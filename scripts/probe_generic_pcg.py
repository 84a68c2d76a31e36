#!/usr/bin/env python
"""Generic (human) FTE pcg budget: post-fuse the pcg matvecs are 41% of
the 26 ms GN iteration (probe_generic_iter_cost_fused.txt). Does the
48-state system converge at pcg_iters < 16?

Run on TPU: python scripts/probe_generic_pcg.py | tee docs/r05/probe_generic_pcg.txt
"""
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io
    from acinoset_tpu.pipeline import sweep as sweep_lib

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    REF = "/root/reference"
    skel = data_io.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    k, d, r, t, _ = data_io.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    p2d = data_io.load_dlc_points(
        sorted(glob(f"{REF}/data/*.h5")), markers=model.markers
    )
    win = p2d.window(60, 60 + N)
    rng = np.random.default_rng(11)
    runs = []
    for i in range(B):
        px = win.pixels + rng.normal(scale=0.5, size=win.pixels.shape)
        runs.append(sweep_lib.RunData(
            data_dir=f"h{i}", pixels=px,
            likelihood=np.nan_to_num(win.likelihood, nan=-1.0),
            cams=(k, d.reshape(-1, 4), r, np.asarray(t).reshape(-1, 3)),
            fps=120.0, start_frame=60, scene_fpath="",
        ))

    for pcg in (16, 12, 8):
        def run():
            return sweep_lib.solve_batch_generic(
                model, runs, dlc_thresh=0.4, num_iters=30, max_batch=None,
                rescue=True, _cfg_override={"pcg_iters": pcg},
            )
        res = run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run()
            ts.append(time.perf_counter() - t0)
        conv = sum(int(r_["converged"]) for r_ in res)
        cost = float(np.mean([r_["cost"] for r_ in res]))
        print(f"pcg={pcg:2d}: {min(ts):.3f} s  {B/min(ts):6.1f} traj/s  "
              f"converged {conv}/{B}  mean cost {cost:.1f}")


if __name__ == "__main__":
    main()
