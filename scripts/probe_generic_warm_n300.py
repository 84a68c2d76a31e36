#!/usr/bin/env python
"""Generic long-horizon init A/B (N=300, B=96 human): the cold
TRI+linreg init leaves 87/96 runs paying the 3x rescue
(docs/r05/bench_generic_n300.txt). For the CHEETAH the EKF warm start
was measured harmful at every horizon (r4) — but that EKF carried
~1e9 of third-difference cost; the r5 generic EKF (soft 8 px R, low
jerk) is heavily smoothed, so re-measure for the generic path.

Run on TPU: python scripts/probe_generic_warm_n300.py | tee docs/r05/probe_generic_warm_n300.txt
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
    N = int(os.environ.get("BENCH_FRAMES", 300))
    iters = int(os.environ.get("BENCH_ITERS", 30))
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

    for label, warm, rescue in [("cold+rescue", False, True),
                                ("warm+rescue", True, True),
                                ("cold", False, False),
                                ("warm", True, False)]:
        def run():
            return sweep_lib.solve_batch_generic(
                model, runs, dlc_thresh=0.4, num_iters=iters,
                max_batch=None, warm_start=warm, rescue=rescue,
            )
        res = run()
        t0 = time.perf_counter()
        res = run()
        dt = time.perf_counter() - t0
        conv = sum(int(r_["converged"]) for r_ in res)
        cost = float(np.mean([r_["cost"] for r_ in res]))
        gn = float(max(r_["grad_norm"] for r_ in res))
        print(f"{label:12s}: {dt:6.2f} s  {B/dt:5.1f} traj/s  "
              f"converged {conv}/{B}  mean cost {cost:.1f}  max gn {gn:.3f}")


if __name__ == "__main__":
    main()
