#!/usr/bin/env python
"""How much rescue budget does the long-horizon generic proof need?
At N=300 the cold 30-iter solve already sits at the optimum cost but
only 9/96 prove stationarity; the 3x rescue (90 iters) converges all
(docs/r05/probe_generic_warm_n300.txt). Measure whether a 1x or 2x
continuation (plain_iters=0, warm-started from the cold solutions —
exactly what _rescue_unconverged does) already proves it.

Run on TPU: python scripts/probe_generic_rescue_budget.py | tee docs/r05/probe_generic_rescue_budget.txt
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

    t0 = time.perf_counter()
    cold = sweep_lib.solve_batch_generic(
        model, runs, dlc_thresh=0.4, num_iters=iters, max_batch=None,
        rescue=False,
    )
    t_cold = time.perf_counter() - t0
    conv0 = sum(int(r_["converged"]) for r_ in cold)
    print(f"cold {iters} iters: {t_cold:.2f} s  converged {conv0}/{B}  "
          f"mean cost {np.mean([r_['cost'] for r_ in cold]):.1f}")
    X0s = [r_["x"] for r_ in cold]
    for mult in (1, 2, 3):
        t0 = time.perf_counter()
        cont = sweep_lib.solve_batch_generic(
            model, runs, dlc_thresh=0.4, num_iters=mult * iters,
            max_batch=None, rescue=False, plain_iters=0, X0_override=X0s,
        )
        dt = time.perf_counter() - t0
        conv = sum(int(r_["converged"]) for r_ in cont)
        cost = float(np.mean([r_["cost"] for r_ in cont]))
        print(f"continue {mult}x ({mult * iters:3d} iters): {dt:6.2f} s  "
              f"converged {conv}/{B}  mean cost {cost:.1f}")


if __name__ == "__main__":
    main()
