#!/usr/bin/env python
"""Generic-skeleton EKF stage on-device: associative vs sequential RTS
smoother at the human skeleton's 144-state size (the 'auto' knee N=256
was tuned on the 75-state cheetah; the associative form's 4x matmul
FLOPs stop being free when the state triples —
docs/r05/bench_generic_b96.txt measured the stage at 1.9 runs/s).

Env: BENCH_BATCH (96), BENCH_FRAMES (100), BENCH_REPEATS (3).
Run on TPU: python scripts/probe_generic_ekf.py | tee docs/r05/probe_generic_ekf.txt
"""
import json
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io
    from acinoset_tpu.pipeline import sweep as sweep_lib

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

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

    for mode in ("associative", "sequential"):
        def run():
            return sweep_lib.solve_batch_ekf_generic(
                model, runs, 0.4, max_batch=None, smoother=mode
            )

        res = run()  # compile + warmup
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            res = run()
            ts.append(time.perf_counter() - t0)
        mk = float(np.nanmean([np.nanstd(r_["positions"]) for r_ in res]))
        print(json.dumps({
            "smoother": mode, "B": B, "N": N,
            "sec": round(min(ts), 3), "runs_per_sec": round(B / min(ts), 2),
            "outliers_mean": round(float(np.mean(
                [r_["outliers"] for r_ in res])), 1),
            "pos_spread": round(mk, 4),
        }))


if __name__ == "__main__":
    main()
