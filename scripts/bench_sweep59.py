#!/usr/bin/env python
"""End-to-end 59-run all_flick-twin sweep timing (the README stage-table
row). Builds a synthetic 59-run dataset mirroring the released capture's
shape (6-cam rigs, ~100-200-frame runs, two fps groups), then times
`pipeline.sweep.sweep` warm in-process — data loading, batched
TRI-init + FTE (+EKF stage), rescue, and result pickles included.

The r2 measurement of this row (5.4 s warm) predates the r5 EKF
result-transfer fix; 'ekf' is in stages so the fixed path is on the
clock.

Run on TPU: python scripts/bench_sweep59.py | tee docs/r05/bench_sweep59.txt
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def build_dataset(root):
    from acinoset_tpu.models import cheetah
    from acinoset_tpu.pipeline import data
    from acinoset_tpu.utils import synthetic

    total_frames = 0
    # 59 runs over two fps groups (one compile signature per group)
    specs = []
    rng = np.random.default_rng(0)
    for i in range(59):
        fps = 90.0 if i % 2 == 0 else 120.0
        N = int(rng.choice([96, 128, 160, 200]))
        specs.append((fps, N, i))
    for fps, N, seed in specs:
        run = os.path.join(root, f"2019_03_{seed:02d}", "cheetah", "run")
        dlc = os.path.join(run, "dlc")
        os.makedirs(dlc)
        cams = synthetic.ring_cameras(n_cams=6)
        k, d, r, t, res = cams
        X = synthetic.cheetah_gallop(N=N, fps=fps)
        pixels, likelihood, _ = synthetic.render_measurements(
            X, cams, noise_px=1.0, outlier_frac=0.01, bad_lik_frac=0.02,
            seed=seed,
        )
        for c in range(6):
            data.save_dlc_points_h5(
                os.path.join(dlc, f"cam{c + 1}DLC.h5"), pixels[c],
                likelihood[c], cheetah.get_markers(),
            )
        scene_dir = os.path.join(os.path.dirname(run), "extrinsic_calib")
        os.makedirs(scene_dir)
        data.save_scene(
            os.path.join(scene_dir, "6_cam_scene_sba.json"),
            k, d.reshape(-1, 4, 1), r, t, res,
        )
        import json

        with open(os.path.join(run, "video_info.json"), "w") as fh:
            json.dump({"resolution": list(res), "fps": fps,
                       "tot_frames": N}, fh)
        total_frames += N
    return total_frames


def main():
    from acinoset_tpu.pipeline.sweep import sweep

    root = tempfile.mkdtemp(prefix="sweep59_")
    try:
        total = build_dataset(root)
        print(f"dataset: 59 runs, {total} frames")
        t0 = time.perf_counter()
        res = sweep(root, dlc_thresh=0.8, num_iters=13,
                    stages=("fte", "ekf"))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = sweep(root, dlc_thresh=0.8, num_iters=13,
                    stages=("fte", "ekf"))
        warm = time.perf_counter() - t0
        conv = sum(int(r.get("converged", True)) for r in res
                   if "converged" in r)
        print(f"cold in-process: {cold:.1f} s   warm: {warm:.2f} s   "
              f"({total / warm:.0f} frames/s warm, fte+ekf stages, "
              f"{conv} converged)")
        sweep(root, dlc_thresh=0.8, num_iters=13, stages=("fte",))
        t0 = time.perf_counter()
        res = sweep(root, dlc_thresh=0.8, num_iters=13, stages=("fte",))
        warm_fte = time.perf_counter() - t0
        print(f"fte-only warm: {warm_fte:.2f} s "
              f"({total / warm_fte:.0f} frames/s)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
