#!/usr/bin/env python
"""Generic (human) FTE per-iteration cost split. The measurement pass
(hj_parts) measured only ~5.0 ms/call at B=96/N=100
(probe_generic_fte_split.txt) while the solve runs ~90 ms/iteration —
so the cost is in the GN iteration body. Slopes:

  iters 10 vs 30 at pcg=16   -> per-GN-iteration cost
  pcg 4 vs 16 at iters=20    -> per-pcg-iteration (matvec) cost

Run on TPU: python scripts/probe_generic_iter_cost.py | tee docs/r05/probe_generic_iter_cost.txt
"""
import os
import sys
import time
from dataclasses import replace
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io
    from acinoset_tpu.pipeline import sweep as sweep_lib
    from acinoset_tpu.pipeline.generic import generic_config

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

    def timeit(num_iters, pcg_iters, reps=3):
        def run():
            return sweep_lib.solve_batch_generic(
                model, runs, dlc_thresh=0.4, num_iters=num_iters,
                max_batch=None, rescue=False,
                _cfg_override={"pcg_iters": pcg_iters},
            )
        run()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_i10 = timeit(10, 16)
    t_i30 = timeit(30, 16)
    per_iter = (t_i30 - t_i10) / 20
    print(f"iters 10: {t_i10:.3f} s  iters 30: {t_i30:.3f} s  "
          f"-> {per_iter * 1e3:.1f} ms/GN-iter (batch)")
    t_p4 = timeit(20, 4)
    t_p16 = timeit(20, 16)
    per_pcg = (t_p16 - t_p4) / (12 * 20)
    print(f"pcg 4: {t_p4:.3f} s  pcg 16: {t_p16:.3f} s  "
          f"-> {per_pcg * 1e3:.2f} ms/pcg-iter x 16 = "
          f"{per_pcg * 16 * 1e3:.1f} ms of the GN iter")


if __name__ == "__main__":
    main()
