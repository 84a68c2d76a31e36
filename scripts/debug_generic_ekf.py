#!/usr/bin/env python
"""Why does the generic EKF diverge on the shipped human fixture while
the generic FTE converges on the same runs? (docs/r05/probe_generic_ekf:
outliers 2629/3000, pos_spread ~1e12.) CPU, single run, f64."""
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io
    from acinoset_tpu.pipeline import sweep as sweep_lib

    N = int(os.environ.get("BENCH_FRAMES", 100))
    REF = "/root/reference"
    skel = data_io.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    k, d, r, t, _ = data_io.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    p2d = data_io.load_dlc_points(
        sorted(glob(f"{REF}/data/*.h5")), markers=model.markers
    )
    win = p2d.window(60, 60 + N)
    lik = np.nan_to_num(win.likelihood, nan=-1.0)
    print("pixels shape", win.pixels.shape, "lik>0.4 frac",
          float((lik > 0.4).mean()))
    run = sweep_lib.RunData(
        data_dir="h0", pixels=win.pixels, likelihood=lik,
        cams=(k, d.reshape(-1, 4), r, np.asarray(t).reshape(-1, 3)),
        fps=120.0, start_frame=60, scene_fpath="",
    )
    res = sweep_lib.solve_batch_ekf_generic(
        model, [run], 0.4, dtype=jnp.float64, max_batch=None
    )[0]
    pos = res["positions"]
    s = res["states"]
    print("outliers", res["outliers"])
    print("pos |max| per decile:",
          [float(np.abs(pos[i]).max()) for i in range(0, N, max(N // 10, 1))])
    x = s["x"]
    print("x root |max| per decile:",
          [float(np.abs(x[i, :3]).max()) for i in range(0, N, max(N // 10, 1))])
    print("smoothed_x root range:",
          float(np.abs(s["smoothed_x"][:, :3]).max()))
    # and the FTE on the same run for contrast
    fte = sweep_lib.solve_batch_generic(
        model, [run], dlc_thresh=0.4, num_iters=30, max_batch=None,
        dtype=jnp.float64,
    )[0]
    print("fte cost", fte["cost"], "converged", fte["converged"],
          "pos |max|", float(np.abs(fte["positions"]).max()))


if __name__ == "__main__":
    main()
