#!/usr/bin/env python
"""Compare FTE linear-solver backends on the flagship workload (TPU).

Times the full batched FTE solve (B trajectories x N frames, 40 GN
iterations) for each linear_solver backend. Used to pick the default
(VERDICT round 1 item 3: wire or delete the grouped tridiagonal solve).
"""
import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from acinoset_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.parallel import mesh as mesh_lib
    from acinoset_tpu.pipeline.ekf import make_h_fn, make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import default_config, initial_trajectory
    from acinoset_tpu.utils import synthetic

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    iters = int(os.environ.get("BENCH_ITERS", 40))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    solvers = os.environ.get("BENCH_SOLVERS", "pcg,chol_unrolled,cg").split(",")
    dtype = jnp.float32

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
    )

    base_cfg = default_config(90.0, num_iters=iters)
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr, np.arange(N), 0.5)
    meas = pixels.transpose(1, 0, 2, 3)
    w = (likelihood.transpose(1, 0, 2) > 0.5) / base_cfg.meas_std_px

    rng = np.random.default_rng(1)
    X0b = np.stack([X0 + rng.normal(scale=1e-3, size=X0.shape) for _ in range(B)])
    measb = np.broadcast_to(meas, (B,) + meas.shape).copy()
    wb = np.broadcast_to(w, (B,) + w.shape).copy()

    mesh = mesh_lib.make_mesh(model_axis=(len(jax.devices()) % 2 == 0 and len(jax.devices()) > 1))
    X0s, meass, ws = mesh_lib.shard_batch(
        mesh, jnp.asarray(X0b, dtype), jnp.asarray(measb, dtype), jnp.asarray(wb, dtype)
    )

    from acinoset_tpu.models import cheetah

    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    results = {}
    for name in solvers:
        cfg = replace(base_cfg, linear_solver=name)
        solver = mesh_lib.sharded_fte_solver(mesh, h, cfg, hj_parts_fn=hj_parts)
        with mesh:
            t0 = time.perf_counter()
            X = solver(X0s, meass, ws)
            X.block_until_ready()
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                X = solver(X0s, meass, ws)
                X.block_until_ready()
                times.append(time.perf_counter() - t0)
        mk = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(np.asarray(X[0]))))
        mk_err = float(np.nanmean(np.linalg.norm(mk - pts3d, axis=-1)))
        results[name] = dict(
            best_s=round(min(times), 4),
            traj_per_sec=round(B / min(times), 2),
            compile_s=round(compile_s, 1),
            mean_marker_err_m=round(mk_err, 5),
        )
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
