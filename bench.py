#!/usr/bin/env python
"""Benchmark: batched FTE throughput on TPU.

Runs the flagship workload — full-trajectory estimation (FTE) for a
batch of cheetah trajectories (N frames x 6 cams x 20 markers, 50
Gauss-Newton iterations) — as one sharded jit program and reports
trajectories/second.

Baseline: the reference solves each trajectory as a separate
Pyomo->IPOPT NLP on CPU. The repo publishes no timings (BASELINE.md);
the driver's north-star target is 90+ trajectories in under 60 s on a
v5e-8 slice, i.e. 1.5 traj/s, which we use as the baseline rate
(vs_baseline = ours / 1.5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env overrides: BENCH_BATCH, BENCH_FRAMES, BENCH_ITERS, BENCH_REPEATS.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    dtype = jnp.float32

    # synthetic canonical run: 6 cams, 20 markers, N frames @ 90 fps
    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
    )

    cfg = default_config(90.0, num_iters=iters)
    if os.environ.get("BENCH_SOLVER"):
        from dataclasses import replace

        cfg = replace(cfg, linear_solver=os.environ["BENCH_SOLVER"])
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr, np.arange(N), 0.5)
    meas = pixels.transpose(1, 0, 2, 3)
    w = (likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px

    # batch: replicate with small perturbations so trajectories differ
    rng = np.random.default_rng(1)
    X0b = np.stack([X0 + rng.normal(scale=1e-3, size=X0.shape) for _ in range(B)])
    measb = np.broadcast_to(meas, (B,) + meas.shape).copy()
    wb = np.broadcast_to(w, (B,) + w.shape).copy()

    mesh = mesh_lib.make_mesh(model_axis=(len(jax.devices()) % 2 == 0 and len(jax.devices()) > 1))
    X0s, meass, ws = mesh_lib.shard_batch(
        mesh, jnp.asarray(X0b, dtype), jnp.asarray(measb, dtype), jnp.asarray(wb, dtype)
    )
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    if os.environ.get("BENCH_NO_PARTS"):
        hj_parts = None
    solver = mesh_lib.sharded_fte_solver(mesh, h, cfg, hj_parts_fn=hj_parts)

    with mesh:
        X = solver(X0s, meass, ws)  # compile + warmup
        X.block_until_ready()
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            X = solver(X0s, meass, ws)
            X.block_until_ready()
            times.append(time.perf_counter() - t0)

    # sanity: solution quality (marker error vs ground truth, f32 path)
    from acinoset_tpu.models import cheetah

    mk = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(np.asarray(X[0]))))
    mk_err = float(np.nanmean(np.linalg.norm(mk - pts3d, axis=-1)))

    best = min(times)
    traj_per_sec = B / best
    baseline = 1.5  # north-star: 90 trajectories / 60 s
    print(
        json.dumps(
            {
                "metric": "fte_trajectories_per_sec",
                "value": round(traj_per_sec, 3),
                "unit": f"traj/s (B={B}, N={N}, C=6, L=20, iters={iters}, "
                f"devices={len(mesh.devices.flatten())}, mean_marker_err_m={mk_err:.4f})",
                "vs_baseline": round(traj_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
