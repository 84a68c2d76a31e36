#!/usr/bin/env python
"""Device-trace the batched EKF+RTS program (VERDICT r3 item 3).

The EKF stage gates the warm path (required at N>=300) and the
pose-block Woodbury rewrite only bought 1.2x at N=100 — the two
75x75 inverses were NOT the bottleneck. This capture shows what is:
writes docs/trace_ekf/ + op_stats.json for the exact sweep-path program
(pipeline.sweep._cached_batch_ekf_solver) at BENCH_BATCH x BENCH_FRAMES.

Usage (on the TPU): python scripts/trace_ekf.py
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

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.pipeline import sweep as sweep_lib
    from acinoset_tpu.solvers import ekf as ekf_solver
    from acinoset_tpu.utils import synthetic

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    dtype = jnp.float32

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, _pts = synthetic.render_measurements(
        X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
    )
    n_pose = cheetah.N_ACTIVE
    ecfg = ekf_solver.EkfConfig(
        dt=1.0 / 90.0, dlc_thresh=0.5, meas_std_px=cheetah.MEAS_STD_PX,
    )
    p_ang = np.ones(n_pose - 3)
    P0 = np.diag(np.concatenate([
        np.ones(3) * 9.0, p_ang * (np.pi / 4) ** 2,
        np.ones(3) * 25.0, p_ang * 9.0,
        np.ones(3) * 9.0, np.concatenate([p_ang[:10] * 9.0, p_ang[10:] * 25.0]),
    ]))
    # fused stage signature (r5): packed pixels+likelihood + camera
    # blocks; the nose-linreg x0 runs in-jit
    packed1 = np.concatenate([pixels, likelihood[..., None]], axis=-1)
    auxp1 = np.concatenate([
        np.asarray(k_arr).reshape(6, 9),
        np.asarray(d_arr).reshape(6, -1)[:, :4],
        np.asarray(r_arr).reshape(6, 9),
        np.asarray(t_arr).reshape(6, 3),
    ], axis=1)
    fn = sweep_lib._cached_batch_ekf_solver(ecfg, N, 6, str(dtype), P0.tobytes())
    args = (
        jnp.asarray(np.broadcast_to(packed1, (B, 6, N, 20, 3)), dtype),
        jnp.asarray(np.broadcast_to(auxp1, (B, 6, 25)), dtype),
        jnp.asarray(np.full(B, N, np.int32)),
        jnp.asarray(np.full(B, float(res[0])), dtype),
    )
    o = fn(*args)  # compile + warmup
    float(np.asarray(o[:, -1]).sum())
    log_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "docs", "trace_ekf")
    os.makedirs(log_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(log_dir):
        o = fn(*args)
        float(np.asarray(o[:, -1]).sum())
    wall = time.perf_counter() - t0
    print(f"traced EKF batch: {wall*1e3:.1f} ms wall (B={B}, N={N})")

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
        for p in planes:
            print("  ", os.path.relpath(p), os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
