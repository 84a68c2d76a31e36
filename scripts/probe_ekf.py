#!/usr/bin/env python
"""Time the batched EKF+RTS stage on device (VERDICT r3 item 3).

The EKF warm start is REQUIRED at N>=300 (cold init diverges) but the
stage was never profiled: at B=96/N=100 it cost 0.45 s — more than the
entire 14-iteration FTE it initializes. This probe times the exact
sweep-path program (`pipeline.sweep._cached_batch_ekf_solver`) on the
synthetic canonical workload at configurable B/N, so before/after
numbers for the solver rewrite are apples-to-apples.

Env: BENCH_BATCH (96), BENCH_FRAMES (100), BENCH_REPEATS (3).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.pipeline import sweep as sweep_lib
    from acinoset_tpu.solvers import ekf as ekf_solver
    from acinoset_tpu.utils import synthetic

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    dtype = jnp.float32

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
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
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = fn(*args)
        # host transfer of a (B,) reduction = true completion sync: the
        # tunneled block_until_ready has been observed to return early
        # on small programs (scripts/probe_timing.py, CLAUDE.md)
        float(np.asarray(o[:, -1]).sum())  # outliers column of the flat buffer
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    # output quality sanity: smoothed pose vs truth (meters on root)
    flat = np.asarray(out)
    sz_s, sz_m = N * n_pose, N * 20 * 3
    mk = flat[:, 6 * sz_s + sz_m:6 * sz_s + 2 * sz_m].reshape(B, N, 20, 3)
    mk_err = float(np.nanmean(np.linalg.norm(mk - pts3d[None], axis=-1)))
    print(json.dumps({
        "probe": "ekf_batched", "B": B, "N": N,
        "sec": round(best, 4), "runs_per_sec": round(B / best, 2),
        "compile_s": round(compile_s, 1),
        "mean_marker_err_m": round(mk_err, 4),
        "outliers_mean": round(float(np.mean(flat[:, -1])), 1),
    }))


if __name__ == "__main__":
    main()
