"""Extended benchmark: all pipeline stages on the attached TPU.

Prints a small table (TRI, SBA, EKF, FTE throughputs). `bench.py` stays
the driver's single-line benchmark; this script is for engineering.

    python scripts/bench_all.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def timeit(f, n=2):
    import jax

    o = f()
    jax.block_until_ready(o)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        o = f()
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.ops import camera as cam_ops
    from acinoset_tpu.pipeline.ekf import make_h_fn
    from acinoset_tpu.pipeline.ekf import make_hj_fn, make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import default_config, initial_trajectory
    from acinoset_tpu.solvers import ekf as ekf_solver
    from acinoset_tpu.solvers.lm import sba_points
    from acinoset_tpu.solvers.trajopt import fte_solve
    from acinoset_tpu.utils import synthetic

    dtype = jnp.float32
    cams = synthetic.ring_cameras(n_cams=6)
    k, d, r, t, res = cams
    rows = []

    # ---- TRI: 8192 frames x 20 markers
    N_tri = 8192
    X64 = synthetic.cheetah_gallop(N=64, fps=90.0)
    px64, lik64, _ = synthetic.render_measurements(X64, cams, noise_px=1.0, seed=0)
    reps = N_tri // 64
    pixels = jnp.asarray(np.tile(px64, (1, reps, 1, 1)), dtype)
    valid = jnp.asarray(np.tile(lik64 > 0.5, (1, reps, 1)))
    tri_f = jax.jit(lambda p, v: cam_ops.triangulate_pairwise_mean(p, v, k, d, r, t)[0])
    dt = timeit(lambda: tri_f(pixels, valid))
    rows.append(("TRI pairwise triangulation", f"{N_tri / dt:,.0f} frames/s", f"{N_tri} frames x 20 markers x 6 cams"))

    # ---- SBA points-only: 8192 points x 6 cams
    P_pts = 8192
    gt = np.random.default_rng(0).uniform(-2, 2, (P_pts, 3))
    gt[:, 2] = np.abs(gt[:, 2]) + 0.5
    obs = np.stack(
        [np.asarray(cam_ops.project_points_fisheye(gt, k[c], d[c], r[c], t[c])) for c in range(6)],
        axis=1,
    )
    mask = np.ones((P_pts, 6), bool)
    x0 = gt + np.random.default_rng(1).normal(scale=0.05, size=gt.shape)
    sba_f = jax.jit(
        lambda o, m, x: sba_points(o, m, k, d, r, t, x, num_iters=20)[0]
    )
    dt = timeit(lambda: sba_f(jnp.asarray(obs, dtype), jnp.asarray(mask), jnp.asarray(x0, dtype)))
    rows.append(("SBA point refinement", f"{P_pts / dt:,.0f} points/s", f"{P_pts} pts x 6 cams, 20 LM iters"))

    # ---- EKF: B=96 runs x 100 frames
    B, N = 96, 100
    Xg = synthetic.cheetah_gallop(N=N, fps=90.0)
    px, lik, _ = synthetic.render_measurements(Xg, cams, noise_px=1.5, seed=0)
    n_pose = cheetah.N_ACTIVE
    cfg_e = ekf_solver.EkfConfig(dt=1 / 90.0, dlc_thresh=0.5, max_pixel_err=float(res[0]))
    P0 = jnp.eye(3 * n_pose, dtype=dtype)
    x0e = np.zeros(3 * n_pose)
    x0e[:3] = Xg[0, :3]
    h = make_h_fn(k, d, r, t, dtype)
    pixb = jnp.asarray(np.stack([px.transpose(1, 0, 2, 3)] * B), dtype)
    likb = jnp.asarray(np.stack([lik.transpose(1, 0, 2)] * B), dtype)
    x0b = jnp.asarray(np.stack([x0e] * B), dtype)
    hj = make_hj_fn(k, d, r, t, dtype)
    ekf_f = jax.jit(
        jax.vmap(lambda p, l, x: ekf_solver.run_ekf(h, p, l, x, P0, cheetah.EKF_QB, cfg_e, hj_fn=hj)["smoothed_x"])
    )
    dt = timeit(lambda: ekf_f(pixb, likb, x0b))
    rows.append(("EKF + RTS smoother", f"{B / dt:,.1f} runs/s ({B * N / dt:,.0f} frames/s)", f"B={B} runs x {N} frames"))

    # ---- FTE: B=96 x 100 frames, 40 GN iters
    cfg = default_config(90.0, num_iters=40)
    X0 = initial_trajectory(px, lik, k, d, r, t, np.arange(N), 0.5)
    w = (lik.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px
    X0b = jnp.asarray(np.stack([X0] * B), dtype)
    measb = jnp.asarray(np.stack([px.transpose(1, 0, 2, 3)] * B), dtype)
    wb = jnp.asarray(np.stack([w] * B), dtype)
    hj_parts = make_hj_parts_fn(k, d, r, t, dtype)
    fte_f = jax.jit(jax.vmap(lambda a, b2, c2: fte_solve(h, a, b2, c2, cfg, hj_parts_fn=hj_parts)[0]))
    dt = timeit(lambda: fte_f(X0b, measb, wb))
    rows.append(("FTE banded Gauss-Newton", f"{B / dt:,.1f} traj/s", f"B={B} x {N} frames, 40 GN iters"))

    print(f"\ndevice: {jax.devices()[0]}")
    wname = max(len(r[0]) for r in rows)
    wval = max(len(r[1]) for r in rows)
    for name, val, note in rows:
        print(f"  {name:<{wname}}  {val:<{wval}}  ({note})")


if __name__ == "__main__":
    main()
