#!/usr/bin/env python
"""Measure measurement-stage (hj_parts = FK + rig projection) formulations
on device. The fresh r4 trace (docs/trace_r4) shows the stage's hottest
op is the camera-frame point transform `pts @ Rm.T` — a batched
dot_general with contraction dim 3 at 22 ms/solve (24% of device time),
the same ≪128-wide contraction class the r4 assembly probe measured as
a layout liability (docs/roofline.md). Variants:

  v0 production make_hj_parts_fn (FK `@` chain + projection `pts @ Rm.T`)
  v1 projection point transform as broadcast-multiply-reduce, FK current
  v2 FK chain as multiply-reduce / row-select (scripts/probe_fk.py v1),
     projection current
  v3 both

Timing per the r4 rule (CLAUDE.md): K>=120-deep scan chain,
non-separable carry perturbation, quadratic consumption, host-transfer
sync. Run on the TPU: python scripts/probe_meas.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.ops import camera as cam_ops
    from acinoset_tpu.pipeline.ekf import make_hj_parts_fn
    from acinoset_tpu.utils import synthetic
    from probe_fk import build_fk_mr

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    K = int(os.environ.get("BENCH_CHAIN", 120))
    M = B * N
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.3, size=(M, 25)), dtype)

    k_arr, d_arr, r_arr, t_arr, _res = synthetic.ring_cameras(n_cams=6)
    k = jnp.asarray(k_arr, dtype)
    d = jnp.asarray(d_arr, dtype).reshape(k.shape[0], -1)[:, :4]
    r = jnp.asarray(r_arr, dtype)
    t = jnp.asarray(t_arr, dtype).reshape(k.shape[0], 3)

    def proj_mr(pts, Kc, D, R, tc, eps=1e-12):
        """project_points_fisheye_and_jac with the point transform as
        broadcast-multiply-reduce instead of `pts @ Rm.T`."""
        pts = jnp.asarray(pts)
        D = jnp.asarray(D, pts.dtype).reshape(-1)[:4]
        tc = jnp.asarray(tc, pts.dtype).reshape(3)
        Rm = jnp.asarray(R, pts.dtype)
        cam = jnp.sum(Rm * pts[..., None, :], axis=-1) + tc
        z = cam[..., 2]
        a = cam[..., 0] / z
        b = cam[..., 1] / z
        r2 = a * a + b * b + eps
        rr = jnp.sqrt(r2)
        theta = jnp.arctan(rr)
        t2 = theta * theta
        poly = 1.0 + t2 * (D[0] + t2 * (D[1] + t2 * (D[2] + t2 * D[3])))
        dpoly = 1.0 + t2 * (
            3.0 * D[0] + t2 * (5.0 * D[1] + t2 * (7.0 * D[2] + 9.0 * t2 * D[3]))
        )
        th_d = theta * poly
        s = th_d / rr
        u = Kc[0, 0] * (a * s) + Kc[0, 2]
        v = Kc[1, 1] * (b * s) + Kc[1, 2]
        uv = jnp.stack([u, v], axis=-1)
        g = (dpoly / (1.0 + r2) - s) / r2
        zinv = 1.0 / z[..., None]
        Ma = (Rm[0] - a[..., None] * Rm[2]) * zinv
        Mb = (Rm[1] - b[..., None] * Rm[2]) * zinv
        Ju = Kc[0, 0] * ((s + a * a * g)[..., None] * Ma + (a * b * g)[..., None] * Mb)
        Jv = Kc[1, 1] * ((a * b * g)[..., None] * Ma + (s + b * b * g)[..., None] * Mb)
        return uv, jnp.stack([Ju, Jv], axis=-2)

    fk_mr = build_fk_mr(t_mulred=False)

    def make_variant(fk_fn, proj_fn):
        def hj(pose25):
            pts, Jfk = fk_fn(pose25)
            h, Jp = jax.vmap(lambda kk, dd, rr_, tt: proj_fn(pts, kk, dd, rr_, tt))(
                k, d, r, t
            )
            return h.reshape(-1), Jp, Jfk
        return jax.vmap(hj)

    variants = {
        "v0_current": jax.vmap(make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)),
        "v1_proj_mr": make_variant(
            cheetah.fk25_and_jac, proj_mr
        ),
        "v2_fk_mr": make_variant(
            fk_mr, cam_ops.project_points_fisheye_and_jac
        ),
        "v3_both_mr": make_variant(fk_mr, proj_mr),
    }

    ref = None
    for name, fn in variants.items():
        @jax.jit
        def prog(x, fn=fn):
            def body(c, _):
                xp = x * (1.0 + 1e-6 * jnp.cos(x * (c + 1.0)))
                h, Jp, Jfk = fn(xp)
                return (
                    c
                    + jnp.mean(h * h)
                    + jnp.mean(Jp * Jp)
                    + jnp.mean(Jfk * Jfk),
                    (),
                )
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        float(prog(x))  # compile + warmup, host-synced
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(x))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K * 1e3
        h, Jp, Jfk = jax.jit(fn)(x)
        if ref is None:
            ref = tuple(np.asarray(a) for a in (h, Jp, Jfk))
            dh = dp = dj = 0.0
        else:
            dh = float(np.max(np.abs(np.asarray(h) - ref[0])) / np.abs(ref[0]).max())
            dp = float(np.max(np.abs(np.asarray(Jp) - ref[1])) / np.abs(ref[1]).max())
            dj = float(np.max(np.abs(np.asarray(Jfk) - ref[2])) / np.abs(ref[2]).max())
        print(
            f"{name:12s}: {per:7.3f} ms/meas-pass (M={M})  "
            f"(rel dh={dh:.2e} dJp={dp:.2e} dJfk={dj:.2e})"
        )


if __name__ == "__main__":
    main()
