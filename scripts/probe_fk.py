#!/usr/bin/env python
"""Measure FK-chain formulations on device (the FK+projection bucket is
the largest remaining one after the r4 VPU-assembly fix, docs/roofline.md).

The current `cheetah.fk25_and_jac` composes the joint chain with `@` on
(3, 3) operands under vmap — batched dot_generals with contraction dim
3 ≪ 128, exactly the shape class the r4 assembly probe measured as a
layout liability (1.5–27 GB/s effective). Variants re-express every
3-wide product as a broadcast-multiply-reduce fusion:

  v0 current fk25_and_jac (batched 3x3 dot_generals)
  v1 multiply-reduce 3x3 composition + matvec; axis rows selected
     directly (R^T e_k = R[k]) instead of matvecs
  v2 v1 plus the (L, L*A) static-mask segment-sum einsum T as a
     multiply-reduce (XLA must fuse the (M, L, L, A, 3) broadcast into
     the reduce or this loses on HBM)

Timing per the r4 rule (CLAUDE.md): K>=120-deep scan chain with a
non-separable carry perturbation, quadratic consumption, host-transfer
sync. Run on the TPU: python scripts/probe_fk.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def build_fk_mr(t_mulred=False):
    """Single-pose (25,) -> (pts (L,3), J (L,3,25)) multiply-reduce FK
    variant; arithmetically equal to cheetah.fk25_and_jac."""
    import jax.numpy as jnp

    from acinoset_tpu.models.cheetah import (
        _JAC_ANGLES, _JAC_MSA, JOINTS, MARKER_SPECS, N_MARKERS,
        expand_pose, N_JOINTS,
    )
    from acinoset_tpu.ops.rotations import rot_x, rot_y, rot_z

    def mm3(A, Bm):
        # (..., 3, 3) @ (..., 3, 3) as broadcast-multiply-reduce
        return jnp.sum(A[..., :, :, None] * Bm[..., None, :, :], axis=-2)

    def mvT3(R, v):
        # R^T @ v for (..., 3, 3), (3,)
        return jnp.sum(R * v[..., :, None], axis=-2)

    def local_rot_mr(has_phi, has_theta, has_psi, phi, theta, psi):
        R = None
        if has_theta:
            R = rot_y(theta)
        if has_phi:
            R = rot_x(phi) if R is None else mm3(rot_x(phi), R)
        if has_psi:
            R = rot_z(psi) if R is None else mm3(rot_z(psi), R)
        return jnp.eye(3, dtype=phi.dtype) if R is None else R

    def fk_and_jac_mr(x25):
        x25 = jnp.asarray(x25)
        dt = x25.dtype
        x45 = expand_pose(x25)
        phi = x45[3 : 3 + N_JOINTS]
        theta = x45[3 + N_JOINTS : 3 + 2 * N_JOINTS]
        psi = x45[3 + 2 * N_JOINTS :]

        eye3 = jnp.eye(3, dtype=dt)
        R, Rpar = [], []
        for j, (_n, (parent, hp, ht, hs)) in enumerate(JOINTS.items()):
            Rl = local_rot_mr(hp, ht, hs, phi[j], theta[j], psi[j])
            Rp = eye3 if parent < 0 else R[parent]
            Rpar.append(Rp)
            R.append(Rl if parent < 0 else mm3(Rl, Rp))

        positions, segs = [], []
        root = x45[:3]
        for _n, base_idx, frame_j, offset in MARKER_SPECS:
            off = jnp.asarray(offset, dtype=dt)
            v = mvT3(R[frame_j], off)
            segs.append(v)
            base = root if base_idx < 0 else positions[base_idx]
            positions.append(base + v)
        pts = jnp.stack(positions)
        V = jnp.stack(segs)  # (L, 3)

        omegas = []
        for kind, j in _JAC_ANGLES:
            if kind == "theta":
                omegas.append(Rpar[j][1])          # Rpar^T y_hat = row 1
            elif kind == "psi":
                omegas.append(R[j][2])             # R^T z_hat = row 2
            else:  # phi: Rpar^T (Ry(th)^T x_hat); Ry(th)^T x = row 0 of Ry
                c, s = jnp.cos(theta[j]), jnp.sin(theta[j])
                omegas.append(c * Rpar[j][0] - s * Rpar[j][2])
        W = jnp.stack(omegas)  # (A, 3)

        msa = jnp.asarray(_JAC_MSA, dt)  # (L, L, A)
        if t_mulred:
            T = jnp.sum(msa[:, :, :, None] * V[None, :, None, :], axis=1)
        else:
            T = jnp.einsum("msa,sx->max", msa, V)  # (L, A, 3)
        Jang = jnp.cross(W[None, :, :], T)
        Jang = jnp.swapaxes(Jang, 1, 2)
        J = jnp.concatenate(
            [jnp.broadcast_to(eye3, (N_MARKERS, 3, 3)), Jang], axis=-1
        )
        return pts, J

    return fk_and_jac_mr


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.models import cheetah

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    K = int(os.environ.get("BENCH_CHAIN", 120))
    M = B * N
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(scale=0.3, size=(M, 25)), dtype)

    variants = {
        "v0_current": jax.vmap(cheetah.fk25_and_jac),
        "v1_mulred": jax.vmap(build_fk_mr(t_mulred=False)),
        "v2_mr_tsum": jax.vmap(build_fk_mr(t_mulred=True)),
    }

    ref = None
    for name, fn in variants.items():
        @jax.jit
        def prog(x, fn=fn):
            def body(c, _):
                xp = x * (1.0 + 1e-6 * jnp.cos(x * (c + 1.0)))
                pts, J = fn(xp)
                return c + jnp.mean(pts * pts) + jnp.mean(J * J), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        float(prog(x))  # compile + warmup, host-synced
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(x))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K * 1e3
        pts, J = jax.jit(fn)(x)
        if ref is None:
            ref = (np.asarray(pts), np.asarray(J))
            dp = dj = 0.0
        else:
            dp = float(np.max(np.abs(np.asarray(pts) - ref[0])) / np.abs(ref[0]).max())
            dj = float(np.max(np.abs(np.asarray(J) - ref[1])) / np.abs(ref[1]).max())
        print(f"{name:12s}: {per:7.3f} ms/FK-pass (M={M})  (rel dpts={dp:.2e} dJ={dj:.2e})")


if __name__ == "__main__":
    main()
