#!/usr/bin/env python
"""RGF marginal-covariance scan optimizations A/B (VERDICT r4 item 7
follow-up: docs/r05/probe_cov_breakdown_* showed the width-2 pair scan
IS the whole ~41 ms uncertainty delta — 34 forward Schur steps + 34
backward steps, latency-bound).

Variants, timed as K-chains in one jit with host-transfer sync on the
production pair form (B=96 x width 2, N=100, P=25):

  v0_current : production block_banded_marginal_covariance (group 3)
  v1_unroll2 : same, lax.scan(unroll=2) on both scans
  v2_unroll4 : same, unroll=4
  v3_group6  : adjacent superblocks pair-merged (G=150, M=17),
               blocked Cholesky at p=50, same Newton refinement
  v4_g6_unr2 : group 6 + unroll=2

Run on TPU: python scripts/probe_cov_opt.py | tee docs/r05/probe_cov_opt.txt
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.solvers.banded import (
        _chol_inv_blocked3,
        _T,
        block_banded_marginal_covariance,
        group_bands_tridiagonal,
    )
    from acinoset_tpu.utils.precision import f32_matmuls

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    P = 25
    K = int(os.environ.get("BENCH_CHAIN", 30))
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    b0 = np.eye(P)[None, None] + 0.05 * rng.normal(size=(B, N, P, P))
    b0 = 0.5 * (b0 + b0.transpose(0, 1, 3, 2)) + 3.0 * np.eye(P)[None, None]
    bands = [jnp.asarray(b0, dtype)] + [
        jnp.asarray(0.05 * rng.normal(size=(B, N, P, P)), dtype) for _ in range(3)
    ]
    ridge = 1e-6

    @f32_matmuls
    def marginal_cov_opt(bands_one, unroll=1, group6=False):
        """Variant of block_banded_marginal_covariance with knobs —
        f32-pinned like the production function (an unpinned first probe
        ran bf16: diag rel err 7.6e-3 on TPU and flattering timings)."""
        Nl, Pl, _ = bands_one[0].shape
        diag, lower, M, pad = group_bands_tridiagonal(bands_one)
        if group6:
            if M % 2:
                eyeG = jnp.eye(diag.shape[-1], dtype=diag.dtype)
                diag = jnp.concatenate([diag, eyeG[None]])
                lower = jnp.concatenate(
                    [lower, jnp.zeros_like(lower[:1])])
                M += 1
            G3 = diag.shape[-1]
            De, Do = diag[0::2], diag[1::2]
            Le, Lo = lower[0::2], lower[1::2]
            top = jnp.concatenate([De, _T(Lo)], axis=2)
            bot = jnp.concatenate([Lo, Do], axis=2)
            diag = jnp.concatenate([top, bot], axis=1)  # (M/2, 2G3, 2G3)
            z = jnp.zeros_like(Le)
            lower = jnp.concatenate([
                jnp.concatenate([z, Le], axis=2),
                jnp.concatenate([z, z], axis=2),
            ], axis=1)
            lower = lower.at[0].set(0.0)
            M //= 2
            p_blk = G3 * 2 // 3
        else:
            p_blk = Pl
        G = diag.shape[-1]
        eye = jnp.eye(G, dtype=diag.dtype)

        def step(Li_prev, inp):
            d, l = inp
            Loff = l @ Li_prev.T
            S = d - Loff @ Loff.T
            _L0, Li = _chol_inv_blocked3(S, p_blk)
            return Li, (Li, Loff)

        _, (Li, Loff) = jax.lax.scan(step, eye, (diag, lower), unroll=unroll)
        Finv = jnp.einsum("mki,mkj->mij", Li, Li)
        Fm = diag - Loff @ _T(Loff)
        Finv = Finv + Finv @ (eye - Fm @ Finv)
        Finv = 0.5 * (Finv + _T(Finv))
        B_next = jnp.concatenate([lower[1:], jnp.zeros((1, G, G), diag.dtype)])

        def bwd_step(Z_next, inp):
            fi, bn = inp
            W = fi @ _T(bn)
            Zm = fi + W @ Z_next @ _T(W)
            return 0.5 * (Zm + _T(Zm)), None

        # emit via second scan output: keep parity with production
        def bwd_step2(Z_next, inp):
            Zm, _ = bwd_step(Z_next, inp)
            return Zm, Zm

        _, Z = jax.lax.scan(
            bwd_step2, jnp.zeros((G, G), diag.dtype), (Finv, B_next),
            reverse=True, unroll=unroll,
        )
        nblk = G // Pl
        Zf = jnp.stack(
            [Z[:, j * Pl:(j + 1) * Pl, j * Pl:(j + 1) * Pl] for j in range(nblk)],
            axis=1,
        )
        return Zf.reshape(-1, Pl, Pl)[:Nl]

    # --- correctness vs production on one system ---
    one = [bk[0] for bk in bands]
    one[0] = one[0] + ridge * jnp.eye(P, dtype=dtype)
    Z_ref = np.asarray(block_banded_marginal_covariance(one))
    dref = np.diagonal(Z_ref, axis1=-2, axis2=-1)
    for name, kw in [("v1", dict(unroll=2)), ("v3", dict(group6=True)),
                     ("v4", dict(group6=True, unroll=2))]:
        Zv = np.asarray(marginal_cov_opt(one, **kw))
        dv = np.diagonal(Zv, axis1=-2, axis2=-1)
        rel = np.max(np.abs(dv - dref) / np.maximum(np.abs(dref), 1e-30))
        print(f"{name} diag rel err vs v0: {rel:.2e}")
    if os.environ.get("PROBE_CORRECTNESS_ONLY"):
        return

    def timed(name, prog, *args):
        f = jax.jit(prog)
        float(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:11s}: {min(ts) / K * 1e3:8.3f} ms/call")

    def chain(fn):
        def prog(*args):
            def body(c, _):
                return fn(c, *args), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out
        return prog

    def pair(mc):
        def s2(c, *bs):
            b0p = bs[0] * (1.0 + 1e-6 * jnp.cos(c + 1.0))
            eye = jnp.eye(P, dtype=dtype)
            pair0 = jnp.stack([b0p, b0p + ridge * eye], 1)
            rest = [jnp.stack([bk, bk], 1) for bk in bs[1:]]
            Z = jax.vmap(jax.vmap(
                lambda a, b, d, e: mc([a, b, d, e])))(pair0, *rest)
            return c + jnp.mean(Z * Z)
        return s2

    timed("v0_current", chain(pair(block_banded_marginal_covariance)), *bands)
    timed("v1_unroll2", chain(pair(lambda bs: marginal_cov_opt(bs, unroll=2))),
          *bands)
    timed("v2_unroll4", chain(pair(lambda bs: marginal_cov_opt(bs, unroll=4))),
          *bands)
    @f32_matmuls
    def marginal_cov_assoc_bwd(bands_one):
        """Backward pass via lax.associative_scan: Z_m = W_m Z_{m+1} W_m^T
        + Finv_m is an affine PSD recurrence, so elements (A, c) compose
        as (A1, c1) o (A2, c2) = (A1 A2, A1 c2 A1^T + c1) — log2(M)
        levels of batched (75,75) matmuls instead of M sequential steps.
        PSD-additivity is preserved (c stays a sum of congruences of
        PSD terms), matching the stability story of the sequential form."""
        Nl, Pl, _ = bands_one[0].shape
        diag, lower, M, pad = group_bands_tridiagonal(bands_one)
        G = diag.shape[-1]
        eye = jnp.eye(G, dtype=diag.dtype)

        def step(Li_prev, inp):
            d, l = inp
            Loff = l @ Li_prev.T
            S = d - Loff @ Loff.T
            _L0, Li = _chol_inv_blocked3(S, Pl)
            return Li, (Li, Loff)

        _, (Li, Loff) = jax.lax.scan(step, eye, (diag, lower))
        Finv = jnp.einsum("mki,mkj->mij", Li, Li)
        Fm = diag - Loff @ _T(Loff)
        Finv = Finv + Finv @ (eye - Fm @ Finv)
        Finv = 0.5 * (Finv + _T(Finv))
        B_next = jnp.concatenate([lower[1:], jnp.zeros((1, G, G), diag.dtype)])
        W = Finv @ _T(B_next)  # (M, G, G); W[M-1] = 0

        def compose(right, left):
            # scanning REVERSED elements: combined = left o right where
            # 'right' is closer to the sequence end
            A1, c1 = left
            A2, c2 = right
            A = A1 @ A2
            c = A1 @ c2 @ _T(A1) + c1
            return A, 0.5 * (c + _T(c))

        Ar, cr = jax.lax.associative_scan(
            compose, (W[::-1], Finv[::-1])
        )
        Z = cr[::-1]  # Z_m with Z_{m+1} seeded at 0 — matches bwd_step
        nblk = G // Pl
        Zf = jnp.stack(
            [Z[:, j * Pl:(j + 1) * Pl, j * Pl:(j + 1) * Pl] for j in range(nblk)],
            axis=1,
        )
        return Zf.reshape(-1, Pl, Pl)[:Nl]

    Zv = np.asarray(marginal_cov_assoc_bwd(one))
    dv = np.diagonal(Zv, axis1=-2, axis2=-1)
    rel = np.max(np.abs(dv - dref) / np.maximum(np.abs(dref), 1e-30))
    print(f"v5 diag rel err vs v0: {rel:.2e}")
    timed("v5_assoc_bwd", chain(pair(marginal_cov_assoc_bwd)), *bands)

    if os.environ.get("PROBE_GROUP6"):
        # first (bf16-unpinned) pass: group6 lost outright (54.4 vs
        # 43.5 ms even with flattering bf16 matmuls) — bigger blocks
        # add FLOPs/bytes faster than they remove scan latency here
        timed("v3_group6",
              chain(pair(lambda bs: marginal_cov_opt(bs, group6=True))),
              *bands)
        timed("v4_g6_unr2",
              chain(pair(lambda bs: marginal_cov_opt(bs, group6=True, unroll=2))),
              *bands)


if __name__ == "__main__":
    main()
