"""Pallas TPU kernel: batched block-banded Cholesky factor + solve.

The FTE Gauss-Newton step solves, for every trajectory in the batch, a
symmetric positive-definite block-banded system (bandwidth 3 in time,
PxP pose blocks). The XLA path (`solvers.banded`) runs a `lax.scan`
whose every step dispatches several small cholesky/triangular kernels —
on TPU those lower to slow sequential loops and the scan is launch-
latency-bound (measured ~44% of FTE wall time).

This kernel does the whole factor+solve in ONE `pallas_call`:

  * grid over the batch — each program owns one trajectory with all its
    bands VMEM-resident;
  * the four PxP bands of each frame are *lane-packed* into one
    (32, 128) tile (4 x 32 lanes), so a trajectory's full system is a
    dense (N, 32, 128) block with zero padding waste;
  * the N-sequential recurrence is an in-kernel `fori_loop`; the PxP
    Cholesky and triangular inverse are column loops on VMEM values;
  * all block algebra (band elimination, Schur updates, substitution)
    is `jax.lax.dot_general` on (32, 32) tiles -> MXU.

Factor results overwrite a VMEM scratch with the same packed layout
(slot 0 holds Linv of the diagonal, slots 1-3 the eliminated bands).
Matches `solvers.banded` to float32 round-off; `interpret=True` makes it
testable on CPU.

Status: numerically verified in interpret mode (see
tests/test_pallas_kernels.py). On-device compilation currently trips a
Mosaic limitation in this jax build ("Not implemented: Offset change" on
1-D masked reductions inside the Cholesky column loop); the XLA scan in
`solvers.banded` remains the production path until the kernel's column
loops are reformulated on 2-D tiles for a Mosaic version that lowers
them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PP = 32  # padded block edge; 4 * PP = 128 lanes exactly


def _chol_and_inv(A, P_eff):
    """Cholesky L and L^-1 of the (PP, PP) tile A (SPD in the leading
    P_eff block; pad region forced to identity).

    Column loops use one-hot masks and reductions instead of dynamic
    value indexing (which Mosaic does not lower): extract column j as a
    masked lane-sum, write it back as a masked blend.
    """
    dtype = A.dtype
    eye = jnp.eye(PP, dtype=dtype)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (PP, PP), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (PP, PP), 1)
    A = jnp.where((row_ids >= P_eff) | (col_ids >= P_eff), eye, A)

    def chol_col(j, L):
        is_col_j = (col_ids == j).astype(dtype)  # (PP, PP) one-hot column
        is_row_j = (row_ids == j).astype(dtype)
        col = jnp.sum(L * is_col_j, axis=1)  # L[:, j]
        # lj = L[j, :] masked to k < j
        row_j = jnp.sum(L * is_row_j, axis=0)  # L[j, :]
        mask_k = (jax.lax.broadcasted_iota(jnp.int32, (PP,), 0) < j).astype(dtype)
        lj = row_j * mask_k
        col = col - (L @ lj[:, None])[:, 0]
        diag_val = jnp.sum(col * mask_from_eq(j, dtype))
        d = jax.lax.rsqrt(jnp.maximum(diag_val, 1e-30))
        col = col * d
        rows1d = jax.lax.broadcasted_iota(jnp.int32, (PP,), 0)
        col = jnp.where(rows1d >= j, col, 0.0)
        # write back column j
        return L * (1.0 - is_col_j) + col[:, None] * is_col_j

    L = jax.lax.fori_loop(0, PP, chol_col, A)

    def inv_row(i, X):
        is_row_i = (row_ids == i).astype(dtype)
        row_iL = jnp.sum(L * is_row_i, axis=0)  # L[i, :]
        mask_k = (jax.lax.broadcasted_iota(jnp.int32, (PP,), 0) < i).astype(dtype)
        li = row_iL * mask_k
        diag = jnp.sum(row_iL * mask_from_eq(i, dtype))
        ei = mask_from_eq(i, dtype)
        row = (ei - (li[None, :] @ X)[0]) / diag
        return X * (1.0 - is_row_i) + row[None, :] * is_row_i

    Linv = jax.lax.fori_loop(0, PP, inv_row, jnp.zeros((PP, PP), dtype))
    return L, Linv


def mask_from_eq(j, dtype):
    """One-hot (PP,) vector with a 1 at index j (no dynamic indexing)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (PP,), 0) == j).astype(dtype)


def _banded_kernel(bands_ref, b_ref, out_ref, fac_ref, *, N, P_eff):
    """bands_ref: (1, N, PP, 4*PP) packed [A0|A1|A2|A3]; b_ref: (1, N, PP);
    out_ref: (1, N, PP); fac_ref: (N, PP, 4*PP) VMEM scratch for
    [Linv0|L1|L2|L3]."""
    dtype = bands_ref.dtype

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def slot(tile, k):
        return tile[:, k * PP : (k + 1) * PP]  # static slice (k is Python int)

    eyePP = jnp.eye(PP, dtype=dtype)
    zeroPP = jnp.zeros((PP, PP), dtype)

    def factor_row(n, _):
        tile = bands_ref[0, n]  # (PP, 4PP)
        A0n, A1n, A2n, A3n = (slot(tile, k) for k in range(4))

        def prev_fac(k, s, eye_default):
            idx = jnp.maximum(n - k, 0)
            blk = slot(fac_ref[idx], s)
            use = (n - k) >= 0
            return jnp.where(use, blk, eyePP if eye_default else zeroPP)

        Linv_1 = prev_fac(1, 0, True)
        Linv_2 = prev_fac(2, 0, True)
        Linv_3 = prev_fac(3, 0, True)
        L1_1 = prev_fac(1, 1, False)
        L1_2 = prev_fac(2, 1, False)
        L2_1 = prev_fac(1, 2, False)

        L3 = dot(A3n, Linv_3.T)
        L2 = dot(A2n - dot(L3, L1_2.T), Linv_2.T)
        L1 = dot(A1n - dot(L3, L2_1.T) - dot(L2, L1_1.T), Linv_1.T)
        S = A0n - dot(L1, L1.T) - dot(L2, L2.T) - dot(L3, L3.T)
        _L0, Linv0 = _chol_and_inv(S, P_eff)

        fac_ref[n] = jnp.concatenate([Linv0, L1, L2, L3], axis=1).astype(dtype)
        return 0

    jax.lax.fori_loop(0, N, factor_row, 0)

    # forward: y_n = Linv0_n (b_n - L1_n y_{n-1} - L2_n y_{n-2} - L3_n y_{n-3})
    def fwd_row(n, _):
        fac = fac_ref[n]

        def prev_y(k):
            idx = jnp.maximum(n - k, 0)
            return jnp.where((n - k) >= 0, out_ref[0, idx], jnp.zeros((PP,), dtype))

        def mv(M, v):
            return (M @ v[:, None])[:, 0]

        rhs = (
            b_ref[0, n]
            - mv(slot(fac, 1), prev_y(1))
            - mv(slot(fac, 2), prev_y(2))
            - mv(slot(fac, 3), prev_y(3))
        )
        out_ref[0, n] = mv(slot(fac, 0), rhs).astype(dtype)
        return 0

    jax.lax.fori_loop(0, N, fwd_row, 0)

    # backward: x_n = Linv0_n^T (y_n - L1_{n+1}^T x_{n+1} - ... )
    def bwd_row(i, _):
        n = N - 1 - i

        def nxt_term(k):
            idx = jnp.minimum(n + k, N - 1)
            use = (n + k) <= (N - 1)
            Lk = jnp.where(use, slot(fac_ref[idx], k), zeroPP)
            xk = jnp.where(use, out_ref[0, idx], jnp.zeros((PP,), dtype))
            return (Lk.T @ xk[:, None])[:, 0]

        rhs = out_ref[0, n] - nxt_term(1) - nxt_term(2) - nxt_term(3)
        out_ref[0, n] = (slot(fac_ref[n], 0).T @ rhs[:, None])[:, 0].astype(dtype)
        return 0

    jax.lax.fori_loop(0, N, bwd_row, 0)


def pack_bands(bands):
    """4 x (B, N, P, P) -> (B, N, PP, 4*PP) lane-packed float32."""
    B, N, P, _ = bands[0].shape
    out = jnp.zeros((B, N, PP, 4 * PP), jnp.float32)
    for k, b in enumerate(bands):
        out = out.at[:, :, :P, k * PP : k * PP + P].set(b.astype(jnp.float32))
    return out


def banded_solve_pallas(bands, g, interpret: bool = False):
    """Batched factor+solve of the bandwidth-3 SPD block system.

    bands: 4 arrays (B, N, P, P); g: (B, N, P). Returns x (B, N, P),
    float32. Equivalent to vmap(block_banded_cholesky + solve).
    """
    B, N, P, _ = bands[0].shape
    packed = pack_bands(bands)
    gp = jnp.zeros((B, N, PP), jnp.float32).at[:, :, :P].set(g.astype(jnp.float32))

    kernel = functools.partial(_banded_kernel, N=N, P_eff=P)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, PP, 4 * PP), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, PP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, PP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, PP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((N, PP, 4 * PP), jnp.float32)],
        interpret=interpret,
    )(packed, gp)
    return out[:, :, :P]
