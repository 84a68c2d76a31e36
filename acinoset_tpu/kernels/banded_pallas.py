"""Pallas TPU kernel: batched block-banded Cholesky factor + solve in
one launch.

The FTE Gauss-Newton step solves, for every trajectory in the batch, a
symmetric positive-definite block-banded system (bandwidth 3 in time,
PxP pose blocks, Jacobi-scaled to unit diagonal by the caller —
`solvers/trajopt.py`). This kernel performs the entire factorization
and both substitutions for a *tile of trajectories* in ONE
`pallas_call`, with all state VMEM-resident. Wired as
``FteConfig(linear_solver='pallas')`` through a `custom_vmap` so an
outer `vmap` maps to the batched kernel instead of serializing
trajectories onto the grid.

Design (shaped by measured Mosaic lowering constraints — see
scripts/probe_mosaic.py / probe_mosaic2.py):

  * the four PxP bands of each frame are lane-packed into one (32, 128)
    tile per trajectory; vectors ride as (1, 32) rows (1-D vector ops
    don't lower);
  * **batch-major blocks** (TB, N, 32, 128): the last two dims of every
    block must equal the full array dims or be (8, 128)-divisible;
  * the TB trajectories of a tile are a *static* Python loop of plain
    2-D (32, 32) matmuls — Mosaic lowers batched `dot_general` ~160x
    slower than 2-D dots (measured 12 us vs ~75 ns/op), and the
    independent per-trajectory chains give the scheduler work to
    pipeline while the sequential N-recurrence stalls on itself;
  * the PxP Cholesky factor and its triangular inverse are column/row
    `fori_loop`s of one-hot-matmul steps (`_chol_and_inv`) — Mosaic
    cannot lower dynamic value indexing, so column j is isolated by
    multiplying with a one-hot diagonal E_j. A Newton-Schulz
    full-inverse variant (half the ops) was measured numerically
    unstable on the FTE's smoothness-dominated systems: applying the
    factored pair (L^-1, L^-T) errs ~eps*sqrt(kappa) where a full
    inverse errs ~eps*kappa, and the third-difference stencil drives
    kappa to ~1/damping once LM damping decays;
  * **the factor overwrites the input block in place** (probed OK): tile
    n of the bands block is rewritten [L0^-1 | L1 | L2 | L3] once
    consumed, halving VMEM so larger batch tiles fit.

Performance reality — FORMAL STATUS (r5 on-device record,
docs/r05/pallas_ondevice.txt, closing SURVEY §2.4's Pallas
obligation): the kernel compiles and runs under the current jax/Mosaic
(the design routes around the three lowering gaps: dynamic value
indexing -> one-hot matmuls, 1-D vector ops -> (1, 32) rows, batched
dot_general -> static 2-D dot loops) and is correct to 4.6e-7 on the
flagship B=96/N=100/P=25 solve — at 279.2 ms vs 0.227 ms for the
batched XLA path (`block_banded_solve_unrolled` under vmap) and
0.258 ms for cyclic reduction, distinct-rhs individually-synced calls
(scripts/bench_pallas_banded.py; per-call tunnel timings under-report
~50x, see CLAUDE.md). A single-TensorCore Pallas grid serializes the
batch (grid steps run one after another on the core) while the XLA
program batches every small op over all 96 trajectories full-chip.
Retained as the validated single-launch template (numerically verified
in interpret mode and on-device, including ill-conditioned FTE-like
systems — tests/test_pallas_kernels.py); NOT the production default,
and no further Pallas work is planned for this op: the solve's
sequential-depth cost is better attacked with algorithms whose depth
is iterations, not frames (the CG backends in solvers/banded.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PP = 32  # padded block edge; 4 * PP = 128 lanes exactly
HIGH = jax.lax.Precision.HIGHEST


def _dot(x, y):
    return jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=HIGH,
    )


def _chol_and_inv(A, P_eff):
    """Cholesky L and L^-1 of the (PP, PP) tile A (SPD in the leading
    P_eff block; pad region forced to identity).

    Every step is a 2-D matmul or elementwise op on (PP, PP) tiles —
    no dynamic value indexing, 1-D dots, or 1-D reductions (none of
    which Mosaic lowers). Column j is isolated by multiplying with a
    one-hot diagonal matrix E_j; the scalar pivot 1/sqrt(d) is realized
    as an elementwise rsqrt of a matrix that is d at (j, j) and 1
    elsewhere, re-masked to (j, j). Loops run only the P_eff live
    columns/rows; the identity pad region is already its own factor.
    """
    dtype = A.dtype
    eye = jnp.eye(PP, dtype=dtype)
    ones = jnp.ones((PP, PP), dtype=dtype)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (PP, PP), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (PP, PP), 1)
    A = jnp.where((row_ids >= P_eff) | (col_ids >= P_eff), eye, A)

    def chol_col(j, L):
        Ej = ((row_ids == j) & (col_ids == j)).astype(dtype)  # one-hot diag
        is_col_j = (col_ids == j).astype(dtype)
        mask_lt_j = (col_ids < j).astype(dtype)  # columns k < j
        colM = _dot(L, Ej)  # (PP, PP), only column j = L[:, j]
        ljM = _dot(Ej, L) * mask_lt_j  # row j of L, cols k<j
        colM = colM - _dot(L, ljM.T)  # subtract sum_k L[:,k] L[j,k]
        # pivot: T has colM[j,j] at (j,j), 1 elsewhere -> elementwise rsqrt
        T = colM * Ej + (ones - Ej)
        pivot = jax.lax.rsqrt(jnp.maximum(T, 1e-30)) * Ej  # only (j,j) = 1/sqrt(d)
        colM = _dot(colM, pivot)  # scale column j
        colM = colM * (row_ids >= j).astype(dtype)  # zero strict upper
        return L * (1.0 - is_col_j) + colM

    L = jax.lax.fori_loop(0, P_eff, chol_col, A)

    def inv_row(i, X):
        Ei = ((row_ids == i) & (col_ids == i)).astype(dtype)
        mask_lt_i = (col_ids < i).astype(dtype)
        liM = _dot(Ei, L) * mask_lt_i  # row i of L, cols k<i
        numM = Ei - _dot(liM, X)  # row i = e_i - L[i,:i] @ X[:i]
        T = _dot(_dot(Ei, L), Ei) + (ones - Ei)  # (i,i) = L[i,i], 1 elsewhere
        recip = (1.0 / T) * Ei  # only (i,i) = 1/L[i,i]
        rowScaled = _dot(recip, numM)  # scales row i, others zero
        return X + rowScaled  # row i of X was zero until now

    Linv = jax.lax.fori_loop(0, P_eff, inv_row, jnp.zeros((PP, PP), dtype))
    # pad rows of Linv are zero: harmless — every operand it ever
    # multiplies has zero pad components (bands and rhs are zero-padded)
    return L, Linv


def _banded_chol_kernel(bands_ref, b_ref, out_ref, *, N, TB, P_eff):
    """bands_ref: (TB, N, PP, 4*PP) lane-packed [A0|A1|A2|A3], overwritten
    in place with [L0inv|L1|L2|L3]; b_ref/out_ref: (TB, N, PP).

    Factor recurrence (same math as solvers.banded.block_banded_cholesky):
        L3 = A3 L0inv_{n-3}^T
        L2 = (A2 - L3 L1_{n-2}^T) L0inv_{n-2}^T
        L1 = (A1 - L3 L2_{n-1}^T - L2 L1_{n-1}^T) L0inv_{n-1}^T
        S  = A0 - L1 L1^T - L2 L2^T - L3 L3^T;  L0, L0inv = chol(S)
    """
    dtype = bands_ref.dtype
    eye = jnp.eye(PP, dtype=dtype)
    zeroM = jnp.zeros((PP, PP), dtype)

    def slot(tile, k):
        return tile[:, k * PP : (k + 1) * PP]  # static lane slice

    def vrow(ref, t, n):  # (1, PP) row of a (TB, N, PP) ref
        return ref[t, pl.ds(n, 1), :]

    def factor_row(n, _):
        m1, m2, m3 = (jnp.maximum(n - k, 0) for k in (1, 2, 3))
        u1, u2, u3 = n >= 1, n >= 2, n >= 3
        for t in range(TB):
            tile = bands_ref[t, n]  # (PP, 4PP)
            tm1, tm2, tm3 = bands_ref[t, m1], bands_ref[t, m2], bands_ref[t, m3]
            A0, A1, A2, A3 = (slot(tile, k) for k in range(4))
            Li1 = jnp.where(u1, slot(tm1, 0), eye)
            L1_1 = jnp.where(u1, slot(tm1, 1), zeroM)
            L2_1 = jnp.where(u1, slot(tm1, 2), zeroM)
            Li2 = jnp.where(u2, slot(tm2, 0), eye)
            L1_2 = jnp.where(u2, slot(tm2, 1), zeroM)
            Li3 = jnp.where(u3, slot(tm3, 0), eye)

            L3 = _dot(A3, Li3.T)
            L2 = _dot(A2 - _dot(L3, L1_2.T), Li2.T)
            L1 = _dot(A1 - _dot(L3, L2_1.T) - _dot(L2, L1_1.T), Li1.T)
            S = A0 - _dot(L1, L1.T) - _dot(L2, L2.T) - _dot(L3, L3.T)
            _L0, Li0 = _chol_and_inv(S, P_eff)
            bands_ref[t, n] = jnp.concatenate([Li0, L1, L2, L3], axis=1).astype(dtype)
        return 0

    jax.lax.fori_loop(0, N, factor_row, 0)

    # forward: y_n = L0inv_n (b_n - L1_n y_{n-1} - L2_n y_{n-2} - L3_n y_{n-3})
    def fwd_row(n, _):
        m1, m2, m3 = (jnp.maximum(n - k, 0) for k in (1, 2, 3))
        u1, u2, u3 = n >= 1, n >= 2, n >= 3
        zrow = jnp.zeros((1, PP), dtype)
        for t in range(TB):
            fac = bands_ref[t, n]
            v1 = jnp.where(u1, vrow(out_ref, t, m1), zrow)
            v2 = jnp.where(u2, vrow(out_ref, t, m2), zrow)
            v3 = jnp.where(u3, vrow(out_ref, t, m3), zrow)
            rhs = (
                vrow(b_ref, t, n)
                - _dot(v1, slot(fac, 1).T)
                - _dot(v2, slot(fac, 2).T)
                - _dot(v3, slot(fac, 3).T)
            )
            # y = L0inv rhs, as a row: rhs_row @ L0inv^T
            out_ref[t, pl.ds(n, 1), :] = _dot(rhs, slot(fac, 0).T).astype(dtype)
        return 0

    jax.lax.fori_loop(0, N, fwd_row, 0)

    # backward: x_n = L0inv_n^T (y_n - L1_{n+1}^T x_{n+1} - L2_{n+2}^T x_{n+2}
    #                            - L3_{n+3}^T x_{n+3})
    def bwd_row(i, _):
        n = N - 1 - i
        p1, p2, p3 = (jnp.minimum(n + k, N - 1) for k in (1, 2, 3))
        d1, d2, d3 = n + 1 <= N - 1, n + 2 <= N - 1, n + 3 <= N - 1
        zrow = jnp.zeros((1, PP), dtype)
        for t in range(TB):
            # row form: (L^T x)^T = x_row @ L
            s1 = jnp.where(d1, _dot(vrow(out_ref, t, p1), slot(bands_ref[t, p1], 1)), zrow)
            s2 = jnp.where(d2, _dot(vrow(out_ref, t, p2), slot(bands_ref[t, p2], 2)), zrow)
            s3 = jnp.where(d3, _dot(vrow(out_ref, t, p3), slot(bands_ref[t, p3], 3)), zrow)
            # x = L0inv^T (y - s), as a row: (y_row - s_row) @ L0inv
            x_row = _dot(vrow(out_ref, t, n) - s1 - s2 - s3, slot(bands_ref[t, n], 0))
            out_ref[t, pl.ds(n, 1), :] = x_row.astype(dtype)
        return 0

    jax.lax.fori_loop(0, N, bwd_row, 0)


def pack_bands(bands):
    """4 x (B, N, P, P) -> (B, N, PP, 4*PP) lane-packed float32."""
    B, N, P, _ = bands[0].shape
    out = jnp.zeros((B, N, PP, 4 * PP), jnp.float32)
    for k, b in enumerate(bands):
        out = out.at[:, :, :P, k * PP : k * PP + P].set(b.astype(jnp.float32))
    return out


def _pick_tile(B: int, N: int) -> int:
    """Largest batch tile whose double-buffered bands block fits VMEM."""
    budget = 12 * 2 ** 20  # leave headroom under ~16 MB/core
    per = 2 * N * PP * 4 * PP * 4  # double-buffered bands bytes per traj
    best = 1
    for tb in range(1, min(B, 8) + 1):
        if B % tb == 0 and tb * per <= budget:
            best = tb
    return best


def banded_solve_pallas(
    bands, g, batch_tile: int | None = None, interpret: bool = False,
):
    """Batched factor+solve of the bandwidth-3 SPD block system.

    bands: 4 arrays (B, N, P, P); g: (B, N, P). Returns x (B, N, P),
    float32. Equivalent to vmap(block_banded_solve_unrolled); the
    caller should supply a Jacobi-scaled (unit-diagonal) system, as
    `solvers/trajopt.py` does.
    """
    B, N, P, _ = bands[0].shape
    if P > PP:
        raise NotImplementedError(f"P={P} exceeds packed block edge {PP}")
    tb = batch_tile or _pick_tile(B, N)
    pad_b = (-B) % tb
    if pad_b:
        eye_band = jnp.broadcast_to(jnp.eye(P, dtype=bands[0].dtype), (pad_b, N, P, P))
        zero_band = jnp.zeros((pad_b, N, P, P), bands[0].dtype)
        bands = [jnp.concatenate([bands[0], eye_band])] + [
            jnp.concatenate([bk, zero_band]) for bk in bands[1:]
        ]
        g = jnp.concatenate([g, jnp.zeros((pad_b, N, P), g.dtype)])
        B = B + pad_b

    packed = pack_bands(bands)
    gp = jnp.zeros((B, N, PP), jnp.float32).at[:, :, :P].set(g.astype(jnp.float32))

    kernel = functools.partial(_banded_chol_kernel, N=N, TB=tb, P_eff=P)
    out = pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec((tb, N, PP, 4 * PP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N, PP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, N, PP), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, PP), jnp.float32),
        interpret=interpret,
    )(packed, gp)
    x = out[:, :, :P]
    return x[: B - pad_b] if pad_b else x


def _solve_auto(bands, g):
    """interpret=True off-TPU so the 'pallas' solver option runs anywhere."""
    interp = jax.default_backend() not in ("tpu", "axon")
    return banded_solve_pallas(bands, g, interpret=interp)


@jax.custom_batching.custom_vmap
def banded_solve_pallas_vmappable(A0, A1, A2, A3, g):
    """`banded_solve_pallas` packaged so that `vmap` maps to the batched
    kernel (one pallas_call over the whole batch) instead of serializing
    trajectories onto the grid. Unbatched call = batch of one.
    Used by ``FteConfig(linear_solver='pallas')`` — `fte_solve` is
    per-trajectory and batched by an outer vmap (solvers/trajopt.py)."""
    return _solve_auto([A0[None], A1[None], A2[None], A3[None]], g[None])[0]


@banded_solve_pallas_vmappable.def_vmap
def _banded_solve_pallas_vmap_rule(axis_size, in_batched, A0, A1, A2, A3, g):
    if not all(in_batched):
        # broadcast any unbatched operand (does not occur in fte_solve)
        A0, A1, A2, A3, g = [
            x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
            for x, b in zip((A0, A1, A2, A3, g), in_batched)
        ]
    return _solve_auto([A0, A1, A2, A3], g), True
