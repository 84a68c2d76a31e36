"""Block-banded Cholesky factorization + solve via `lax.scan`.

The FTE collocation normal equations are block-banded in time: frame n
couples only to frames n-3..n+3 (third-difference smoothness stencil),
with dense PxP diagonal blocks from the measurement Gauss-Newton terms.
This module factors and solves such systems with sequential scans over
the time axis — the TPU-native replacement for IPOPT's general sparse
factorization (ma86/MUMPS): `vmap` over a batch of trajectories turns
every PxP block op into one big batched MXU matmul.

Band convention: ``bands[k]`` has shape (N, P, P) and holds block
(n, n-k) at index n (zero for n < k). The matrix is symmetric; only the
lower bands are stored. Bandwidth q is static (q=3 for FTE).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls


def _tri_solve_right(L, B):
    """Solve X @ L.T = B for X, with L lower-triangular: X = B L^{-T}."""
    # solve L X^T = B^T  -> X^T = L^{-1} B^T
    return jax.scipy.linalg.solve_triangular(L, B.T, lower=True).T


@f32_matmuls
def block_banded_cholesky(bands: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Factor a symmetric positive-definite block-banded matrix.

    bands: [A0, A1, ..., Aq] with Ak[n] = block (n, n-k); A0 is the
    diagonal. Returns L bands in the same convention (L0 lower-
    triangular Cholesky factors on the diagonal).
    """
    q = len(bands) - 1
    N, P, _ = bands[0].shape
    dtype = bands[0].dtype
    eye = jnp.eye(P, dtype=dtype)

    if q != 3:
        raise NotImplementedError("block_banded_cholesky currently supports bandwidth 3")

    A0, A1, A2, A3 = bands

    def step(carry, inp):
        # carry: rows n-1, n-2, n-3 -> tuples (L0, L1, L2) per row
        (L0_1, L1_1, L2_1), (L0_2, L1_2, L2_2), (L0_3, _, _) = carry
        a0, a1, a2, a3 = inp

        L3 = _tri_solve_right(L0_3, a3)
        L2 = _tri_solve_right(L0_2, a2 - L3 @ L1_2.T)
        L1 = _tri_solve_right(L0_1, a1 - L3 @ L2_1.T - L2 @ L1_1.T)
        S = a0 - L1 @ L1.T - L2 @ L2.T - L3 @ L3.T
        L0 = jnp.linalg.cholesky(S)

        new_carry = ((L0, L1, L2), (L0_1, L1_1, L2_1), (L0_2, L1_2, L2_2))
        return new_carry, (L0, L1, L2, L3)

    zeros = jnp.zeros((P, P), dtype=dtype)
    init_row = (eye, zeros, zeros)
    carry0 = (init_row, init_row, init_row)
    _, (L0, L1, L2, L3) = jax.lax.scan(step, carry0, (A0, A1, A2, A3))
    return [L0, L1, L2, L3]


@f32_matmuls
def block_banded_solve(L_bands: Sequence[jnp.ndarray], b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given the Cholesky bands of A. b: (N, P)."""
    L0, L1, L2, L3 = L_bands
    N, P = b.shape
    dtype = b.dtype
    zeros = jnp.zeros(P, dtype=dtype)

    # forward: L y = b
    def fwd(carry, inp):
        y1, y2, y3 = carry
        L0n, L1n, L2n, L3n, bn = inp
        rhs = bn - L1n @ y1 - L2n @ y2 - L3n @ y3
        y = jax.scipy.linalg.solve_triangular(L0n, rhs, lower=True)
        return (y, y1, y2), y

    _, y = jax.lax.scan(fwd, (zeros, zeros, zeros), (L0, L1, L2, L3, b))

    # backward: L^T x = y ; x[n] needs L1[n+1], L2[n+2], L3[n+3]
    # ([:N] guards N < bandwidth, where Lk[k:] is empty)
    pad = jnp.zeros((3, P, P), dtype=dtype)
    L1s = jnp.concatenate([L1[1:], pad[:1]])[:N]  # L1s[n] = L1[n+1]
    L2s = jnp.concatenate([L2[2:], pad[:2]])[:N]
    L3s = jnp.concatenate([L3[3:], pad[:3]])[:N]

    def bwd(carry, inp):
        x1, x2, x3 = carry  # x[n+1], x[n+2], x[n+3]
        L0n, L1n1, L2n2, L3n3, yn = inp
        rhs = yn - L1n1.T @ x1 - L2n2.T @ x2 - L3n3.T @ x3
        x = jax.scipy.linalg.solve_triangular(L0n, rhs, lower=True, trans=1)
        return (x, x1, x2), x

    _, x = jax.lax.scan(bwd, (zeros, zeros, zeros), (L0, L1s, L2s, L3s, y), reverse=True)
    return x


def group_bands_tridiagonal(bands: Sequence[jnp.ndarray], group: int = 3):
    """Regroup a bandwidth-3 block-banded system into block-*tridiagonal*
    form with (group*P x group*P) super-blocks.

    Grouping `group` consecutive frames per super-block turns the
    7-small-op scan step into one factor + one solve on 3x-larger
    blocks and cuts the sequential scan length by `group` — the banded
    solve is scan-latency-bound on TPU.

    Returns (diag (M, G, G), lower (M, G, G), M, pad) where G = group*P
    and `pad` frames of identity were appended to make N divisible.
    """
    q = len(bands) - 1
    assert q == 3 and group == 3, "grouping implemented for bandwidth 3, group 3"
    A0, A1, A2, A3 = bands
    N, P, _ = A0.shape
    dtype = A0.dtype
    M = -(-N // group)
    pad = M * group - N
    if pad:
        eyeP = jnp.broadcast_to(jnp.eye(P, dtype=dtype), (pad, P, P))
        A0 = jnp.concatenate([A0, eyeP])
        z = jnp.zeros((pad, P, P), dtype)
        A1 = jnp.concatenate([A1, z])
        A2 = jnp.concatenate([A2, z])
        A3 = jnp.concatenate([A3, z])

    # indices of frames per super-block m: 3m, 3m+1, 3m+2
    i0 = jnp.arange(M) * 3
    Z = jnp.zeros((M, P, P), dtype)

    def g(A, off):  # A[k][i0+off] with guard
        return A[i0 + off]

    # diagonal super-block D[m] (symmetric):
    # [[A0[3m],   A1[3m+1]^T, A2[3m+2]^T],
    #  [A1[3m+1], A0[3m+1],   A1[3m+2]^T],
    #  [A2[3m+2], A1[3m+2],   A0[3m+2]]]
    r0 = jnp.concatenate([g(A0, 0), _T(g(A1, 1)), _T(g(A2, 2))], axis=2)
    r1 = jnp.concatenate([g(A1, 1), g(A0, 1), _T(g(A1, 2))], axis=2)
    r2 = jnp.concatenate([g(A2, 2), g(A1, 2), g(A0, 2)], axis=2)
    diag = jnp.concatenate([r0, r1, r2], axis=1)  # (M, 3P, 3P)

    # lower super-block L[m] = coupling of group m to group m-1:
    # rows (3m..3m+2), cols (3m-3..3m-1):
    # [[A3[3m],   A2[3m],   A1[3m]],
    #  [0,        A3[3m+1], A2[3m+1]],
    #  [0,        0,        A3[3m+2]]]
    s0 = jnp.concatenate([g(A3, 0), g(A2, 0), g(A1, 0)], axis=2)
    s1 = jnp.concatenate([Z, g(A3, 1), g(A2, 1)], axis=2)
    s2 = jnp.concatenate([Z, Z, g(A3, 2)], axis=2)
    lower = jnp.concatenate([s0, s1, s2], axis=1)  # (M, 3P, 3P); lower[0] unused
    lower = lower.at[0].set(0.0)
    return diag, lower, M, pad


def _T(x):
    return jnp.swapaxes(x, -1, -2)


@f32_matmuls
def banded_solve_grouped(bands: Sequence[jnp.ndarray], g: jnp.ndarray):
    """Factor + solve the bandwidth-3 system via 3-frame grouping into a
    block-tridiagonal system with 3P x 3P super-blocks.

    Same math as `block_banded_solve_unrolled`, but the sequential scan
    is N/3 steps of one big factor+solve instead of N steps of small
    ones (the solve is scan-latency-bound on TPU). Uses the same
    unrolled small-matrix Cholesky-inverse — matmul/elementwise only,
    no native cholesky/triangular kernels. bands as in
    block_banded_cholesky; g: (N, P). Returns x (N, P).
    """
    N, P = g.shape
    diag, lower, M, pad = group_bands_tridiagonal(bands)
    if pad:
        g = jnp.concatenate([g, jnp.zeros((pad, P), g.dtype)])
    b = g.reshape(M, 3 * P)
    G = 3 * P
    dtype = diag.dtype
    eye = jnp.eye(G, dtype=dtype)
    zv = jnp.zeros((G,), dtype)

    _, (Li, Loff) = jax.lax.scan(_schur_factor_step, eye, (diag, lower))

    def fwd(y_prev, inp):
        Lin, ln, bn = inp
        y = Lin @ (bn - ln @ y_prev)
        return y, y

    _, y = jax.lax.scan(fwd, zv, (Li, Loff, b))

    Loff_next = jnp.concatenate([Loff[1:], jnp.zeros((1, G, G), dtype)])

    def bwd(x_next, inp):
        Lin, ln1, yn = inp
        x = Lin.T @ (yn - ln1.T @ x_next)
        return x, x

    _, x = jax.lax.scan(bwd, zv, (Li, Loff_next, y), reverse=True)
    return x.reshape(-1, P)[:N]


def _schur_factor_step(Li_prev, inp):
    """One step of the block-tridiagonal Schur/Cholesky recurrence for
    the grouped direct solve (banded_solve_grouped). The RGF
    marginal-covariance forward pass (block_banded_marginal_covariance)
    uses a deliberately DIVERGED variant since r5: same recurrence, but
    the per-step factorization is the 3x-shallower blocked form plus a
    post-scan Newton refinement of the batched Finv (the unrolled
    G=3P-column factorization per scan step was the latency floor of
    the whole uncertainty pass; the direct solver keeps this bit-exact
    unrolled form — golden fixtures pin it). carry: Li_prev =
    chol(F_{m-1})^{-1}; inp: (d, l) = (D_m, B_m). Emits (Li, Loff) with
    F_m = D_m - Loff Loff^T, Loff = B_m chol(F_{m-1})^{-T}."""
    d, l = inp
    Loff = l @ Li_prev.T
    S = d - Loff @ Loff.T
    _L0, Li = _chol_inv_unrolled(S)
    return Li, (Li, Loff)


def _chol_inv_unrolled(A):
    """Cholesky factor AND its inverse of a small SPD matrix, computed
    with a trace-time-unrolled column loop of batched arithmetic.

    TPU's native cholesky/triangular_solve lower to slow sequential
    kernels; for P ~ 25 this unrolled form (static P steps of
    elementwise ops + matvecs over the batch) is far faster inside
    scans. A: (..., P, P) -> (L, Linv) with L lower-triangular.
    """
    P = A.shape[-1]
    dtype = A.dtype
    L = jnp.zeros_like(A)
    for j in range(P):
        col = A[..., :, j]
        if j > 0:
            col = col - jnp.einsum("...ik,...k->...i", L[..., :, :j], L[..., j, :j])
        d = jax.lax.rsqrt(jnp.maximum(col[..., j], 1e-30))
        col = col * d[..., None]
        mask = (np.arange(P) >= j).astype(np.float32)
        L = L.at[..., :, j].set(col * jnp.asarray(mask, dtype))
    # forward-substitution inverse, row by row (static loop)
    Linv = jnp.zeros_like(A)
    for i in range(P):
        ei = jnp.zeros((P,), dtype).at[i].set(1.0)
        if i > 0:
            acc = jnp.einsum("...k,...kj->...j", L[..., i, :i], Linv[..., :i, :])
        else:
            acc = jnp.zeros_like(A[..., 0, :])
        row = (ei - acc) / L[..., i, i][..., None]
        Linv = Linv.at[..., i, :].set(row)
    return L, Linv


def _chol_inv_blocked3(A, p: int):
    """Cholesky factor + inverse of a batched (..., 3p, 3p) SPD matrix
    via a 3x3 grid of (p, p) blocks.

    The column-unrolled `_chol_inv_unrolled` is fine for small matrices
    inside scans, but on a LARGE batch of 3p-sized matrices its 2*(3p)
    per-column `.at[].set()` updates each rewrite the whole (..., 3p,
    3p) buffer — measured 174 ms of scatter (49% of the EKF program's
    device time) for the RTS smoother's (96*99, 75, 75) batch
    (docs/trace_ekf). The blocked form does the off-diagonal work as
    nine batched (p, p) matmuls and confines the column-unrolled part
    to three (..., p, p) diagonal factorizations — ~10x less HBM
    traffic at equal math.
    """
    p1, p2 = p, 2 * p

    def blk(i, j):
        return A[..., i * p : (i + 1) * p, j * p : (j + 1) * p]

    L11, L11i = _chol_inv_unrolled(blk(0, 0))
    L11iT = jnp.swapaxes(L11i, -1, -2)
    L21 = blk(1, 0) @ L11iT
    L31 = blk(2, 0) @ L11iT
    S22 = blk(1, 1) - L21 @ jnp.swapaxes(L21, -1, -2)
    L22, L22i = _chol_inv_unrolled(S22)
    L32 = (blk(2, 1) - L31 @ jnp.swapaxes(L21, -1, -2)) @ jnp.swapaxes(
        L22i, -1, -2
    )
    S33 = (
        blk(2, 2)
        - L31 @ jnp.swapaxes(L31, -1, -2)
        - L32 @ jnp.swapaxes(L32, -1, -2)
    )
    L33, L33i = _chol_inv_unrolled(S33)

    # block lower-triangular inverse
    Li21 = -L22i @ L21 @ L11i
    Li32 = -L33i @ L32 @ L22i
    Li31 = -L33i @ (L31 @ L11i + L32 @ Li21)

    z = jnp.zeros_like(L11)
    L = jnp.concatenate(
        [
            jnp.concatenate([L11, z, z], -1),
            jnp.concatenate([L21, L22, z], -1),
            jnp.concatenate([L31, L32, L33], -1),
        ],
        -2,
    )
    Linv = jnp.concatenate(
        [
            jnp.concatenate([L11i, z, z], -1),
            jnp.concatenate([Li21, L22i, z], -1),
            jnp.concatenate([Li31, Li32, L33i], -1),
        ],
        -2,
    )
    return L, Linv


@f32_matmuls
def block_banded_solve_unrolled(bands: Sequence[jnp.ndarray], b: jnp.ndarray) -> jnp.ndarray:
    """Factor + solve the bandwidth-3 system using unrolled small-matrix
    Cholesky inverses — matmul/elementwise ops only (no native
    cholesky/triangular kernels). Same math as block_banded_cholesky +
    block_banded_solve. bands: [A0..A3] (N, P, P); b: (N, P)."""
    A0, A1, A2, A3 = bands
    N, P = b.shape
    dtype = b.dtype
    eye = jnp.eye(P, dtype=dtype)
    zM = jnp.zeros((P, P), dtype)
    zv = jnp.zeros((P,), dtype)

    def factor_step(carry, inp):
        (Li_1, L1_1, L2_1), (Li_2, L1_2, _), (Li_3, _, _) = carry
        a0, a1, a2, a3 = inp
        L3 = a3 @ Li_3.T
        L2 = (a2 - L3 @ L1_2.T) @ Li_2.T
        L1 = (a1 - L3 @ L2_1.T - L2 @ L1_1.T) @ Li_1.T
        S = a0 - L1 @ L1.T - L2 @ L2.T - L3 @ L3.T
        _L0, Li0 = _chol_inv_unrolled(S)
        new_carry = ((Li0, L1, L2), (Li_1, L1_1, L2_1), (Li_2, L1_2, zM))
        return new_carry, (Li0, L1, L2, L3)

    init_row = (eye, zM, zM)
    _, (Li0, L1, L2, L3) = jax.lax.scan(
        factor_step, (init_row, init_row, init_row), (A0, A1, A2, A3)
    )

    def fwd(carry, inp):
        y1, y2, y3 = carry
        Li, l1, l2, l3, bn = inp
        y = Li @ (bn - l1 @ y1 - l2 @ y2 - l3 @ y3)
        return (y, y1, y2), y

    _, y = jax.lax.scan(fwd, (zv, zv, zv), (Li0, L1, L2, L3, b))

    pad = jnp.zeros((3, P, P), dtype)
    L1s = jnp.concatenate([L1[1:], pad[:1]])[:N]
    L2s = jnp.concatenate([L2[2:], pad[:2]])[:N]
    L3s = jnp.concatenate([L3[3:], pad[:3]])[:N]

    def bwd(carry, inp):
        x1, x2, x3 = carry
        Li, l1n, l2n, l3n, yn = inp
        x = Li.T @ (yn - l1n.T @ x1 - l2n.T @ x2 - l3n.T @ x3)
        return (x, x1, x2), x

    _, x = jax.lax.scan(bwd, (zv, zv, zv), (Li0, L1s, L2s, L3s, y), reverse=True)
    return x


@f32_matmuls
def banded_cg_solve(
    bands: Sequence[jnp.ndarray],
    b: jnp.ndarray,
    num_iters: int = 50,
    tol: float = 1e-8,
) -> jnp.ndarray:
    """Conjugate-gradient solve of the SPD block-banded system.

    On TPU, Cholesky/triangular ops lower to slow sequential kernels; CG
    needs only `banded_matvec` (a handful of large batched einsums) and
    elementwise math, with a sequential depth of `num_iters` independent
    of N. With the system Jacobi-scaled to unit diagonal (as the FTE
    solver does), ~40-60 iterations reach the accuracy a damped GN step
    needs; the surrounding accept/reject loop tolerates the remaining
    inexactness (truncated-Newton). ``tol`` is relative, like
    pcg_solve's: iterations freeze once |r|^2 drops below tol^2 of its
    initial value (scaling the system cannot change the criterion).
    """
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r)
    rs0 = rs

    def step(carry, _):
        x, r, p, rs = carry
        Ap = banded_matvec(bands, p)
        denom = jnp.sum(p * Ap)
        alpha = rs / jnp.where(denom > 0, denom, 1.0)
        active = (rs > tol * tol * rs0) & (denom > 0)
        alpha = jnp.where(active, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        beta = jnp.where(active, rs_new / jnp.maximum(rs, 1e-30), 0.0)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, r, p, rs), _ = jax.lax.scan(step, (x, r, p, rs), None, length=num_iters)
    return x


@f32_matmuls
def pcg_solve(matvec, minv, b: jnp.ndarray, num_iters: int = 16,
              tol: float = 1e-6) -> jnp.ndarray:
    """Generic preconditioned CG with a fixed (jit-static) iteration
    count. `tol` is relative: iterations freeze once the M-norm residual
    drops below tol^2 of its initial value."""
    x = jnp.zeros_like(b)
    r = b
    z = minv(r)
    p = z
    rz = jnp.sum(r * z)
    rz0 = rz

    def step(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        active = (rz > tol * tol * rz0) & (denom > 0)
        alpha = jnp.where(active, rz / jnp.where(denom > 0, denom, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = minv(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(active, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, r, p, rz), _ = jax.lax.scan(step, (x, r, p, rz), None, length=num_iters)
    return x


def spectral_minv(U: jnp.ndarray, eigs: jnp.ndarray, wq: jnp.ndarray,
                  c: jnp.ndarray):
    """Preconditioner for the *unscaled* FTE normal equations.

    The ill-conditioned part of the system is the model term, and it is
    exactly separable: 2 (D3^T D3) (x) diag(1/q), with D3^T D3 a static
    (N, N) matrix whose eigendecomposition U diag(eigs) U^T is computed
    once at trace time (host numpy). The preconditioner

        M = U [ 2 eigs_k wq_p + c_p ] U^T      (c = mean frame-local diag)

    captures the model term exactly and the measurement/limit/damping
    diagonal on average, so CG convergence is governed only by the
    *per-frame variation* of the measurement Hessian — ~16 iterations
    of a few large batched ops replace the N-step factorization scan
    that makes the direct solvers latency-bound on TPU."""

    def minv(r):
        y = U.T @ r  # project onto the smoothness eigenbasis (time axis)
        y = y / (2.0 * eigs[:, None] * wq[None, :] + c[None, :])
        return U @ y

    return minv


def banded_pcg_solve(
    bands: Sequence[jnp.ndarray],
    b: jnp.ndarray,
    U: jnp.ndarray,
    eigs: jnp.ndarray,
    wq: jnp.ndarray,
    c: jnp.ndarray,
    num_iters: int = 16,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """Spectral PCG against explicit banded storage (testing/reference
    form; the FTE hot path uses the structured operator in
    solvers/trajopt.py, which reads the measurement Hessian once instead
    of four mostly-diagonal (N, P, P) bands). bands: UNscaled [A0..A3]
    with damping already added to A0; b: (N, P)."""
    return pcg_solve(
        lambda p: banded_matvec(bands, p), spectral_minv(U, eigs, wq, c),
        b, num_iters=num_iters, tol=tol,
    )


@f32_matmuls
def block_banded_marginal_covariance(bands: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-frame diagonal blocks of inv(A) for the SPD block-banded A
    (bandwidth 3) — the marginal covariances when A is a precision
    matrix.

    The RGF (recursive Green's function) scheme on the 3-frame-grouped
    block-tridiagonal form: with D_m the diagonal and B_m the
    sub-diagonal super-blocks,

        F_m = D_m - B_m F_{m-1}^-1 B_m^T               (forward Schur)
        Z_M = F_M^-1 ;
        Z_m = F_m^-1 + (F_m^-1 B_{m+1}^T) Z_{m+1} (B_{m+1} F_m^-1)

    so the marginal covariance of every group falls out of two scans
    without forming the dense (NP, NP) inverse. Every F_m is an SPD
    Schur complement of A (eigenvalues bounded below by A's) and the
    backward step is PSD-*additive* — no cancelling subtraction — which
    is what makes this stable where alternatives fail on the FTE's
    ~1e8-conditioned Hessians: the Takahashi/Erisman–Tinney in-band
    recurrence measured *negative variances* at N=50 in f64, and the
    two-sided variant inv(F_m + G_m - D_m) cancels to NaN in f32.

    This powers the FTE's Laplace posterior (per-frame pose covariance
    -> per-marker error bars), something the reference's IPOPT pipeline
    never exposed (the KKT factorization is discarded,
    src/all_optimizations.py:503-516). Uses the trace-time-unrolled
    small-matrix Cholesky (`_chol_inv_unrolled`) — matmul/elementwise
    only, no native cholesky/triangular kernels.

    bands: [A0..A3], Ak[n] = block (n, n-k), A0 the diagonal blocks.
    Returns Z (N, P, P) with Z[n] = block (n, n) of inv(A).
    """
    N, P, _ = bands[0].shape
    diag, lower, M, pad = group_bands_tridiagonal(bands)
    G = diag.shape[-1]
    dtype = diag.dtype
    eye = jnp.eye(G, dtype=dtype)

    # lower[0] = 0 -> F_0 = D_0. The Schur step's G-column unrolled
    # Cholesky (G=3P=75 columns of full-buffer updates per scan step)
    # made the forward scan the latency floor of the whole uncertainty
    # pass; the blocked 3x3-of-(P,P) factorization cuts the unrolled
    # depth 3x, and ONE Newton/Schulz refinement of Finv per step
    # (two (G, G) matmuls) pulls the blocked form's f32 reassociation
    # back under roundoff — same recipe as the RTS smoother gain
    # (solvers/ekf.py, VERDICT r4 item 1). Finv stays a PSD product
    # plus a symmetrized correction, preserving the recurrence's
    # PSD-additive stability story.
    def _schur_step_blocked(Li_prev, inp):
        d, l = inp
        Loff = l @ Li_prev.T
        S = d - Loff @ Loff.T
        _L0, Li = _chol_inv_blocked3(S, P)
        return Li, (Li, Loff)

    import os as _os

    step = (
        _schur_factor_step
        if _os.environ.get("ACINOSET_COV_STEP") == "unrolled"
        else _schur_step_blocked
    )
    _, (Li, Loff) = jax.lax.scan(step, eye, (diag, lower))
    Finv = jnp.einsum("mki,mkj->mij", Li, Li)  # (M, G, G)
    # the Newton/Schulz refinement promised above — applied to the
    # BATCHED Finv after the scan (two (M, G, G) matmuls, off the
    # latency path). The carried factor keeps the blocked form's
    # rounding (it only positions the factorization point); the
    # emitted inverses that both recurrences consume are refined.
    Fm = diag - Loff @ _T(Loff)
    Finv = Finv + Finv @ (eye - Fm @ Finv)
    Finv = 0.5 * (Finv + _T(Finv))

    B_next = jnp.concatenate([lower[1:], jnp.zeros((1, G, G), dtype)])

    def bwd_step(Z_next, inp):
        fi, bn = inp
        W = fi @ _T(bn)  # F_m^-1 B_{m+1}^T
        Zm = fi + W @ Z_next @ _T(W)
        # exact symmetry (the recurrence is symmetric; rounding isn't)
        Zm = 0.5 * (Zm + _T(Zm))
        return Zm, Zm

    _, Z = jax.lax.scan(
        bwd_step, jnp.zeros((G, G), dtype), (Finv, B_next), reverse=True
    )  # Z_{M-1} = Finv_{M-1} since B_next[M-1] = 0
    # per-frame (P, P) diagonal sub-blocks, padding dropped
    Zf = jnp.stack(
        [Z[:, j * P:(j + 1) * P, j * P:(j + 1) * P] for j in range(3)], axis=1
    )
    return Zf.reshape(-1, P, P)[:N]


def banded_matvec(bands: Sequence[jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """y = A x for the symmetric block-banded A (testing utility)."""
    q = len(bands) - 1
    N, P = x.shape
    y = jnp.einsum("nij,nj->ni", bands[0], x)
    for k in range(1, q + 1):
        Ak = bands[k]
        # lower part: block (n, n-k) times x[n-k]
        y = y.at[k:].add(jnp.einsum("nij,nj->ni", Ak[k:], x[:-k]))
        # upper part: block (n, n+k) = Ak[n+k]^T times x[n+k]
        y = y.at[:-k].add(jnp.einsum("nji,nj->ni", Ak[k:], x[k:]))
    return y
