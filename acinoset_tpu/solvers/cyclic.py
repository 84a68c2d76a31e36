"""Block cyclic reduction for the FTE banded normal equations.

The sequential bottleneck of the FTE Gauss-Newton step is the banded
factor+solve: `solvers.banded` scans frame-by-frame, so its sequential
depth is O(N) small ops — latency-bound on TPU regardless of batch
size. Cyclic reduction re-orders the elimination so the depth is
O(log N) instead, and every level's work is one *large batched matmul*
over all blocks being eliminated — exactly the shape the MXU wants.

Pipeline:
  1. regroup the bandwidth-3 system into block *tridiagonal* form with
     3-frame super-blocks (``banded.group_bands_tridiagonal``, G = 3P);
  2. repeatedly eliminate the odd-indexed blocks: with
     x_o = D_o^{-1} (b_o - L_o x_{o-1} - L_{o+1}^T x_{o+1}) substituted
     into the even equations, the evens again form a block tridiagonal
     system of half the size:
        D'_e = D_j - L_j D_{j-1}^{-1} L_j^T - L_{j+1}^T D_{j+1}^{-1} L_{j+1}
        L'_e = -L_j D_{j-1}^{-1} L_{j-1}
        b'_e = b_j - L_j D_{j-1}^{-1} b_{j-1} - L_{j+1}^T D_{j+1}^{-1} b_{j+1}
     (j = 2e; all O(M) block products batch into single einsums);
  3. solve the final single block, then walk the levels back up filling
     in the odd blocks.

log2(M) levels of ~10 batched (G x G) matmuls replace M sequential scan
steps. The diagonal-block inverses use the same trace-time-unrolled
Cholesky inverse as `solvers.banded` (native cholesky/triangular lower
to slow sequential TPU kernels; see CLAUDE.md perf rules). Cyclic
reduction on an SPD block-tridiagonal system is numerically stable
(each level's reduced system is the Schur complement of an SPD matrix,
hence SPD); the solver runs in f32 with full-precision matmuls pinned.

Replaces (with `FteConfig.linear_solver='cr'`) the same role IPOPT's
sparse ma57/mumps factorization plays in the reference
(/root/reference/src/all_optimizations.py:504-516).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from .banded import _chol_inv_unrolled, group_bands_tridiagonal


def _dinv(D):
    """Batched SPD inverse via the unrolled Cholesky inverse."""
    _L, Li = _chol_inv_unrolled(D)
    return _T(Li) @ Li


def _T(x):
    return jnp.swapaxes(x, -1, -2)


def _pad_rows(x, count):
    if count == 0:
        return x
    pad_shape = (count,) + x.shape[1:]
    return jnp.concatenate([x, jnp.zeros(pad_shape, x.dtype)], axis=0)


@f32_matmuls
def banded_solve_cr(bands: Sequence[jnp.ndarray], g: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD bandwidth-3 block-banded system by block cyclic
    reduction. bands: [A0..A3] each (N, P, P); g: (N, P) -> x (N, P).

    Same system as `block_banded_solve_unrolled`; sequential depth
    O(log N) instead of O(N).
    """
    N, P = g.shape
    diag, lower, M, pad = group_bands_tridiagonal(bands)
    if pad:
        g = jnp.concatenate([g, jnp.zeros((pad, P), g.dtype)])
    b = g.reshape(M, 3 * P)

    # ---- downward sweep: halve until one block remains
    stack = []  # per level: (Dinv_odd, L, L_next, b_odd) for back-subst
    D, L = diag, lower
    while D.shape[0] > 1:
        Ml = D.shape[0]
        E = (Ml + 1) // 2  # even blocks kept
        O = Ml // 2  # odd blocks eliminated

        Dinv_o = _dinv(D[1::2])  # (O, G, G)
        L_even = L[0::2]  # (E, G, G): L[2e]
        # odd-side neighbours of each even block, zero-padded at the ends
        Dinv_prev = jnp.concatenate([jnp.zeros_like(Dinv_o[:1]), Dinv_o], axis=0)[:E]
        L_next = _pad_rows(L[1::2], E - O)  # L[2e+1]
        Dinv_next = _pad_rows(Dinv_o, E - O)  # Dinv[2e+1]
        L_prev_odd = jnp.concatenate([jnp.zeros_like(L[:1]), L[1::2]], axis=0)[:E]  # L[2e-1]
        b_prev = jnp.concatenate([jnp.zeros_like(b[:1]), b[1::2]], axis=0)[:E]  # b[2e-1]
        b_next = _pad_rows(b[1::2], E - O)  # b[2e+1]

        T1 = L_even @ Dinv_prev  # L[2e] D[2e-1]^-1   (zero at e=0: L[0]=0)
        T2 = _T(L_next) @ Dinv_next  # L[2e+1]^T D[2e+1]^-1 (zero at tail)

        D_new = D[0::2] - T1 @ _T(L_even) - T2 @ L_next
        L_new = -(T1 @ L_prev_odd)
        L_new = L_new.at[0].set(0.0)
        b_new = (
            b[0::2]
            - jnp.einsum("eij,ej->ei", T1, b_prev)
            - jnp.einsum("eij,ej->ei", T2, b_next)
        )

        stack.append((Dinv_o, L[1::2], L_even, b[1::2]))
        D, L, b = D_new, L_new, b_new

    x = jnp.einsum("eij,ej->ei", _dinv(D), b)  # the single root block

    # ---- upward sweep: fill in the odd blocks of each level
    for Dinv_o, L_odd, L_even, b_odd in reversed(stack):
        O = Dinv_o.shape[0]
        E = x.shape[0]
        Ml = E + O
        # x_odd[o] = Dinv[o] (b_odd[o] - L[2o+1] x[2o] - L[2o+2]^T x[2o+2])
        x_prev_even = x[:O]  # x[2o]   (even index o)
        x_next_even = _pad_rows(x[1 : O + 1], O - x[1 : O + 1].shape[0])  # x[2o+2]
        L_up = _pad_rows(L_even[1 : O + 1], O - L_even[1 : O + 1].shape[0])  # L[2o+2]
        rhs = (
            b_odd
            - jnp.einsum("oij,oj->oi", L_odd, x_prev_even)
            - jnp.einsum("oji,oj->oi", L_up, x_next_even)
        )
        x_odd = jnp.einsum("oij,oj->oi", Dinv_o, rhs)
        x_full = jnp.zeros((Ml,) + x.shape[1:], x.dtype)
        x_full = x_full.at[0::2].set(x)
        x_full = x_full.at[1::2].set(x_odd)
        x = x_full

    return x.reshape(-1, P)[:N]
