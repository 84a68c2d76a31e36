"""FTE collocation trajectory optimization as a banded Gauss-Newton solver.

TPU-native replacement for the reference's Pyomo -> IPOPT pipeline
(AcinoSet src/all_optimizations.py:22-566). The Pyomo model's decision
variables (x, dx, ddx, poses, slack_model, slack_meas) and equality
constraints are *eliminated analytically*:

  backward-Euler integration (:369-383) makes dx, ddx finite differences
  of x; the constant-acceleration constraint (:386-391) makes
  slack_model the third difference of x divided by Ts^2 (the free
  initial dx[1], ddx[1] absorb the first two boundary terms exactly);
  the pose/measurement constraints (:359-365, :394-399) define
  slack_meas = project(FK(x_n)) - measurement.

What remains is an unconstrained problem in the active pose trajectory
X in R^{N x P}:

  min_X  sum_n |sqrt(1/Q) * D3 X|^2  +  sum redesc(w_meas * (proj(FK(x_n)) - meas))
  s.t.   lo <= X <= hi  (joint limits, :401-483)

with D3 the third-difference stencil — a *banded* coupling in time.
We solve it by damped Gauss-Newton with iteratively-reweighted
redescending measurement weights (graduated: plain/Huber -> full
redescending), joint limits by quadratic penalty + final clamp, and the
banded normal equations solved by spectrally-preconditioned CG by
default (the separable model term is diagonalized exactly in a
trace-time eigenbasis — `solvers.banded.pcg_solve`; direct banded
factorizations from `solvers.banded`/`solvers.cyclic` remain available
via `FteConfig.linear_solver`). `vmap` over trajectories batches every
step onto the MXU — hundreds of trajectories solve in parallel per
chip, where IPOPT solved one NLP per process.

The objective evaluated for accept/reject is the reference's *actual*
objective (redescending measurement loss + weighted model quadratic), so
convergence targets the same optimum IPOPT sought (tol there was a loose
1e-1, :512).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses
from .banded import (
    banded_cg_solve,
    banded_solve_grouped,
    block_banded_cholesky,
    block_banded_marginal_covariance,
    block_banded_solve,
    block_banded_solve_unrolled,
    pcg_solve,
    spectral_minv,
)
from .cyclic import banded_solve_cr


@dataclass(frozen=True)
class FteConfig:
    Ts: float  # timestep = 1/fps
    q_var: Tuple[float, ...]  # per-pose-param model variance (reference Q, squared)
    lo: Tuple[float, ...]  # joint lower bounds (len P)
    hi: Tuple[float, ...]  # joint upper bounds
    meas_std_px: float = 5.0  # R (:243)
    redesc: Tuple[float, float, float] = (3.0, 10.0, 20.0)
    #: 'redescending' (cheetah FTE, :497), 'l1' (generic build.py:299 —
    #: realized as Huber IRLS with delta=redesc[0]), or 'quadratic'
    meas_loss: str = "redescending"
    num_iters: int = 60  # total GN iterations
    plain_iters: int = 15  # iterations before redescending weights switch on
    #: linear-system backend: 'chol_unrolled' (default — banded Cholesky
    #: with trace-time-unrolled small-matrix factor/inverse; 4.5x faster
    #: than native TPU cholesky/triangular kernels), 'cr' (block cyclic
    #: reduction on the 3-frame-grouped tridiagonal form — O(log N)
    #: sequential depth, see solvers/cyclic.py), 'grouped' (3-frame
    #: block-tridiagonal regrouping, N/3 scan steps of 3Px3P blocks),
    #: 'chol' (native kernels), 'cg' (matmul-only truncated-Newton CG),
    #: 'pcg' (spectrally-preconditioned CG — the D3^T D3 model term is
    #: diagonalized exactly by a trace-time eigendecomposition, so ~15
    #: big-matmul iterations replace the N-step factorization scan), or
    #: 'pallas' (single-launch fused factor+solve TPU kernel,
    #: kernels/banded_pallas.py)
    linear_solver: str = "chol_unrolled"
    cg_iters: int = 50
    pcg_iters: int = 16
    limit_penalty: float = 1e4
    lam0: float = 1e-2
    #: starting LM damping; None = lam0. A warm restart that continues a
    #: previous solve (e.g. the sweep's rescue pass) can hand the carried
    #: damping back in; also the deterministic handle for exercising the
    #: polish-boundary lam clamp (CPU f64 LM virtually never rejects on
    #: this problem family, so a naturally ratcheted lam cannot be
    #: produced in unit tests).
    lam_init: Optional[float] = None
    lam_up: float = 4.0
    #: LM damping decay on accept. 0.5 (gentle) measured strictly better
    #: than the former 0.25: aggressive decay made a ~15% tail of
    #: near-identical batch replicas oscillate accept/reject in the
    #: redescending phase and stall >2x longer (24/24 vs 21/24 converged
    #: at 14 iterations, equal final cost at 40 — see CLAUDE.md)
    lam_down: float = 0.5
    #: refresh the measurement Jacobian (Jp, Jfk) every k-th iteration
    #: instead of every iteration (lagged/chord Gauss-Newton). The
    #: residual h(X) — and therefore the accept/reject objective — is
    #: still exact every iteration; only the linearization lags. A
    #: rejected step forces a refresh at the next candidate. k=1 is the
    #: classic fully-relinearized GN. Measured on v5e: k>1 is a net LOSS
    #: in hj_parts mode (h and the Jacobian come out of one fused
    #: measurement pass, so skipping the refresh still pays a separate
    #: h-only pass plus slower convergence: 399 vs 498 traj/s at k=2) —
    #: kept as an option for jacfwd-mode models where J truly dominates.
    relinearize_every: int = 1
    #: stationarity tolerance: converged when the Jacobi-scaled gradient
    #: inf-norm  max_i |g_i| / sqrt(H_ii)  — evaluated FRESH at the
    #: final accepted solution under pinned-f32 matmul precision (see
    #: the status block in fte_solve) — falls below this (units ~
    #: sqrt(cost decrement per scaled coordinate step); IPOPT's
    #: analogous dual-infeasibility tol on this problem was a loose
    #: 1e-1, src/all_optimizations.py:512).
    #: 0.05 is the measured separation boundary on the flagship
    #: workload (f32, B=24): fully-converged runs land at gn <= 0.049
    #: (14/20/40 iters alike) while under-converged 10-iter runs
    #: scatter 0.07-1.8 and starved 6-iter runs 0.49-3.8 — the earlier
    #: 0.5 let a starved run through at gn 0.486 with 12x the marker
    #: error of its rescued solve.
    stat_tol: float = 0.05
    #: run the LAST polish_iters of the num_iters budget under pinned
    #: full-f32 matmul precision (re-evaluating the carry h/J/cost at
    #: the segment boundary so the accept test stays self-consistent).
    #: Why: on TPU the default-bf16 iterations converge to a bf16
    #: stationary point whose EXACT Jacobi-scaled gradient is ~0.06-0.2
    #: — above stat_tol even though marker error equals the CPU solve
    #: (measured, scripts/probe_stat_tpu.py) — so without a pinned tail
    #: the stationarity flag can never pass on the production backend.
    #: One exact final step pulls converged runs back under the
    #: universal 0.05 boundary; the pinned linearization is then reused
    #: for the status gradient at no extra cost. On CPU the precision
    #: pin is a no-op and the split is arithmetic-identical WHEN the
    #: boundary lam is still <= lam0 (the common converged case); if
    #: late rejects ratcheted lam above lam0, the boundary clamp
    #: deliberately undamps the polish step, so the split can then
    #: reach a (better) different point than the single segment. 0
    #: restores the single-segment schedule (status then pays a
    #: standalone pinned evaluation pass).
    polish_iters: int = 1
    #: H/g assembly formulation in hj_parts mode. 'einsum' contracts the
    #: per-marker cores with dot_generals; 'vpu' computes the two small-
    #: contraction steps (A = Jp^T omega Jp over the 12-wide (cams, uv)
    #: axis, G = A Jfk over the 3-wide marker axis) as broadcast-
    #: multiply-reduce fusions instead, keeping only the K=60 GEMM
    #: H = Jfk^T G on the MXU. Why: the r4 device trace
    #: (docs/trace/SUMMARY.md) showed the tiny-contraction dot_generals
    #: running at 1.5-27 GB/s effective (the 6-wide camera axis lands on
    #: the 128 lanes) plus ~34 ms/solve of pure layout copies feeding
    #: them. 'auto' (default) resolves to 'vpu' on TPU and 'einsum'
    #: elsewhere (CPU tests keep the bit-exact legacy order).
    assembly: str = "auto"
    #: round the measurement Hessian blocks to bf16 for the pcg matvec
    #: (f32 accumulate via preferred_element_type). The matvec streams
    #: H_meas once per pcg iteration at near-HBM-bandwidth (608 GB/s,
    #: docs/trace_r4b) — halving its bytes attacks the last big
    #: bandwidth bucket. The rounded H' is a FIXED SPD perturbation of
    #: H (PCG stays consistent; GN tolerates inexact steps by
    #: construction), and the diagonal cancellation below uses H''s own
    #: diagonal so the split stays exact. Off by default pending the
    #: measured end-to-end verdict (scripts/probe_r5_buckets.py).
    pcg_meas_bf16: bool = False


def third_difference(X, Ts):
    """slack_model[n] = (x[n] - 3x[n-1] + 3x[n-2] - x[n-3]) / Ts^2, n>=3."""
    return (X[3:] - 3.0 * X[2:-1] + 3.0 * X[1:-2] - X[:-3]) / Ts**2


def _d3_correlate(v, Ts):
    """g = D3^T v for v of shape (N-3, P): adjoint of third_difference.

    Built from shifted zero-pads + adds rather than `.at[].add()`: the
    indexed-add form lowers to HLO scatter on TPU (measured 15.1 ms
    across the 224 pcg occurrences of one bench solve,
    docs/trace/SUMMARY.md), while pads and adds fuse into one
    elementwise pass."""
    z = ((3, 0), (0, 0)), ((2, 1), (0, 0)), ((1, 2), (0, 0)), ((0, 3), (0, 0))
    g = (
        jnp.pad(v, z[0])
        - 3.0 * jnp.pad(v, z[1])
        + 3.0 * jnp.pad(v, z[2])
        - jnp.pad(v, z[3])
    )
    return g / Ts**2


def _d3_gram_dense(N: int, Ts: float) -> np.ndarray:
    """Dense D3^T D3 (exact, boundary-corrected). Shape (N, N)."""
    c = np.array([-1.0, 3.0, -3.0, 1.0]) / Ts**2  # coefficient of x[n-3..n]
    D = np.zeros((max(N - 3, 0), N))
    for r in range(max(N - 3, 0)):
        D[r, r : r + 4] = c
    return D.T @ D


def _d3_gram_bands(N: int, Ts: float) -> np.ndarray:
    """Scalar bands of D3^T D3 (exact, boundary-corrected). Shape (4, N)."""
    G = _d3_gram_dense(N, Ts)
    bands = np.zeros((4, N))
    for k in range(4):
        for n in range(k, N):
            bands[k, n] = G[n, n - k]
    return bands


def fte_objective(X, h_fn, meas, w_meas, cfg: FteConfig):
    """The reference objective (src/all_optimizations.py:486-500) on X —
    the same function ``fte_solve`` minimizes (same ``cfg.meas_loss``
    choice, same exterior limit penalty, same NaN sanitization), for an
    unpadded trajectory. Independent-oracle checks differentiate THIS
    (tests/test_fte_vs_reference_solver.py), so any divergence from the
    in-solver ``objective_from_h`` silently invalidates them."""
    q = jnp.asarray(cfg.q_var, X.dtype)
    d3 = third_difference(X, cfg.Ts)
    model_term = jnp.sum((1.0 / q) * d3 * d3)
    proj = jax.vmap(h_fn)(X)  # (N, C, L, 2)
    w = jnp.where(jnp.isfinite(w_meas), w_meas, 0.0)
    e = w[..., None] * (proj - jnp.nan_to_num(meas, nan=0.0))
    a, b, c = cfg.redesc
    if cfg.meas_loss == "redescending":
        meas_term = jnp.sum(losses.redescending_loss(e, a, b, c))
    elif cfg.meas_loss == "l1":
        meas_term = jnp.sum(losses.huber_loss(e, a))
    else:
        meas_term = jnp.sum(0.5 * e * e)
    lo = jnp.asarray(cfg.lo, X.dtype)
    hi = jnp.asarray(cfg.hi, X.dtype)
    viol = jnp.maximum(lo - X, 0.0) + jnp.maximum(X - hi, 0.0)
    return model_term + meas_term + cfg.limit_penalty * jnp.sum(viol**2)


def fte_solve(
    h_fn: Callable[..., jnp.ndarray],
    X0: jnp.ndarray,  # (N, P) initial trajectory
    meas: jnp.ndarray,  # (N, C, L, 2) pixel measurements (NaN-free; mask via w)
    w_meas: jnp.ndarray,  # (N, C, L) weights: 1/R if trusted else 0 (:302-308)
    cfg: FteConfig,
    aux=None,
    n_valid=None,
    hj_fn=None,
    hj_parts_fn=None,
    compute_cov: bool = False,
):
    """Solve one FTE trajectory. Returns (X, info dict).

    Status semantics: ``info["converged"]`` tests the Jacobi-scaled
    gradient of the loss the LAST iteration actually optimized — with
    ``num_iters <= plain_iters`` that is the quadratic surrogate, not
    the robust objective (whose value ``cost`` always reports).

    ``compute_cov`` (static) adds a Laplace-posterior pass at the
    solution (the pre-clamp penalized optimum: if the final joint-limit
    clamp is active, the error bars describe the interior point the
    penalty settled at, not the projected pose): the diagonal blocks of
    the inverse objective Hessian via
    the two-sided banded Schur recurrence (`solvers.banded.
    block_banded_marginal_covariance`) give ``info["pose_cov"]`` — the
    (N, P, P) per-frame marginal covariance of the pose states — and,
    in hj_parts mode, ``info["marker_cov"]``/``info["marker_std"]``:
    per-marker 3D covariance/std in meters (J_fk Sigma J_fk^T). The
    reference's IPOPT pipeline never exposed this (the KKT factorization
    is discarded, src/all_optimizations.py:503-516). Unobserved
    directions honestly surface as huge variances. In float32 the pass
    additionally reports ``info["cov_ridge_shrink"]`` — the relative
    variance shrink of the floppiest direction caused by the f32
    stabilizing ridge (~0 when the error bars are trustworthy; values
    approaching 1 mean near-floppy DoFs whose 1-sigma is under-reported
    — recompute in f64 if those bars matter). The GN (IRLS-
    weighted) Hessian approximates the robust likelihood's curvature;
    with relinearize_every > 1 the last refreshed Jacobian is used.

    Fully jit-able; vmap over leading batch of (X0, meas, w_meas) for
    multi-trajectory solves.

    Precision: the measurement stage (FK, Jacobians, H assembly) runs at
    the platform's default matmul precision (bfloat16 MXU passes on TPU —
    measured no accuracy loss after Jacobi preconditioning), while the
    banded factor+solve pins full float32 internally (solvers.banded);
    this mixed scheme is ~1.5x faster than all-f32 at equal marker error.

    ``aux`` is an optional pytree of per-trajectory parameters forwarded
    to ``h_fn(x, aux)`` (e.g. camera intrinsics/extrinsics when batching
    across runs with different rigs) — vmap over it alongside the data.

    ``n_valid`` (optional, traceable) marks the true trajectory length
    when frames are padded for batching: third-difference smoothness
    rows touching frames >= n_valid are masked out, so padding cannot
    bias the real tail (padded frames then have zero measurement AND
    zero model coupling and simply stay at their initialization).

    ``hj_fn`` optionally supplies a fused (h(x), J(x)) evaluation for one
    frame (J flat (m, P)) — e.g. a chain-rule split J = J_proj @ J_fk
    that avoids pushing all P tangents through the camera projection
    (see pipeline.ekf.make_hj_fn). Defaults to jacfwd of h_fn.

    ``hj_parts_fn`` (preferred on TPU) supplies the chain-rule Jacobian
    *unassembled*: x -> (h (m,), Jp (C, L, 2, 3), Jfk (L, 3, P)) — see
    pipeline.ekf.make_hj_parts_fn. The full J = Jp @ Jfk (m, P) is then
    NEVER materialized: the GN pieces factor through the marker points,
        H = Jfk^T [ sum_c Jp^T diag(omega) Jp ] Jfk      ((L, 3, 3) cores)
        g = Jfk^T [ sum_c Jp^T (omega * resid) ],
    which cuts the measurement-stage HBM traffic ~8x (J for the flagship
    batch is 230 MB per evaluation and lives in the iteration carry) —
    measured ~1.5x on whole-iteration time (scripts/profile_fte.py).
    """
    _SOLVERS = ("pcg", "cg", "chol", "chol_unrolled", "grouped", "cr", "pallas")
    if cfg.linear_solver not in _SOLVERS:
        raise ValueError(
            f"unknown linear_solver {cfg.linear_solver!r}; choose from {_SOLVERS}"
        )
    _LOSSES = ("redescending", "l1", "quadratic")
    if cfg.meas_loss not in _LOSSES:
        raise ValueError(
            f"unknown meas_loss {cfg.meas_loss!r}; choose from {_LOSSES}"
        )
    _ASSEMBLIES = ("auto", "einsum", "vpu")
    if cfg.assembly not in _ASSEMBLIES:
        raise ValueError(
            f"unknown assembly {cfg.assembly!r}; choose from {_ASSEMBLIES}"
        )
    vpu_assembly = cfg.assembly == "vpu" or (
        cfg.assembly == "auto" and jax.default_backend() == "tpu"
    )
    if aux is not None:
        base_h = h_fn
        h_fn = lambda x: base_h(x, aux)  # noqa: E731
        if hj_fn is not None:
            base_hj = hj_fn
            hj_fn = lambda x: base_hj(x, aux)  # noqa: E731
        if hj_parts_fn is not None:
            base_hjp = hj_parts_fn
            hj_parts_fn = lambda x: base_hjp(x, aux)  # noqa: E731
    N, P = X0.shape
    dtype = X0.dtype
    q = jnp.asarray(cfg.q_var, dtype)
    lo = jnp.asarray(cfg.lo, dtype)
    hi = jnp.asarray(cfg.hi, dtype)
    a, b, c = cfg.redesc

    if cfg.linear_solver == "pcg":
        # trace-time eigendecomposition of the static third-difference
        # Gram: the spectral preconditioner's basis (host numpy, cheap)
        _e, _U = np.linalg.eigh(_d3_gram_dense(N, cfg.Ts))
        U_pc = jnp.asarray(_U, dtype)
        e_pc = jnp.asarray(np.maximum(_e, 0.0), dtype)
    else:
        U_pc = e_pc = None

    # third-difference row mask (row r involves frames r..r+3)
    if n_valid is None:
        row_mask = jnp.ones((max(N - 3, 0),), dtype)
    else:
        row_mask = (jnp.arange(N - 3) + 3 < n_valid).astype(dtype)

    # gram bands of D3^T diag(row_mask) D3, assembled from shifted masks:
    # band_k[n] = sum_{j=k..3} c_j * c_{j-k} * row_mask[n-j]
    cstencil = np.array([-1.0, 3.0, -3.0, 1.0]) / cfg.Ts**2  # coeff of x[r+j] in row r
    rm_pad = jnp.concatenate([jnp.zeros((3,), dtype), row_mask, jnp.zeros((3,), dtype)])

    def shifted_rm(j):  # row_mask[n - j] as an (N,) vector
        return jax.lax.dynamic_slice_in_dim(rm_pad, 3 - j, N)

    gram_bands = []
    for kk in range(4):
        acc = jnp.zeros((N,), dtype)
        for j in range(kk, 4):
            acc = acc + float(cstencil[j] * cstencil[j - kk]) * shifted_rm(j)
        gram_bands.append(acc)

    meas = jnp.nan_to_num(meas, nan=0.0)
    w = jnp.where(jnp.isfinite(w_meas), w_meas, 0.0)

    h_flat = lambda x: h_fn(x).reshape(-1)  # (m,)
    if hj_parts_fn is not None:
        def _hjp(x):
            hh, Jp, Jfk = hj_parts_fn(x)
            return hh, (Jp, Jfk)  # J rides in the carry as the two factors

        hj_batch = jax.vmap(_hjp)
    elif hj_fn is None:
        _jac = jax.jacfwd(h_flat)
        hj_batch = jax.vmap(lambda x: (h_flat(x), _jac(x)))
    else:
        hj_batch = jax.vmap(hj_fn)

    w_flat_all = jnp.repeat(w.reshape(N, -1), 2, axis=-1)  # (N, m)
    meas_flat = meas.reshape(N, -1)

    def meas_rho(e):
        if cfg.meas_loss == "redescending":
            return losses.redescending_loss(e, a, b, c)
        if cfg.meas_loss == "l1":
            return losses.huber_loss(e, a)
        return 0.5 * e * e

    def meas_irls(e):
        if cfg.meas_loss == "redescending":
            return losses.redescending_weight(e, a, b, c)
        if cfg.meas_loss == "l1":
            return losses.huber_weight(e, a)
        return jnp.ones_like(e)

    def objective_from_h(X, hX):
        """Reference objective at X given hX = h_batch(X) (one FK pass
        per GN iteration: the candidate's measurement evaluation is
        reused as next iteration's linearization point)."""
        d3 = third_difference(X, cfg.Ts) * row_mask[:, None]
        model_term = jnp.sum((1.0 / q) * d3 * d3)
        e = w_flat_all * (hX - meas_flat)
        meas_term = jnp.sum(meas_rho(e))
        # limit penalty (exterior): contributes 0 when feasible
        viol = jnp.maximum(lo - X, 0.0) + jnp.maximum(X - hi, 0.0)
        return model_term + meas_term + cfg.limit_penalty * jnp.sum(viol**2)

    lag = max(int(cfg.relinearize_every), 1)
    h_only_batch = jax.vmap(h_flat)
    wq = 1.0 / q  # (P,)

    def meas_normal_pieces(hX, JX, robust_on):
        """Measurement GN pieces at a linearization point (hX, JX):
        residuals e, Gauss-Newton Hessian H_meas (N, P, P), gradient
        g_meas (N, P). Shared by the iteration and the posterior-
        covariance pass."""
        e = w_flat_all * (hX - meas_flat)  # (N, m) scaled residuals
        w_irls = jnp.where(robust_on, meas_irls(e), 1.0)
        if hj_parts_fn is not None:
            # J = Jp @ Jfk never materialized: contract through the
            # (L, 3, 3) per-marker cores
            JpX, JfkX = JX
            C = meas.shape[1]
            Lm = meas.shape[2]
            omega = (w_flat_all**2 * w_irls).reshape(N, C, Lm, 2)
            er = (w_flat_all * w_irls * e).reshape(N, C, Lm, 2)
            if vpu_assembly:
                # broadcast-multiply-reduce: the 12-wide (C, 2) and
                # 3-wide contractions are VPU work, not MXU work — as
                # dot_generals they tile a 128x128 systolic pass with a
                # 6-wide lane dim and force layout copies of every
                # operand (measured 1.5 GB/s effective + ~34 ms/solve of
                # copies, r4 trace). Only the final K=60 contraction is
                # MXU-shaped and stays a GEMM.
                Jw = JpX * omega[..., None]  # (C, L, 2, 3)... batched (N,...)
                A = jnp.sum(
                    Jw[..., :, None] * JpX[..., None, :], axis=(1, 3)
                )  # (N, L, 3, 3)
                G = jnp.sum(
                    A[..., None] * JfkX[:, :, None, :, :], axis=3
                )  # (N, L, 3, P)
                # merge (l, x) -> one K=60 contraction axis BEFORE the
                # dot: as a 4-d einsum XLA lowers 'nlxa,nlxb->nab' ~3x
                # slower (4.78 vs 1.60 ms/call standalone at M=9600,
                # docs/r04/probe_hgemm.txt) — the merged-axis batched
                # GEMM is the hottest op in the solve (docs/trace_r4b).
                Nn = JfkX.shape[0]
                Jr = JfkX.reshape(Nn, -1, JfkX.shape[-1])
                Gr = G.reshape(Nn, -1, G.shape[-1])
                # default (bf16 MXU) precision is INTENTIONAL here, per
                # the repo precision policy: in-loop H noise is covered
                # by the pinned-f32 polish tail + pinned status
                # evaluation (ADVICE r4) — only the gradient einsums
                # below pin HIGHEST
                H_meas = jax.lax.dot_general(
                    Jr, Gr, (((1,), (1,)), ((0,), (0,)))
                )
            else:
                A = jnp.einsum("nclui,nclu,ncluj->nlij", JpX, omega, JpX)
                H_meas = jnp.einsum("nlxa,nlxy,nlyb->nab", JfkX, A, JfkX)
            # the GRADIENT contractions are pinned to exact-f32 MXU
            # passes: at the optimum g_meas is a near-cancelling sum and
            # these einsums are ~1% of the H contractions' FLOPs, so
            # HIGHEST precision is free. NOTE (measured,
            # scripts/probe_stat_tpu.py): pinning the contraction alone
            # does NOT recover the CPU-level stationarity floor on TPU —
            # the bf16 noise lives in the operands (hX/JX from the FK
            # einsum), so the solver status is decided by the separate
            # fully-pinned final evaluation after the iteration loop.
            bv = jnp.einsum(
                "nclui,nclu->nli", JpX, er, precision=jax.lax.Precision.HIGHEST
            )
            g_meas = jnp.einsum(
                "nlxa,nlx->na", JfkX, bv, precision=jax.lax.Precision.HIGHEST
            )
        else:
            J = JX * w_flat_all[..., None]  # d e / d x  (N, m, P)
            Wm = w_irls  # (N, m)
            H_meas = jnp.einsum("nmi,nm,nmj->nij", J, Wm, J)  # (N, P, P)
            g_meas = jnp.einsum(  # exact-f32: see hj_parts branch note
                "nmi,nm,nm->ni", J, Wm, e, precision=jax.lax.Precision.HIGHEST
            )  # (N, P)
        return H_meas, g_meas

    def limit_hessian(X):
        viol_lo = jnp.maximum(lo - X, 0.0)
        viol_hi = jnp.maximum(X - hi, 0.0)
        h_lim = 2.0 * cfg.limit_penalty * ((viol_lo > 0) | (viol_hi > 0)).astype(dtype)
        return viol_lo, viol_hi, h_lim

    def objective_grad_and_diag(X, H_meas, g_meas):
        """Full objective gradient and undamped Jacobi diagonal at X,
        given the measurement GN pieces — the ONE assembly of
        g = g_meas + 2 g_model + g_lim and diag = model + H_meas diag +
        h_lim, shared by the iteration step and the solver-status
        evaluation (duplicating it inline was a drift risk).

        Gradient factors: the model term sum w*d3^2 has no 1/2 so its
        gradient carries a 2; the measurement rho is ~e^2/2 near zero so
        its GN pieces enter with factor 1 (rho' = w_irls*e, rho'' ~
        w_irls). With a lagged Jacobian g_meas is the chord gradient —
        exact again on every refresh iteration.
        """
        d3 = third_difference(X, cfg.Ts) * row_mask[:, None]  # (N-3, P)
        g_model = _d3_correlate(d3 * wq, cfg.Ts)  # = D3^T M W D3 X
        viol_lo, viol_hi, h_lim = limit_hessian(X)
        g_lim = 2.0 * cfg.limit_penalty * (viol_hi - viol_lo)
        g = g_meas + 2.0 * g_model + g_lim  # (N, P)
        diag_model = 2.0 * gram_bands[0][:, None] * wq[None, :]
        diag0 = diag_model + jnp.diagonal(H_meas, axis1=-2, axis2=-1) + h_lim
        return g, diag0, diag_model, h_lim

    def hessian_bands(H_meas, h_lim):
        """Undamped objective-Hessian bands: 2x model gram + measurement
        GN blocks + active limit-penalty diagonal."""
        bands = []
        for k in range(4):
            bk = gram_bands[k][:, None] * wq[None, :]  # (N, P)
            Bk = jnp.zeros((N, P, P), dtype).at[:, jnp.arange(P), jnp.arange(P)].set(bk)
            bands.append(2.0 * Bk)
        bands[0] = bands[0] + H_meas
        bands[0] = bands[0].at[:, jnp.arange(P), jnp.arange(P)].add(h_lim)
        return bands

    def gn_step(carry, it):
        X, hX, JX, lam, cost, need_refresh = carry
        robust_on = it >= cfg.plain_iters

        # ---- measurement GN pieces, frame-local (hX, JX carried from
        # the previous iteration's candidate evaluation), then the full
        # gradient + undamped Jacobi diagonal via the shared assembly
        # (the pcg branch never materializes the (N, P, P) band
        # matrices — the diagonal is computed directly)
        H_meas, g_meas = meas_normal_pieces(hX, JX, robust_on)
        g, diag0, diag_model, h_lim = objective_grad_and_diag(X, H_meas, g_meas)
        damp = lam * jnp.maximum(diag0, 1e-8)  # LM damping


        if cfg.linear_solver == "pcg":
            # spectral preconditioning solves the UNscaled system with a
            # *structured* operator: the model term applies as the D3
            # stencil (a handful of shifted adds — no (P, P) band
            # matrices materialized or read), the measurement term as
            # one einsum over H_meas, the rest as a diagonal. The
            # preconditioner M = U diag(2 e_k wq_p + c_p) U^T inverts
            # the model term exactly in the precomputed eigenbasis;
            # c = mean frame-local diag. With n_valid masking the
            # unmasked G is used — M is then approximate, which PCG
            # tolerates.
            diag_extra = diag0 + damp - diag_model  # lim + damp + H diag
            # H's diagonal is already inside diag_extra; rather than
            # materializing an off-diagonal copy of H (a (N, P, P)
            # diagonal-scatter + full-array subtract per GN iteration),
            # apply full H in the matvec and cancel the diagonal
            # contribution elementwise
            if cfg.pcg_meas_bf16:
                # fixed bf16-rounded operator H' (see FteConfig): the
                # matvec reads half the bytes; accumulation stays f32
                H_mv = H_meas.astype(jnp.bfloat16)
                diag_H = jnp.diagonal(H_mv, axis1=-2, axis2=-1).astype(dtype)

                def _meas_mul(x):
                    return jax.lax.dot_general(
                        H_mv, x.astype(jnp.bfloat16),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=dtype,
                    )
            else:
                diag_H = jnp.diagonal(H_meas, axis1=-2, axis2=-1)

                def _meas_mul(x):
                    return jnp.einsum("nij,nj->ni", H_meas, x)

            def _A_mul(x):
                d3x = third_difference(x, cfg.Ts) * row_mask[:, None]
                model = 2.0 * _d3_correlate(d3x * wq[None, :], cfg.Ts)
                meas = _meas_mul(x) - diag_H * x
                return model + meas + diag_extra * x

            c_pc = jnp.maximum(jnp.mean(diag_extra, axis=0), 1e-12)
            dX = pcg_solve(
                _A_mul, spectral_minv(U_pc, e_pc, wq, c_pc), -g,
                num_iters=cfg.pcg_iters,
            )
        else:
            bands = hessian_bands(H_meas, h_lim)
            bands[0] = bands[0].at[:, jnp.arange(P), jnp.arange(P)].add(damp)
            # Jacobi (symmetric diagonal) preconditioning: the model terms
            # carry 1/Ts^4 (~1e7 at 90 fps) while measurement terms are
            # O(1e4) — rescaling to unit diagonal keeps the banded Cholesky
            # accurate in float32 on TPU.
            diag_full = diag0 + damp
            s = 1.0 / jnp.sqrt(jnp.maximum(diag_full, 1e-20))  # (N, P)
            zeros_pad = jnp.zeros((3, P), dtype)
            s_shift = [s]
            for k in range(1, 4):
                s_shift.append(jnp.concatenate([zeros_pad[:k], s[:-k]], axis=0))
            bands = [
                bands[k] * s[:, :, None] * s_shift[k][:, None, :] for k in range(4)
            ]
            if cfg.linear_solver == "cg":
                dX = banded_cg_solve(bands, -g * s, num_iters=cfg.cg_iters) * s
            elif cfg.linear_solver == "chol":
                L = block_banded_cholesky(bands)
                dX = block_banded_solve(L, -g * s) * s
            elif cfg.linear_solver == "grouped":
                dX = banded_solve_grouped(bands, -g * s) * s
            elif cfg.linear_solver == "cr":
                dX = banded_solve_cr(bands, -g * s) * s
            elif cfg.linear_solver == "pallas":
                from ..kernels.banded_pallas import banded_solve_pallas_vmappable

                dX = banded_solve_pallas_vmappable(*bands, -g * s) * s
            else:
                dX = block_banded_solve_unrolled(bands, -g * s) * s

        X_new = X + dX
        if lag > 1:
            # lagged/chord GN: the residual (and cost) is exact every
            # iteration via the cheap forward pass; the Jacobian factors
            # refresh only on schedule or after a rejected step
            refresh = need_refresh | (jnp.mod(it, lag) == lag - 1)
            h_new, J_new = jax.lax.cond(
                refresh, hj_batch, lambda Xn: (h_only_batch(Xn), JX), X_new
            )
        else:
            h_new, J_new = hj_batch(X_new)  # the iteration's ONE measurement pass
        new_cost = objective_from_h(X_new, h_new)
        ok = (new_cost < cost) & jnp.all(jnp.isfinite(dX))
        X = jnp.where(ok, X_new, X)
        hX = jnp.where(ok, h_new, hX)
        # JX is the flat Jacobian or, in parts mode, the (Jp, Jfk) tuple
        JX = jax.tree.map(lambda a_, b_: jnp.where(ok, a_, b_), J_new, JX)
        cost = jnp.where(ok, new_cost, cost)
        lam = jnp.clip(jnp.where(ok, lam * cfg.lam_down, lam * cfg.lam_up), 1e-10, 1e10)
        return (X, hX, JX, lam, cost, ~ok), cost

    n_polish = min(max(int(cfg.polish_iters), 0), int(cfg.num_iters))
    n_main = int(cfg.num_iters) - n_polish
    h0, J0 = hj_batch(X0)
    cost0 = objective_from_h(X0, h0)
    # the scan emits ONLY the cost trace: an in-loop gnorm trace was
    # dropped outright (r5 bucket audit) — the solver-status gradient
    # is the separate pinned-precision evaluation below
    lam_start = cfg.lam0 if cfg.lam_init is None else cfg.lam_init
    carry = (X0, h0, J0, jnp.asarray(lam_start, dtype), cost0, jnp.asarray(False))
    carry, cost_hist = jax.lax.scan(
        gn_step, carry, jnp.arange(n_main)
    )
    if n_polish > 0:
        # pinned-f32 polish tail (see FteConfig.polish_iters): the carry
        # h/J/cost are re-evaluated inside the pinned context first —
        # comparing a pinned candidate cost against a bf16 carried cost
        # would spuriously reject steps whose true decrement is below
        # the bf16 noise floor. On CPU this re-evaluation reproduces the
        # carried values exactly and the trajectory is unchanged.
        with jax.default_matmul_precision("float32"):
            X_m = carry[0]
            h_p, J_p = hj_batch(X_m)
            cost_p = objective_from_h(X_m, h_p)
            # clamp the LM damping at the segment boundary: on the bf16
            # cost plateau late iterations see no real decrement, the
            # accept test rejects, and lam ratchets up to ~1e6+ — an
            # over-damped pinned step then cannot restore stationarity
            # (measured: 40-iter runs ended at gn ~0.09 vs 0.015 for
            # 14-iter runs whose lam was still small). The exact-f32
            # accept test below re-rejects the step if undamping was
            # wrong, so this is safe.
            lam_p = jnp.minimum(carry[3], jnp.asarray(cfg.lam0, dtype))
            carry = (X_m, h_p, J_p, lam_p, cost_p, jnp.asarray(False))
            carry, cost_hist_p = jax.lax.scan(
                gn_step, carry, n_main + jnp.arange(n_polish)
            )
        cost_hist = jnp.concatenate([cost_hist, cost_hist_p])
    (X, hX, JX, lam, cost, _) = carry
    extra = {}
    if compute_cov:
        # Laplace posterior at the solution: undamped Hessian bands at
        # the final accepted (X, hX, JX), Jacobi-scaled for f32 Cholesky
        # stability, selected-inverted, unscaled back
        robust_fin = jnp.asarray(cfg.num_iters > cfg.plain_iters)
        H_meas_f, _g_unused = meas_normal_pieces(hX, JX, robust_fin)
        _vl, _vh, h_lim_f = limit_hessian(X)
        bands_f = hessian_bands(H_meas_f, h_lim_f)
        if n_valid is not None:
            # padded frames carry zero measurement weight AND masked
            # smoothness rows — an all-zero Hessian block whose Cholesky
            # would poison the backward recurrence (0 @ nan = nan). Pin
            # them to identity precision; callers trim frames >= n_valid.
            pad_frame = (jnp.arange(N) >= n_valid).astype(dtype)
            bands_f[0] = bands_f[0] + pad_frame[:, None, None] * jnp.eye(P, dtype=dtype)
        diag_f = bands_f[0][:, jnp.arange(P), jnp.arange(P)]
        s = 1.0 / jnp.sqrt(jnp.maximum(diag_f, 1e-20))  # (N, P)
        zpad = jnp.zeros((3, P), dtype)
        s_shift = [s] + [
            jnp.concatenate([zpad[:k], s[:-k]], axis=0) for k in range(1, 4)
        ]
        bands_s = [
            bands_f[k] * s[:, :, None] * s_shift[k][:, None, :] for k in range(4)
        ]
        ridge = 1e-6 if dtype == jnp.float32 else 0.0
        if ridge:
            # the Jacobi-scaled Hessian's ~1e8 conditioning exceeds
            # 1/eps_f32: rounding drives Schur pivots negative and the
            # clamped inverses overflow to inf -> nan. A weak prior
            # ridge (1e-6 of the unit-scaled diagonal) keeps every pivot
            # positive. Measured vs the f64 posterior on the synthetic
            # fixture: median std ratio 0.975 (5th pct 0.69 — only the
            # near-floppy tail is shrunk). f64 needs none (1e-12 exact).
            bands_s[0] = bands_s[0] + ridge * jnp.eye(P, dtype=dtype)
        if ridge:
            # the ridge self-diagnosis below needs the SAME recurrence
            # at double the ridge — run both variants as ONE width-2
            # vmapped scan instead of two sequential scans: the RGF
            # scans are latency-bound (sequential depth ~2M steps of
            # small-block math), so batching the pair ~halves the
            # uncertainty pass's scan time (VERDICT r4 item 7).
            # f64 output is bit-equal to the sequential pair; f32
            # perturbs within the recurrence's own noise floor (median
            # rel 3e-4, p99 4e-3 on marker_std — an order below the
            # documented ±2.5% f32/f64 gap): batch-shape changes
            # perturb XLA reduction tiling (CLAUDE.md r4)
            b0_pair = jnp.stack(
                [bands_s[0], bands_s[0] + ridge * jnp.eye(P, dtype=dtype)]
            )
            rest = [jnp.stack([bk, bk]) for bk in bands_s[1:]]
            Z_pair = jax.vmap(
                lambda b0, b1, b2, b3: block_banded_marginal_covariance(
                    [b0, b1, b2, b3]
                )
            )(b0_pair, *rest)
            Zs, Zs2 = Z_pair[0], Z_pair[1]
        else:
            Zs = block_banded_marginal_covariance(bands_s)
        pose_cov = Zs * s[:, :, None] * s[:, None, :]
        extra["pose_cov"] = pose_cov
        if ridge:
            # which error bars did the f32 ridge shrink? Run the same
            # recurrence at DOUBLE the ridge and Richardson-extrapolate
            # each variance to r=0: with v(r) the computed variance,
            # v0 ~= v(r) + (v(r) - v(2r)) to first order in r, so the
            # RELATIVE deficit of the reported variance is
            #   shrink = (v0 - v(r)) / v0 = (v1 - v2) / (2 v1 - v2).
            # Exactly 0 where the ridge is irrelevant, -> 1 for
            # near-floppy directions; measured (not modeled) — the
            # diagonal-sensitivity estimate r*Z^2 overstated the
            # flagship's affected fraction 10x. Zs2 came out of the
            # width-2 vmapped scan above, riding the same program.
            z1 = jnp.diagonal(Zs, axis1=-2, axis2=-1)
            z2 = jnp.diagonal(Zs2, axis1=-2, axis2=-1)
            rel_pose = jnp.clip(
                (z1 - z2) / jnp.maximum(2.0 * z1 - z2, 1e-30), 0.0, 1.0
            )
            if n_valid is not None:
                live = (jnp.arange(N) < n_valid)[:, None]
                rel_pose = jnp.where(live, rel_pose, 0.0)
            # worst pose-direction relative variance shrink (padded
            # frames are identity pins — masked out above)
            extra["cov_ridge_shrink"] = jnp.max(rel_pose)
            pose_cov2 = Zs2 * s[:, :, None] * s[:, None, :]
        else:
            extra["cov_ridge_shrink"] = jnp.zeros((), dtype)
            pose_cov2 = None
        if hj_parts_fn is not None:
            _JpX, JfkX = JX
            # marker_cov (N, L, 3, 3) is exposed for API completeness
            # but the sweep path consumes only marker_std — computing
            # the variances by their OWN direct einsum (not as the
            # diagonal of mc) lets XLA dead-code the full tensor in the
            # batched jit that doesn't return it (VERDICT r4 item 7)
            extra["marker_cov"] = jnp.einsum(
                "nlxa,nab,nlyb->nlxy", JfkX, pose_cov, JfkX
            )
            mvar = jnp.clip(
                jnp.einsum("nlxa,nab,nlxb->nlx", JfkX, pose_cov, JfkX),
                0.0, None,
            )
            extra["marker_std"] = jnp.sqrt(mvar)
            if ridge:
                # per-cell marker-space deficit by the same two-point
                # extrapolation, plus the fraction of live cells whose
                # bars are >10% understated in variance — the per-run
                # "which error bars are affected" signal
                v1 = mvar
                v2 = jnp.clip(
                    jnp.einsum("nlxa,nab,nlxb->nlx", JfkX, pose_cov2, JfkX),
                    0.0, None,
                )
                rel = jnp.clip(
                    (v1 - v2) / jnp.maximum(2.0 * v1 - v2, 1e-30), 0.0, 1.0
                )
                extra["marker_std_ridge_shrink"] = rel
                if n_valid is not None:
                    live_cells = jnp.broadcast_to(
                        live[:, :, None], rel.shape
                    ).astype(dtype)
                else:
                    live_cells = jnp.ones_like(rel)
                hit = (rel > 0.1).astype(dtype) * live_cells
                extra["cov_ridge_frac"] = jnp.sum(hit) / jnp.maximum(
                    jnp.sum(live_cells), 1.0
                )
    # solver-status surfacing (the reference streamed IPOPT's termination
    # status, SURVEY.md §5): converged = stationarity, the Jacobi-scaled
    # gradient inf-norm at the final accepted solution below stat_tol —
    # the analog of IPOPT's scaled-dual-infeasibility test (tol there a
    # loose 1e-1, src/all_optimizations.py:512).
    #
    # The status gradient is a fully-f32-pinned evaluation, not the
    # in-loop gnorm trace: on TPU the default-bf16 loop's hX/JX come out
    # of bf16 MXU einsums (the FK chain), which sets a noise floor of
    # gn ~ 0.12-0.23 at the optimum — 10x the CPU floor and 3-5x
    # stat_tol — so the bf16 history cannot decide convergence on the
    # production backend (measured: scripts/probe_stat_tpu.py; pinning
    # only the gradient contraction did NOT recover the floor because
    # the noise lives in the operands, not the contraction). When the
    # polish tail ran, its carried hX/JX are already pinned evaluations
    # at the accepted solution and are reused here for free; otherwise
    # this pays one standalone pinned measurement pass, which XLA
    # dead-code-eliminates for callers that drop the status outputs.
    # Evaluated at the pre-clip linearization state, matching the
    # in-loop criterion and the posterior-covariance pass above.
    with jax.default_matmul_precision("float32"):
        if n_polish > 0 and lag == 1:
            h_st, J_st = hX, JX
        else:
            # no polish tail ran (standalone pinned pass), or the
            # Jacobian is lagged (relinearize_every > 1: an accepted
            # polish step that skipped the refresh leaves JX linearized
            # at the pre-step point, so the carried factors would give a
            # chord gradient at a stale linearization)
            h_st, J_st = hj_batch(X)
        robust_st = jnp.asarray(cfg.num_iters > cfg.plain_iters)
        H_meas_st, g_meas_st = meas_normal_pieces(h_st, J_st, robust_st)
        g_st, diag_st, _dm_st, _hl_st = objective_grad_and_diag(
            X, H_meas_st, g_meas_st
        )
        grad_norm = jnp.max(
            jnp.abs(g_st) * jax.lax.rsqrt(jnp.maximum(diag_st, 1e-12))
        )
    X = jnp.clip(X, lo, hi)
    converged = grad_norm <= cfg.stat_tol
    return X, dict(
        cost=cost, cost0=cost0, cost_history=cost_hist, lam=lam,
        converged=converged, grad_norm=grad_norm, **extra,
    )


def derivatives_from_trajectory(X, Ts):
    """Recover dx, ddx consistent with the backward-Euler constraints.

    dx[n] = (x[n] - x[n-1])/Ts for n>=1; ddx[n] = (dx[n] - dx[n-1])/Ts
    for n>=2. The free boundary values dx[0], ddx[0], ddx[1] take the
    cost-minimizing values (copies of their first defined neighbor),
    mirroring how IPOPT's free variables settle.
    """
    if X.shape[0] < 2:  # degenerate 1-frame trajectory: all derivatives 0
        return jnp.zeros_like(X), jnp.zeros_like(X)
    dx = jnp.diff(X, axis=0) / Ts
    dx = jnp.concatenate([dx[:1], dx], axis=0)
    ddx = jnp.diff(dx, axis=0) / Ts
    ddx = jnp.concatenate([ddx[1:2], ddx[1:2], ddx[1:]], axis=0) if ddx.shape[0] >= 2 else jnp.zeros_like(X)
    return dx, ddx
