"""Extended Kalman filter + RTS smoother as a single `lax.scan` program.

TPU-native rebuild of the reference EKF (AcinoSet
src/all_optimizations.py:569-865): constant-acceleration dynamics over
pose/vel/acc blocks, per-frame measurement = all cameras x markers x 2
pixels through FK + fisheye projection, 3-sigma innovation gating, and a
backward Rauch-Tung-Striebel pass.

Differences by design (documented, all strictly better on TPU):
  * the measurement Jacobian is exact (`jax.jacfwd` of FK+projection)
    instead of forward finite differences with eps=1e-3 (:634-649);
  * the time loop is `lax.scan` (one compiled program, vmap-able over
    runs) instead of a Python loop;
  * the gain is computed by a pose-block Woodbury identity (two n_pose
    = n_states/3 trace-time-unrolled Cholesky inverses) instead of
    factorizing the m x m innovation matrix with native kernels: the
    measurement touches ONLY the pose block (H = [Hp | 0]), so the full
    update factors through 25x25 cores — 27x fewer inverse FLOPs and 3x
    less sequential unroll depth per frame than the previous
    n_states-sized information form (the scan is latency-bound);
  * NaN measurements (absent rows) are masked to zero residual with
    untrusted-noise weighting, where the reference would propagate NaN.
"""
from __future__ import annotations

from dataclasses import dataclass

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .banded import _chol_inv_blocked3, _chol_inv_unrolled
from ..utils.precision import f32_matmuls


@dataclass(frozen=True)
class EkfConfig:
    dt: float
    sigma_bound: float = 3.0  # innovation gate (:609)
    dlc_thresh: float = 0.5
    meas_std_px: float = 5.0  # trusted-point sigma (:757)
    max_pixel_err: float = 1920.0  # untrusted sigma = cam width (:610)


def constant_acc_F(n_pose: int, dt: float, dtype=jnp.float64) -> jnp.ndarray:
    """State-transition Jacobian for [pos, vel, acc] blocks (:759-764)."""
    n = 3 * n_pose
    F = jnp.eye(n, dtype=dtype)
    i = jnp.arange(2 * n_pose)
    F = F.at[i, i + n_pose].set(dt)
    j = jnp.arange(n_pose)
    F = F.at[j, j + 2 * n_pose].set(dt**2 / 2)
    return F


def constant_acc_Q(qb_std: np.ndarray, dt: float) -> np.ndarray:
    """Process covariance: [[dt^4/4, dt^3/2, dt^2/2], ...] x qb (:749-754)."""
    qb = np.diag(np.asarray(qb_std) / 2.0) ** 2
    return np.block(
        [
            [dt**4 / 4 * qb, dt**3 / 2 * qb, dt**2 / 2 * qb],
            [dt**3 / 2 * qb, dt**2 * qb, dt * qb],
            [dt**2 / 2 * qb, dt * qb, qb],
        ]
    )


def predict_next_state(x: jnp.ndarray, dt: float, n_pose: int) -> jnp.ndarray:
    """Constant-acceleration prediction (:624-631)."""
    pos, vel, acc = x[:n_pose], x[n_pose : 2 * n_pose], x[2 * n_pose :]
    acc_p = acc
    vel_p = vel + dt * acc_p
    pos_p = pos + dt * vel_p + 0.5 * dt**2 * acc_p
    return jnp.concatenate([pos_p, vel_p, acc_p])


@f32_matmuls
def run_ekf(
    h_fn: Callable[[jnp.ndarray], jnp.ndarray],
    pixels: jnp.ndarray,
    likelihood: jnp.ndarray,
    x0: jnp.ndarray,
    P0: jnp.ndarray,
    qb_std: np.ndarray,
    config: EkfConfig,
    hj_fn=None,
    smoother: str = "auto",
):
    """Run EKF + RTS smoother.

    Args:
      h_fn: pose (n_pose,) -> predicted pixels (C, L, 2) for all cameras.
      pixels: (N, C, L, 2) measured pixels (NaN where missing).
      likelihood: (N, C, L) DLC likelihoods.
      x0: (3*n_pose,) initial state. P0: initial covariance.
      qb_std: (n_pose,) per-DoF process std list (reference qb_list).
      config: EkfConfig.
      hj_fn: optional fused pose -> (h (m,), J (m, n_pose)) measurement
        evaluation (e.g. pipeline.ekf.make_hj_fn with the analytic FK
        Jacobian); defaults to jacfwd of h_fn.
      smoother: 'associative' (log2(N) levels of batched matmuls, peak
        memory ~4 (N, n, n) arrays), 'sequential' (N-step reverse scan,
        ~2x less peak memory — the associative form RESOURCE_EXHAUSTs a
        16 GB chip at B=96/N=600 when vmapped over runs), or 'auto'
        (associative up to N=256, sequential beyond).

    Returns dict with states/covariances: x, dx, ddx and smoothed_*,
    plus 'outliers' (total gated pairs). Shapes (N, n_pose) etc.
    'P' and 'smoothed_P' are the POSE-BLOCK covariance marginals
    (N, n_pose, n_pose) — every downstream consumer (3D error bars via
    make_marker_std_fn, inspection) reads only that block, and emitting
    the full 3n x 3n history is what RESOURCE_EXHAUSTed long horizons
    (two extra (N, 3n, 3n) outputs at B=96/N=600). The full-state
    covariance remains internal to the filter/smoother recursions.
    """
    dtype = x0.dtype
    N, C, L, _ = pixels.shape
    n_pose = x0.shape[0] // 3
    n_states = 3 * n_pose

    F = constant_acc_F(n_pose, config.dt, dtype)
    Q = jnp.asarray(constant_acc_Q(qb_std, config.dt), dtype)
    # F = Fc (x) I_{n_pose} in [pos, vel, acc] blocks: covariance
    # propagation F P F^T is a 3x3 *scalar* contraction over the block
    # grid — a handful of fused scaled adds instead of two n_states
    # matmuls per scan step (the step is latency-bound on TPU)
    dt = config.dt
    Fc = jnp.asarray(
        [[1.0, dt, dt * dt / 2.0], [0.0, 1.0, dt], [0.0, 0.0, 1.0]], dtype
    )

    def fpft(P):
        Pb = P.reshape(3, n_pose, 3, n_pose)
        return jnp.einsum("ab,bicj,dc->aidj", Fc, Pb, Fc).reshape(
            n_states, n_states
        )

    if hj_fn is None:
        _jac = jax.jacfwd(lambda p: h_fn(p).reshape(-1))
        hj_fn = lambda p: (h_fn(p).reshape(-1), _jac(p))  # noqa: E731

    def step(carry, inp):
        x, P = carry
        z, lik = inp  # (C, L, 2), (C, L)

        # predict
        x_pred = predict_next_state(x, config.dt, n_pose)
        P_pred = fpft(P) + Q

        # measure (H = [Hp | 0] is never materialized — every product
        # below factors through the pose block)
        pose = x_pred[:n_pose]
        h, Hp = hj_fn(pose)  # (m,), (m, n_pose)

        trusted = jnp.repeat((lik > config.dlc_thresh).reshape(-1), 2)
        sigma = jnp.where(trusted, config.meas_std_px, config.max_pixel_err)
        Rdiag = sigma**2

        residual = z.reshape(-1) - h
        missing = jnp.isnan(residual)
        residual = jnp.where(missing, 0.0, residual)
        Rdiag = jnp.where(missing, config.max_pixel_err**2, Rdiag)

        # 3-sigma gating per (x, y) pair (:817-823) — needs only diag(S):
        # S = H P H^T + R and H = [Hp | 0], so diag(S) touches the
        # pose-pose covariance block only
        Ppp = P_pred[:n_pose, :n_pose]
        diagS = jnp.einsum("mi,ij,mj->m", Hp, Ppp, Hp) + Rdiag
        gate = config.sigma_bound * jnp.sqrt(diagS)
        over = jnp.abs(residual) > gate
        pair_over = over.reshape(-1, 2).any(axis=1)
        gated = jnp.repeat(pair_over, 2)
        residual = jnp.where(gated, 0.0, residual)
        n_outliers = pair_over.sum()

        # Pose-block conditioning update (identical math to the optimal
        # K = P H^T S^-1 gain for diagonal R): H = [Hp | 0] observes
        # ONLY the pose marginal, so the Kalman update is exact Gaussian
        # conditioning — update the n_pose-sized pose marginal in
        # information form, then propagate to the full state through the
        # prior regression of x on pose:
        #   Gp = Hp^T R^-1 Hp,   b = Hp^T R^-1 r        (pose info)
        #   Ci = (Ppp^-1 + Gp)^-1                       (posterior pose cov)
        #   Lam = P_pred[:, :n_pose] Ppp^-1             (regression, 3n x n)
        #   x_est = x_pred + Lam (Ci b)
        #   P_est = (P_pred - Lam U^T) + Lam Ci Lam^T   (U = P_pred[:, :pose])
        # Stability: Ci comes out of the Cholesky inverse as a PSD
        # product (CiL^T CiL) and both covariance terms are PSD (the
        # first is the conditional covariance of x given pose), so this
        # inherits Joseph-form robustness in float32 — unlike the
        # symbolic Joseph expansion P + U(Gs Ppp Gs + Gr - 2Gs)U^T,
        # whose Gs = (I - Gp Ci) Gp cancels catastrophically for
        # strongly-observed poses (measured: f32 diverged from f64).
        # Every inverse is n_pose-sized: two 25x25 trace-time-unrolled
        # Choleskys replace the previous two 75x75 information-form ones
        # (27x fewer inverse FLOPs, 3x less sequential unroll depth in
        # the latency-bound scan).
        Rinv = 1.0 / Rdiag
        b = Hp.T @ (Rinv * residual)  # (n_pose,)
        Gp = jnp.einsum("mi,m,mj->ij", Hp, Rinv, Hp)
        U = P_pred[:, :n_pose]  # (n_states, n_pose)
        _Lp, PiL = _chol_inv_unrolled(Ppp)
        Ppp_inv = PiL.T @ PiL
        _Lm, CiL = _chol_inv_unrolled(Ppp_inv + Gp)
        Ci = CiL.T @ CiL
        Lam = U @ Ppp_inv  # (n_states, n_pose)
        x_est = x_pred + Lam @ (Ci @ b)
        P_est = P_pred - Lam @ U.T + Lam @ Ci @ Lam.T
        P_est = 0.5 * (P_est + P_est.T)

        return (x_est, P_est), (x_est, P_est, n_outliers)

    (_, _), (x_est_h, P_est_h, outliers) = jax.lax.scan(
        step, (x0, P0), (pixels, likelihood)
    )

    # Predicted quantities for the smoother, recomputed in ONE batched
    # pass from the filtered history (bit-identical to the in-scan
    # values: same ops on the same inputs) instead of stacked by the
    # scan — the stacked (N, n, n) pred arrays were half the working
    # set, and memory is the binding constraint when vmapping over runs
    # (B=96/N=600 RESOURCE_EXHAUSTed a 16 GB chip).
    x_pred_next = jax.vmap(
        lambda xe: predict_next_state(xe, config.dt, n_pose)
    )(x_est_h[:-1])  # (N-1, n)
    P_pred_next = jax.vmap(fpft)(P_est_h[:-1]) + Q  # (N-1, n, n)

    # RTS smoother (:839-845): the backward recursion
    #   xs_n = c_n + A_n xs_{n+1},  Ps_n = D_n + A_n Ps_{n+1} A_n^T
    # with all smoother gains A_n from ONE batched BLOCKED Cholesky
    # inverse (native linalg kernels are slow sequential loops on TPU;
    # the column-unrolled form's full-matrix scatters were 49% of the
    # EKF program's device time at this batch size — see
    # _chol_inv_blocked3).
    _Lc, Linv = _chol_inv_blocked3(P_pred_next, n_pose)
    P_pred_inv = jnp.swapaxes(Linv, -1, -2) @ Linv
    # One Newton/Schulz refinement X <- X + X(I - P X): the blocked
    # factorization's f32 reassociation on TPU degraded the smoothed
    # marker error 25.3 -> 28.8 mm (docs/r04/probe_ekf_n100*.txt, the
    # column-unrolled form vs blocked); the refinement squares the
    # inverse's residual (back under f32 roundoff whatever its source —
    # MXU rounding, Schur-complement cancellation) for two extra batched
    # (3p, 3p) matmuls, negligible next to the smoother recursion
    # (VERDICT r4 item 1). Correction computed separately (X@R, not
    # X(2I-PX)) so the small term isn't absorbed by the large one.
    Rres = jnp.eye(n_states, dtype=dtype) - P_pred_next @ P_pred_inv
    P_pred_inv = P_pred_inv + P_pred_inv @ Rres
    P_pred_inv = 0.5 * (P_pred_inv + jnp.swapaxes(P_pred_inv, -1, -2))
    A = P_est_h[:-1] @ F.T @ P_pred_inv  # smoother gains, all n at once
    c = x_est_h[:-1] - jnp.einsum("nij,nj->ni", A, x_pred_next)
    D = P_est_h[:-1] - A @ P_pred_next @ jnp.swapaxes(A, -1, -2)

    N_frames = x_est_h.shape[0]
    if smoother == "auto":
        smoother = "associative" if N_frames <= 256 else "sequential"
    if smoother == "associative":
        # temporally parallelized: the recursion is an affine map
        # composed n -> n+1 -> ... -> N-1; affine maps form an
        # associative monoid, so `lax.associative_scan` evaluates every
        # suffix composition in log2(N) levels of batched (n, n)
        # matmuls instead of an N-step sequential scan.
        # terminal element: the constant map X -> x_est_{N-1}
        A_all = jnp.concatenate([A, jnp.zeros((1, n_states, n_states), dtype)])
        c_all = jnp.concatenate([c, x_est_h[-1:]])
        D_all = jnp.concatenate([D, P_est_h[-1:]])

        def compose(g, f):
            """(f o g)(x) = f(g(x)): under reverse=True the scan passes
            the *later* suffix element first, so combine(g=later,
            f=earlier) must apply the earlier map last (verified vs a
            sequential fold in tests/test_ekf_oracle.py)."""
            Af, cf, Df = f
            Ag, cg, Dg = g
            return (
                Af @ Ag,
                cf + jnp.einsum("...ij,...j->...i", Af, cg),
                Df + Af @ Dg @ jnp.swapaxes(Af, -1, -2),
            )

        _As, x_smooth, P_smooth = jax.lax.associative_scan(
            compose, (A_all, c_all, D_all), reverse=True
        )
    elif smoother == "sequential":
        # memory-lean N-step reverse scan: two batched (n, n) matmuls
        # per step, no log-level intermediates, and only the pose block
        # of each smoothed covariance is EMITTED (the full matrix rides
        # in the carry) — the long-horizon mode (N=600 at B=96 only
        # fits HBM this way)
        def back(carry, inp):
            xs_next, Ps_next = carry
            A_n, c_n, D_n = inp
            xs = c_n + A_n @ xs_next
            Ps = D_n + A_n @ Ps_next @ A_n.T
            return (xs, Ps), (xs, Ps[:n_pose, :n_pose])

        _c, (xs_rev, Ps_rev) = jax.lax.scan(
            back, (x_est_h[-1], P_est_h[-1]), (A, c, D), reverse=True
        )
        x_smooth = jnp.concatenate([xs_rev, x_est_h[-1:]])
        P_smooth_pose = jnp.concatenate(
            [Ps_rev, P_est_h[-1:, :n_pose, :n_pose]]
        )
    else:
        raise ValueError(f"unknown smoother {smoother!r}")
    if smoother == "associative":
        P_smooth_pose = P_smooth[:, :n_pose, :n_pose]

    v, a = n_pose, 2 * n_pose
    return dict(
        x=x_est_h[:, :v],
        dx=x_est_h[:, v:a],
        ddx=x_est_h[:, a:],
        smoothed_x=x_smooth[:, :v],
        smoothed_dx=x_smooth[:, v:a],
        smoothed_ddx=x_smooth[:, a:],
        P=P_est_h[:, :v, :v],
        smoothed_P=P_smooth_pose,
        outliers=outliers.sum(),
    )
