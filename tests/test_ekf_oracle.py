"""EKF scan vs a straightforward NumPy oracle of the reference equations.

The oracle implements the documented filter loop (SURVEY.md §2.2.2 /
src/all_optimizations.py:781-845) in plain NumPy — predict, covariance
propagation, stacked measurement, 3-sigma pair gating, inv-based update,
RTS backward pass — sharing the measurement function/Jacobian with the
scan implementation so the comparison isolates the filter wiring.
"""
import jax
import jax.numpy as jnp
import numpy as np

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline.ekf import make_h_fn
from acinoset_tpu.solvers import ekf as ekf_solver

import synthetic


def numpy_ekf_oracle(h_fn, jac_fn, pixels, likelihood, x0, P0, qb, cfg):
    N, C, L, _ = pixels.shape
    n_pose = x0.shape[0] // 3
    n_states = 3 * n_pose
    F = np.asarray(ekf_solver.constant_acc_F(n_pose, cfg.dt))
    Q = ekf_solver.constant_acc_Q(qb, cfg.dt)
    x = x0.copy()
    P = P0.copy()
    xs_pred, Ps_pred, xs_est, Ps_est = [], [], [], []
    for i in range(N):
        x = np.asarray(ekf_solver.predict_next_state(jnp.asarray(x), cfg.dt, n_pose))
        P = F @ P @ F.T + Q
        xs_pred.append(x.copy())
        Ps_pred.append(P.copy())

        z = pixels[i].reshape(-1)
        lik = likelihood[i].reshape(-1)
        h = np.asarray(h_fn(jnp.asarray(x[:n_pose]))).reshape(-1)
        Hp = np.asarray(jac_fn(jnp.asarray(x[:n_pose])))
        H = np.concatenate([Hp, np.zeros((len(z), n_states - n_pose))], axis=1)
        sigma = np.where(np.repeat(lik > cfg.dlc_thresh, 2), cfg.meas_std_px, cfg.max_pixel_err)
        R = np.diag(sigma**2)
        residual = z - h
        S = H @ P @ H.T + R
        gate = cfg.sigma_bound * np.sqrt(np.diag(S))
        for j in range(0, len(residual), 2):
            if abs(residual[j]) > gate[j] or abs(residual[j + 1]) > gate[j + 1]:
                residual[j : j + 2] = 0
        K = P @ H.T @ np.linalg.inv(S)
        x = x + K @ residual
        P = (np.eye(n_states) - K @ H) @ P
        xs_est.append(x.copy())
        Ps_est.append(P.copy())

    xs_s = [x.copy() for x in xs_est]
    for i in range(N - 2, -1, -1):
        A = Ps_est[i] @ F.T @ np.linalg.inv(Ps_pred[i + 1])
        xs_s[i] = xs_est[i] + A @ (xs_s[i + 1] - xs_pred[i + 1])
    return np.stack(xs_est), np.stack(xs_s)


def test_ekf_scan_matches_numpy_oracle():
    cams = synthetic.ring_cameras(n_cams=3)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=12, fps=90.0)
    pixels, likelihood, _ = synthetic.render_measurements(
        X, cams, noise_px=1.0, outlier_frac=0.05, bad_lik_frac=0.05, seed=6
    )
    pix = pixels.transpose(1, 0, 2, 3)
    lik = likelihood.transpose(1, 0, 2)
    n_pose = cheetah.N_ACTIVE
    cfg = ekf_solver.EkfConfig(dt=1 / 90.0, dlc_thresh=0.5, max_pixel_err=float(res[0]))
    x0 = np.zeros(3 * n_pose)
    x0[:3] = X[0, :3]
    x0[5] = X[0, 5]
    P0 = np.eye(3 * n_pose) * 0.5
    qb = cheetah.EKF_QB

    h_fn = make_h_fn(k, d, r, t)
    jac_fn = jax.jacfwd(lambda p: h_fn(p).reshape(-1))

    ours = ekf_solver.run_ekf(
        h_fn, jnp.asarray(pix), jnp.asarray(lik), jnp.asarray(x0), jnp.asarray(P0), qb, cfg
    )
    x_est_ref, x_smooth_ref = numpy_ekf_oracle(h_fn, jac_fn, pix, lik, x0, P0, qb, cfg)

    x_est_ours = np.concatenate([ours["x"], ours["dx"], ours["ddx"]], axis=1)
    np.testing.assert_allclose(x_est_ours, x_est_ref, atol=1e-7)
    x_s_ours = np.concatenate(
        [ours["smoothed_x"], ours["smoothed_dx"], ours["smoothed_ddx"]], axis=1
    )
    np.testing.assert_allclose(x_s_ours, x_smooth_ref, atol=1e-6)
