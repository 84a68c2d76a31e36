"""EKF + RTS smoother on synthetic cheetah data."""
import numpy as np
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline.ekf import run_cheetah_ekf

import synthetic


@pytest.fixture(scope="module")
def synth():
    cams = synthetic.ring_cameras(n_cams=4)
    X = synthetic.cheetah_gallop(N=50, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=1.0, outlier_frac=0.01, bad_lik_frac=0.02, seed=1
    )
    return cams, X, pixels, likelihood, pts3d


def test_ekf_tracks_synthetic_run(synth):
    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    pp = cheetah.get_pose_params()
    x0 = np.zeros(3 * cheetah.N_ACTIVE)
    # init near truth for position/heading (the pipeline computes this
    # from the triangulated nose track)
    x0[pp["x_0"]] = X_true[0, pp["x_0"]]
    x0[pp["y_0"]] = X_true[0, pp["y_0"]]
    x0[pp["psi_0"]] = X_true[0, pp["psi_0"]]
    x0[cheetah.N_ACTIVE + pp["x_0"]] = 8.0  # approx forward speed

    states = run_cheetah_ekf(
        pixels.transpose(1, 0, 2, 3), likelihood.transpose(1, 0, 2),
        k_arr, d_arr, r_arr, t_arr,
        fps=90.0, cam_res=res, dlc_thresh=0.5, x0_pose=x0,
    )
    assert states["x"].shape == (50, 25)
    # after settling, filtered root position should track within ~10 cm
    err_root = np.linalg.norm(states["x"][20:, :3] - X_true[20:, :3], axis=1)
    assert err_root.mean() < 0.05, err_root.mean()
    err_s = np.linalg.norm(states["smoothed_x"][20:, :3] - X_true[20:, :3], axis=1)
    assert err_s.mean() < 0.05, err_s.mean()
    # marker-space error small (cm scale)
    import jax, jax.numpy as jnp

    mk = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(states["smoothed_x"])))
    mk_err = np.linalg.norm(mk[20:] - np.asarray(
        jax.vmap(cheetah.fk25)(jnp.asarray(X_true))
    )[20:], axis=-1)
    # tight pin (measured 0.0452 on this fixture): the r4 blocked-
    # smoother rewrite silently regressed the TPU smoothed error 14%
    # under a 0.10 bound — keep <=10% headroom so a repeat fails here
    assert np.nanmean(mk_err) < 0.050, np.nanmean(mk_err)


def test_ekf_f32_matches_f64(synth):
    """The sweep path runs the EKF in float32 (information-form update
    with clamped unrolled-Cholesky pivots) — regression-check it against
    the f64 run the oracle test validates (ADVICE r2)."""
    import jax.numpy as jnp

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    pp = cheetah.get_pose_params()
    x0 = np.zeros(3 * cheetah.N_ACTIVE)
    x0[pp["x_0"]] = X_true[0, pp["x_0"]]
    x0[pp["y_0"]] = X_true[0, pp["y_0"]]
    x0[pp["psi_0"]] = X_true[0, pp["psi_0"]]
    x0[cheetah.N_ACTIVE + pp["x_0"]] = 8.0

    kwargs = dict(fps=90.0, cam_res=res, dlc_thresh=0.5, x0_pose=x0)
    s64 = run_cheetah_ekf(
        pixels.transpose(1, 0, 2, 3), likelihood.transpose(1, 0, 2),
        k_arr, d_arr, r_arr, t_arr, dtype=jnp.float64, **kwargs,
    )
    s32 = run_cheetah_ekf(
        pixels.transpose(1, 0, 2, 3), likelihood.transpose(1, 0, 2),
        k_arr, d_arr, r_arr, t_arr, dtype=jnp.float32, **kwargs,
    )
    # filters amplify rounding on weakly-observed angles (measured max
    # state gap ~0.13 rad on a tail angle), so the guard is the
    # product-level metric: FK marker positions must agree to mm scale,
    # states loosely — a clamped-pivot degradation would blow both up
    import jax, jax.numpy as jnp2

    mk_true = np.asarray(jax.vmap(cheetah.fk25)(jnp2.asarray(X_true)))
    for key in ("x", "smoothed_x"):
        diff = np.abs(s32[key].astype(np.float64) - s64[key])
        assert diff.max() < 0.3, (key, diff.max())
        assert diff.mean() < 0.02, (key, diff.mean())
        mk32 = np.asarray(jax.vmap(cheetah.fk25)(jnp2.asarray(s32[key], jnp2.float64)))
        mk64 = np.asarray(jax.vmap(cheetah.fk25)(jnp2.asarray(s64[key])))
        mk_gap = np.linalg.norm(mk32 - mk64, axis=-1)
        assert mk_gap.mean() < 1e-2, (key, mk_gap.mean())
        # the fast (f32) path must not be the less accurate one: its
        # error vs truth may beat f64 (filter chaos) but never exceed
        # it by >5% — the guard VERDICT r4 item 1 asked for (the r4
        # blocked smoother shipped a 14% TPU-only regression under the
        # old product-level bound)
        e32 = np.nanmean(np.linalg.norm(mk32[20:] - mk_true[20:], axis=-1))
        e64 = np.nanmean(np.linalg.norm(mk64[20:] - mk_true[20:], axis=-1))
        assert e32 < 1.05 * e64, (key, e32, e64)


def test_ekf_sequential_smoother_matches_associative(synth):
    """The memory-lean long-horizon smoother (reverse lax.scan) must be
    numerically equal to the associative-scan form — same recursion,
    different evaluation order (the associative form RESOURCE_EXHAUSTs
    a 16 GB chip at B=96/N=600, solvers/ekf.py)."""
    import jax.numpy as jnp

    from acinoset_tpu.pipeline.ekf import make_h_fn
    from acinoset_tpu.solvers import ekf as ekf_solver

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    n_pose = cheetah.N_ACTIVE
    cfg = ekf_solver.EkfConfig(
        dt=1 / 90.0, dlc_thresh=0.5, max_pixel_err=float(res[0])
    )
    x0 = np.zeros(3 * n_pose)
    x0[:3] = X_true[0, :3]
    P0 = np.eye(3 * n_pose) * 0.5
    h_fn = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    args = (
        h_fn, jnp.asarray(pixels.transpose(1, 0, 2, 3)),
        jnp.asarray(likelihood.transpose(1, 0, 2)),
        jnp.asarray(x0), jnp.asarray(P0), cheetah.EKF_QB, cfg,
    )
    s_assoc = ekf_solver.run_ekf(*args, smoother="associative")
    s_seq = ekf_solver.run_ekf(*args, smoother="sequential")
    for key in ("smoothed_x", "smoothed_dx", "smoothed_ddx"):
        np.testing.assert_allclose(
            np.asarray(s_seq[key]), np.asarray(s_assoc[key]),
            rtol=1e-8, atol=1e-9,
        )
    np.testing.assert_allclose(
        np.asarray(s_seq["smoothed_P"]), np.asarray(s_assoc["smoothed_P"]),
        rtol=1e-6, atol=1e-9,
    )


def test_ekf_constant_acc_blocks():
    from acinoset_tpu.solvers import ekf as ekf_solver

    F = np.asarray(ekf_solver.constant_acc_F(3, 0.1))
    assert F.shape == (9, 9)
    np.testing.assert_allclose(F[0, 3], 0.1)
    np.testing.assert_allclose(F[0, 6], 0.005)
    np.testing.assert_allclose(F[3, 6], 0.1)
    # prediction follows the reference formula (:624-631), which applies
    # dt*vel_NEW and therefore carries 1.5*dt^2*acc on the position —
    # deliberately different from F's 0.5*dt^2 (as in the reference).
    x = np.arange(9.0)
    x_pred = np.asarray(ekf_solver.predict_next_state(x, 0.1, 3))
    pos, vel, acc = x[:3], x[3:6], x[6:]
    np.testing.assert_allclose(x_pred[3:6], vel + 0.1 * acc, atol=1e-12)
    np.testing.assert_allclose(pos + 0.1 * (vel + 0.1 * acc) + 0.005 * acc, x_pred[:3], atol=1e-12)
    Q = ekf_solver.constant_acc_Q(np.ones(3) * 2.0, 0.1)
    assert Q.shape == (9, 9)
    # Q is PSD
    w = np.linalg.eigvalsh(Q)
    assert w.min() > -1e-12


def test_ekf_marker_std_from_smoothed(synth):
    """EKF-stage error bars: J_fk Sigma J_fk^T from the RTS-smoothed
    covariance — positive, finite, and mm-to-dm scale on the synthetic
    run (the smoother's covariance reflects the Q/R model, looser than
    the FTE posterior)."""
    from acinoset_tpu.pipeline.ekf import marker_std_from_smoothed, run_cheetah_ekf

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    states = run_cheetah_ekf(
        pixels.transpose(1, 0, 2, 3), likelihood.transpose(1, 0, 2),
        k_arr, d_arr, r_arr, t_arr, 90.0, res, 0.5,
    )
    std = marker_std_from_smoothed(states["smoothed_x"], states["smoothed_P"])
    N = std.shape[0]
    assert std.shape == (N, cheetah.N_MARKERS, 3)
    assert np.all(np.isfinite(std)) and std.min() > 0
    assert 5e-4 < np.median(std) < 0.3, np.median(std)
    # identity-covariance sanity: std reduces to sqrt(diag(J J^T))
    import jax.numpy as jnp
    x = states["smoothed_x"][0]
    _pts, J = cheetah.fk25_and_jac(jnp.asarray(x))
    expect = np.sqrt(np.einsum("lxa,lxa->lx", np.asarray(J), np.asarray(J)))
    got = marker_std_from_smoothed(
        x[None], np.eye(3 * cheetah.N_ACTIVE)[None]
    )[0]
    np.testing.assert_allclose(got, expect, rtol=1e-6)
