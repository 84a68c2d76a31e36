"""Robustness: degenerate windows, missing data, minimal rigs."""
import numpy as np
import jax.numpy as jnp
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.ops import camera as cam_ops
from acinoset_tpu.pipeline.ekf import make_h_fn, run_cheetah_ekf
from acinoset_tpu.pipeline.fte import default_config, fte_run
from acinoset_tpu.solvers import trajopt

import synthetic


def test_fte_short_trajectory():
    """N=3 (< third-difference support): model term is empty; damping
    keeps the system solvable and the fit is measurement-driven."""
    cams = synthetic.ring_cameras(n_cams=4)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=3, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=0.5, outlier_frac=0, bad_lik_frac=0, seed=0
    )
    out = fte_run(pixels, likelihood, k, d, r, t, fps=90.0, dlc_thresh=0.5, num_iters=30)
    assert np.isfinite(out["positions"]).all()
    err = np.linalg.norm(out["positions"] - pts3d, axis=-1)
    assert np.nanmean(err) < 0.05


def test_fte_marker_never_seen():
    """A marker below threshold everywhere contributes nothing and the
    solve still succeeds (weights zero)."""
    cams = synthetic.ring_cameras(n_cams=4)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=20, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=1.0, outlier_frac=0, bad_lik_frac=0, seed=1
    )
    li = cheetah.get_markers().index("tail2")
    likelihood[:, :, li] = 0.0
    pixels[:, :, li] = np.nan
    out = fte_run(pixels, likelihood, k, d, r, t, fps=90.0, dlc_thresh=0.5, num_iters=30)
    assert np.isfinite(out["positions"]).all()
    others = [i for i in range(cheetah.N_MARKERS) if i != li]
    err = np.linalg.norm(out["positions"][:, others] - pts3d[:, others], axis=-1)
    assert np.nanmean(err) < 0.05


def test_tri_two_cameras_minimum():
    cams = synthetic.ring_cameras(n_cams=2)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=6, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=0.2, outlier_frac=0, bad_lik_frac=0, seed=2
    )
    pts, seen = cam_ops.triangulate_pairwise_mean(
        jnp.asarray(np.nan_to_num(pixels)), jnp.asarray(likelihood > 0.5),
        k, d, r, t,
    )
    assert np.asarray(seen).all()
    err = np.linalg.norm(np.asarray(pts) - pts3d, axis=-1)
    assert np.nanmedian(err) < 0.03


def test_tri_frame_with_no_detections():
    cams = synthetic.ring_cameras(n_cams=3)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=5, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=0.2, outlier_frac=0, bad_lik_frac=0, seed=2
    )
    likelihood[:, 2, :] = 0.0  # frame 2 invisible everywhere
    pts, seen = cam_ops.triangulate_pairwise_mean(
        jnp.asarray(np.nan_to_num(pixels)), jnp.asarray(likelihood > 0.5), k, d, r, t
    )
    assert not np.asarray(seen)[2].any()
    assert np.isnan(np.asarray(pts)[2]).all()
    assert np.asarray(seen)[[0, 1, 3, 4]].all()


def test_ekf_with_nan_measurements():
    cams = synthetic.ring_cameras(n_cams=3)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=15, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=1.0, outlier_frac=0, bad_lik_frac=0, seed=4
    )
    pixels[0, 5:8] = np.nan  # camera 0 drops out for 3 frames
    likelihood[0, 5:8] = np.nan
    pp = cheetah.get_pose_params()
    x0 = np.zeros(75)
    x0[:3] = X[0, :3]
    x0[pp["psi_0"]] = X[0, pp["psi_0"]]
    states = run_cheetah_ekf(
        pixels.transpose(1, 0, 2, 3), likelihood.transpose(1, 0, 2),
        k, d, r, t, fps=90.0, cam_res=res, dlc_thresh=0.5, x0_pose=x0,
    )
    assert np.isfinite(states["smoothed_x"]).all()


def test_fte_objective_finite_at_limits():
    """Objective stays finite when the trajectory sits exactly on the
    joint limits (penalty boundary)."""
    cfg = default_config(90.0)
    lo = np.asarray(cfg.lo)
    hi = np.asarray(cfg.hi)
    N = 10
    X = np.zeros((N, 25))
    X[:, 3:] = np.where(np.isfinite(hi[3:]), hi[3:], 0.0)
    cams = synthetic.ring_cameras(n_cams=2)
    k, d, r, t, res = cams
    h = make_h_fn(k, d, r, t)
    meas = jnp.zeros((N, 2, 20, 2))
    w = jnp.zeros((N, 2, 20))
    val = trajopt.fte_objective(jnp.asarray(X), h, meas, w, cfg)
    assert np.isfinite(float(val))
