"""EKF pipeline — cheetah state-space smoothing over a run.

Rebuild of the reference `ekf()` entry point
(AcinoSet src/all_optimizations.py:569-865) on top of
`solvers.ekf.run_ekf` (a lax.scan program with exact autodiff
Jacobians). Initialization mirrors the reference: linear regression of
the triangulated nose track fixes the initial planar position, velocity
and heading (:699-711); initial covariance and process noise use the
reference's constants (:713-754).
"""
from __future__ import annotations

import os
from glob import glob
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cheetah
from ..ops import camera as cam_ops
from ..solvers import ekf as ekf_solver
from . import app
from . import data as data_io
from .tri import triangulate_run


def nose_track_linreg(positions: np.ndarray, frames: np.ndarray, marker_idx: int):
    """Linear regression of a marker's triangulated track over frame index.

    Returns (x_slope, x_int, y_slope, y_int, z_slope, z_int) with NaN
    frames ignored (reference used scipy.stats.linregress, :701-707).
    """
    track = positions[:, marker_idx]  # (N, 3)
    ok = np.isfinite(track).all(axis=1)
    f = frames[ok].astype(np.float64)
    out = []
    for d in range(3):
        y = track[ok, d]
        if len(f) < 2:
            out.extend([0.0, float(np.nanmean(y)) if len(y) else 0.0])
            continue
        slope, intercept = np.polyfit(f, y, 1)
        out.extend([float(slope), float(intercept)])
    return tuple(out)


def make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype=jnp.float64):
    """pose25 -> (C, L, 2) predicted pixels through FK + fisheye projection."""
    k = jnp.asarray(k_arr, dtype)
    d = jnp.asarray(d_arr, dtype).reshape(k.shape[0], -1)[:, :4]
    r = jnp.asarray(r_arr, dtype)
    t = jnp.asarray(t_arr, dtype).reshape(k.shape[0], 3)

    def h(pose25):
        pts = cheetah.fk25(pose25)  # (L, 3)
        return jax.vmap(
            lambda K, D, R, T: cam_ops.project_points_fisheye(pts, K, D, R, T)
        )(k, d, r, t)

    return h


def make_hj_fn(k_arr, d_arr, r_arr, t_arr, dtype=jnp.float64):
    """Fused (pixels, Jacobian) for one pose, via the chain rule.

    J = J_proj(points) @ J_fk(pose): the FK Jacobian is analytic
    (cheetah.fk25_and_jac) and the projection Jacobian is the fused
    closed form (ops.camera.project_points_fisheye_and_jac) — no tangent
    ever flows through the camera model. Returns (h (C*L*2,),
    J (C*L*2, 25)) for `trajopt.fte_solve(hj_fn=...)` and
    `solvers.ekf.run_ekf(hj_fn=...)`.
    """
    C = np.asarray(k_arr).shape[0]
    L = cheetah.N_MARKERS
    parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)

    def hj(pose25):
        h, Jp, Jfk = parts(pose25)
        J = jnp.einsum("clij,ljk->clik", Jp, Jfk)  # (C, L, 2, 25)
        return h, J.reshape(C * L * 2, -1)

    return hj


def hj_parts_aux(pose25, aux):
    """Aux-parameterized twin of make_hj_parts_fn for batched rigs:
    ``aux = (K, D, R, T)`` rides along as traced per-trajectory camera
    parameters (pipeline.sweep vmaps over it). Returns
    (h (C*L*2,), Jp (C, L, 2, 3), Jfk (L, 3, 25))."""
    K, D, R, T = aux
    D = D.reshape(K.shape[0], -1)[:, :4]  # same d-normalization as make_hj_parts_fn
    pts, Jfk = cheetah.fk25_and_jac(pose25)
    h, Jp = cam_ops.project_rig_and_jac(pts, K, D, R, T)  # (C,L,2), (C,L,2,3)
    return h.reshape(-1), Jp, Jfk


def make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype=jnp.float64):
    """Chain-rule measurement Jacobian, *unassembled*, for
    `trajopt.fte_solve(hj_parts_fn=...)`.

    Returns x -> (h (C*L*2,), Jp (C, L, 2, 3), Jfk (L, 3, 25)) so the
    full J = Jp @ Jfk is never materialized — the FTE assembles the GN
    normal equations directly from the two factors (H = Jfk^T A Jfk with
    (3, 3) per-marker cores), cutting the measurement stage's HBM
    traffic ~8x versus carrying J (m, 25) per frame.
    """
    k = jnp.asarray(k_arr, dtype)
    d = jnp.asarray(d_arr, dtype).reshape(k.shape[0], -1)[:, :4]
    r = jnp.asarray(r_arr, dtype)
    t = jnp.asarray(t_arr, dtype).reshape(k.shape[0], 3)

    fk_and_jac = cheetah.fk25_and_jac  # analytic geometric Jacobian

    def hj_parts(pose25):
        pts, Jfk = fk_and_jac(pose25)  # (L,3), (L,3,25)
        # Fused analytic projection Jacobian: one elementwise pass yields
        # every per-point (2, 3) block (project_points_fisheye_and_jac,
        # parity with jacfwd at machine precision) — supersedes the
        # earlier 3-linearized-pass scheme (1 forward + 3 jvp passes).
        h, Jp = cam_ops.project_rig_and_jac(pts, k, d, r, t)  # (C,L,2),(C,L,2,3)
        return h.reshape(-1), Jp, Jfk

    return hj_parts


def make_marker_std_fn(fk_and_jac, n_pose):
    """Per-frame per-marker 1-sigma error bars from a smoothed state
    covariance: ``one(x (n_pose*3?,...), Pf (S, S)) -> (L, 3)`` std in
    meters via J_fk Sigma_pose J_fk^T at the smoothed pose. The single
    shared core behind the single-run EKF stage, the batched sweep
    stages, and their generic twins — the EKF-stage twin of the FTE's
    Laplace posterior (trajopt.fte_solve compute_cov)."""

    def one(x, Pf):
        _pts, J = fk_and_jac(x)  # J: (L, 3, n_pose)
        S = Pf[:n_pose, :n_pose]
        mc = jnp.einsum("lxa,ab,lyb->lxy", J, S, J)
        return jnp.sqrt(jnp.clip(jnp.diagonal(mc, axis1=-2, axis2=-1), 0.0, None))

    return one


_MARKER_STD_JIT = None


def marker_std_from_smoothed(smoothed_x, smoothed_P) -> np.ndarray:
    """Per-marker 1-sigma position error bars (N, L, 3) in meters from
    the RTS-smoothed state covariance (see make_marker_std_fn)."""
    global _MARKER_STD_JIT
    if _MARKER_STD_JIT is None:  # one stable jitted program per process
        _MARKER_STD_JIT = jax.jit(jax.vmap(
            make_marker_std_fn(cheetah.fk25_and_jac, cheetah.N_ACTIVE)
        ))
    return np.asarray(
        _MARKER_STD_JIT(jnp.asarray(smoothed_x), jnp.asarray(smoothed_P))
    )


def run_cheetah_ekf(
    pixels: np.ndarray,  # (N, C, L, 2)
    likelihood: np.ndarray,  # (N, C, L)
    k_arr, d_arr, r_arr, t_arr,
    fps: float,
    cam_res,
    dlc_thresh: float,
    x0_pose: Optional[np.ndarray] = None,
    dtype=jnp.float64,
) -> Dict:
    """Functional core: run EKF + RTS over one window. Returns states dict."""
    n_pose = cheetah.N_ACTIVE
    cfg = ekf_solver.EkfConfig(
        dt=1.0 / fps,
        dlc_thresh=dlc_thresh,
        meas_std_px=cheetah.MEAS_STD_PX,
        max_pixel_err=float(cam_res[0]),
    )
    # initial covariance (:713-731)
    p_lin_pos = np.ones(3) * 3**2
    p_ang_pos = np.ones(n_pose - 3) * (np.pi / 4) ** 2
    p_lin_vel = np.ones(3) * 5**2
    p_ang_vel = np.ones(n_pose - 3) * 3**2
    p_lin_acc = np.ones(3) * 3**2
    p_ang_acc = np.ones(n_pose - 3) * 3**2
    p_ang_acc[10:] = 5**2
    P0 = np.diag(
        np.concatenate([p_lin_pos, p_ang_pos, p_lin_vel, p_ang_vel, p_lin_acc, p_ang_acc])
    )

    x0 = np.zeros(3 * n_pose)
    if x0_pose is not None:
        x0[: len(x0_pose)] = np.asarray(x0_pose).reshape(-1)[: 3 * n_pose]

    h_fn = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    out = ekf_solver.run_ekf(
        h_fn,
        jnp.asarray(pixels, dtype),
        jnp.asarray(np.nan_to_num(likelihood, nan=-1.0), dtype),
        jnp.asarray(x0, dtype),
        jnp.asarray(P0, dtype),
        cheetah.EKF_QB,
        cfg,
        hj_fn=make_hj_fn(k_arr, d_arr, r_arr, t_arr, dtype),
    )
    return {k: np.asarray(v) for k, v in out.items()}


def ekf(
    data_dir: str,
    start_frame: int,
    end_frame: int,
    dlc_thresh: float,
    out_dir: Optional[str] = None,
    save: bool = True,
) -> Dict:
    """CLI-contract entry point (1-based start_frame like the reference)."""
    out_dir = out_dir or os.path.join(data_dir, "ekf")
    dlc_dir = os.path.join(data_dir, "dlc")
    assert os.path.exists(dlc_dir)

    k_arr, d_arr, r_arr, t_arr, cam_res, n_cams, scene_fpath = data_io.find_scene_file(
        data_dir, verbose=False
    )
    _res, fps, tot_frames, _ = app.get_vid_info(data_dir)
    if end_frame == -1:
        end_frame = tot_frames
    start0 = start_frame - 1

    fpaths = sorted(glob(os.path.join(dlc_dir, "*.h5")))
    assert len(fpaths) == n_cams
    markers = cheetah.get_markers()
    p2d = data_io.load_dlc_points(fpaths, markers=markers)
    win = p2d.window(start0, end_frame)

    # init from triangulated nose track (:699-711)
    tri_pos = triangulate_run(
        np.nan_to_num(win.pixels), win.valid(dlc_thresh), k_arr, d_arr, r_arr, t_arr
    )
    xi = cheetah.get_pose_params()
    x0_pose = np.zeros(cheetah.N_ACTIVE * 3)
    nose = markers.index("nose")
    xs, xi_, ys, yi_, _zs, _zi = nose_track_linreg(tri_pos, win.frames, nose)
    sT = 1.0 / fps
    x0_pose[xi["x_0"]] = start0 * xs + xi_
    x0_pose[xi["y_0"]] = start0 * ys + yi_
    x0_pose[xi["psi_0"]] = np.arctan2(ys, xs)
    v = cheetah.N_ACTIVE
    x0_pose[v + xi["x_0"]] = xs / sT
    x0_pose[v + xi["y_0"]] = ys / sT

    states = run_cheetah_ekf(
        win.pixels.transpose(1, 0, 2, 3),
        win.likelihood.transpose(1, 0, 2),
        k_arr, d_arr, r_arr, t_arr,
        fps, cam_res, dlc_thresh,
        x0_pose=x0_pose,
    )
    positions = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(states["smoothed_x"])))
    keep = dict(
        x=states["x"], dx=states["dx"], ddx=states["ddx"],
        smoothed_x=states["smoothed_x"], smoothed_dx=states["smoothed_dx"],
        smoothed_ddx=states["smoothed_ddx"],
        # per-marker 1-sigma error bars from the RTS-smoothed covariance
        # (free — P_smooth is already computed); the FTE stage's twin
        # comes from the Laplace posterior (fte --uncertainty)
        marker_std=marker_std_from_smoothed(
            states["smoothed_x"], states["smoothed_P"]
        ),
    )
    print("EKF complete!")
    print("Outliers ignored:", int(states["outliers"]))
    if save:
        os.makedirs(out_dir, exist_ok=True)
        app.save_ekf(keep, out_dir, scene_fpath, start0, dlc_thresh, positions=positions)
        from .plots import plot_cheetah_states

        plot_cheetah_states(
            keep["x"], keep["smoothed_x"], os.path.join(out_dir, "ekf.pdf")
        )
    return dict(positions=positions, states=keep, outliers=int(states["outliers"]))
