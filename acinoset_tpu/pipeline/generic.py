"""Generic-skeleton FTE — the src/build.py path for arbitrary subjects.

Runs full-trajectory estimation for any skeleton dictionary (humans, new
animals) on the same banded Gauss-Newton solver as the cheetah pipeline.
Mirrors the reference builder's weights (flat model weight 0.002, meas
std R=3, build.py:142,190), its L1 measurement loss (:299, realized as
Huber IRLS), its blanket +-pi/2 joint limits (:263-266), and its
forehead-track linear-regression initialization (:151-165).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.skeleton import (
    SkeletonModel, build_skeleton_model, fk_and_jac_any, generic_pose_limits,
)
from ..ops import camera as cam_ops
from ..solvers import trajopt
from . import data as data_io
from .ekf import nose_track_linreg
from .tri import triangulate_run


def make_h_fn_generic(model: SkeletonModel, k_arr, d_arr, r_arr, t_arr, dtype=jnp.float64):
    k = jnp.asarray(k_arr, dtype)
    d = jnp.asarray(d_arr, dtype).reshape(k.shape[0], -1)[:, :4]
    r = jnp.asarray(r_arr, dtype)
    t = jnp.asarray(t_arr, dtype).reshape(k.shape[0], 3)

    def h(pose):
        pts = model.fk(pose)  # (L, 3)
        return jax.vmap(
            lambda K, D, R, T: cam_ops.project_points_fisheye(pts, K, D, R, T)
        )(k, d, r, t)

    return h


def make_hj_parts_fn_generic(model: SkeletonModel, k_arr, d_arr, r_arr, t_arr,
                             dtype=jnp.float64):
    """Unassembled chain-rule measurement Jacobian for the generic
    skeleton (see trajopt.fte_solve / pipeline.ekf.make_hj_parts_fn):
    FK Jacobian (analytic for tree graphs, jacfwd over FK alone
    otherwise — never through the cameras) + fused analytic projection
    Jacobian. Available for EVERY skeleton."""
    fk_and_jac = fk_and_jac_any(model)
    k = jnp.asarray(k_arr, dtype)
    d = jnp.asarray(d_arr, dtype).reshape(k.shape[0], -1)[:, :4]
    r = jnp.asarray(r_arr, dtype)
    t = jnp.asarray(t_arr, dtype).reshape(k.shape[0], 3)

    def hj_parts(pose):
        pts, Jfk = fk_and_jac(pose)  # (L,3), (L,3,n_pose)
        h, Jp = cam_ops.project_rig_and_jac(pts, k, d, r, t)
        return h.reshape(-1), Jp, Jfk

    return hj_parts


def generic_config(
    model: SkeletonModel,
    fps: float,
    num_iters: int = 60,
    model_err_weight: float = 0.002,
    meas_std_px: float = 3.0,
    huber_delta: float = 3.0,
) -> trajopt.FteConfig:
    """huber_delta: the reference loss is pure L1 (build.py:299); the
    IRLS realization is Huber with this transition point on the
    1/R-scaled residual — smaller approximates L1 more closely (0.3
    reaches a lower reference-objective value than the shipped IPOPT
    fixture; see tests/test_generic_fte.py)."""
    lo, hi = generic_pose_limits(model)
    # model_err_weight = 1/Q -> Q = 1/w (build.py:186-190); states that
    # never touch the FK keep a tiny weight so the banded system stays PD
    q = np.full(model.n_pose, 1.0 / model_err_weight)
    return trajopt.FteConfig(
        Ts=1.0 / fps,
        q_var=tuple(q),
        lo=tuple(lo),
        hi=tuple(hi),
        meas_std_px=meas_std_px,
        redesc=(huber_delta, 10.0, 20.0),
        meas_loss="l1",
        num_iters=num_iters,
    )


def fte_generic_run(
    skel_dict: Dict,
    pixels: np.ndarray,  # (C, N, L, 2) in skeleton marker order
    likelihood: np.ndarray,  # (C, N, L)
    k_arr, d_arr, r_arr, t_arr,
    fps: float,
    dlc_thresh: float = 0.4,
    init_marker: str = "forehead",
    num_iters: int = 60,
    exclude_markers=("neck",),
    dtype=jnp.float64,
    compat: str = "tpu",
    huber_delta: float = 3.0,
) -> Dict:
    """Solve one generic-skeleton trajectory.

    exclude_markers: measurement weights zeroed for these (build.py
    skips the synthetic 'neck' marker, :121-129).
    compat="reference" uses the bit-faithful reference FK semantics
    (see models.skeleton) for regression against shipped fixtures.
    """
    model = build_skeleton_model(skel_dict, compat=compat)
    C, N, L, _ = pixels.shape
    assert L == model.n_markers, (L, model.n_markers)
    cfg = generic_config(model, fps, num_iters=num_iters, huber_delta=huber_delta)

    # init from triangulated init_marker track
    valid = np.nan_to_num(likelihood, nan=-1.0) > dlc_thresh
    tri_pos = triangulate_run(np.nan_to_num(pixels), valid, k_arr, d_arr, r_arr, t_arr)
    mi = model.markers.index(init_marker)
    frames = np.arange(N)
    xs, xi, ys, yi, zs, zi = nose_track_linreg(tri_pos, frames, mi)
    X0 = np.zeros((N, model.n_pose))
    f = frames.astype(np.float64)
    X0[:, 0] = f * xs + xi
    X0[:, 1] = f * ys + yi
    X0[:, 2] = f * zs + zi

    h_fn = make_h_fn_generic(model, k_arr, d_arr, r_arr, t_arr, dtype)
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3), dtype)
    lik = np.nan_to_num(likelihood.transpose(1, 0, 2), nan=-1.0)
    w = (lik > dlc_thresh).astype(np.float64) / cfg.meas_std_px
    for m in exclude_markers or ():
        if m in model.markers:
            w[:, :, model.markers.index(m)] = 0.0

    hj_parts = make_hj_parts_fn_generic(model, k_arr, d_arr, r_arr, t_arr, dtype)
    X, info = jax.jit(
        lambda a, b, c: trajopt.fte_solve(h_fn, a, b, c, cfg, hj_parts_fn=hj_parts)
    )(jnp.asarray(X0, dtype), meas, jnp.asarray(w, dtype))

    positions = np.asarray(jax.vmap(model.fk)(X))
    dx, ddx = trajopt.derivatives_from_trajectory(X, cfg.Ts)
    return dict(
        positions=positions,
        x=np.asarray(X),
        dx=np.asarray(dx),
        ddx=np.asarray(ddx),
        markers=model.markers,
        cost=float(info["cost"]),
        cost0=float(info["cost0"]),
        # solver status (parity with the batched paths and the
        # reference's IPOPT termination-status surfacing, SURVEY §5)
        converged=bool(info["converged"]),
        grad_norm=float(info["grad_norm"]),
    )


def build_and_solve(
    skeleton_fpath: str,
    project_dir: str,
    start_frame: int = 60,
    n_frames: int = 100,
    fps: float = 120.0,
    dlc_thresh: float = 0.4,
    out_fpath: Optional[str] = None,
    num_iters: int = 60,
) -> Dict:
    """File-driven twin of src/build.py __main__ (:483-497): loads the
    skeleton pickle, the 4_cam_scene_static_sba.json scene and the DLC
    .h5 files under <project_dir>/data, solves, saves traj_results.pickle."""
    import os
    from glob import glob

    skel = data_io.load_skeleton(skeleton_fpath)
    model = build_skeleton_model(skel)
    scene_path = os.path.join(project_dir, "data", "4_cam_scene_static_sba.json")
    k_arr, d_arr, r_arr, t_arr, _res = data_io.load_scene(scene_path)
    fpaths = sorted(glob(os.path.join(project_dir, "data", "*.h5")))
    p2d = data_io.load_dlc_points(fpaths, markers=model.markers)
    win = p2d.window(start_frame, start_frame + n_frames)
    result = fte_generic_run(
        skel, win.pixels, win.likelihood, k_arr, d_arr.reshape(-1, 4), r_arr, t_arr,
        fps=fps, dlc_thresh=dlc_thresh, num_iters=num_iters,
    )
    out_fpath = out_fpath or os.path.join(project_dir, "data", "results", "traj_results.pickle")
    data_io.save_pickle(
        out_fpath,
        dict(
            positions=result["positions"], x=result["x"], dx=result["dx"],
            ddx=result["ddx"],
            # metadata beyond the reference schema (build.py:344-378):
            # lets `cli eval` align GT windows/markers by name
            markers=result["markers"], start_frame=start_frame,
            scene_fpath=scene_path,
            converged=result["converged"], grad_norm=result["grad_norm"],
        ),
    )
    return result
