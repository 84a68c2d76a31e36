"""FTE pipeline — full-trajectory estimation for the cheetah model.

Rebuild of the reference `fte()` entry point
(AcinoSet src/all_optimizations.py:22-566) on top of
`solvers.trajopt.fte_solve` (banded Gauss-Newton replacing
Pyomo->IPOPT). The measurement weighting, redescending loss constants,
initialization (nose-track linear regression + initial yaw) and output
schema all follow the reference; the solve itself is a fixed-iteration
jit program that `vmap`s across trajectories.
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
from ..solvers import trajopt
from . import app
from . import data as data_io
from .ekf import make_h_fn, make_hj_parts_fn, nose_track_linreg
from .tri import triangulate_run


def default_config(fps: float, num_iters: int = 60) -> trajopt.FteConfig:
    lo, hi = cheetah.pose_limits_25()
    return trajopt.FteConfig(
        Ts=1.0 / fps,
        q_var=tuple(cheetah.Q_VAR[cheetah.ACTIVE_IDX_ORDERED]),
        lo=tuple(lo),
        hi=tuple(hi),
        meas_std_px=cheetah.MEAS_STD_PX,
        redesc=(cheetah.REDESC_A, cheetah.REDESC_B, cheetah.REDESC_C),
        num_iters=num_iters,
        # spectral PCG: measured 99.8 traj/s vs 71.0 (chol_unrolled) on
        # the flagship v5e batch at equal-or-better marker error (7.5 vs
        # 8.1 mm) — see README / scripts/profile_fte.py
        linear_solver="pcg",
    )


def _x0_from_tri(tri_pos: np.ndarray, frames: np.ndarray) -> np.ndarray:
    """Nose-track linreg -> straight-line x/y/z + initial yaw (the
    shared tail of initial_trajectory and its batched twin)."""
    nose = cheetah.get_markers().index("nose")
    xs, xi, ys, yi, zs, zi = nose_track_linreg(tri_pos, frames, nose)
    N = len(frames)
    X0 = np.zeros((N, cheetah.N_ACTIVE))
    pp = cheetah.get_pose_params()
    f = frames.astype(np.float64)
    X0[:, pp["x_0"]] = f * xs + xi
    X0[:, pp["y_0"]] = f * ys + yi
    X0[:, pp["z_0"]] = f * zs + zi
    X0[:, pp["psi_0"]] = np.arctan2(ys, xs)
    return X0


def initial_trajectory(
    pixels, likelihood, k_arr, d_arr, r_arr, t_arr, frames, dlc_thresh
) -> np.ndarray:
    """Linear-regression init (src/all_optimizations.py:269-277,334-337):
    triangulated nose track -> straight-line x/y/z + initial yaw psi_0."""
    tri_pos = triangulate_run(
        np.nan_to_num(pixels), np.nan_to_num(likelihood, nan=-1.0) > dlc_thresh,
        k_arr, d_arr, r_arr, t_arr,
    )
    return _x0_from_tri(tri_pos, frames)


def initial_trajectory_batch(
    pixels_b, likelihood_b, aux, frames, dlc_thresh
) -> list:
    """Batched initial_trajectory for a padded run group: ONE jitted
    vmapped triangulation program + ONE host transfer
    (tri.triangulate_runs_batch), then the cheap numpy linreg per run.
    The per-run loop paid a tunnel round-trip per run on a
    remote-attached TPU — measured 196 s for B=96/N=300 where the EKF
    itself costs ~1 s (docs/r04/warm_n300.txt).

    pixels_b: (B, C, N, L, 2); likelihood_b: (B, C, N, L);
    aux: (K, D, R, T) stacks, each (B, C, ...); frames: (N,).
    Returns a list of B (N, n_pose) float64 arrays, identical math to
    per-run initial_trajectory (tests/test_sweep.py).
    """
    from .tri import triangulate_runs_batch

    tri = triangulate_runs_batch(
        np.nan_to_num(np.asarray(pixels_b)),
        np.nan_to_num(np.asarray(likelihood_b), nan=-1.0) > dlc_thresh,
        aux,
    )
    return [_x0_from_tri(t, frames) for t in tri]


def fte_run(
    pixels: np.ndarray,  # (C, N, L, 2)
    likelihood: np.ndarray,  # (C, N, L)
    k_arr, d_arr, r_arr, t_arr,
    fps: float,
    dlc_thresh: float,
    frames: Optional[np.ndarray] = None,
    num_iters: int = 60,
    dtype=jnp.float64,
    uncertainty: bool = False,
) -> Dict:
    """Functional core: solve one trajectory. Returns positions + states.

    ``uncertainty`` adds the Laplace-posterior pass (trajopt.fte_solve
    compute_cov): ``marker_std`` (N, L, 3) per-marker 1-sigma position
    error bars in meters and ``pose_cov`` (N, P, P) — capability the
    reference's IPOPT pipeline never exposed."""
    C, N, L, _ = pixels.shape
    frames = frames if frames is not None else np.arange(N)
    cfg = default_config(fps, num_iters=num_iters)

    X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr, frames, dlc_thresh)

    # measurement stage: unassembled chain-rule Jacobian (J = Jp @ Jfk is
    # never materialized — see trajopt.fte_solve docstring; measured
    # ~1.4x whole-solve speedup on TPU over plain jacfwd)
    h_fn = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3), dtype)  # (N, C, L, 2)
    lik = np.nan_to_num(likelihood.transpose(1, 0, 2), nan=-1.0)
    w_meas = jnp.asarray((lik > dlc_thresh) / cfg.meas_std_px, dtype)

    X, info = jax.jit(
        lambda X0_, meas_, w_: trajopt.fte_solve(
            h_fn, X0_, meas_, w_, cfg, hj_parts_fn=hj_parts,
            compute_cov=uncertainty,
        )
    )(jnp.asarray(X0, dtype), meas, w_meas)

    positions = np.asarray(jax.vmap(cheetah.fk25)(X))
    dx, ddx = trajopt.derivatives_from_trajectory(X, cfg.Ts)
    converged = bool(info["converged"])
    print(f"FTE solve: cost {float(info['cost0']):.1f} -> {float(info['cost']):.1f} "
          f"(grad_norm {float(info['grad_norm']):.3g}; "
          f"{'converged' if converged else 'NOT converged — raise num_iters'})")
    out = dict(
        positions=positions,
        x=np.asarray(X),
        dx=np.asarray(dx),
        ddx=np.asarray(ddx),
        cost=float(info["cost"]),
        cost0=float(info["cost0"]),
        cost_history=np.asarray(info["cost_history"]),
        converged=converged,
        grad_norm=float(info["grad_norm"]),
    )
    if uncertainty:
        out["marker_std"] = np.asarray(info["marker_std"])
        out["pose_cov"] = np.asarray(info["pose_cov"])
        print(f"posterior marker std: median "
              f"{1e3 * float(np.median(out['marker_std'])):.1f} mm")
    return out


def fte(
    data_dir: str,
    start_frame: int,
    end_frame: int,
    dlc_thresh: float,
    out_dir: Optional[str] = None,
    save: bool = True,
    num_iters: int = 60,
    uncertainty: bool = False,
) -> Dict:
    """CLI-contract entry point (1-based start_frame like the reference)."""
    out_dir = out_dir or os.path.join(data_dir, "fte")
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
    markers = cheetah.get_markers()
    p2d = data_io.load_dlc_points(fpaths, markers=markers)
    win = p2d.window(start0, end_frame)

    result = fte_run(
        win.pixels, win.likelihood, k_arr, d_arr, r_arr, t_arr, fps, dlc_thresh,
        frames=win.frames, num_iters=num_iters, uncertainty=uncertainty,
    )
    if save:
        os.makedirs(out_dir, exist_ok=True)
        # fte.pickle stores state columns in the reference's stripped-45
        # order (convert_m semantics) — not the EKF pose-param order
        to_ref = lambda a: np.asarray(cheetah.to_fte_order(a))  # noqa: E731
        states = dict(
            x=to_ref(result["x"]), dx=to_ref(result["dx"]), ddx=to_ref(result["ddx"]),
            start_frame=start0,
            cost_history=result["cost_history"], scene_fpath=scene_fpath,
            dlc_thresh=dlc_thresh,
            cost=result["cost"], cost0=result["cost0"],
            converged=result["converged"], grad_norm=result["grad_norm"],
        )
        if uncertainty:
            states["marker_std"] = result["marker_std"]
        app.save_optimised_cheetah(
            result["positions"], os.path.join(out_dir, "fte.pickle"), extra_data=states
        )
        app.save_3d_cheetah_as_2d(
            result["positions"], out_dir, scene_fpath, markers,
            cam_ops.project_points_fisheye, start0,
        )
        from .plots import plot_cheetah_states

        plot_cheetah_states(result["x"], out_fpath=os.path.join(out_dir, "fte.svg"))
    return result
