"""SBA — sparse bundle adjustment over animal marker points.

Rebuild of the reference `sba()` entry point and the missing
lib.app.sba_points_fisheye (AcinoSet src/all_optimizations.py:868-895;
engine src/calib/calib.py:327-341): every (frame, marker) observed by
>= 2 cameras becomes a 3D point, initialized by triangulating its first
two observing cameras, then refined against all observing cameras under
a Cauchy robust loss (f_scale=50) with cameras fixed.

TPU-first: the points are *independent* once cameras are fixed, so the
whole refinement is `vmap(lm_dense)` over a dense (N*L)-point grid with
visibility masks — no sparse Jacobian machinery needed.
"""
from __future__ import annotations

import os
from glob import glob
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cheetah
from ..ops import camera as cam_ops
from ..solvers import lm
from . import app
from . import data as data_io


def _robust_triangulation_init(pixels, valid, k_arr, d_arr, r_arr, t_arr):
    """Initialize each (frame, marker) robustly: triangulate *every*
    camera pair and keep, per point, the candidate whose median
    reprojection error over all observing cameras is smallest.

    This is a vmapped RANSAC-lite replacement for the reference's
    fixed first-two-cameras initialization
    (src/calib/calib.py:290-296), which is derailed by a single outlier
    in either chosen view. pixels: (C, N, L, 2); valid: (C, N, L).
    Returns ((N, L, 3) init (zeros where <2 views), seen (N, L)).
    """
    C, N, L, _ = pixels.shape
    k_arr = jnp.asarray(k_arr)
    d_arr = jnp.asarray(d_arr).reshape(C, -1)[:, :4]
    r_arr = jnp.asarray(r_arr)
    t_arr = jnp.asarray(t_arr).reshape(C, 3)

    ab = jax.vmap(lambda p, K, D: cam_ops.undistort_points_fisheye(p, K, D), in_axes=(0, 0, 0))(
        jnp.asarray(pixels).reshape(C, -1, 2), k_arr, d_arr
    ).reshape(C, N, L, 2)
    P_mats = jnp.concatenate([r_arr, t_arr[:, :, None]], axis=2)  # (C, 3, 4)

    v = jnp.asarray(valid)
    vT = v.transpose(1, 2, 0).reshape(-1, C)  # (Npts, C)
    abT = ab.transpose(1, 2, 0, 3).reshape(-1, C, 2)
    pixT = jnp.asarray(pixels).transpose(1, 2, 0, 3).reshape(-1, C, 2)
    seen = vT.sum(axis=1) >= 2

    pairs = [(i, j) for i in range(C) for j in range(i + 1, C)]  # static
    big = jnp.asarray(1e12)

    def score_pair(i, j):
        tri = jax.vmap(lambda ab_row: cam_ops._dlt_one(ab_row[i], ab_row[j], P_mats[i], P_mats[j]))(
            abT
        )  # (Npts, 3)
        proj = jax.vmap(
            lambda K, D, R, t: cam_ops.project_points_fisheye(tri, K, D, R, t)
        )(k_arr, d_arr, r_arr, t_arr)  # (C, Npts, 2)
        err = jnp.linalg.norm(proj.transpose(1, 0, 2) - pixT, axis=-1)  # (Npts, C)
        err = jnp.where(vT, err, jnp.nan)
        med = jnp.nanmedian(err, axis=1)
        ok = vT[:, i] & vT[:, j]
        return tri, jnp.where(ok, med, big)

    tris, scores = [], []
    for i, j in pairs:
        tri, s = score_pair(i, j)
        tris.append(tri)
        scores.append(s)
    tris = jnp.stack(tris)  # (n_pairs, Npts, 3)
    scores = jnp.stack(scores)  # (n_pairs, Npts)
    best = jnp.argmin(scores, axis=0)  # (Npts,)
    pts = jnp.take_along_axis(tris, best[None, :, None], axis=0)[0]
    pts = jnp.where(seen[:, None], pts, 0.0)
    return pts.reshape(N, L, 3), seen.reshape(N, L)


def sba_run(
    pixels: np.ndarray,  # (C, N, L, 2)
    valid: np.ndarray,  # (C, N, L) bool
    k_arr, d_arr, r_arr, t_arr,
    f_scale: float = 50.0,
    num_iters: int = 30,
) -> Tuple[np.ndarray, Dict]:
    """Functional core. Returns (positions (N, L, 3) with NaN where
    unseen, residuals dict before/after)."""
    C, N, L, _ = pixels.shape
    pix = np.nan_to_num(pixels)
    x0, seen = _robust_triangulation_init(pix, valid, k_arr, d_arr, r_arr, t_arr)

    obs = jnp.asarray(pix).transpose(1, 2, 0, 3).reshape(-1, C, 2)  # (P_pts, C, 2)
    mask = jnp.asarray(valid).transpose(1, 2, 0).reshape(-1, C) & jnp.asarray(seen).reshape(-1)[:, None]
    pts, residuals = lm.sba_points(
        obs, mask,
        k_arr, d_arr, r_arr, t_arr,
        jnp.asarray(x0).reshape(-1, 3),
        f_scale=f_scale, num_iters=num_iters,
    )
    positions = np.array(pts).reshape(N, L, 3)  # writable copy
    seen_np = np.asarray(seen)
    positions[~seen_np] = np.nan
    residuals = {k: np.asarray(v) for k, v in residuals.items()}
    return positions, residuals


def sba_points_fisheye(scene_fpath: str, p2d: data_io.Points2D, dlc_thresh: float = 0.5):
    """Missing lib.app.sba_points_fisheye contract (call site :874)."""
    k_arr, d_arr, r_arr, t_arr, _cam_res = data_io.load_scene(scene_fpath)
    return sba_run(p2d.pixels, p2d.valid(dlc_thresh), k_arr, d_arr.reshape(-1, 4), r_arr, t_arr)


def sba(
    data_dir: str,
    start_frame: int,
    end_frame: int,
    dlc_thresh: float,
    out_dir: Optional[str] = None,
    save: bool = True,
) -> Dict:
    """CLI-contract entry point (1-based start_frame like the reference)."""
    out_dir = out_dir or os.path.join(data_dir, "sba")
    dlc_dir = os.path.join(data_dir, "dlc")
    assert os.path.exists(dlc_dir)

    k_arr, d_arr, r_arr, t_arr, cam_res, n_cams, scene_fpath = data_io.find_scene_file(
        data_dir, verbose=False
    )
    fpaths = sorted(glob(os.path.join(dlc_dir, "*.h5")))
    markers = cheetah.get_markers()
    p2d = data_io.load_dlc_points(fpaths, markers=markers)
    start0 = start_frame - 1
    if end_frame == -1:
        end_frame = p2d.pixels.shape[1]
    win = p2d.window(start0, end_frame)

    positions, residuals = sba_run(
        win.pixels, win.valid(dlc_thresh), k_arr, d_arr, r_arr, t_arr
    )
    if save:
        os.makedirs(out_dir, exist_ok=True)
        app.save_sba(positions, out_dir, scene_fpath, start0, dlc_thresh)
    return dict(positions=positions, residuals=residuals, start_frame=start0)
