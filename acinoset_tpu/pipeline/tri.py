"""TRI — pairwise DLT triangulation baseline.

Rebuild of the reference `tri()` entry point
(AcinoSet src/all_optimizations.py:906-939): filter detections by
likelihood, triangulate every adjacent camera pair, average the pair
estimates per (frame, marker). The pandas merge pipeline of
src/calib/calib.py:394-423 becomes one dense masked JAX program.
"""
from __future__ import annotations

import os
from glob import glob
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models import cheetah
from ..ops import camera as cam_ops
from . import app
from . import data as data_io


def triangulate_run(
    pixels: np.ndarray,  # (C, N, L, 2)
    valid: np.ndarray,  # (C, N, L) bool
    k_arr, d_arr, r_arr, t_arr,
) -> np.ndarray:
    """(N, L, 3) pair-averaged positions; NaN where unseen."""
    pts3d, _seen = cam_ops.triangulate_pairwise_mean(
        jnp.asarray(pixels), jnp.asarray(valid), k_arr, d_arr, r_arr, t_arr
    )
    return np.asarray(pts3d)


def tri(
    data_dir: str,
    start_frame: int,
    end_frame: int,
    dlc_thresh: float,
    out_dir: Optional[str] = None,
    save: bool = True,
    markers=None,
) -> Dict:
    """CLI-contract entry point (1-based start_frame like the reference)."""
    out_dir = out_dir or os.path.join(data_dir, "tri")
    dlc_dir = os.path.join(data_dir, "dlc")
    assert os.path.exists(dlc_dir), f"missing {dlc_dir}"

    k_arr, d_arr, r_arr, t_arr, cam_res, n_cams, scene_fpath = data_io.find_scene_file(
        data_dir, verbose=False
    )
    fpaths = sorted(glob(os.path.join(dlc_dir, "*.h5")))
    assert n_cams == len(fpaths), f"{len(fpaths)} dlc files != {n_cams} cams"

    markers = markers or cheetah.get_markers()
    p2d = data_io.load_dlc_points(fpaths, markers=markers)
    start0 = start_frame - 1
    if end_frame == -1:
        end_frame = p2d.pixels.shape[1]
    win = p2d.window(start0, end_frame)

    positions = triangulate_run(
        np.nan_to_num(win.pixels), win.valid(dlc_thresh), k_arr, d_arr, r_arr, t_arr
    )
    result = dict(positions=positions, start_frame=start0, markers=markers)
    if save:
        os.makedirs(out_dir, exist_ok=True)
        app.save_tri(positions, out_dir, scene_fpath, start0, dlc_thresh)
    return result
