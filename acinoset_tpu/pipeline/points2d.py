"""2D-point project helpers — the src/get_points.py twin.

Small project-directory utilities: tidy 2D keypoint frames, bodypart
listings, and the straight-line 3D path estimate for a single part that
the reference used to seed optimizations (src/get_points.py:8-51).
"""
from __future__ import annotations

import os
from glob import glob
from typing import List, Tuple

import numpy as np


from . import data as data_io
from .ekf import nose_track_linreg
from .tri import triangulate_run


def get_bodyparts(project_dir: str) -> List[str]:
    """List bodyparts from a project's DLC files (src/get_points.py:42-51)."""
    fpaths = sorted(glob(os.path.join(project_dir, "data", "*.h5")))
    if not fpaths:
        fpaths = sorted(glob(os.path.join(project_dir, "dlc", "*.h5")))
    assert fpaths, f"no .h5 files under {project_dir}"
    _frames, bodyparts, _vals = data_io._read_dlc_h5(fpaths[0])
    return list(bodyparts)


def get_2d_points_df(project_dir: str):
    """Tidy [frame, camera, marker, x, y, likelihood] dataframe for a
    project (src/get_points.py:8-20)."""
    fpaths = sorted(glob(os.path.join(project_dir, "data", "*.h5")))
    if not fpaths:
        fpaths = sorted(glob(os.path.join(project_dir, "dlc", "*.h5")))
    return data_io.load_dlc_points_as_df(fpaths)


def estimate_part_path(
    project_dir: str,
    part: str,
    scene_fname: str = "4_cam_scene_static_sba.json",
    dlc_thresh: float = 0.4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Linear-regression 3D path estimate for one bodypart
    (src/get_points.py:8-40): triangulate the part across frames, fit a
    straight line vs frame index. Returns (slopes (3,), intercepts (3,))."""
    scene_path = os.path.join(project_dir, "data", scene_fname)
    if not os.path.exists(scene_path):
        k, d, r, t, *_rest, _scene = data_io.find_scene_file(project_dir, verbose=False)
    else:
        k, d, r, t, _res = data_io.load_scene(scene_path)
        d = d.reshape(-1, 4)
    fpaths = sorted(glob(os.path.join(project_dir, "data", "*.h5")))
    if not fpaths:
        fpaths = sorted(glob(os.path.join(project_dir, "dlc", "*.h5")))
    p2d = data_io.load_dlc_points(fpaths)
    assert part in p2d.markers, f"{part} not in {p2d.markers}"
    tri = triangulate_run(
        np.nan_to_num(p2d.pixels), p2d.valid(dlc_thresh), k, d, r, t
    )
    mi = p2d.markers.index(part)
    xs, xi, ys, yi, zs, zi = nose_track_linreg(tri, p2d.frames, mi)
    return np.array([xs, ys, zs]), np.array([xi, yi, zi])
