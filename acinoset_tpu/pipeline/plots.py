"""Plotting: state grids, 3D skeleton playback, calibration visuals.

Matplotlib-based rebuilds of the missing lib.app plotting surface
(SURVEY.md §2.3: plot_cheetah_states, plot_cheetah_reconstruction,
plot_multiple_cheetah_reconstructions) and of src/calib/app.py's
plot_corners / plot_points_fisheye_undistort / plot_scene (the reference
used a PyQt5/pyqtgraph viewer; headless matplotlib is the default here,
with interactive display when a GUI backend is available).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ..models import cheetah as cheetah_model
from . import data as data_io

#: cheetah skeleton edges (marker-index pairs) for rendering
CHEETAH_LINKS = [
    ("nose", "l_eye"), ("nose", "r_eye"), ("l_eye", "r_eye"),
    ("nose", "neck_base"), ("neck_base", "spine"), ("spine", "tail_base"),
    ("tail_base", "tail1"), ("tail1", "tail2"),
    ("neck_base", "l_shoulder"), ("l_shoulder", "l_front_knee"),
    ("l_front_knee", "l_front_ankle"),
    ("neck_base", "r_shoulder"), ("r_shoulder", "r_front_knee"),
    ("r_front_knee", "r_front_ankle"),
    ("tail_base", "l_hip"), ("l_hip", "l_back_knee"), ("l_back_knee", "l_back_ankle"),
    ("tail_base", "r_hip"), ("r_hip", "r_back_knee"), ("r_back_knee", "r_back_ankle"),
]


def _marker_links(markers: Sequence[str]):
    idx = {m: i for i, m in enumerate(markers)}
    return [(idx[a], idx[b]) for a, b in CHEETAH_LINKS if a in idx and b in idx]


def plot_cheetah_states(
    x: np.ndarray,
    smoothed_x: Optional[np.ndarray] = None,
    out_fpath: Optional[str] = None,
    state_names: Optional[List[str]] = None,
):
    """Grid plot of state trajectories (lib.app.plot_cheetah_states,
    call sites src/all_optimizations.py:566,865)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    x = np.asarray(x)
    n_states = x.shape[1]
    names = state_names or list(cheetah_model.get_pose_params().keys())[:n_states]
    ncols = 5
    nrows = int(np.ceil(n_states / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 2.2 * nrows), squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        if i < n_states:
            ax.plot(x[:, i], label="x")
            if smoothed_x is not None:
                ax.plot(np.asarray(smoothed_x)[:, i], label="smoothed")
            ax.set_title(names[i] if i < len(names) else f"state {i}", fontsize=9)
        else:
            ax.axis("off")
    axes[0][0].legend(fontsize=8)
    fig.tight_layout()
    if out_fpath:
        os.makedirs(os.path.dirname(out_fpath) or ".", exist_ok=True)
        fig.savefig(out_fpath)
        print(f"Saved {out_fpath}")
    plt.close(fig)
    return fig


def plot_cheetah_reconstruction(
    data_fpath: str,
    markers: Optional[Sequence[str]] = None,
    frame_step: int = 10,
    out_fpath: Optional[str] = None,
    centered: bool = False,
    dark_mode: bool = False,
):
    """3D skeleton playback (lib.app.plot_cheetah_reconstruction; the
    reference opened an interactive pyqtgraph window — here a multi-frame
    3D strip rendered to a figure, interactive if shown)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    payload = data_io.load_pickle(data_fpath)
    positions = np.asarray(payload["positions"])
    markers = markers or cheetah_model.get_markers()
    links = _marker_links(markers) if len(markers) == positions.shape[1] else []

    if dark_mode:
        plt.style.use("dark_background")
    fig = plt.figure(figsize=(14, 6))
    ax = fig.add_subplot(111, projection="3d")
    frames = range(0, len(positions), max(frame_step, 1))
    for n in frames:
        pts = positions[n].copy()
        if centered:
            pts = pts - np.nanmean(pts, axis=0, keepdims=True)
        ax.scatter(*pts.T, s=6)
        for a, b in links:
            if np.isfinite(pts[[a, b]]).all():
                ax.plot(*np.stack([pts[a], pts[b]]).T, lw=0.8, alpha=0.7)
    ax.set_xlabel("x [m]"); ax.set_ylabel("y [m]"); ax.set_zlabel("z [m]")
    ax.set_title(os.path.basename(data_fpath))
    if out_fpath:
        fig.savefig(out_fpath)
        print(f"Saved {out_fpath}")
    plt.close(fig)
    return fig


def plot_multiple_cheetah_reconstructions(
    data_fpaths: Sequence[str],
    reprojections: bool = False,
    dark_mode: bool = False,
    frame_step: int = 20,
    out_fpath: Optional[str] = None,
):
    """Overlay multiple reconstructions (lib.app twin; call site
    src/all_optimizations.py:983)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if dark_mode:
        plt.style.use("dark_background")
    fig = plt.figure(figsize=(14, 6))
    ax = fig.add_subplot(111, projection="3d")
    for fp in data_fpaths:
        payload = data_io.load_pickle(fp)
        positions = np.asarray(payload["positions"])
        label = os.path.basename(fp).replace(".pickle", "")
        for n in range(0, len(positions), max(frame_step, 1)):
            pts = positions[n]
            ax.scatter(*pts.T, s=4, label=label if n == 0 else None, alpha=0.6)
    ax.legend()
    if out_fpath:
        fig.savefig(out_fpath)
        print(f"Saved {out_fpath}")
    plt.close(fig)
    return fig


def plot_results_with_pan(
    result_fpath: str,
    encoder_counts: Optional[np.ndarray] = None,
    frame_step: int = 10,
    out_fpath: Optional[str] = None,
):
    """Frame-by-frame result playback with rotating-rig pan compensation
    (the runnable core of src/analyse.py:50-104 / gui.py analyse page):
    de-rotates each frame's skeleton by the encoder angle before plotting."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from ..utils import pan_compensation

    payload = data_io.load_pickle(result_fpath)
    positions = np.asarray(payload["positions"])
    if encoder_counts is not None:
        theta = np.asarray(pan_compensation.count_to_rad(np.asarray(encoder_counts)))
        positions = np.asarray(
            pan_compensation.rotate_point(positions, -theta[:, None])
        )
    fig = plt.figure(figsize=(12, 6))
    ax = fig.add_subplot(111, projection="3d")
    for n in range(0, len(positions), max(frame_step, 1)):
        ax.scatter(*positions[n].T, s=5, alpha=0.7)
    ax.set_title(f"{os.path.basename(result_fpath)} (pan-compensated)")
    if out_fpath:
        fig.savefig(out_fpath)
    plt.close(fig)
    return positions


def animate_reconstruction(
    result_fpath: str,
    out_fpath: str,
    skel_links: Optional[Sequence[Sequence[str]]] = None,
    fps: float = 15.0,
    max_frames: int = 300,
    elev: float = 20.0,
    azim: float = -60.0,
):
    """Render a result pickle's 3D reconstruction as an mp4 — the
    headless stand-in for the reference's interactive pyqtgraph viewer
    (src/calib/plotting.py:133-196, plot_cheetah_reconstruction call
    sites in TRI.ipynb). One matplotlib 3D frame per timestep with
    fixed axes, stitched by `pipeline.video.images_to_video`.

    skel_links: optional marker-name pairs to draw as bones; the
    result's own `markers` list (saved by our pipelines) resolves the
    names. Falls back to a scatter when absent."""
    import tempfile

    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from .video import images_to_video

    payload = data_io.load_pickle(result_fpath)
    positions = np.asarray(payload["positions"])[:max_frames]
    markers = list(payload.get("markers") or [])
    pairs = []
    if skel_links and markers:
        for a, b in skel_links:
            if a in markers and b in markers:
                pairs.append((markers.index(a), markers.index(b)))

    lo = np.nanmin(positions.reshape(-1, 3), axis=0)
    hi = np.nanmax(positions.reshape(-1, 3), axis=0)
    pad = 0.1 * np.maximum(hi - lo, 1e-3)
    lo, hi = lo - pad, hi + pad

    with tempfile.TemporaryDirectory() as tmp:
        fpaths = []
        for n, pts in enumerate(positions):
            fig = plt.figure(figsize=(8, 6))
            ax = fig.add_subplot(111, projection="3d")
            ax.scatter(*pts.T, s=12, c="tab:red")
            for i, j in pairs:
                seg = np.stack([pts[i], pts[j]])
                ax.plot(*seg.T, lw=1.5, c="tab:blue")
            ax.set_xlim(lo[0], hi[0]); ax.set_ylim(lo[1], hi[1]); ax.set_zlim(lo[2], hi[2])
            ax.view_init(elev=elev, azim=azim)
            ax.set_title(f"frame {n}")
            fp = os.path.join(tmp, f"f{n:05d}.png")
            fig.savefig(fp, dpi=80)
            plt.close(fig)
            fpaths.append(fp)
        images_to_video(fpaths, out_fpath, fps=fps)
    return out_fpath


def plot_corners(points_fpath: str, out_fpath: Optional[str] = None):
    """Scatter all detected board corners (src/calib/app.py:44-47)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    points, fnames, board_shape, _edge, cam_res = data_io.load_points(points_fpath)
    fig, ax = plt.subplots(figsize=(10, 6))
    for p in points:
        ax.plot(*p.reshape(-1, 2).T, ".-", ms=2, lw=0.4, alpha=0.7)
    ax.set_xlim(0, cam_res[0]); ax.set_ylim(cam_res[1], 0)
    ax.set_title(f"{len(points)} boards ({points_fpath})")
    if out_fpath:
        fig.savefig(out_fpath)
    plt.close(fig)
    return fig


def plot_points_fisheye_undistort(points_fpath: str, camera_fpath: str, out_fpath=None):
    """Corners before/after fisheye undistortion — straightness check
    (src/calib/app.py:50-62)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    from ..ops.camera import undistort_points_fisheye

    points, fnames, board_shape, _e, cam_res = data_io.load_points(points_fpath)
    k, d, _ = data_io.load_camera(camera_fpath)
    fig, axes = plt.subplots(1, 2, figsize=(16, 5))
    for p in points:
        p2 = p.reshape(-1, 2)
        axes[0].plot(*p2.T, ".-", ms=2, lw=0.4)
        u = np.asarray(undistort_points_fisheye(p2, k, d.reshape(-1)[:4], P=k))
        axes[1].plot(*u.T, ".-", ms=2, lw=0.4)
    axes[0].set_title("distorted"); axes[1].set_title("undistorted")
    for ax in axes:
        ax.set_xlim(0, cam_res[0]); ax.set_ylim(cam_res[1], 0)
    if out_fpath:
        fig.savefig(out_fpath)
    plt.close(fig)
    return fig


def plot_scene(
    scene_fpath: str,
    points_3d: Optional[np.ndarray] = None,
    out_fpath: Optional[str] = None,
    dark_mode: bool = False,
    frustum_scale: float = 0.5,
):
    """Render camera frusta (+ optional 3D points) — the headless twin of
    the pyqtgraph Scene (src/calib/plotting.py:133-196, app.py:192-198)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    k_arr, d_arr, r_arr, t_arr, _res = data_io.load_scene(scene_fpath)
    if dark_mode:
        plt.style.use("dark_background")
    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    for i, (R, t) in enumerate(zip(r_arr, t_arr)):
        C = -R.T @ np.asarray(t).reshape(3)
        ax.scatter(*C, marker="s", s=40)
        ax.text(*C, f"cam{i + 1}")
        # frustum: 4 image-corner rays
        for sx, sy in ((-1, -1), (-1, 1), (1, 1), (1, -1)):
            ray = R.T @ np.array([sx * 0.6, sy * 0.4, 1.0]) * frustum_scale
            ax.plot(*np.stack([C, C + ray]).T, "b-", lw=0.6)
    if points_3d is not None:
        p = np.asarray(points_3d).reshape(-1, 3)
        ax.scatter(*p.T, s=2, alpha=0.5)
    ax.set_xlabel("x"); ax.set_ylabel("y"); ax.set_zlabel("z")
    if out_fpath:
        fig.savefig(out_fpath)
        print(f"Saved {out_fpath}")
    plt.close(fig)
    return fig
