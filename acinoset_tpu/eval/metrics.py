"""Reconstruction quality metrics — the src/testing.py twin.

Implements the reference evaluation quantities
(AcinoSet src/testing.py:88-214): per-marker reprojection RMSE (px),
standard deviation, PCK@fraction-of-bbox-diagonal, and NRMSE, computed
between reprojected 3D reconstructions and ground-truth 2D labels.
Vectorized over frames/markers with NaN-aware masking instead of the
reference's per-frame Python loops.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from ..ops import camera as cam_ops


def reproject_positions(positions, k, d, r, t):
    """(N, L, 3) world positions -> (N, L, 2) pixels in one camera
    (NaN positions propagate)."""
    positions = np.asarray(positions)
    N, L, _ = positions.shape
    flat = positions.reshape(-1, 3)
    ok = np.isfinite(flat).all(axis=1)
    out = np.full((N * L, 2), np.nan)
    if ok.any():
        out[ok] = np.asarray(
            cam_ops.project_points_fisheye(flat[ok], k, np.asarray(d).reshape(-1)[:4], r, t)
        )
    return out.reshape(N, L, 2)


def bbox_diag(gt_2d: np.ndarray) -> np.ndarray:
    """Per-frame bounding-box diagonal of the GT keypoints (N,)."""
    mins = np.nanmin(gt_2d, axis=1)  # (N, 2)
    maxs = np.nanmax(gt_2d, axis=1)
    return np.linalg.norm(maxs - mins, axis=1)


def keypoint_metrics(
    pred_2d: np.ndarray,  # (N, L, 2)
    gt_2d: np.ndarray,  # (N, L, 2), NaN where unlabeled
    pck_thresh: float = 0.1,
) -> Dict[str, float]:
    """RMSE / std / PCK@pck_thresh*bbox-diag / NRMSE
    (formulas of src/testing.py:188-214)."""
    err = np.linalg.norm(np.asarray(pred_2d) - np.asarray(gt_2d), axis=-1)  # (N, L)
    valid = np.isfinite(err)
    e = err[valid]
    rmse = float(np.sqrt(np.mean(e**2))) if e.size else float("nan")
    std = float(np.std(e)) if e.size else float("nan")
    diag = bbox_diag(gt_2d)  # (N,)
    thresh = pck_thresh * diag[:, None]
    pck = float(np.mean((err <= thresh)[valid])) if e.size else float("nan")
    nrmse = float(rmse / np.nanmean(diag)) if e.size else float("nan")
    return dict(rmse_px=rmse, std_px=std, pck=pck, nrmse=nrmse, n_points=int(e.size))


def evaluate_reconstruction(
    positions: np.ndarray,  # (N, L, 3)
    gt_2d_per_cam: Sequence[np.ndarray],  # per-camera (N, L, 2)
    k_arr, d_arr, r_arr, t_arr,
    cam_indices: Optional[Sequence[int]] = None,
    pck_thresh: float = 0.1,
) -> Dict[str, Dict[str, float]]:
    """Evaluate a 3D reconstruction against GT 2D labels in chosen cameras.

    Returns {"cam{i}": metrics, ..., "overall": metrics}."""
    cam_indices = list(cam_indices) if cam_indices is not None else list(range(len(gt_2d_per_cam)))
    out = {}
    all_pred, all_gt = [], []
    for ci, gt in zip(cam_indices, gt_2d_per_cam):
        pred = reproject_positions(positions, k_arr[ci], d_arr[ci], r_arr[ci], t_arr[ci])
        out[f"cam{ci + 1}"] = keypoint_metrics(pred, gt, pck_thresh)
        all_pred.append(pred)
        all_gt.append(gt)
    out["overall"] = keypoint_metrics(
        np.concatenate(all_pred, axis=0), np.concatenate(all_gt, axis=0), pck_thresh
    )
    return out


def positions_rmse_3d(pred: np.ndarray, gt: np.ndarray) -> float:
    """3D marker RMSE between two (N, L, 3) reconstructions (NaN-aware)."""
    d = np.linalg.norm(np.asarray(pred) - np.asarray(gt), axis=-1)
    return float(np.sqrt(np.nanmean(d**2)))


def reprojection_errors(
    positions: np.ndarray,
    gt_2d_per_cam: Sequence[np.ndarray],
    k_arr, d_arr, r_arr, t_arr,
    cam_indices: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Flat per-point reprojection error distribution (px) across all
    evaluated cameras — the quantity the reference histograms
    (src/testing.py:199-221 plt.hist(errs, bins=20))."""
    cam_indices = list(cam_indices) if cam_indices is not None else list(range(len(gt_2d_per_cam)))
    errs = []
    for ci, gt in zip(cam_indices, gt_2d_per_cam):
        pred = reproject_positions(positions, k_arr[ci], d_arr[ci], r_arr[ci], t_arr[ci])
        e = np.linalg.norm(pred - np.asarray(gt), axis=-1).ravel()
        errs.append(e[np.isfinite(e)])
    return np.concatenate(errs) if errs else np.zeros(0)


def save_error_histogram(
    errors: np.ndarray,
    out_fpath: str,
    bins: int = 20,
    title: str = "Reprojection error",
) -> str:
    """Save the reference-style reprojection-error histogram
    (src/testing.py:199-205: 20 bins, 'Reprojection Error (px)' /
    'Frequency' axes) as a png. Returns out_fpath."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(np.asarray(errors), bins=bins)
    ax.set_title(title)
    ax.set_xlabel("Reprojection Error (px)")
    ax.set_ylabel("Frequency")
    fig.tight_layout()
    fig.savefig(out_fpath, dpi=120)
    plt.close(fig)
    return out_fpath
