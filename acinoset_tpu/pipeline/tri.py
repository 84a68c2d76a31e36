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

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cheetah
from ..ops import camera as cam_ops
from . import app
from . import data as data_io


_TRI_JIT = None


def triangulate_run(
    pixels: np.ndarray,  # (C, N, L, 2)
    valid: np.ndarray,  # (C, N, L) bool
    k_arr, d_arr, r_arr, t_arr,
) -> np.ndarray:
    """(N, L, 3) pair-averaged positions; NaN where unseen.

    jitted (cached across calls with matching shapes) — eager per-op
    dispatch is expensive on remote-attached accelerators."""
    global _TRI_JIT
    if _TRI_JIT is None:
        _TRI_JIT = jax.jit(
            lambda p, v, k, d, r, t: cam_ops.triangulate_pairwise_mean(p, v, k, d, r, t)[0]
        )
    C = len(k_arr)
    pts3d = _TRI_JIT(
        jnp.asarray(pixels), jnp.asarray(valid),
        jnp.asarray(np.asarray(k_arr)),
        jnp.asarray(np.asarray(d_arr).reshape(C, -1)[:, :4]),
        jnp.asarray(np.asarray(r_arr)),
        jnp.asarray(np.asarray(t_arr).reshape(C, 3)),
    )
    return np.asarray(pts3d)


_TRI_BATCH_JIT = None


def triangulate_runs_batch(
    pixels_b: np.ndarray,  # (B, C, N, L, 2)
    valid_b: np.ndarray,  # (B, C, N, L) bool
    aux,  # (K, D, R, T) stacks, each (B, C, ...)
) -> np.ndarray:
    """(B, N, L, 3) pair-averaged positions for a padded run group in
    ONE jitted vmapped program + ONE host transfer. The per-run
    triangulate_run loop pays a tunnel round-trip per run on a
    remote-attached TPU — measured ~2 s/run at N=300
    (docs/r04/warm_n300.txt) where the whole batched program costs
    milliseconds."""
    global _TRI_BATCH_JIT
    if _TRI_BATCH_JIT is None:
        _TRI_BATCH_JIT = jax.jit(jax.vmap(
            lambda p, v, k, d, r, t: cam_ops.triangulate_pairwise_mean(
                p, v, k, d, r, t)[0]
        ))
    K, D, R, T = (np.asarray(a) for a in aux)
    B, C = K.shape[:2]
    return np.asarray(_TRI_BATCH_JIT(
        jnp.asarray(pixels_b), jnp.asarray(valid_b),
        jnp.asarray(K), jnp.asarray(D.reshape(B, C, -1)[..., :4]),
        jnp.asarray(R), jnp.asarray(T.reshape(B, C, 3)),
    ))


def get_pairwise_3d_points_from_df(
    points_2d_df, k_arr, d_arr, r_arr, t_arr, triangulate_func=None
):
    """Dataframe-compatible twin of src/calib/calib.py:394-423: tidy
    [frame, camera, marker, x, y] detections in -> per-(frame, marker)
    pair-averaged [frame, marker, x, y, z] dataframe out. Internally
    runs the dense masked JAX triangulation."""
    import pandas as pd

    from . import data as d_io

    markers = sorted(points_2d_df["marker"].unique())
    p2d = d_io.points2d_from_df(points_2d_df.assign(likelihood=1.0), markers)
    pts3d = triangulate_run(
        np.nan_to_num(p2d.pixels), np.isfinite(p2d.pixels).all(axis=-1),
        k_arr, d_arr, r_arr, t_arr,
    )
    N, L, _ = pts3d.shape
    frames = np.repeat(np.arange(N), L)
    mk = np.tile(np.array(markers, dtype=object), N)
    flat = pts3d.reshape(-1, 3)
    ok = np.isfinite(flat).all(axis=1)
    return pd.DataFrame(
        {
            "frame": frames[ok],
            "marker": mk[ok],
            "x": flat[ok, 0],
            "y": flat[ok, 1],
            "z": flat[ok, 2],
        }
    )


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
