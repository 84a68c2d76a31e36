"""Orchestration-layer utilities: logging, result saving, video info.

Rebuilds the missing lib.app surface (SURVEY.md §2.3): start/stop
logging tee, save_tri/save_sba/save_ekf/save_optimised_cheetah,
save_3d_cheetah_as_2d, get_vid_info. Plotting lives in
`pipeline.plots`, video rendering in `pipeline.video`.
"""
from __future__ import annotations

import os
import sys
from glob import glob
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import data as data_io


# --------------------------------------------------------------------------
# Logging tee (lib.app.start_logging / stop_logging;
# call sites src/all_optimizations.py:52,526,580,851)
# --------------------------------------------------------------------------

class _Tee:
    def __init__(self, stream, fpath):
        self.stream = stream
        self.file = open(fpath, "w")

    def write(self, msg):
        self.stream.write(msg)
        self.file.write(msg)

    def flush(self):
        self.stream.flush()
        self.file.flush()

    def close(self):
        self.file.close()


_active_tee: Optional[_Tee] = None


def start_logging(fpath: str):
    """Tee stdout to a per-run log file."""
    global _active_tee
    stop_logging()
    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    _active_tee = _Tee(sys.stdout, fpath)
    sys.stdout = _active_tee


def stop_logging():
    global _active_tee
    if _active_tee is not None:
        sys.stdout = _active_tee.stream
        _active_tee.close()
        _active_tee = None


# --------------------------------------------------------------------------
# Video info (lib.app.get_vid_info; call sites :55, :596)
# --------------------------------------------------------------------------


def get_vid_info(data_dir: str):
    """Read cam[1-9].mp4 -> (resolution, fps, tot_frames, fpaths).

    Falls back to a `video_info.json` sidecar ({"resolution": [w, h],
    "fps": f, "tot_frames": n}) when no videos are present (e.g. the
    released dataset subsets that ship only DLC .h5 files).
    """
    fpaths = sorted(glob(os.path.join(data_dir, "cam[1-9].mp4")))
    if fpaths:
        import cv2

        cap = cv2.VideoCapture(fpaths[0])
        res = (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)), int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
        fps = cap.get(cv2.CAP_PROP_FPS)
        tot = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return res, fps, tot, fpaths
    sidecar = os.path.join(data_dir, "video_info.json")
    if os.path.exists(sidecar):
        import json

        with open(sidecar) as f:
            info = json.load(f)
        return tuple(info["resolution"]), info["fps"], info["tot_frames"], fpaths
    raise FileNotFoundError(f"No cam[1-9].mp4 or video_info.json in {data_dir}")


# --------------------------------------------------------------------------
# Result pickles ({tri,sba,ekf,fte}.pickle — schema matches the reference
# fixtures data/results/traj_results.pickle: positions + x/dx/ddx arrays)
# --------------------------------------------------------------------------


def _save_result(out_fpath, positions, scene_fpath, start_frame, dlc_thresh, extra: Dict = None):
    payload = dict(
        positions=np.asarray(positions),
        scene_fpath=scene_fpath,
        start_frame=start_frame,
        dlc_thresh=dlc_thresh,
    )
    if extra:
        payload.update({k: np.asarray(v) if hasattr(v, "shape") else v for k, v in extra.items()})
    data_io.save_pickle(out_fpath, payload)
    print(f"Saved {out_fpath}")
    return payload


def save_tri(positions, out_dir, scene_fpath, start_frame, dlc_thresh, extra: Dict = None):
    return _save_result(os.path.join(out_dir, "tri.pickle"), positions, scene_fpath, start_frame, dlc_thresh, extra)


def save_sba(positions, out_dir, scene_fpath, start_frame, dlc_thresh, extra: Dict = None):
    return _save_result(os.path.join(out_dir, "sba.pickle"), positions, scene_fpath, start_frame, dlc_thresh, extra)


def save_ekf(states: Dict, out_dir, scene_fpath, start_frame, dlc_thresh, positions=None):
    return _save_result(
        os.path.join(out_dir, "ekf.pickle"),
        positions if positions is not None else np.zeros((0,)),
        scene_fpath,
        start_frame,
        dlc_thresh,
        extra=states,
    )


def save_optimised_cheetah(positions, out_fpath, extra_data: Dict = None):
    """fte.pickle: {positions, x, dx, ddx, start_frame} (call site :558-559;
    schema verified against data/results/traj_results.pickle)."""
    payload = dict(positions=np.asarray(positions))
    if extra_data:
        payload.update(extra_data)
    data_io.save_pickle(out_fpath, payload)
    print(f"Saved {out_fpath}")
    return payload


def save_3d_cheetah_as_2d(
    positions, out_dir, scene_fpath, markers: Sequence[str], project_func, start_frame: int,
    out_fname: str = "cheetah_reprojected",
):
    """Reproject a 3D trajectory into every camera and write per-camera
    2D keypoint files (lib.app.save_3d_cheetah_as_2d, call site :560).

    Output: one <out_fname>_cam{i}.h5 per camera in DLC-compatible
    layout (written with pandas fixed format via h5py-free fallback to
    .pickle when HDF5 write is unavailable).
    """
    import pandas as pd

    k_arr, d_arr, r_arr, t_arr, _res = data_io.load_scene(scene_fpath)
    d_arr = d_arr.reshape((-1, 4))
    positions = np.asarray(positions)  # (N, L, 3)
    N, L, _ = positions.shape
    out_paths = []
    for c in range(len(k_arr)):
        pts = positions.reshape(-1, 3)
        ok = np.isfinite(pts).all(axis=1)
        pix = np.full((N * L, 2), np.nan)
        if ok.any():
            pix[ok] = np.asarray(
                project_func(pts[ok], k_arr[c], d_arr[c], r_arr[c], t_arr[c])
            )
        pix = pix.reshape(N, L, 2)
        cols = pd.MultiIndex.from_product(
            [["acinoset_tpu"], list(markers), ["x", "y", "likelihood"]],
            names=["scorer", "bodyparts", "coords"],
        )
        arr = np.concatenate(
            [pix, np.where(np.isfinite(pix[..., :1]), 1.0, 0.0)], axis=-1
        ).reshape(N, L * 3)
        df = pd.DataFrame(arr, index=np.arange(start_frame, start_frame + N), columns=cols)
        fpath = os.path.join(out_dir, f"{out_fname}_cam{c + 1}.h5")
        try:
            df.to_hdf(fpath, key="df_with_missing", mode="w")
        except ImportError:  # no pytables in this environment
            fpath = fpath.replace(".h5", ".pickle")
            df.to_pickle(fpath)
        out_paths.append(fpath)
        print(f"Saved {fpath}")
    return out_paths
