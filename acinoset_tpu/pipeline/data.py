"""Host-side data model & (de)serialization, byte-compatible with the reference.

Covers the reference's L2 layer (AcinoSet src/calib/utils.py and the
missing lib/utils.py — SURVEY.md §2.3): scene/camera/points JSON,
skeleton pickles, result pickles, and DeepLabCut .h5 ingestion. Two JSON
schema generations are supported on load (`board_edge_len` +
`created_timestamp` vs the newer `board_square_len` + `timestamp`, cf.
src/calib/utils.py:25 vs data/thursday_kiara/.../points_cam1.json).

DLC .h5 files are PyTables "frame_table" stores written by pandas; we
parse them directly with h5py (no pytables dependency): the column
MultiIndex lives in pickled group attrs, the payload in
``<group>/table`` as a structured array. The ingest path converts
straight to dense (C, N, L, 3) arrays — the TPU-friendly layout — with
the tidy dataframe available as a compat shim.
"""
from __future__ import annotations

import json
import os
import pickle
import re
from dataclasses import dataclass
from datetime import datetime
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# --------------------------------------------------------------------------
# Scene / camera / points JSON (schemas of src/calib/utils.py:16-101)
# --------------------------------------------------------------------------


def _timestamp() -> str:
    return str(datetime.now())


def save_points(out_fpath, img_points, img_fnames, board_shape, board_square_len, camera_resolution):
    """Write a corner-points JSON (newer schema keys, cf.
    data/thursday_kiara/extrinsic_calib/points/points_cam1.json)."""
    if isinstance(img_points, np.ndarray):
        img_points = img_points.tolist()
    data = {
        "timestamp": _timestamp(),
        "board_shape": list(board_shape),
        "board_square_len": board_square_len,
        "camera_resolution": list(camera_resolution),
        "points": dict(zip(img_fnames, img_points)),
    }
    os.makedirs(os.path.dirname(out_fpath) or ".", exist_ok=True)
    with open(out_fpath, "w") as f:
        json.dump(data, f)


def load_points(fpath) -> Tuple[np.ndarray, List[str], Tuple[int, int], float, Tuple[int, int]]:
    """Load a corner-points JSON, accepting both schema generations
    (board_edge_len/created_timestamp and board_square_len/timestamp)."""
    with open(fpath, "r") as f:
        data = json.load(f)
    fnames = list(data["points"].keys())
    points = np.array(list(data["points"].values()), dtype=np.float32)
    board_shape = tuple(data["board_shape"])
    edge_len = data.get("board_square_len", data.get("board_edge_len"))
    camera_resolution = tuple(data["camera_resolution"])
    return points, fnames, board_shape, edge_len, camera_resolution


def save_camera(out_fpath, camera_resolution, k, d):
    data = {
        "timestamp": _timestamp(),
        "camera_resolution": list(camera_resolution),
        "k": np.asarray(k).tolist(),
        "d": np.asarray(d).tolist(),
    }
    os.makedirs(os.path.dirname(out_fpath) or ".", exist_ok=True)
    with open(out_fpath, "w") as f:
        json.dump(data, f)


def load_camera(fpath) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    with open(fpath, "r") as f:
        data = json.load(f)
    return (
        np.array(data["k"], dtype=np.float64),
        np.array(data["d"], dtype=np.float64),
        tuple(data["camera_resolution"]),
    )


def save_scene(out_fpath, k_arr, d_arr, r_arr, t_arr, camera_resolution):
    cameras = [
        {
            "k": np.asarray(k).tolist(),
            "d": np.asarray(d).tolist(),
            "r": np.asarray(r).tolist(),
            "t": np.asarray(t).tolist(),
        }
        for k, d, r, t in zip(k_arr, d_arr, r_arr, t_arr)
    ]
    data = {
        "timestamp": _timestamp(),
        "camera_resolution": list(camera_resolution),
        "cameras": cameras,
    }
    os.makedirs(os.path.dirname(out_fpath) or ".", exist_ok=True)
    with open(out_fpath, "w") as f:
        json.dump(data, f)


def load_scene(fpath):
    """Load a scene JSON -> (k_arr, d_arr, r_arr, t_arr, camera_resolution).

    Shapes match the reference loader (src/calib/utils.py:84-101):
    k (C,3,3), d (C,4,1) as stored, r (C,3,3), t (C,3,1).
    """
    with open(fpath, "r") as f:
        data = json.load(f)
    cams = data["cameras"]
    k_arr = np.array([c["k"] for c in cams], dtype=np.float64)
    d_arr = np.array([c["d"] for c in cams], dtype=np.float64)
    r_arr = np.array([c["r"] for c in cams], dtype=np.float64)
    t_arr = np.array([c["t"] for c in cams], dtype=np.float64)
    return k_arr, d_arr, r_arr, t_arr, tuple(data["camera_resolution"])


def find_scene_file(data_dir, scene_fname=None, verbose: bool = True):
    """Walk up from ``data_dir`` to locate ``{n}_cam_scene_sba.json`` (or a
    given scene filename) — the contract of the missing
    lib.utils.find_scene_file (call sites: src/all_optimizations.py:220,601,911).

    Returns (k_arr, d_arr(C,4), r_arr, t_arr, cam_res, n_cams, scene_fpath).
    """
    # primary pattern, then any scene variant (the shipped human data
    # uses 4_cam_scene_static_sba.json, build.py:97)
    patterns = (
        [scene_fname] if scene_fname
        else ["[1-9]_cam_scene_sba.json", "[1-9]_cam_scene*.json"]
    )
    current = os.path.abspath(data_dir)
    while True:
        for sub in ("extrinsic_calib", "."):
            hits = []
            for pattern in patterns:
                hits = sorted(glob(os.path.join(current, sub, pattern)))
                if hits:
                    break
            if hits:
                scene_fpath = hits[-1]
                k_arr, d_arr, r_arr, t_arr, cam_res = load_scene(scene_fpath)
                # trust the file contents over the filename: the shipped
                # human scene is named 4_cam_... but holds 2 cameras
                # (matching the 2 shipped DLC .h5 files)
                n_cams = len(k_arr)
                m = re.match(r"(\d+)_cam_scene", os.path.basename(scene_fpath))
                if verbose:
                    print(f"Loaded scene file {scene_fpath}")
                    if m and int(m.group(1)) != n_cams:
                        print(
                            f"  note: filename claims {m.group(1)} cams, "
                            f"file holds {n_cams}"
                        )
                return k_arr, d_arr.reshape((-1, 4)), r_arr, t_arr, cam_res, n_cams, scene_fpath
        parent = os.path.dirname(current)
        if parent == current:
            raise FileNotFoundError(
                f"No scene file matching {patterns} found walking up from {data_dir}"
            )
        current = parent


# --------------------------------------------------------------------------
# Checkerboard object points (src/calib/utils.py:10-13)
# --------------------------------------------------------------------------


def create_board_object_pts(board_shape: Tuple[int, int], square_edge_length: float) -> np.ndarray:
    object_pts = np.zeros((board_shape[0] * board_shape[1], 3), np.float32)
    object_pts[:, :2] = (
        np.mgrid[0 : board_shape[0], 0 : board_shape[1]].T.reshape(-1, 2) * square_edge_length
    )
    return object_pts


# --------------------------------------------------------------------------
# DeepLabCut .h5 ingestion (pytables frame_table parsed via h5py)
# --------------------------------------------------------------------------


def _read_dlc_h5(fpath) -> Tuple[np.ndarray, List[str], np.ndarray]:
    """Read one DLC .h5 -> (frames (N,), bodyparts (L,), values (N, L, 3)).

    values[..., :] = (x, y, likelihood). Handles the pandas
    'frame_table' layout: column names are in the pickled
    ``non_index_axes`` group attribute; data in ``<group>/table`` with
    fields 'index' and 'values_block_0'. Falls back to the
    'fixed'-format layout (axis0/axis1/block0_values) if present.
    """
    import h5py

    with h5py.File(fpath, "r") as f:
        group = f[list(f.keys())[0]]
        if "table" in group:  # pytables "table" format
            attrs = dict(group.attrs)
            non_index_axes = pickle.loads(bytes(attrs["non_index_axes"]))
            # non_index_axes = [(axis, [ (scorer, bodypart, coord), ... ])]
            columns = non_index_axes[0][1]
            table = group["table"][:]
            frames = table["index"].astype(np.int64)
            vals = table["values_block_0"].astype(np.float64)
        else:  # pandas "fixed" format
            def _s(x):
                return x.decode() if isinstance(x, bytes) else str(x)

            columns_arrs = [group[f"axis0_level{i}"][:] for i in range(3)]
            labels = [group[f"axis0_label{i}"][:] for i in range(3)]
            columns = [
                tuple(_s(columns_arrs[lvl][lab[j]]) for lvl, lab in enumerate(labels))
                for j in range(len(labels[0]))
            ]
            frames = group["axis1"][:].astype(np.int64)
            vals = group["block0_values"][:].astype(np.float64)

    # column order: (scorer, bodypart, coord) triples; group by bodypart
    bodyparts: List[str] = []
    col_of: Dict[Tuple[str, str], int] = {}
    for j, col in enumerate(columns):
        _, bp, coord = col
        if bp not in bodyparts:
            bodyparts.append(bp)
        col_of[(bp, coord)] = j
    n, L = len(frames), len(bodyparts)
    out = np.full((n, L, 3), np.nan)
    for i, bp in enumerate(bodyparts):
        for k, coord in enumerate(("x", "y", "likelihood")):
            j = col_of.get((bp, coord))
            if j is not None:
                out[:, i, k] = vals[:, j]
    return frames, bodyparts, out


def save_dlc_points_h5(
    fpath: str,
    pixels: np.ndarray,  # (N, L, 2)
    likelihood: np.ndarray,  # (N, L)
    markers: List[str],
    scorer: str = "acinoset_tpu",
):
    """Write a DLC-style .h5 keypoint file (pandas 'fixed'-format layout,
    emitted directly with h5py so no pytables dependency is needed;
    `_read_dlc_h5` and DeepLabCut-compatible readers parse it)."""
    import h5py

    N, L, _ = pixels.shape
    vals = np.concatenate([pixels, likelihood[..., None]], axis=-1).reshape(N, L * 3)
    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    with h5py.File(fpath, "w") as f:
        g = f.create_group("df_with_missing")
        g.attrs["pandas_type"] = np.bytes_(b"frame")
        g.attrs["CLASS"] = np.bytes_(b"GROUP")
        str_dt = h5py.string_dtype("utf-8")
        g.create_dataset("axis0_level0", data=np.array([scorer], dtype=object), dtype=str_dt)
        g.create_dataset("axis0_level1", data=np.array(markers, dtype=object), dtype=str_dt)
        g.create_dataset(
            "axis0_level2", data=np.array(["x", "y", "likelihood"], dtype=object), dtype=str_dt
        )
        g.create_dataset("axis0_label0", data=np.zeros(L * 3, dtype=np.int64))
        g.create_dataset("axis0_label1", data=np.repeat(np.arange(L, dtype=np.int64), 3))
        g.create_dataset("axis0_label2", data=np.tile(np.arange(3, dtype=np.int64), L))
        g.create_dataset("axis1", data=np.arange(N, dtype=np.int64))
        g.create_dataset("block0_values", data=vals.astype(np.float64))
    return fpath


@dataclass
class Points2D:
    """Dense multi-camera 2D keypoint container — the TPU-native data model.

    pixels:     (C, N, L, 2) float64
    likelihood: (C, N, L)    float64 (NaN where a frame/marker is absent)
    frames:     (N,) original frame indices (contiguous range)
    markers:    list of L marker names, in canonical order
    """

    pixels: np.ndarray
    likelihood: np.ndarray
    frames: np.ndarray
    markers: List[str]

    @property
    def n_cams(self) -> int:
        return self.pixels.shape[0]

    def window(self, start_frame: int, end_frame: int) -> "Points2D":
        """Slice to frame indices [start_frame, end_frame) (0-based)."""
        sel = (self.frames >= start_frame) & (self.frames < end_frame)
        return Points2D(
            self.pixels[:, sel], self.likelihood[:, sel], self.frames[sel], self.markers
        )

    def valid(self, thresh: float) -> np.ndarray:
        """(C, N, L) bool: likelihood strictly above thresh (reference
        filters with '>' — src/all_optimizations.py:263)."""
        return np.nan_to_num(self.likelihood, nan=-1.0) > thresh


def load_dlc_points(fpaths: Sequence[str], markers: Optional[List[str]] = None) -> Points2D:
    """Load per-camera DLC .h5 files into a dense Points2D.

    Replaces lib.utils.load_dlc_points_as_df +
    create_dlc_points_2d_file (src/calib/utils.py:105-120) with a dense
    array layout. ``markers`` fixes the marker order (e.g.
    misc.get_markers() for the cheetah); by default uses the file's
    bodypart order. Markers missing from a file get NaN/0-likelihood.
    """
    per_cam = [_read_dlc_h5(p) for p in fpaths]
    n_frames = max(int(f[-1]) + 1 for f, _, _ in per_cam)
    if markers is None:
        markers = per_cam[0][1]
    L = len(markers)
    C = len(per_cam)
    pixels = np.full((C, n_frames, L, 2), np.nan)
    likelihood = np.full((C, n_frames, L), np.nan)
    for c, (frames, bodyparts, vals) in enumerate(per_cam):
        bp_idx = {bp: i for i, bp in enumerate(bodyparts)}
        for i, m in enumerate(markers):
            if m in bp_idx:
                pixels[c, frames, i] = vals[:, bp_idx[m], :2]
                likelihood[c, frames, i] = vals[:, bp_idx[m], 2]
    return Points2D(pixels, likelihood, np.arange(n_frames), list(markers))


def load_dlc_points_as_df(fpaths: Sequence[str], verbose: bool = False):
    """Compat shim returning the reference's tidy dataframe
    ``[frame, camera, marker, x, y, likelihood]``
    (src/calib/utils.py:105-120)."""
    import pandas as pd

    rows = []
    for c, p in enumerate(fpaths):
        frames, bodyparts, vals = _read_dlc_h5(p)
        if verbose:
            print(f"Loaded {p}: {len(frames)} frames, {len(bodyparts)} markers")
        n, L = vals.shape[:2]
        rows.append(
            pd.DataFrame(
                {
                    "frame": np.repeat(frames, L),
                    "camera": c,
                    "marker": np.tile(np.array(bodyparts, dtype=object), n),
                    "x": vals[:, :, 0].ravel(),
                    "y": vals[:, :, 1].ravel(),
                    "likelihood": vals[:, :, 2].ravel(),
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def points2d_from_df(df, markers: List[str]) -> Points2D:
    """Tidy dataframe -> dense Points2D (inverse of the compat shim)."""
    cams = sorted(df["camera"].unique())
    n_frames = int(df["frame"].max()) + 1
    C, L = len(cams), len(markers)
    pixels = np.full((C, n_frames, L, 2), np.nan)
    likelihood = np.full((C, n_frames, L), np.nan)
    m_idx = {m: i for i, m in enumerate(markers)}
    for c_i, c in enumerate(cams):
        sub = df[df["camera"] == c]
        li = sub["marker"].map(m_idx).to_numpy()
        fi = sub["frame"].to_numpy().astype(int)
        ok = ~np.isnan(li.astype(float))
        li = li[ok].astype(int)
        fi = fi[ok]
        pixels[c_i, fi, li, 0] = sub["x"].to_numpy()[ok]
        pixels[c_i, fi, li, 1] = sub["y"].to_numpy()[ok]
        likelihood[c_i, fi, li] = sub["likelihood"].to_numpy()[ok]
    return Points2D(pixels, likelihood, np.arange(n_frames), list(markers))


# --------------------------------------------------------------------------
# Skeleton & result pickles
# --------------------------------------------------------------------------


def load_skeleton(fpath) -> Dict:
    """Load a skeleton dict pickle {links, dofs, positions, markers}
    (schema of skeletons/cheetah.pickle; reader src/build.py:19-26)."""
    with open(fpath, "rb") as f:
        return pickle.load(f)


def save_skeleton(fpath, skel_dict: Dict):
    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    with open(fpath, "wb") as f:
        pickle.dump(skel_dict, f)


def load_pickle(fpath) -> Dict:
    with open(fpath, "rb") as f:
        return pickle.load(f)


def save_pickle(fpath, data: Dict):
    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    with open(fpath, "wb") as f:
        pickle.dump(data, f)
