"""Host-side video I/O: frame extraction, labeled videos, animations.

Rebuilds the reference's video utilities (lib.app.create_labeled_videos,
lib.extract.get_frames — SURVEY.md §2.3; src/make_anim.py). Video codecs
are host-CPU work by nature (the reference used the same OpenCV C++
capability); the TPU framework keeps this as a thin adapter around cv2
with imageio fallback.
"""
from __future__ import annotations

import os
import re
from glob import glob
from typing import List, Optional, Sequence

import numpy as np


from . import data as data_io
from .plots import CHEETAH_LINKS


def get_frames(video_fpath: str, frame_indices: Sequence[int], out_dir: Optional[str] = None):
    """Extract specific frames from a video (non-interactive core of
    src/calib/extract.py:21-44). Returns list of (index, image)."""
    import cv2

    cap = cv2.VideoCapture(video_fpath)
    out = []
    for idx in frame_indices:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
        ok, frame = cap.read()
        if not ok:
            continue
        out.append((idx, frame))
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            cv2.imwrite(os.path.join(out_dir, f"{idx}.png"), frame)
    cap.release()
    return out


def _load_2d_labels(fpath: str):
    """Load a DLC-style 2D label file (.h5 or the .pickle fallback that
    save_3d_cheetah_as_2d writes) -> (frames, markers, (N, L, 3))."""
    if fpath.endswith(".pickle"):
        import pandas as pd

        df = pd.read_pickle(fpath)
        markers = list(dict.fromkeys(c[1] for c in df.columns))
        vals = df.to_numpy().reshape(len(df), len(markers), 3)
        return df.index.to_numpy(), markers, vals
    frames, markers, vals = data_io._read_dlc_h5(fpath)
    return frames, markers, vals


def create_labeled_videos(
    video_fpaths: Sequence[str],
    out_dir: str,
    draw_skeleton: bool = True,
    pcutoff: float = 0.5,
    label_fpaths: Optional[Sequence[str]] = None,
    max_frames: Optional[int] = None,
):
    """Burn 2D keypoints (+skeleton) into videos
    (lib.app.create_labeled_videos; call sites
    src/all_optimizations.py:563,945). Looks for per-camera label files
    in out_dir when label_fpaths is not given."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    outputs = []
    for ci, vid in enumerate(video_fpaths):
        if label_fpaths is not None:
            lf = label_fpaths[ci]
        else:
            cands = sorted(
                glob(os.path.join(out_dir, f"*cam{ci + 1}.h5"))
                + glob(os.path.join(out_dir, f"*cam{ci + 1}.pickle"))
            )
            if not cands:
                print(f"No labels for cam{ci + 1}; skipping {vid}")
                continue
            lf = cands[0]
        frames_idx, markers, vals = _load_2d_labels(lf)
        link_idx = [
            (markers.index(a), markers.index(b))
            for a, b in CHEETAH_LINKS
            if a in markers and b in markers
        ]
        cap = cv2.VideoCapture(vid)
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        W = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        H = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        out_fpath = os.path.join(
            out_dir, os.path.basename(vid).replace(".mp4", "_labeled.mp4")
        )
        writer = cv2.VideoWriter(
            out_fpath, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H)
        )
        lookup = {int(f): i for i, f in enumerate(frames_idx)}
        colors = [
            tuple(int(c) for c in np.array([37, 99, 235]) * (0.4 + 0.6 * i / max(len(markers) - 1, 1)))
            for i in range(len(markers))
        ]
        n = 0
        while True:
            ok, frame = cap.read()
            if not ok or (max_frames is not None and n >= max_frames):
                break
            row = lookup.get(n)
            if row is not None:
                pts = vals[row]
                if draw_skeleton:
                    for a, b in link_idx:
                        pa, pb = pts[a], pts[b]
                        if (
                            np.isfinite(pa[:2]).all() and np.isfinite(pb[:2]).all()
                            and pa[2] >= pcutoff and pb[2] >= pcutoff
                        ):
                            cv2.line(
                                frame,
                                (int(pa[0]), int(pa[1])),
                                (int(pb[0]), int(pb[1])),
                                (200, 200, 200), 1,
                            )
                for li, p in enumerate(pts):
                    if np.isfinite(p[:2]).all() and p[2] >= pcutoff:
                        cv2.circle(frame, (int(p[0]), int(p[1])), 3, colors[li], -1)
            writer.write(frame)
            n += 1
        cap.release()
        writer.release()
        outputs.append(out_fpath)
        print(f"Saved {out_fpath}")
    return outputs


# ---- src/make_anim.py twins ----------------------------------------------


def natural_sort(items: Sequence[str]) -> List[str]:
    """Natural (numeric-aware) sort (src/make_anim.py:41-44)."""
    def key(s):
        return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]

    return sorted(items, key=key)


def extract_frame_range(video_fpath: str, start: int, end: int, out_dir: str):
    """Dump frames [start, end) of a video as PNGs (src/make_anim.py:8-39)."""
    return get_frames(video_fpath, range(start, end), out_dir=out_dir)


def images_to_video(image_fpaths: Sequence[str], out_fpath: str, fps: float = 30.0):
    """Stitch images into a video (src/make_anim.py:46-74)."""
    import cv2

    image_fpaths = natural_sort(list(image_fpaths))
    first = cv2.imread(image_fpaths[0])
    H, W = first.shape[:2]
    writer = cv2.VideoWriter(out_fpath, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    for p in image_fpaths:
        img = cv2.imread(p)
        writer.write(img)
    writer.release()
    print(f"Saved {out_fpath}")
    return out_fpath


def vstack_images(image_fpaths: Sequence[str], out_fpath: str):
    """Vertical concatenation (src/make_anim.py:76-90)."""
    import cv2

    imgs = [cv2.imread(p) for p in image_fpaths]
    w = min(i.shape[1] for i in imgs)
    imgs = [i[:, :w] for i in imgs]
    out = np.concatenate(imgs, axis=0)
    cv2.imwrite(out_fpath, out)
    return out_fpath
