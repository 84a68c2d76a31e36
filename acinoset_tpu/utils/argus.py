"""Argus Clicker -> manual_points.json converter (src/argus_converter.py twin).

Argus exports manually-clicked multi-camera correspondences as a wide
CSV (columns like 'track_cam_1_x', 'track_cam_1_y', ...) plus a YAML
config holding the camera resolution. AcinoSet's manual-point tools
expect ``manual_points.json`` with points shaped (n_points, n_cams, 2)
and the y axis flipped (Argus measures y up from the bottom;
src/argus_converter.py:67).
"""
from __future__ import annotations

import json
import os
import re
from typing import Optional, Tuple

import numpy as np


def convert_argus_csv(
    csv_fpath: str,
    yaml_fpath: Optional[str] = None,
    out_fpath: Optional[str] = None,
    camera_resolution: Tuple[int, int] = (2704, 1520),
):
    """Convert an Argus clicker CSV (+YAML config) to manual_points.json.

    Returns the points array (n_points, n_cams, 2) with NaN for
    unclicked views.
    """
    import pandas as pd

    if yaml_fpath:
        import yaml

        with open(yaml_fpath) as f:
            cfg = yaml.safe_load(f)
        # argus configs store image width/height (possibly per camera)
        w = cfg.get("image_width") or cfg.get("width") or camera_resolution[0]
        h = cfg.get("image_height") or cfg.get("height") or camera_resolution[1]
        camera_resolution = (int(w), int(h))

    df = pd.read_csv(csv_fpath)
    cam_ids = sorted(
        {int(m.group(1)) for c in df.columns for m in [re.search(r"cam[_ ]?(\d+)[_ ]?x$", c.lower())] if m}
    )
    n_cams = len(cam_ids)
    n_points = len(df)
    pts = np.full((n_points, n_cams, 2), np.nan)
    for ci, cam in enumerate(cam_ids):
        xcol = next(c for c in df.columns if re.search(rf"cam[_ ]?{cam}[_ ]?x$", c.lower()))
        ycol = next(c for c in df.columns if re.search(rf"cam[_ ]?{cam}[_ ]?y$", c.lower()))
        pts[:, ci, 0] = df[xcol].to_numpy()
        # Argus y runs bottom-up; AcinoSet expects top-down pixels
        pts[:, ci, 1] = camera_resolution[1] - df[ycol].to_numpy()
    out_fpath = out_fpath or os.path.join(os.path.dirname(csv_fpath), "manual_points.json")
    with open(out_fpath, "w") as f:
        json.dump(
            {
                "camera_resolution": list(camera_resolution),
                "points": np.where(np.isfinite(pts), pts, None).tolist(),
            },
            f,
        )
    print(f"Saved {out_fpath}")
    return pts
