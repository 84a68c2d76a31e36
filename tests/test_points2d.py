"""Project-directory 2D helpers (get_points.py twins)."""
import json
import os

import numpy as np
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline import data, points2d

import synthetic


@pytest.fixture(scope="module")
def project_dir(tmp_path_factory):
    proj = tmp_path_factory.mktemp("proj")
    dlc = proj / "dlc"
    dlc.mkdir()
    cams = synthetic.ring_cameras(n_cams=3)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=20, fps=90.0)
    pixels, likelihood, _ = synthetic.render_measurements(X, cams, noise_px=0.5, seed=3)
    for c in range(3):
        data.save_dlc_points_h5(
            str(dlc / f"cam{c + 1}.h5"), pixels[c], likelihood[c], cheetah.get_markers()
        )
    sd = proj / "extrinsic_calib"
    sd.mkdir()
    data.save_scene(str(sd / "3_cam_scene_sba.json"), k, d.reshape(-1, 4, 1), r, t, res)
    return str(proj)


def test_get_bodyparts(project_dir):
    bp = points2d.get_bodyparts(project_dir)
    assert bp == cheetah.get_markers()


def test_get_2d_points_df(project_dir):
    df = points2d.get_2d_points_df(project_dir)
    assert len(df) == 3 * 20 * 20
    assert set(["frame", "camera", "marker", "x", "y", "likelihood"]).issubset(df.columns)


def test_estimate_part_path(project_dir):
    slopes, intercepts = points2d.estimate_part_path(project_dir, "nose")
    # the synthetic gallop moves ~8 m/s in +x at 90 fps
    assert abs(slopes[0] - 8.0 / 90) < 0.02
