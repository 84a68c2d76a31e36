"""Skeleton builder, label session, pan compensation, Argus import."""
import json
import os

import numpy as np

from acinoset_tpu.gui.label_session import LabelSession
from acinoset_tpu.gui.skeleton_builder import SkeletonBuilder, patch_markers
from acinoset_tpu.models.skeleton import build_skeleton_model
from acinoset_tpu.utils import pan_compensation
from acinoset_tpu.utils.argus import convert_argus_csv


def test_skeleton_builder_roundtrip(tmp_path):
    b = (
        SkeletonBuilder()
        .add_part("nose", [0, 0, 0], dofs=(1, 1, 1))
        .add_part("neck", [-0.3, 0, 0], dofs=(0, 1, 0))
        .add_part("tail", [-0.8, 0, 0], dofs=(0, 1, 1))
    )
    b.link("nose", "neck").link("neck", "tail")
    assert b.validate() == []
    fp = str(tmp_path / "skel.pickle")
    skel = b.save(fp)
    model = build_skeleton_model(skel)
    assert model.n_markers == 3
    x = np.zeros(model.n_pose)
    p = np.asarray(model.fk(x))
    np.testing.assert_allclose(p[model.markers.index("tail")], [-0.8, 0, 0], atol=1e-12)
    # patch markers utility
    patch_markers(fp, ["nose", "tail"])
    from acinoset_tpu.pipeline import data

    assert data.load_skeleton(fp)["markers"] == ["nose", "tail"]


def test_label_session_roundtrip(tmp_path):
    s = LabelSession(n_cams=3, camera_resolution=(1920, 1080))
    i = s.new_point()
    s.record(i, 0, (100.5, 200.5))
    s.record(i, 2, (300.0, 400.0))
    s.record(1, 1, (7.0, 8.0))
    fp = str(tmp_path / "manual_points.json")
    s.save(fp)
    with open(fp) as f:
        payload = json.load(f)
    pts = payload["points"]
    assert pts[0][0] == [100.5, 200.5]
    assert pts[0][1] is None or pts[0][1] == [None, None]
    s2 = LabelSession.load(fp)
    arr = s2.as_array()
    assert arr.shape == (2, 3, 2)
    assert np.isnan(arr[0, 1]).all()
    np.testing.assert_allclose(arr[1, 1], [7.0, 8.0])


def test_pan_compensation():
    # full revolution returns to start
    theta = pan_compensation.count_to_rad(102000)
    np.testing.assert_allclose(float(theta), 2 * np.pi, rtol=1e-9)
    p = np.array([1.0, 0.0, 2.0])
    r = np.asarray(pan_compensation.rotate_point(p, np.pi / 2))
    np.testing.assert_allclose(r, [0.0, 1.0, 2.0], atol=1e-12)
    # batch form
    pts = np.tile(p, (5, 1))
    r5 = np.asarray(pan_compensation.rotate_point(pts, np.full(5, np.pi)))
    np.testing.assert_allclose(r5, np.tile([-1.0, 0.0, 2.0], (5, 1)), atol=1e-9)


def test_argus_converter(tmp_path):
    import pandas as pd

    df = pd.DataFrame(
        {
            "track_cam_1_x": [10.0, 20.0, np.nan],
            "track_cam_1_y": [100.0, 200.0, np.nan],
            "track_cam_2_x": [11.0, np.nan, 31.0],
            "track_cam_2_y": [110.0, np.nan, 310.0],
        }
    )
    csv = str(tmp_path / "clicks.csv")
    df.to_csv(csv, index=False)
    pts = convert_argus_csv(csv, camera_resolution=(2704, 1520))
    assert pts.shape == (3, 2, 2)
    np.testing.assert_allclose(pts[0, 0], [10.0, 1520 - 100.0])
    assert np.isnan(pts[2, 0]).all()
    assert os.path.exists(tmp_path / "manual_points.json")
