"""IO layer tests against the real reference data files."""
import os

import numpy as np
import pytest

from acinoset_tpu.pipeline import data

REF = "/root/reference/data"


def test_load_scene_reference_file():
    k, d, r, t, res = data.load_scene(os.path.join(REF, "4_cam_scene_static_sba.json"))
    assert k.shape[1:] == (3, 3)
    assert d.reshape(len(k), -1).shape[1] == 4
    assert r.shape[1:] == (3, 3)
    assert res == (1920, 1080)
    # rotations should be orthonormal
    for R in r:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_scene_roundtrip(tmp_path):
    k, d, r, t, res = data.load_scene(os.path.join(REF, "4_cam_scene_static_sba.json"))
    out = tmp_path / "2_cam_scene_sba.json"
    data.save_scene(str(out), k, d, r, t, res)
    k2, d2, r2, t2, res2 = data.load_scene(str(out))
    np.testing.assert_array_equal(k, k2)
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(r, r2)
    np.testing.assert_array_equal(t, t2)
    assert res == res2


def test_find_scene_file(tmp_path):
    k, d, r, t, res = data.load_scene(os.path.join(REF, "4_cam_scene_static_sba.json"))
    scene_dir = tmp_path / "2019_03_09" / "lily"
    run_dir = scene_dir / "run"
    run_dir.mkdir(parents=True)
    data.save_scene(str(scene_dir / "extrinsic_calib" / "2_cam_scene_sba.json"), k, d, r, t, res)
    k2, d2, *_rest, n_cams, fpath = data.find_scene_file(str(run_dir), verbose=False)
    assert n_cams == 2
    assert d2.shape == (2, 4)
    assert fpath.endswith("2_cam_scene_sba.json")


def test_load_points_old_and_new_schema():
    # new schema (board_square_len) from the shipped data
    pts, fnames, shape, edge, res = data.load_points(
        os.path.join(REF, "thursday_kiara/extrinsic_calib/points/points_cam1.json")
    )
    assert pts.ndim == 4 and pts.shape[-1] == 2
    assert len(fnames) == pts.shape[0]
    assert edge > 0
    # old schema round-trips through our saver (which emits new keys)
    import json, tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(
            {
                "created_timestamp": "x",
                "board_shape": [9, 6],
                "board_edge_len": 0.04,
                "camera_resolution": [2704, 1520],
                "points": {"img1.png": np.zeros((9 * 6, 1, 2)).tolist()},
            },
            f,
        )
        old = f.name
    pts2, fn2, shape2, edge2, res2 = data.load_points(old)
    assert shape2 == (9, 6) and edge2 == 0.04


def test_load_dlc_h5():
    fpaths = sorted(
        os.path.join(REF, f)
        for f in os.listdir(REF)
        if f.endswith(".h5")
    )
    assert len(fpaths) == 2
    p2d = data.load_dlc_points(fpaths)
    assert p2d.n_cams == 2
    assert p2d.pixels.shape[2] == 14  # human model bodyparts
    assert p2d.pixels.shape[1] == 6241  # Cam4 has one extra frame
    assert "forehead" in p2d.markers and "ankle1" in p2d.markers
    # likelihoods are in [0, 1]
    lk = p2d.likelihood[~np.isnan(p2d.likelihood)]
    assert lk.min() >= 0.0 and lk.max() <= 1.0
    # windowing
    w = p2d.window(60, 160)
    assert w.pixels.shape[1] == 100
    assert w.frames[0] == 60


def test_dlc_df_shim_consistent_with_dense():
    fpaths = sorted(
        os.path.join(REF, f) for f in os.listdir(REF) if f.endswith(".h5")
    )
    df = data.load_dlc_points_as_df(fpaths)
    assert set(["frame", "camera", "marker", "x", "y", "likelihood"]).issubset(df.columns)
    dense = data.load_dlc_points(fpaths)
    sub = df[(df.camera == 0) & (df.marker == "forehead")].sort_values("frame")
    i = dense.markers.index("forehead")
    frames = sub["frame"].to_numpy().astype(int)  # cam0 has one frame fewer than cam1
    np.testing.assert_allclose(sub["x"].to_numpy(), dense.pixels[0, frames, i, 0])
    back = data.points2d_from_df(df, dense.markers)
    np.testing.assert_allclose(back.pixels, dense.pixels, equal_nan=True)


def test_load_skeleton_and_results():
    sk = data.load_skeleton("/root/reference/skeletons/cheetah.pickle")
    assert set(sk.keys()) == {"links", "dofs", "positions", "markers"}
    assert len(sk["markers"]) == 18
    res = data.load_pickle(os.path.join(REF, "results", "traj_results.pickle"))
    assert res["positions"].shape == (100, 15, 3)
    assert res["x"].shape == (100, 48)
