"""Native C++ corner engine vs the JAX reference detector + cv2 corners."""
import os
import subprocess

import imageio.v2 as imageio
import numpy as np
import pytest
from scipy.spatial import cKDTree

from acinoset_tpu.calib import corners, native
from acinoset_tpu.pipeline import data

REF = "/root/reference/data/thursday_kiara/extrinsic_calib"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native.available():
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
        native._SEARCHED = False  # re-probe
    assert native.available()


def test_native_matches_reference_corners():
    pts_ref, fnames, board_shape, _e, _res = data.load_points(
        f"{REF}/points/points_cam1.json"
    )
    imgs = [imageio.imread(f"{REF}/frames/1/{fn}") for fn in fnames[:4]]
    grids, found = native.find_corners_batch(imgs, tuple(board_shape))
    assert found.all()
    for i, fn in enumerate(fnames[:4]):
        ref = pts_ref[fnames.index(fn)].reshape(-1, 2)
        d, _ = cKDTree(ref).query(grids[i].reshape(-1, 2))
        assert np.median(d) < 0.5, (fn, np.median(d))
        assert d.max() < 2.0, (fn, d.max())


def test_native_matches_jax_detector():
    img = imageio.imread(f"{REF}/frames/2/0.png")
    _pts, fnames, board_shape, _e, _res = data.load_points(f"{REF}/points/points_cam2.json")
    g_native, ok_n = native.find_corners(img, tuple(board_shape))
    g_jax, ok_j = corners.find_corners(img, tuple(board_shape))
    assert ok_n and ok_j
    # same canonical ordering, sub-pixel agreement
    d = np.linalg.norm(g_native.reshape(-1, 2) - g_jax.reshape(-1, 2), axis=1)
    assert np.median(d) < 0.3, np.median(d)


def test_find_corners_images_engine_switch(tmp_path):
    src = f"{REF}/frames/3"
    _pts, fnames, board_shape, _e, _res = data.load_points(f"{REF}/points/points_cam3.json")
    paths = [os.path.join(src, f) for f in ["0.png", "1.png"]]
    pts_n, names_n, res_n = corners.find_corners_images(
        paths, tuple(board_shape), verbose=False, engine="native"
    )
    assert len(names_n) >= 1
    assert pts_n.shape[1:] == tuple(board_shape) + (2,)
