"""Image undistortion maps vs cv2; df-compat triangulation; skeleton export."""
import cv2
import numpy as np
import jax.numpy as jnp

from acinoset_tpu.models import cheetah
from acinoset_tpu.ops import camera


def test_undistort_rectify_map_matches_cv2(fisheye_cam):
    K, D, _, _ = fisheye_cam
    size = (320, 180)
    Ks = K.copy()
    Ks[0, 0] /= 8; Ks[1, 1] /= 8; Ks[0, 2] /= 8; Ks[1, 2] /= 8
    mx, my = camera.undistort_rectify_map_fisheye(
        jnp.asarray(Ks), jnp.asarray(D), jnp.asarray(Ks), size
    )
    mx_ref, my_ref = cv2.fisheye.initUndistortRectifyMap(
        Ks, D, np.eye(3), Ks, size, cv2.CV_32FC1
    )
    np.testing.assert_allclose(np.asarray(mx), mx_ref, atol=1e-2)
    np.testing.assert_allclose(np.asarray(my), my_ref, atol=1e-2)


def test_undistort_image_roundtrip(fisheye_cam, rng):
    K, D, _, _ = fisheye_cam
    Ks = K.copy()
    Ks[0, 0] /= 8; Ks[1, 1] /= 8; Ks[0, 2] /= 8; Ks[1, 2] /= 8
    img = rng.uniform(0, 1, (180, 320)).astype(np.float32)
    out = np.asarray(camera.undistort_image_fisheye(jnp.asarray(img), Ks, D))
    assert out.shape == img.shape
    ref = cv2.remap(
        img,
        *cv2.fisheye.initUndistortRectifyMap(Ks, D, np.eye(3), Ks, (320, 180), cv2.CV_32FC1),
        interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
    )
    # interiors agree (borders differ by out-of-range policy)
    diff = np.abs(out[20:-20, 20:-20] - ref[20:-20, 20:-20])
    assert np.median(diff) < 1e-3, np.median(diff)


def test_undistort_pinhole_map_and_image_match_cv2(rng):
    """Rational-model image undistortion == cv2.initUndistortRectifyMap
    + cv2.remap (reference create_undistort_img_function,
    src/calib/calib.py:33-38)."""
    size = (320, 180)
    K = np.array([[260.0, 0, 160.0], [0, 258.0, 90.0], [0, 0, 1.0]])
    # 8-coefficient rational model (k1 k2 p1 p2 k3 k4 k5 k6)
    D = np.array([-0.3, 0.12, 1e-3, -2e-3, -0.02, -0.25, 0.08, -0.01])
    mx, my = camera.undistort_rectify_map_pinhole(
        jnp.asarray(K), jnp.asarray(D), jnp.asarray(K), size
    )
    mx_ref, my_ref = cv2.initUndistortRectifyMap(
        K, D, None, K, size, cv2.CV_32FC1
    )
    np.testing.assert_allclose(np.asarray(mx), mx_ref, atol=1e-2)
    np.testing.assert_allclose(np.asarray(my), my_ref, atol=1e-2)

    img = rng.uniform(0, 1, (180, 320)).astype(np.float32)
    out = np.asarray(camera.undistort_image_pinhole(jnp.asarray(img), K, D))
    assert out.shape == img.shape
    ref = cv2.remap(img, mx_ref, my_ref, interpolation=cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT)
    diff = np.abs(out[20:-20, 20:-20] - ref[20:-20, 20:-20])
    assert np.median(diff) < 1e-3, np.median(diff)

    # short (5-coefficient) vectors zero-pad like cv2
    D5 = np.array([-0.3, 0.12, 1e-3, -2e-3, -0.02])
    mx5, my5 = camera.undistort_rectify_map_pinhole(
        jnp.asarray(K), jnp.asarray(D5), jnp.asarray(K), size
    )
    mx5_ref, my5_ref = cv2.initUndistortRectifyMap(K, D5, None, K, size, cv2.CV_32FC1)
    np.testing.assert_allclose(np.asarray(mx5), mx5_ref, atol=1e-2)
    np.testing.assert_allclose(np.asarray(my5), my5_ref, atol=1e-2)


def test_get_pairwise_3d_points_from_df():
    import pandas as pd

    from acinoset_tpu.pipeline.tri import get_pairwise_3d_points_from_df
    import synthetic

    cams = synthetic.ring_cameras(n_cams=3)
    k, d, r, t, _res = cams
    X = synthetic.cheetah_gallop(N=5, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=0.0, outlier_frac=0, bad_lik_frac=0, seed=0
    )
    rows = []
    markers = cheetah.get_markers()
    for c in range(3):
        for n in range(5):
            for l, m in enumerate(markers):
                rows.append(dict(frame=n, camera=c, marker=m,
                                 x=pixels[c, n, l, 0], y=pixels[c, n, l, 1]))
    df = pd.DataFrame(rows)
    out = get_pairwise_3d_points_from_df(df, k, d, r, t)
    assert set(out.columns) == {"frame", "marker", "x", "y", "z"}
    row = out[(out.frame == 2) & (out.marker == "nose")].iloc[0]
    ni = markers.index("nose")
    np.testing.assert_allclose([row.x, row.y, row.z], pts3d[2, ni], atol=1e-5)


def test_cheetah_skeleton_export():
    skel = cheetah.to_skeleton_dict()
    assert set(skel.keys()) >= {"links", "dofs", "positions", "markers"}
    assert len(skel["markers"]) == 20
    np.testing.assert_allclose(skel["positions"]["spine"], [-0.65, 0, 0], atol=1e-9)
    from acinoset_tpu.models.skeleton import build_skeleton_model

    # the export is interchange-grade, NOT FK-equivalent to the flagship
    # chain — compiling it into a solvable generic model must refuse by
    # default (VERDICT r3 item 8: the silent-mismatch path is closed)
    assert skel["fk_equivalent"] is False
    import pytest

    with pytest.raises(ValueError, match="flagship"):
        build_skeleton_model(skel, promote_markers_to_3dof=False)
    model = build_skeleton_model(
        skel, promote_markers_to_3dof=False, allow_fk_mismatch=True
    )
    p = np.asarray(model.fk(np.zeros(model.n_pose)))
    ref = np.asarray(cheetah.fk(np.zeros(45)))
    # zero-pose layouts agree up to the root (nose vs head origin) offset
    i = model.markers.index("tail2")
    j = cheetah.MARKERS.index("tail2")
    np.testing.assert_allclose(
        p[i] - p[model.markers.index("nose")], ref[j] - ref[cheetah.MARKERS.index("nose")],
        atol=1e-9,
    )
