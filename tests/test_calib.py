"""Calibration subsystem tests against reference data + synthetic rigs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acinoset_tpu.calib import corners, extrinsics, intrinsics, pnp
from acinoset_tpu.ops import camera as cam_ops
from acinoset_tpu.ops.rotations import rodrigues
from acinoset_tpu.pipeline import data

REF = "/root/reference/data"


def test_homography_and_pose(rng):
    K = np.array([[800.0, 0, 640], [0, 800.0, 360], [0, 0, 1]])
    R = np.asarray(rodrigues(np.array([0.2, -0.3, 0.1])))
    t = np.array([0.1, -0.2, 1.5])
    obj = data.create_board_object_pts((9, 6), 0.04)[:, :2]
    world = np.concatenate([obj, np.zeros((54, 1))], axis=1)
    cam = world @ R.T + t
    pix = (cam / cam[:, 2:3]) @ K.T
    H = np.asarray(pnp.homography_dlt(jnp.asarray(obj), jnp.asarray(pix[:, :2])))
    # H reprojects the plane
    proj = (np.concatenate([obj, np.ones((54, 1))], 1) @ H.T)
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(proj, pix[:, :2], atol=1e-6)
    R2, t2 = pnp.pose_from_homography(jnp.asarray(H), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)


def test_fisheye_intrinsics_parity_with_reference():
    """Calibrating from the shipped 2021 corner data reproduces the
    shipped camera JSON (camera 2 — cams 2-4 agree exactly; cam 1's
    geometry leaves a center/tilt degeneracy both solvers fit equally)."""
    pts, fnames, board_shape, edge, res = data.load_points(
        f"{REF}/intrinsic_calib/2021/points_2.json"
    )
    k_ref, d_ref, _ = data.load_camera(f"{REF}/intrinsic_calib/2021/camera_2.json")
    obj = data.create_board_object_pts(board_shape, edge)
    cal = intrinsics.calibrate_fisheye_camera(obj, pts, res)
    assert float(cal.rms) < 0.5, float(cal.rms)
    # compare undistortion ray mappings over the observed corners
    pix = pts.reshape(-1, 2)
    ab_ref = np.asarray(cam_ops.undistort_points_fisheye(pix, k_ref, d_ref.ravel()))
    ab_our = np.asarray(
        cam_ops.undistort_points_fisheye(pix, np.asarray(cal.k), np.asarray(cal.d))
    )
    def rays(ab):
        v = np.concatenate([ab, np.ones_like(ab[:, :1])], axis=1)
        return v / np.linalg.norm(v, axis=1, keepdims=True)
    ang = np.arccos(np.clip(np.sum(rays(ab_ref) * rays(ab_our), axis=1), -1, 1))
    assert np.degrees(ang.max()) * 60 < 2.0, np.degrees(ang.max()) * 60  # < 2 arcmin


def test_corner_detection_vs_reference():
    import imageio.v2 as imageio
    from scipy.spatial import cKDTree

    pts_ref, fnames, board_shape, edge, res = data.load_points(
        f"{REF}/thursday_kiara/extrinsic_calib/points/points_cam1.json"
    )
    img = imageio.imread(f"{REF}/thursday_kiara/extrinsic_calib/frames/1/0.png")
    grid, ok = corners.find_corners(img, tuple(board_shape))
    assert ok
    assert grid.shape == tuple(board_shape) + (2,)
    ref = pts_ref[fnames.index("0.png")].reshape(-1, 2)
    d, _ = cKDTree(ref).query(grid.reshape(-1, 2))
    assert np.median(d) < 0.5, np.median(d)
    assert d.max() < 2.0, d.max()
    # canonical ordering is deterministic lattice (monotone corners)
    again, ok2 = corners.find_corners(img, tuple(board_shape))
    np.testing.assert_allclose(grid, again, atol=1e-6)


def test_stereo_pair_synthetic(rng):
    K = np.array([[700.0, 0, 1352], [0, 700.0, 760], [0, 0, 1.0]])
    D = np.array([0.04, 0.005, -0.006, 0.001])
    R_rel = np.asarray(rodrigues(np.array([0.05, -0.35, 0.08])))
    t_rel = np.array([1.2, 0.1, 0.25])
    obj = data.create_board_object_pts((9, 6), 0.04)
    F = 8
    p1s, p2s = [], []
    for f in range(F):
        Rb = np.asarray(rodrigues(rng.normal(scale=0.4, size=3)))
        tb = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3), rng.uniform(2, 5)])
        p1 = np.asarray(cam_ops.project_points_fisheye(obj, K, D, Rb, tb))
        p2 = np.asarray(
            cam_ops.project_points_fisheye(obj, K, D, R_rel @ Rb, R_rel @ tb + t_rel)
        )
        p1s.append(p1 + rng.normal(scale=0.2, size=p1.shape))
        p2s.append(p2 + rng.normal(scale=0.2, size=p2.shape))
    rms, R, t = extrinsics.calibrate_pair_extrinsics_fisheye(
        obj, np.array(p1s), np.array(p2s), K, D, K, D, (2704, 1520), num_iters=40
    )
    assert float(rms) < 0.5, float(rms)
    np.testing.assert_allclose(np.asarray(R), R_rel, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t).ravel(), t_rel, atol=5e-3)


@pytest.mark.slow
def test_pairwise_chain_reference_data():
    """Chained extrinsics from the shipped thursday_kiara corner data
    reproduce the shipped 4_cam_scene.json relative poses (the per-frame
    corner-ordering ambiguity is resolved automatically; the reference
    fixed it by hand)."""
    base = f"{REF}/thursday_kiara/extrinsic_calib"
    k_arr, d_arr, r_ref, t_ref, cam_res = data.load_scene(f"{base}/4_cam_scene.json")
    d4 = d_arr.reshape(4, -1)[:, :4]
    img_pts_arr, fnames_arr = [], []
    for i in range(1, 5):
        pts, fn, board_shape, edge, _ = data.load_points(f"{base}/points/points_cam{i}.json")
        img_pts_arr.append(pts)
        fnames_arr.append(fn)
    r_out, t_out = extrinsics.calibrate_pairwise_extrinsics(
        extrinsics.calibrate_pair_extrinsics_fisheye,
        img_pts_arr, fnames_arr, list(k_arr), list(d4), cam_res, board_shape, edge,
    )
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        Rab_ref = r_ref[b] @ r_ref[a].T
        Rab_our = np.asarray(r_out[b]) @ np.asarray(r_out[a]).T
        ang = np.degrees(
            np.arccos(np.clip((np.trace(Rab_our @ Rab_ref.T) - 1) / 2, -1, 1))
        )
        assert ang < 2.0, (a, b, ang)
        tab_ref = (t_ref[b] - Rab_ref @ t_ref[a]).ravel()
        tab_our = (np.asarray(t_out[b]) - Rab_our @ np.asarray(t_out[a])).ravel()
        assert np.linalg.norm(tab_our - tab_ref) < 0.08, (a, b)
