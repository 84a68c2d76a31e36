"""Standard (pinhole) camera calibration paths vs synthetic ground truth."""
import cv2
import numpy as np
import jax.numpy as jnp

from acinoset_tpu.calib import intrinsics, extrinsics
from acinoset_tpu.ops import camera as cam_ops
from acinoset_tpu.ops.rotations import rodrigues
from acinoset_tpu.pipeline import data


def _board_views(rng, K, D, F=10, board=(9, 6), square=0.04):
    obj = data.create_board_object_pts(board, square)
    views = []
    poses = []
    for _ in range(F):
        R = np.asarray(rodrigues(rng.normal(scale=0.35, size=3)))
        t = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.2, 0.2), rng.uniform(0.8, 2.0)])
        pix = np.asarray(cam_ops.project_points_pinhole(obj, K, D, R, t))
        views.append(pix + rng.normal(scale=0.2, size=pix.shape))
        poses.append((R, t))
    return obj, np.array(views).reshape(F, board[0], board[1], 2), poses


def test_undistort_points_pinhole_matches_cv2(rng):
    K = np.array([[800.0, 0, 640], [0, 790.0, 360], [0, 0, 1]])
    D8 = np.array([0.12, -0.07, 0.001, -0.002, 0.02, 0.03, -0.02, 0.004])
    pix = rng.uniform([100, 100], [1180, 620], size=(200, 2))
    ours = np.asarray(cam_ops.undistort_points_pinhole(pix, K, D8))
    ref = cv2.undistortPoints(pix.reshape(-1, 1, 2), K, D8).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_calibrate_camera_pinhole(rng):
    K_true = np.array([[820.0, 0, 640.0], [0, 810.0, 360.0], [0, 0, 1]])
    D_true = np.array([0.08, -0.03, 0.0005, -0.001, 0.005, 0.0, 0.0, 0.0])
    obj, views, _ = _board_views(rng, K_true, D_true, F=12)
    K, D, rvecs, tvecs, rms = intrinsics.calibrate_camera(obj, views, (1280, 720))
    assert float(rms) < 0.5, float(rms)
    # focal lengths recovered within ~1%
    np.testing.assert_allclose(np.asarray(K)[0, 0], K_true[0, 0], rtol=0.02)
    np.testing.assert_allclose(np.asarray(K)[1, 1], K_true[1, 1], rtol=0.02)


def test_calibrate_pair_extrinsics_pinhole(rng):
    K = np.array([[820.0, 0, 640.0], [0, 810.0, 360.0], [0, 0, 1]])
    D = np.array([0.05, -0.02, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    R_rel = np.asarray(rodrigues(np.array([0.04, -0.3, 0.06])))
    t_rel = np.array([0.8, 0.05, 0.15])
    obj = data.create_board_object_pts((9, 6), 0.04)
    rng2 = np.random.default_rng(11)
    p1s, p2s = [], []
    for _ in range(8):
        Rb = np.asarray(rodrigues(rng2.normal(scale=0.3, size=3)))
        tb = np.array([rng2.uniform(-0.3, 0.3), rng2.uniform(-0.2, 0.2), rng2.uniform(1.2, 2.5)])
        p1 = np.asarray(cam_ops.project_points_pinhole(obj, K, D, Rb, tb))
        p2 = np.asarray(cam_ops.project_points_pinhole(obj, K, D, R_rel @ Rb, R_rel @ tb + t_rel))
        p1s.append(p1 + rng2.normal(scale=0.2, size=p1.shape))
        p2s.append(p2 + rng2.normal(scale=0.2, size=p2.shape))
    rms, R, t = extrinsics.calibrate_pair_extrinsics(
        obj, np.array(p1s), np.array(p2s), K, D, K, D, (1280, 720), num_iters=40
    )
    assert float(rms) < 0.5, float(rms)
    np.testing.assert_allclose(np.asarray(R), R_rel, atol=3e-3)
    np.testing.assert_allclose(np.asarray(t).ravel(), t_rel, atol=8e-3)


def test_triangulate_points_pinhole(rng, fisheye_cam):
    K = np.array([[820.0, 0, 640.0], [0, 810.0, 360.0], [0, 0, 1]])
    D = np.array([0.05, -0.02, 0.001, -0.001, 0.0, 0.0, 0.0, 0.0])
    R1 = np.eye(3)
    t1 = np.zeros((3, 1))
    R2 = np.asarray(rodrigues(np.array([0.0, -0.2, 0.0])))
    t2 = np.array([[0.6], [0.0], [0.1]])
    world = rng.uniform(-0.5, 0.5, (50, 3))
    world[:, 2] = rng.uniform(1.5, 4.0, 50)
    p1 = np.asarray(cam_ops.project_points_pinhole(world, K, D, R1, t1.ravel()))
    p2 = np.asarray(cam_ops.project_points_pinhole(world, K, D, R2, t2.ravel()))
    out = np.asarray(cam_ops.triangulate_points(p1, p2, K, D, R1, t1, K, D, R2, t2))
    np.testing.assert_allclose(out, world, atol=1e-5)
