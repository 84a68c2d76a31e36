"""Parity tests: pure-JAX camera model vs OpenCV (the reference's engine)."""
import cv2
import numpy as np
import jax.numpy as jnp

from acinoset_tpu.ops import camera, rotations


def make_world_points(rng, n=200, z_range=(2.0, 12.0)):
    pts = rng.uniform(-1.5, 1.5, size=(n, 3))
    pts[:, 2] = rng.uniform(*z_range, size=n)
    return pts


def test_project_fisheye_matches_cv2(rng, fisheye_cam):
    K, D, R, t = fisheye_cam
    # points in front of the camera: build them in cam frame then pull back to world
    cam_pts = make_world_points(rng)
    world = (cam_pts - t.ravel()) @ R  # R^T @ (cam - t) = world
    ours = np.asarray(camera.project_points_fisheye(world, K, D, R, t))
    rvec = cv2.Rodrigues(R)[0]
    ref = cv2.fisheye.projectPoints(world.reshape(-1, 1, 3), rvec, t, K, D)[0].reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_undistort_fisheye_matches_cv2(rng, fisheye_cam):
    K, D, _, _ = fisheye_cam
    pix = rng.uniform([200, 200], [2500, 1300], size=(300, 2))
    ours = np.asarray(camera.undistort_points_fisheye(pix, K, D))
    ref = cv2.fisheye.undistortPoints(pix.reshape(-1, 1, 2), K, D).reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-8)
    # with P=K: undistorted pixel coords
    ours_p = np.asarray(camera.undistort_points_fisheye(pix, K, D, P=K))
    ref_p = cv2.fisheye.undistortPoints(pix.reshape(-1, 1, 2), K, D, P=K).reshape(-1, 2)
    np.testing.assert_allclose(ours_p, ref_p, atol=1e-5)


def test_project_undistort_roundtrip(rng, fisheye_cam):
    K, D, R, t = fisheye_cam
    cam_pts = make_world_points(rng)
    world = (cam_pts - t.ravel()) @ R
    pix = camera.project_points_fisheye(world, K, D, R, t)
    ab = camera.undistort_points_fisheye(pix, K, D)
    # normalized coords should equal cam-frame perspective division
    cam = world @ np.asarray(R).T + t.ravel()
    np.testing.assert_allclose(np.asarray(ab), cam[:, :2] / cam[:, 2:3], atol=1e-9)


def test_triangulate_fisheye_matches_cv2(rng, fisheye_cam):
    K, D, R1, t1 = fisheye_cam
    R2 = cv2.Rodrigues(np.array([0.05, -0.4, 0.0]))[0] @ R1
    t2 = t1 + np.array([[1.5], [0.1], [0.3]])
    world = make_world_points(rng, n=100)
    # keep only points in front of both cameras
    c1 = world @ R1.T + t1.ravel()
    c2 = world @ R2.T + t2.ravel()
    keep = (c1[:, 2] > 0.5) & (c2[:, 2] > 0.5)
    world = world[keep]
    p1 = np.asarray(camera.project_points_fisheye(world, K, D, R1, t1))
    p2 = np.asarray(camera.project_points_fisheye(world, K, D, R2, t2))

    ours = np.asarray(camera.triangulate_points_fisheye(p1, p2, K, D, R1, t1, K, D, R2, t2))
    # reference implementation via cv2 (mirrors src/calib/calib.py:121-130)
    u1 = cv2.fisheye.undistortPoints(p1.reshape(-1, 1, 2), K, D)
    u2 = cv2.fisheye.undistortPoints(p2.reshape(-1, 1, 2), K, D)
    P1 = np.hstack([R1, t1])
    P2 = np.hstack([R2, t2])
    X = cv2.triangulatePoints(P1, P2, u1, u2)
    ref = (X[:3] / X[3]).T
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    np.testing.assert_allclose(ours, world, atol=1e-6)


def test_project_pinhole_matches_cv2(rng, fisheye_cam):
    K, _, R, t = fisheye_cam
    D8 = np.array([0.1, -0.05, 0.001, -0.002, 0.01, 0.02, -0.01, 0.005])
    cam_pts = make_world_points(rng)
    world = (cam_pts - t.ravel()) @ R
    ours = np.asarray(camera.project_points_pinhole(world, K, D8, R, t))
    rvec = cv2.Rodrigues(R)[0]
    ref = cv2.projectPoints(world.reshape(-1, 1, 3), rvec, t, K, D8)[0].reshape(-1, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rodrigues_roundtrip(rng):
    rvecs = rng.normal(size=(50, 3))
    Rs = np.asarray(rotations.rodrigues(rvecs))
    for rv, R in zip(rvecs, Rs):
        ref = cv2.Rodrigues(rv)[0]
        np.testing.assert_allclose(R, ref, atol=1e-10)
    # vector round-trip only for |rvec| < pi (log map is canonical)
    inside = np.linalg.norm(rvecs, axis=1) < np.pi - 1e-2
    back = np.asarray(rotations.rodrigues_inv(Rs))
    np.testing.assert_allclose(back[inside], rvecs[inside], atol=1e-8)
    # beyond pi: matrix-level consistency exp(log(R)) == R
    Rs2 = np.asarray(rotations.rodrigues(back))
    np.testing.assert_allclose(Rs2, Rs, atol=1e-6)


def test_rodrigues_small_angle():
    tiny = np.array([1e-9, -2e-9, 0.5e-9])
    R = np.asarray(rotations.rodrigues(tiny))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-8)
    z = np.asarray(rotations.rodrigues(np.zeros(3)))
    np.testing.assert_allclose(z, np.eye(3), atol=0)


def test_triangulate_pairwise_mean_masked(rng, fisheye_cam):
    K, D, R1, t1 = fisheye_cam
    C, N, L = 3, 7, 5
    Rs, ts = [R1], [t1]
    for i in range(1, C):
        Rs.append(cv2.Rodrigues(np.array([0.0, -0.3 * i, 0.0]))[0] @ R1)
        ts.append(t1 + np.array([[1.0 * i], [0.0], [0.1 * i]]))
    world = make_world_points(rng, n=N * L).reshape(N, L, 3)
    pts2d = np.stack(
        [np.asarray(camera.project_points_fisheye(world, K, D, Rs[c], ts[c])) for c in range(C)]
    )
    valid = np.ones((C, N, L), dtype=bool)
    valid[0, 0, 0] = False  # pair (0,1) misses it; pair (1,2) still sees it
    valid[1, 1, 1] = False  # both pairs miss it -> NaN
    valid[2, 1, 1] = False

    k_arr = np.stack([K] * C)
    d_arr = np.stack([D] * C)
    r_arr = np.stack(Rs)
    t_arr = np.stack(ts)
    pts3d, seen = camera.triangulate_pairwise_mean(
        jnp.asarray(pts2d), jnp.asarray(valid), k_arr, d_arr, r_arr, t_arr
    )
    pts3d = np.asarray(pts3d)
    assert not seen[1, 1]
    assert np.isnan(pts3d[1, 1]).all()
    assert seen[0, 0]
    mask = np.asarray(seen)
    np.testing.assert_allclose(pts3d[mask], world[mask], atol=1e-5)


def test_project_fisheye_analytic_jacobian(rng, fisheye_cam):
    """project_points_fisheye_and_jac == jacfwd(project_points_fisheye)
    at machine precision (the hot measurement-stage Jacobian: one fused
    elementwise pass instead of 3 linearized projection passes)."""
    import jax

    K, D, R, t = fisheye_cam
    cam_pts = make_world_points(rng, n=64)
    world = (cam_pts - t.ravel()) @ R

    uv, J = camera.project_points_fisheye_and_jac(world, K, D, R, t)
    uv0 = camera.project_points_fisheye(world, K, D, R, t)
    Jref = jax.vmap(
        jax.jacfwd(lambda p: camera.project_points_fisheye(p, K, D, R, t))
    )(jnp.asarray(world))
    np.testing.assert_allclose(np.asarray(uv), np.asarray(uv0), atol=0.0)
    scale = float(np.abs(np.asarray(Jref)).max())
    np.testing.assert_allclose(
        np.asarray(J), np.asarray(Jref), atol=1e-11 * max(scale, 1.0)
    )


def test_project_rig_and_jac_shapes(rng, fisheye_cam):
    K, D, R, t = fisheye_cam
    Ks = np.stack([K, K])
    Ds = np.stack([D.reshape(-1)[:4], D.reshape(-1)[:4]])
    Rs = np.stack([R, np.eye(3)])
    Ts = np.stack([t.reshape(3), np.array([0.0, 0.0, 5.0])])
    pts = make_world_points(rng, n=20)
    h, Jp = camera.project_rig_and_jac(jnp.asarray(pts), Ks, Ds, Rs, Ts)
    assert h.shape == (2, 20, 2) and Jp.shape == (2, 20, 2, 3)
    assert np.all(np.isfinite(np.asarray(Jp)))
