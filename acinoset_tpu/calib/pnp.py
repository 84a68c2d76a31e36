"""Planar homography estimation + pose recovery, pure JAX.

Building blocks for checkerboard calibration (replacing the internals of
cv2.calibrateCamera / cv2.fisheye.calibrate used by the reference at
AcinoSet src/calib/calib.py:13-90): DLT homography from a planar board,
Zhang-style intrinsic initialization from homography constraints, and
homography decomposition into a board pose. Everything is batched over
frames with `vmap`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def homography_dlt(obj_xy: jnp.ndarray, img_xy: jnp.ndarray) -> jnp.ndarray:
    """Estimate H (3,3) with obj plane points (M,2) -> image points (M,2).

    Hartley-normalized DLT solved via the smallest eigenvector of A^T A.
    """
    def normalize(p):
        mean = p.mean(axis=0)
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.mean(jnp.linalg.norm(p - mean, axis=1)), 1e-12
        )
        T = jnp.array(
            [
                [scale, 0.0, -scale * mean[0]],
                [0.0, scale, -scale * mean[1]],
                [0.0, 0.0, 1.0],
            ],
            dtype=p.dtype,
        )
        ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=1)
        return (T @ ph.T).T, T

    src, Ts = normalize(obj_xy)
    dst, Td = normalize(img_xy)
    M = obj_xy.shape[0]
    zeros = jnp.zeros((M, 3), dtype=obj_xy.dtype)
    # rows: [-x, -y, -1, 0, 0, 0, u*x, u*y, u] and [0,0,0,-x,-y,-1, v*x, v*y, v]
    r1 = jnp.concatenate([-src, zeros, dst[:, 0:1] * src], axis=1)
    r2 = jnp.concatenate([zeros, -src, dst[:, 1:2] * src], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, V = jnp.linalg.eigh(A.T @ A)
    h = V[:, 0]
    H = h.reshape(3, 3)
    H = jnp.linalg.solve(Td, H @ Ts)
    return H / H[2, 2]


def zhang_intrinsics(Hs: jnp.ndarray, fix_principal_point=None):
    """Zhang's closed-form K from >=3 homographies (Hs: (F, 3, 3)).

    Returns K (3,3). If fix_principal_point=(cx, cy) is given, solves the
    reduced 2-parameter system for (fx, fy) only — more stable for
    fisheye lenses where the plain Zhang system can go indefinite.
    """
    def v_ij(H, i, j):
        return jnp.stack(
            [
                H[0, i] * H[0, j],
                H[0, i] * H[1, j] + H[1, i] * H[0, j],
                H[1, i] * H[1, j],
                H[2, i] * H[0, j] + H[0, i] * H[2, j],
                H[2, i] * H[1, j] + H[1, i] * H[2, j],
                H[2, i] * H[2, j],
            ]
        )

    rows = []
    for H in Hs:
        rows.append(v_ij(H, 0, 1))
        rows.append(v_ij(H, 0, 0) - v_ij(H, 1, 1))
    V = jnp.stack(rows)

    if fix_principal_point is not None:
        cx, cy = fix_principal_point
        # b = [1/fx^2, 0, 1/fy^2, -cx/fx^2, -cy/fy^2, ...] with skew 0;
        # parametrize by a=1/fx^2, c=1/fy^2 and known cx, cy:
        # omega ~ [[a,0,-a cx],[0,c,-c cy],[-a cx, -c cy, a cx^2 + c cy^2 + 1]]
        # Each constraint row v^T b with b=(b11,b12,b22,b13,b23,b33):
        # substitute b = a*ba + c*bc + b0 where
        ba = jnp.array([1.0, 0.0, 0.0, -cx, 0.0, cx * cx])
        bc = jnp.array([0.0, 0.0, 1.0, 0.0, -cy, cy * cy])
        b0 = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        A2 = jnp.stack([V @ ba, V @ bc], axis=1)  # (rows, 2)
        rhs = -(V @ b0)
        sol, *_ = jnp.linalg.lstsq(A2, rhs)
        a, c = sol
        fx = 1.0 / jnp.sqrt(jnp.maximum(a, 1e-12))
        fy = 1.0 / jnp.sqrt(jnp.maximum(c, 1e-12))
        return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=Hs.dtype)

    _, Vv = jnp.linalg.eigh(V.T @ V)
    b11, b12, b22, b13, b23, b33 = Vv[:, 0]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = jnp.sqrt(lam / b11)
    fy = jnp.sqrt(lam * b11 / (b11 * b22 - b12 * b12))
    skew = -b12 * fx * fx * fy / lam
    cx = skew * cy / fx - b13 * fx * fx / lam
    return jnp.array([[fx, skew, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=Hs.dtype)


def pose_from_homography(H: jnp.ndarray, K: jnp.ndarray):
    """Board pose (R, t) from homography under intrinsics K.

    H ~ K [r1 r2 t]; orthonormalizes [r1 r2 r3] via SVD. Ensures the
    board is in front of the camera (t_z > 0).
    """
    A = jnp.linalg.solve(K, H)
    # sign fix: board should project with positive depth
    A = A * jnp.sign(A[2, 2])
    lam = 0.5 * (jnp.linalg.norm(A[:, 0]) + jnp.linalg.norm(A[:, 1]))
    r1 = A[:, 0] / lam
    r2 = A[:, 1] / lam
    t = A[:, 2] / lam
    r3 = jnp.cross(r1, r2)
    Q = jnp.stack([r1, r2, r3], axis=1)
    # nearest rotation matrix
    U, _, Vt = jnp.linalg.svd(Q)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    return R, t


def board_pose_fisheye(obj_xy, img_pts, K, D):
    """Initial board pose for a fisheye view: undistort corners to the
    normalized plane, homography against identity intrinsics, decompose."""
    from ..ops.camera import undistort_points_fisheye

    ab = undistort_points_fisheye(img_pts, K, D)  # normalized coords
    H = homography_dlt(obj_xy, ab)
    return pose_from_homography(H, jnp.eye(3, dtype=img_pts.dtype))
