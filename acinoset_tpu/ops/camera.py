"""Fisheye (Kannala-Brandt 4-coefficient) and pinhole camera models, pure JAX.

TPU-native replacements for the OpenCV calls in the reference
(AcinoSet src/calib/calib.py:52-136): projection is the closed-form
equidistant model the reference itself spells out analytically
(src/all_optimizations.py:193-209); undistortion inverts the distortion
polynomial with a fixed-iteration Newton solve (jit-safe, no
data-dependent control flow); triangulation is the classic two-view DLT
built from normalized rays, solved per point with a 4x4 SVD. Everything
is written point-wise and then `vmap`-ed, so XLA fuses the math into
large batched element-wise + matmul programs.

Shapes: K (3,3), D (4,), R (3,3), t (3,) or (3,1). Points broadcast
over leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Projection
# --------------------------------------------------------------------------

def distort_theta(theta, D):
    """Kannala-Brandt radial polynomial: theta_d = theta(1 + d0 t^2 + d1 t^4 + d2 t^6 + d3 t^8)."""
    t2 = theta * theta
    poly = 1.0 + t2 * (D[..., 0] + t2 * (D[..., 1] + t2 * (D[..., 2] + t2 * D[..., 3])))
    return theta * poly


def project_points_fisheye(pts, K, D, R, t, eps: float = 1e-12):
    """Project world points (..., 3) to pixels (..., 2) with the KB4 fisheye model.

    Equivalent of cv2.fisheye.projectPoints as used by the reference
    (src/calib/calib.py:132-136) and bit-matching its analytic twin
    `pt3d_to_2d` (src/all_optimizations.py:193-209), including the same
    1e-12 guard inside the radius sqrt.
    """
    pts = jnp.asarray(pts)
    D = jnp.asarray(D, pts.dtype).reshape(-1)[:4]
    t = jnp.asarray(t, pts.dtype).reshape(3)
    cam = pts @ jnp.asarray(R, pts.dtype).T + t  # (..., 3) camera-frame
    a = cam[..., 0] / cam[..., 2]
    b = cam[..., 1] / cam[..., 2]
    r = jnp.sqrt(a * a + b * b + eps)
    theta = jnp.arctan(r)
    th_d = distort_theta(theta, D)
    scale = th_d / r
    u = K[0, 0] * (a * scale) + K[0, 2]
    v = K[1, 1] * (b * scale) + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def project_points_pinhole(pts, K, D, R, t):
    """Pinhole + rational/radial-tangential distortion (cv2.projectPoints twin).

    Supports the first 8 distortion coefficients
    (k1,k2,p1,p2,k3,k4,k5,k6) of OpenCV's rational model
    (src/calib/calib.py:13-22 uses CALIB_RATIONAL_MODEL). Extra entries
    in D are ignored; missing ones are treated as zero.
    """
    pts = jnp.asarray(pts)
    d = jnp.zeros(8, dtype=pts.dtype).at[: jnp.asarray(D).reshape(-1).shape[0]].set(
        jnp.asarray(D, pts.dtype).reshape(-1)[:8]
    )
    t = jnp.asarray(t, pts.dtype).reshape(3)
    cam = pts @ jnp.asarray(R, pts.dtype).T + t
    x = cam[..., 0] / cam[..., 2]
    y = cam[..., 1] / cam[..., 2]
    r2 = x * x + y * y
    num = 1.0 + r2 * (d[0] + r2 * (d[1] + r2 * d[4]))
    den = 1.0 + r2 * (d[5] + r2 * (d[6] + r2 * d[7]))
    radial = num / den
    x_d = x * radial + 2.0 * d[2] * x * y + d[3] * (r2 + 2.0 * x * x)
    y_d = y * radial + d[2] * (r2 + 2.0 * y * y) + 2.0 * d[3] * x * y
    u = K[0, 0] * x_d + K[0, 1] * y_d + K[0, 2]
    v = K[1, 1] * y_d + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def project_points_fisheye_and_jac(pts, K, D, R, t, eps: float = 1e-12):
    """Fused KB4 projection + analytic point-Jacobian.

    Returns ``(uv (..., 2), J (..., 2, 3))`` with
    ``J = d uv / d world-point`` — exactly ``jax.jacfwd`` of
    :func:`project_points_fisheye` (same ``eps`` placement inside the
    radius sqrt), but as one fused elementwise pass instead of three
    linearized projection passes. With ``a = x/z, b = y/z,
    r = sqrt(a^2+b^2+eps), theta = atan(r), s = theta_d/r`` the chain
    rule collapses to

        d(a s)/d(a, b) = [s + a^2 g, a b g],   g = (theta_d'/(1+r^2) - s)/r^2

    composed with ``da/dp = (R_0 - a R_2)/z`` (and the b row alike),
    where ``theta_d' = 1 + 3 d0 th^2 + 5 d1 th^4 + 7 d2 th^6 + 9 d3 th^8``.
    This is the hot Jacobian of the FTE/EKF measurement stage
    (reference equations: AcinoSet src/all_optimizations.py:193-209).
    """
    pts = jnp.asarray(pts)
    D = jnp.asarray(D, pts.dtype).reshape(-1)[:4]
    t = jnp.asarray(t, pts.dtype).reshape(3)
    Rm = jnp.asarray(R, pts.dtype)
    cam = pts @ Rm.T + t  # (..., 3)
    z = cam[..., 2]
    a = cam[..., 0] / z
    b = cam[..., 1] / z
    r2 = a * a + b * b + eps  # r^2 INCLUDING eps — matches the primal
    r = jnp.sqrt(r2)
    theta = jnp.arctan(r)
    t2 = theta * theta
    poly = 1.0 + t2 * (D[0] + t2 * (D[1] + t2 * (D[2] + t2 * D[3])))
    dpoly = 1.0 + t2 * (
        3.0 * D[0] + t2 * (5.0 * D[1] + t2 * (7.0 * D[2] + 9.0 * t2 * D[3]))
    )
    th_d = theta * poly
    s = th_d / r
    u = K[0, 0] * (a * s) + K[0, 2]
    v = K[1, 1] * (b * s) + K[1, 2]
    uv = jnp.stack([u, v], axis=-1)

    g = (dpoly / (1.0 + r2) - s) / r2
    zinv = 1.0 / z[..., None]
    Ma = (Rm[0] - a[..., None] * Rm[2]) * zinv  # da/dp  (..., 3)
    Mb = (Rm[1] - b[..., None] * Rm[2]) * zinv  # db/dp
    Ju = K[0, 0] * ((s + a * a * g)[..., None] * Ma + (a * b * g)[..., None] * Mb)
    Jv = K[1, 1] * ((a * b * g)[..., None] * Ma + (s + b * b * g)[..., None] * Mb)
    return uv, jnp.stack([Ju, Jv], axis=-2)


def project_rig_and_jac(pts, K, D, R, T):
    """Project (L, 3) points through a C-camera rig with Jacobians:
    ``(h (C, L, 2), Jp (C, L, 2, 3))`` — the measurement-stage primitive
    shared by the FTE/EKF hj_parts factories."""
    return jax.vmap(
        lambda k, d, r, t: project_points_fisheye_and_jac(pts, k, d, r, t)
    )(K, D, R, T)


# --------------------------------------------------------------------------
# Undistortion (fixed-iteration Newton inverse of the KB4 polynomial)
# --------------------------------------------------------------------------

def undistort_theta(th_d, D, num_iters: int = 10):
    """Invert theta_d = distort_theta(theta) by Newton iteration.

    Fixed iteration count keeps the op jit-able; 10 Newton steps reach
    machine precision for |theta| < pi/2 with realistic GoPro
    coefficients (|d_i| << 1).
    """
    theta = th_d

    def body(_, theta):
        t2 = theta * theta
        poly = 1.0 + t2 * (D[..., 0] + t2 * (D[..., 1] + t2 * (D[..., 2] + t2 * D[..., 3])))
        dpoly = 1.0 + t2 * (3.0 * D[..., 0] + t2 * (5.0 * D[..., 1] + t2 * (7.0 * D[..., 2] + 9.0 * t2 * D[..., 3])))
        f = theta * poly - th_d
        return theta - f / dpoly

    return jax.lax.fori_loop(0, num_iters, body, theta)


def undistort_points_fisheye(pts, K, D, P=None, num_iters: int = 10, eps: float = 1e-12):
    """Undistort pixel points (..., 2).

    With ``P=None`` returns normalized camera-plane coordinates (a, b)
    such that projecting ([a, b, 1]) with zero distortion reproduces the
    input — the twin of cv2.fisheye.undistortPoints(pts, k, d)
    (src/calib/calib.py:124-125). With ``P=K`` re-applies the pinhole K
    to give undistorted pixels (src/calib/calib.py:93-98).
    """
    pts = jnp.asarray(pts)
    D = jnp.asarray(D).reshape(-1)[:4]
    x = (pts[..., 0] - K[0, 2]) / K[0, 0]
    y = (pts[..., 1] - K[1, 2]) / K[1, 1]
    th_d = jnp.sqrt(x * x + y * y + eps)
    # cv2.fisheye.undistortPoints clips theta_d to [-pi/2, pi/2] before
    # inverting; match that so edge-of-fisheye points agree.
    th_d = jnp.minimum(th_d, jnp.pi / 2)
    theta = undistort_theta(th_d, D, num_iters=num_iters)
    scale = jnp.tan(theta) / th_d
    a = x * scale
    b = y * scale
    out = jnp.stack([a, b], axis=-1)
    if P is not None:
        u = P[0, 0] * a + P[0, 2]
        v = P[1, 1] * b + P[1, 2]
        out = jnp.stack([u, v], axis=-1)
    return out


# --------------------------------------------------------------------------
# Triangulation (two-view DLT)
# --------------------------------------------------------------------------

def _dlt_rows(ab1, ab2, P1, P2):
    A = jnp.stack(
        [
            ab1[0] * P1[2] - P1[0],
            ab1[1] * P1[2] - P1[1],
            ab2[0] * P2[2] - P2[0],
            ab2[1] * P2[2] - P2[1],
        ]
    )
    return A


def _dlt_one(ab1, ab2, P1, P2):
    """Two-view DLT for one normalized point pair. ab: (2,), P: (3,4).

    Solves the inhomogeneous form A[:, :3] xyz = -A[:, 3] via closed-form
    Cramer's rule on the 3x3 normal equations — pure arithmetic that the
    VPU vectorizes perfectly (batched eigh/SVD lower to slow sequential
    kernels on TPU). Identical to the homogeneous SVD solution at exact
    ray intersections and indistinguishable at realistic noise for
    finite points (w ~ 1); `_dlt_one_eigh` keeps the homogeneous solver.
    """
    A = _dlt_rows(ab1, ab2, P1, P2)
    M = A[:, :3]
    b = -A[:, 3]
    # 3x3 normal equations via Cramer
    G = M.T @ M  # (3, 3)
    h = M.T @ b  # (3,)
    c00 = G[1, 1] * G[2, 2] - G[1, 2] * G[2, 1]
    c01 = G[1, 2] * G[2, 0] - G[1, 0] * G[2, 2]
    c02 = G[1, 0] * G[2, 1] - G[1, 1] * G[2, 0]
    det = G[0, 0] * c00 + G[0, 1] * c01 + G[0, 2] * c02
    # adjugate (G symmetric)
    adj = jnp.array(
        [
            [c00, G[0, 2] * G[2, 1] - G[0, 1] * G[2, 2], G[0, 1] * G[1, 2] - G[0, 2] * G[1, 1]],
            [c01, G[0, 0] * G[2, 2] - G[0, 2] * G[2, 0], G[0, 2] * G[1, 0] - G[0, 0] * G[1, 2]],
            [c02, G[0, 1] * G[2, 0] - G[0, 0] * G[2, 1], G[0, 0] * G[1, 1] - G[0, 1] * G[1, 0]],
        ],
        dtype=A.dtype,
    )
    return (adj.T @ h) / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)


def _dlt_one_eigh(ab1, ab2, P1, P2):
    """Homogeneous DLT (smallest eigenvector of A^T A) — the exact
    cv2.triangulatePoints twin; slower on TPU (batched eigh)."""
    A = _dlt_rows(ab1, ab2, P1, P2)
    _, V = jnp.linalg.eigh(A.T @ A)
    X = V[:, 0]
    return X[:3] / X[3]


def triangulate_points_fisheye(img_pts_1, img_pts_2, k1, d1, r1, t1, k2, d2, r2, t2):
    """Triangulate fisheye pixel correspondences into 3D world points.

    Twin of the reference `triangulate_points_fisheye`
    (src/calib/calib.py:121-130): undistort both views to normalized
    coordinates, then DLT with P = [R | t]. Accepts (..., 2) arrays in
    both views (any matching leading shape); returns (N, 3) with leading
    dims flattened, matching the reference's (-1, 3) output.
    """
    p1 = jnp.asarray(img_pts_1).reshape(-1, 2)
    p2 = jnp.asarray(img_pts_2).reshape(-1, 2)
    ab1 = undistort_points_fisheye(p1, k1, d1)
    ab2 = undistort_points_fisheye(p2, k2, d2)
    P1 = jnp.concatenate([jnp.asarray(r1), jnp.asarray(t1).reshape(3, 1)], axis=1)
    P2 = jnp.concatenate([jnp.asarray(r2), jnp.asarray(t2).reshape(3, 1)], axis=1)
    return jax.vmap(_dlt_one, in_axes=(0, 0, None, None))(ab1, ab2, P1, P2)


def triangulate_points(img_pts_1, img_pts_2, k1, d1, r1, t1, k2, d2, r2, t2):
    """Standard-camera twin of src/calib/calib.py:52-61 (undistort + DLT).

    Uses an 8-coefficient rational-model undistortion via Newton on the
    full distortion map.
    """
    p1 = jnp.asarray(img_pts_1).reshape(-1, 2)
    p2 = jnp.asarray(img_pts_2).reshape(-1, 2)
    ab1 = undistort_points_pinhole(p1, k1, d1)
    ab2 = undistort_points_pinhole(p2, k2, d2)
    P1 = jnp.concatenate([jnp.asarray(r1), jnp.asarray(t1).reshape(3, 1)], axis=1)
    P2 = jnp.concatenate([jnp.asarray(r2), jnp.asarray(t2).reshape(3, 1)], axis=1)
    return jax.vmap(_dlt_one, in_axes=(0, 0, None, None))(ab1, ab2, P1, P2)


def undistort_points_pinhole(pts, K, D, num_iters: int = 20):
    """Invert the rational distortion model by fixed-point iteration.

    Twin of cv2.undistortPoints without P (returns normalized coords).
    """
    pts = jnp.asarray(pts)
    d = jnp.zeros(8, dtype=pts.dtype).at[: jnp.asarray(D).reshape(-1).shape[0]].set(
        jnp.asarray(D, pts.dtype).reshape(-1)[:8]
    )
    x0 = (pts[..., 0] - K[0, 2]) / K[0, 0]
    y0 = (pts[..., 1] - K[1, 2]) / K[1, 1]

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        num = 1.0 + r2 * (d[0] + r2 * (d[1] + r2 * d[4]))
        den = 1.0 + r2 * (d[5] + r2 * (d[6] + r2 * d[7]))
        radial = num / den
        dx = 2.0 * d[2] * x * y + d[3] * (r2 + 2.0 * x * x)
        dy = d[2] * (r2 + 2.0 * y * y) + 2.0 * d[3] * x * y
        return ((x0 - dx) / radial, (y0 - dy) / radial)

    x, y = jax.lax.fori_loop(0, num_iters, body, (x0, y0))
    return jnp.stack([x, y], axis=-1)


# --------------------------------------------------------------------------
# Image undistortion (remap grids + bilinear gather)
# --------------------------------------------------------------------------


def undistort_rectify_map_fisheye(K, D, new_K, size):
    """Build the (map_x, map_y) source-pixel grids that undistort a
    fisheye image — twin of cv2.fisheye.initUndistortRectifyMap as used
    by create_undistort_fisheye_img_function (src/calib/calib.py:101-106).

    size: (width, height) of the output image.
    """
    W, H = size
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32))
    # output pixel -> ideal normalized coords under new_K
    a = (u - new_K[0, 2]) / new_K[0, 0]
    b = (v - new_K[1, 2]) / new_K[1, 1]
    # distort: normalized -> fisheye source pixel
    r = jnp.sqrt(a * a + b * b + 1e-12)
    theta = jnp.arctan(r)
    th_d = distort_theta(theta, jnp.asarray(D).reshape(-1)[:4])
    scale = th_d / r
    map_x = K[0, 0] * (a * scale) + K[0, 2]
    map_y = K[1, 1] * (b * scale) + K[1, 2]
    return map_x, map_y


def remap_bilinear(img, map_x, map_y):
    """Sample img (H, W[, C]) at float source coords; zero outside."""
    img = jnp.asarray(img)
    H, W = img.shape[:2]
    x0 = jnp.floor(map_x).astype(jnp.int32)
    y0 = jnp.floor(map_y).astype(jnp.int32)
    fx = (map_x - x0)[..., None] if img.ndim == 3 else map_x - x0
    fy = (map_y - y0)[..., None] if img.ndim == 3 else map_y - y0
    inside = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)
    xc0 = jnp.clip(x0, 0, W - 1)
    yc0 = jnp.clip(y0, 0, H - 1)
    xc1 = jnp.clip(x0 + 1, 0, W - 1)
    yc1 = jnp.clip(y0 + 1, 0, H - 1)
    out = (
        img[yc0, xc0] * (1 - fx) * (1 - fy)
        + img[yc0, xc1] * fx * (1 - fy)
        + img[yc1, xc0] * (1 - fx) * fy
        + img[yc1, xc1] * fx * fy
    )
    mask = inside[..., None] if img.ndim == 3 else inside
    return jnp.where(mask, out, 0)


def undistort_image_fisheye(img, K, D, new_K=None):
    """Undistort one fisheye image (jit/vmap-able over a frame batch)."""
    K = jnp.asarray(K)
    new_K = K if new_K is None else jnp.asarray(new_K)
    H, W = jnp.asarray(img).shape[:2]
    map_x, map_y = undistort_rectify_map_fisheye(K, D, new_K, (W, H))
    return remap_bilinear(img, map_x, map_y)


def undistort_rectify_map_pinhole(K, D, new_K, size):
    """Source-pixel grids that undistort a standard (rational-model)
    camera image — twin of cv2.initUndistortRectifyMap as used by
    create_undistort_img_function (src/calib/calib.py:33-38).

    D: up to 8 coefficients in OpenCV order (k1 k2 p1 p2 k3 k4 k5 k6);
    shorter vectors are zero-padded. size: (width, height).
    """
    W, H = size
    d = jnp.zeros(8, dtype=jnp.float32).at[: jnp.asarray(D).reshape(-1).shape[0]].set(
        jnp.asarray(D, jnp.float32).reshape(-1)[:8]
    )
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32))
    # output pixel -> ideal normalized coords under new_K
    a = (u - new_K[0, 2]) / new_K[0, 0]
    b = (v - new_K[1, 2]) / new_K[1, 1]
    # forward-distort: normalized -> source pixel
    r2 = a * a + b * b
    num = 1.0 + r2 * (d[0] + r2 * (d[1] + r2 * d[4]))
    den = 1.0 + r2 * (d[5] + r2 * (d[6] + r2 * d[7]))
    radial = num / den
    xd = a * radial + 2.0 * d[2] * a * b + d[3] * (r2 + 2.0 * a * a)
    yd = b * radial + d[2] * (r2 + 2.0 * b * b) + 2.0 * d[3] * a * b
    map_x = K[0, 0] * xd + K[0, 2]
    map_y = K[1, 1] * yd + K[1, 2]
    return map_x, map_y


def undistort_image_pinhole(img, K, D, new_K=None):
    """Undistort one standard-camera image (jit/vmap-able over frames).

    Twin of the reference create_undistort_img_function
    (src/calib/calib.py:33-38: initUndistortRectifyMap + INTER_LINEAR
    remap with P=K)."""
    K = jnp.asarray(K)
    new_K = K if new_K is None else jnp.asarray(new_K)
    H, W = jnp.asarray(img).shape[:2]
    map_x, map_y = undistort_rectify_map_pinhole(K, D, new_K, (W, H))
    return remap_bilinear(img, map_x, map_y)


# --------------------------------------------------------------------------
# Multi-view batched triangulation (TPU-first: masked, dense)
# --------------------------------------------------------------------------

def triangulate_pairwise_mean(pts2d, valid, k_arr, d_arr, r_arr, t_arr):
    """Dense, masked, batched replacement for the reference's
    pandas-merge pipeline `get_pairwise_3d_points_from_df`
    (src/calib/calib.py:394-423).

    For each adjacent camera pair (c, c+1), triangulates every
    (frame, marker) observed in both views, then averages all pair
    estimates per (frame, marker).

    Args:
      pts2d: (C, N, L, 2) pixel observations per camera/frame/marker.
      valid: (C, N, L) bool — observation kept (e.g. likelihood > thresh).
      k_arr, d_arr, r_arr, t_arr: stacked camera params, leading dim C.

    Returns:
      points3d: (N, L, 3) pair-averaged positions (NaN where unseen by
        any adjacent pair — mirroring the reference's missing rows).
      seen: (N, L) bool.
    """
    k_arr = jnp.asarray(k_arr)
    d_arr = jnp.asarray(d_arr).reshape(k_arr.shape[0], -1)[:, :4]
    r_arr = jnp.asarray(r_arr)
    t_arr = jnp.asarray(t_arr).reshape(k_arr.shape[0], 3)
    C = k_arr.shape[0]
    N, L = pts2d.shape[1], pts2d.shape[2]

    def tri_pair(c):
        # one adjacent pair: triangulate all N*L points, mask invalid
        p1 = pts2d[c].reshape(-1, 2)
        p2 = pts2d[c + 1].reshape(-1, 2)
        xyz = triangulate_points_fisheye(
            p1, p2, k_arr[c], d_arr[c], r_arr[c], t_arr[c],
            k_arr[c + 1], d_arr[c + 1], r_arr[c + 1], t_arr[c + 1],
        ).reshape(N, L, 3)
        ok = valid[c] & valid[c + 1]
        return xyz, ok

    # static python loop over the (small, static) number of camera pairs;
    # XLA sees C-1 fused triangulation batches.
    total = jnp.zeros((N, L, 3), dtype=pts2d.dtype)
    count = jnp.zeros((N, L), dtype=pts2d.dtype)
    for c in range(C - 1):
        xyz, ok = tri_pair(c)
        okf = ok.astype(pts2d.dtype)
        total = total + jnp.where(ok[..., None], xyz, 0.0)
        count = count + okf
    seen = count > 0
    mean = total / jnp.where(seen, count, 1.0)[..., None]
    points3d = jnp.where(seen[..., None], mean, jnp.nan)
    return points3d, seen
