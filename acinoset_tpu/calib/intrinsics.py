"""Fisheye (KB4) and pinhole intrinsic calibration, pure JAX.

Replaces cv2.fisheye.calibrate / cv2.calibrateCamera as used by the
reference (AcinoSet src/calib/calib.py:13-22, 72-90), including the
reference's recursive dropping of ill-conditioned frames on
CALIB_CHECK_COND (:85-90) — here realized as an explicit
condition/residual screen instead of an exception-driven retry.

Pipeline per camera:
  1. Zhang-style closed-form K init from per-frame board homographies
     (principal point fixed at the image center, skew 0 — matching the
     reference flags CALIB_FIX_SKEW and the fisheye model);
  2. per-frame board poses from homography decomposition;
  3. joint Gauss-Newton over [fx, fy, cx, cy, d0..d3, (rvec_i, tvec_i)_i]
     minimizing all reprojection residuals, with the board-pose blocks
     eliminated by a Schur complement (same structure as SBA: pose
     blocks are 6x6 block-diagonal).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as cam_ops
from ..ops.rotations import rodrigues, rodrigues_inv
from ..utils.precision import f32_matmuls
from . import pnp


class FisheyeCalibration(NamedTuple):
    k: jnp.ndarray  # (3, 3)
    d: jnp.ndarray  # (4,)
    rvecs: jnp.ndarray  # (F, 3) board poses
    tvecs: jnp.ndarray  # (F, 3)
    rms: jnp.ndarray  # scalar reprojection RMS (px)
    frame_rms: jnp.ndarray  # (F,) per-frame RMS
    used: np.ndarray  # (F,) bool — frames kept after conditioning screen


def _pack_cam(K, D):
    return jnp.concatenate([jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]), D.reshape(-1)[:4]])


def _unpack_cam(c):
    K = jnp.array(
        [[c[0], 0.0, c[2]], [0.0, c[1], c[3]], [0.0, 0.0, 1.0]], dtype=c.dtype
    )
    return K, c[4:8]


@f32_matmuls
def _joint_refine(obj_pts, img_pts, cam0, rvecs0, tvecs0, num_iters, project_fn, fix_principal_point=False):
    """GN over camera params + per-frame poses, Schur-eliminating poses.

    obj_pts: (M, 3) board points; img_pts: (F, M, 2); cam0: (8,) packed.
    """
    F, M, _ = img_pts.shape
    dtype = img_pts.dtype
    poses0 = jnp.concatenate([rvecs0, tvecs0], axis=1)  # (F, 6)

    def frame_residual(cam, pose):
        K, D = _unpack_cam(cam)
        R = rodrigues(pose[:3])
        proj = project_fn(obj_pts, K, D, R, pose[3:])
        return proj  # (M, 2)

    def residuals(cam, poses):
        proj = jax.vmap(lambda p: frame_residual(cam, p))(poses)
        return (proj - img_pts).reshape(F, -1)  # (F, 2M)

    jac_cam = jax.jacfwd(lambda cam, pose: frame_residual(cam, pose).reshape(-1), argnums=0)
    jac_pose = jax.jacfwd(lambda cam, pose: frame_residual(cam, pose).reshape(-1), argnums=1)

    n_cam = 8
    cam_mask = jnp.ones(n_cam, dtype)
    if fix_principal_point:
        cam_mask = cam_mask.at[2:4].set(0.0)

    def cost(cam, poses):
        r = residuals(cam, poses)
        return 0.5 * jnp.sum(r * r)

    def step(carry, _):
        cam, poses, lam, c0 = carry
        r = residuals(cam, poses)  # (F, 2M)
        Jc = jax.vmap(lambda p: jac_cam(cam, p))(poses) * cam_mask  # (F, 2M, 8)
        Jp = jax.vmap(lambda p: jac_pose(cam, p))(poses)  # (F, 2M, 6)

        Hcc = jnp.einsum("fmi,fmj->ij", Jc, Jc)
        Hpp = jnp.einsum("fmi,fmj->fij", Jp, Jp)
        B = jnp.einsum("fmi,fmj->fij", Jc, Jp)  # (F, 8, 6)
        gc = jnp.einsum("fmi,fm->i", Jc, r)
        gp = jnp.einsum("fmi,fm->fi", Jp, r)

        Hcc_d = Hcc + lam * jnp.diag(jnp.maximum(jnp.diag(Hcc), 1e-10))
        dpp = jnp.maximum(jax.vmap(jnp.diag)(Hpp), 1e-10)
        Hpp_d = Hpp + lam * dpp[:, :, None] * jnp.eye(6, dtype=dtype)
        Hpp_inv = jnp.linalg.inv(Hpp_d)

        BHinv = jnp.einsum("fij,fjk->fik", B, Hpp_inv)  # (F, 8, 6)
        S = Hcc_d - jnp.einsum("fik,fjk->ij", BHinv, B)
        rhs = gc - jnp.einsum("fik,fk->i", BHinv, gp)
        # mask fixed params by pinning their rows/cols to identity
        S = S * cam_mask[:, None] * cam_mask[None, :] + jnp.diag(1.0 - cam_mask)
        rhs = rhs * cam_mask
        dcam = -jnp.linalg.solve(S, rhs)
        dposes = -jnp.einsum("fij,fj->fi", Hpp_inv, gp + jnp.einsum("fij,i->fj", B, dcam))

        cam_new = cam + dcam
        poses_new = poses + dposes
        c_new = cost(cam_new, poses_new)
        ok = (c_new < c0) & jnp.isfinite(c_new)
        cam = jnp.where(ok, cam_new, cam)
        poses = jnp.where(ok, poses_new, poses)
        c0 = jnp.where(ok, c_new, c0)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-10, 1e8)
        return (cam, poses, lam, c0), c0

    c_init = cost(cam0, poses0)
    (cam, poses, _lam, _c), _hist = jax.lax.scan(
        step, (cam0, poses0, jnp.asarray(1e-3, dtype), c_init), None, length=num_iters
    )
    r = residuals(cam, poses)
    frame_rms = jnp.sqrt(jnp.mean(r.reshape(F, M, 2) ** 2, axis=(1, 2)))
    rms = jnp.sqrt(jnp.mean(r**2))
    return cam, poses, rms, frame_rms


def calibrate_fisheye_camera(
    obj_pts: np.ndarray,  # (M, 3) board object points
    img_pts: np.ndarray,  # (F, ..., 2) detected corners per frame
    camera_resolution: Tuple[int, int],
    num_iters: int = 60,
    cond_rms_factor: float = 3.0,
    max_drop_rounds: int = 3,
) -> FisheyeCalibration:
    """Calibrate a KB4 fisheye camera from checkerboard corners.

    Mirrors the reference contract (src/calib/calib.py:72-90): principal
    point initialized at the image center, skew fixed to 0, and frames
    that destabilize the solve are dropped and the calibration re-run —
    the screen here is per-frame RMS > cond_rms_factor x median RMS
    (replacing OpenCV's CALIB_CHECK_COND singular-value test).
    """
    obj = jnp.asarray(obj_pts, jnp.float64)[:, :2]
    img = jnp.asarray(np.asarray(img_pts, np.float64).reshape(len(img_pts), -1, 2))
    F = img.shape[0]
    assert F >= 4, "Need at least 4 valid frames to perform calibration."
    used = np.ones(F, dtype=bool)

    for _ in range(max_drop_rounds):
        res = _calibrate_once(obj, img[jnp.asarray(np.where(used)[0])], camera_resolution, num_iters)
        frame_rms = np.asarray(res.frame_rms)
        med = np.median(frame_rms)
        bad = frame_rms > cond_rms_factor * max(med, 0.3)
        if not bad.any() or used.sum() - bad.sum() < 4:
            break
        idx = np.where(used)[0]
        used[idx[bad]] = False
        print(f"Dropping {bad.sum()} ill-conditioned frame(s); re-calibrating")

    full_r = np.zeros((F, 3))
    full_t = np.zeros((F, 3))
    sel = np.where(used)[0]
    full_r[sel] = np.asarray(res.rvecs)
    full_t[sel] = np.asarray(res.tvecs)
    return FisheyeCalibration(
        k=res.k, d=res.d, rvecs=jnp.asarray(full_r), tvecs=jnp.asarray(full_t),
        rms=res.rms, frame_rms=res.frame_rms, used=used,
    )


def _calibrate_once(obj, img, camera_resolution, num_iters):
    dtype = img.dtype
    F = img.shape[0]
    cx, cy = camera_resolution[0] / 2.0, camera_resolution[1] / 2.0

    # 1) Zhang init on raw pixels (distortion ignored; central corners
    # dominate the LS fit enough for a usable starting focal)
    Hs = jax.vmap(lambda p: pnp.homography_dlt(obj, p))(img)
    K0 = pnp.zhang_intrinsics(Hs, fix_principal_point=(cx, cy))
    D0 = jnp.zeros(4, dtype)

    # 2) per-frame pose init from homographies under K0
    def pose0(H):
        R, t = pnp.pose_from_homography(H, K0)
        return jnp.concatenate([rodrigues_inv(R), t])

    poses = jax.vmap(pose0)(Hs)
    cam0 = _pack_cam(K0, D0)

    # 3) joint refinement
    cam, poses, rms, frame_rms = _joint_refine(
        jnp.concatenate([obj, jnp.zeros_like(obj[:, :1])], axis=1),
        img, cam0, poses[:, :3], poses[:, 3:], num_iters,
        cam_ops.project_points_fisheye,
    )
    K, D = _unpack_cam(cam)
    return FisheyeCalibration(
        k=K, d=D, rvecs=poses[:, :3], tvecs=poses[:, 3:],
        rms=rms, frame_rms=frame_rms, used=np.ones(F, bool),
    )


def calibrate_camera(
    obj_pts: np.ndarray,
    img_pts: np.ndarray,
    camera_resolution: Tuple[int, int],
    num_iters: int = 60,
):
    """Pinhole (rational-model) twin of src/calib/calib.py:13-22.

    Returns (k, d(8,), rvecs, tvecs). Principal point fixed at center
    (CALIB_FIX_PRINCIPAL_POINT), rational model 8 coefficients.
    """
    obj = jnp.asarray(obj_pts, jnp.float64)[:, :2]
    img = jnp.asarray(np.asarray(img_pts, np.float64).reshape(len(img_pts), -1, 2))
    cx, cy = camera_resolution[0] / 2.0, camera_resolution[1] / 2.0
    Hs = jax.vmap(lambda p: pnp.homography_dlt(obj, p))(img)
    K0 = pnp.zhang_intrinsics(Hs, fix_principal_point=(cx, cy))

    def pose0(H):
        R, t = pnp.pose_from_homography(H, K0)
        return jnp.concatenate([rodrigues_inv(R), t])

    poses = jax.vmap(pose0)(Hs)

    # pack: fx, fy, cx, cy, d0..d7  (12 params)
    cam0 = jnp.concatenate(
        [jnp.stack([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]]), jnp.zeros(8, img.dtype)]
    )

    def unpack(c):
        K = jnp.array([[c[0], 0.0, c[2]], [0.0, c[1], c[3]], [0.0, 0.0, 1.0]], dtype=c.dtype)
        return K, c[4:12]

    obj3 = jnp.concatenate([obj, jnp.zeros_like(obj[:, :1])], axis=1)

    def frame_residual(cam, pose):
        K, D = unpack(cam)
        R = rodrigues(pose[:3])
        return (cam_ops.project_points_pinhole(obj3, K, D, R, pose[3:])).reshape(-1)

    # dense LM over everything (12 + 6F params) — calibration sets are
    # small (tens of frames), a dense solve is simplest and fast enough
    from ..solvers.lm import lm_dense

    F = img.shape[0]

    def residual_all(theta):
        cam = theta[:12]
        poses_ = theta[12:].reshape(F, 6)
        proj = jax.vmap(lambda p: frame_residual(cam, p))(poses_)
        return (proj - img.reshape(F, -1)).reshape(-1)

    theta0 = jnp.concatenate([cam0, poses.reshape(-1)])
    # keep principal point fixed by zeroing its update via a mask wrapper
    mask = jnp.ones_like(theta0).at[2:4].set(0.0)

    def residual_masked(theta):
        return residual_all(theta0 + mask * (theta - theta0))

    out = lm_dense(residual_masked, theta0, num_iters=num_iters)
    theta = theta0 + mask * (out.x - theta0)
    K, D = unpack(theta[:12])
    poses = theta[12:].reshape(F, 6)
    rms = jnp.sqrt(jnp.mean(residual_all(theta) ** 2))
    return K, D, poses[:, :3], poses[:, 3:], rms
