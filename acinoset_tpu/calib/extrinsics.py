"""Stereo-pair extrinsic calibration, pairwise chaining, and board SBA.

Replaces cv2.fisheye.stereoCalibrate + the reference's chaining logic
(AcinoSet src/calib/calib.py:110-194) and the board bundle adjustment
(:362-390, via solvers.lm). The world frame is pinned exactly as the
reference pins it: camera 1 at R = [[1,0,0],[0,0,-1],[0,1,0]], T = 0
(:147-150); each subsequent camera is composed as R2 = r @ R1,
T2 = r @ T1 + t (:186-187).
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as cam_ops
from ..ops.rotations import rodrigues, rodrigues_inv
from ..solvers import lm
from ..utils.precision import f32_matmuls
from . import pnp
from ..pipeline import data as data_io


# --------------------------------------------------------------------------
# Stereo pair (fixed intrinsics)
# --------------------------------------------------------------------------


@f32_matmuls
def calibrate_pair_extrinsics_fisheye(
    obj_pts, img_pts_1, img_pts_2, k1, d1, k2, d2, camera_resolution,
    num_iters: int = 60,
):
    """Relative pose (R, t) of cam2 w.r.t. cam1 from shared board views.

    Twin of src/calib/calib.py:110-118 (cv2.fisheye.stereoCalibrate with
    CALIB_FIX_INTRINSIC). Initialization: per-frame fisheye board poses
    in both cameras -> per-frame relative poses -> chordal mean; then a
    joint GN over (rel pose, per-frame board poses in cam1) minimizing
    reprojection in both cameras.

    Returns (rms, R (3,3), t (3,1)).
    """
    obj = jnp.asarray(np.asarray(obj_pts, np.float64))[:, :2]
    p1 = jnp.asarray(np.asarray(img_pts_1, np.float64).reshape(len(img_pts_1), -1, 2))
    p2 = jnp.asarray(np.asarray(img_pts_2, np.float64).reshape(len(img_pts_2), -1, 2))
    F = p1.shape[0]
    dtype = p1.dtype
    k1 = jnp.asarray(k1); d1 = jnp.asarray(d1).reshape(-1)[:4]
    k2 = jnp.asarray(k2); d2 = jnp.asarray(d2).reshape(-1)[:4]

    # per-frame poses via undistorted homographies
    R1s, t1s = jax.vmap(lambda p: pnp.board_pose_fisheye(obj, p, k1, d1))(p1)
    R2s, t2s = jax.vmap(lambda p: pnp.board_pose_fisheye(obj, p, k2, d2))(p2)

    # relative: X_c2 = R_rel X_c1 + t_rel
    R_rel_i = jnp.einsum("fij,fkj->fik", R2s, R1s)  # R2 @ R1^T
    t_rel_i = t2s - jnp.einsum("fij,fj->fi", R_rel_i, t1s)
    # chordal mean of rotations: SVD-project the mean matrix
    M = R_rel_i.mean(axis=0)
    U, _, Vt = jnp.linalg.svd(M)
    R0 = U @ Vt
    R0 = R0 * jnp.sign(jnp.linalg.det(R0))
    t0 = t_rel_i.mean(axis=0)

    obj3 = jnp.concatenate([obj, jnp.zeros_like(obj[:, :1])], axis=1)

    def residual(theta):
        rel = theta[:6]
        poses = theta[6:].reshape(F, 6)
        Rr = rodrigues(rel[:3])

        def per_frame(pose, q1, q2):
            Rb = rodrigues(pose[:3])
            tb = pose[3:]
            pr1 = cam_ops.project_points_fisheye(obj3, k1, d1, Rb, tb)
            R2f = Rr @ Rb
            t2f = Rr @ tb + rel[3:]
            pr2 = cam_ops.project_points_fisheye(obj3, k2, d2, R2f, t2f)
            return jnp.concatenate([(pr1 - q1).reshape(-1), (pr2 - q2).reshape(-1)])

        return jax.vmap(per_frame)(poses, p1, p2).reshape(-1)

    theta0 = jnp.concatenate(
        [
            rodrigues_inv(R0), t0,
            jnp.concatenate([jax.vmap(rodrigues_inv)(R1s), t1s], axis=1).reshape(-1),
        ]
    )
    out = lm.lm_dense(residual, theta0, num_iters=num_iters)
    rel = out.x[:6]
    R = rodrigues(rel[:3])
    t = rel[3:].reshape(3, 1)
    rms = jnp.sqrt(2.0 * out.cost / (residual(out.x).shape[0]))
    return rms, R, t


def calibrate_pair_extrinsics(
    obj_pts, img_pts_1, img_pts_2, k1, d1, k2, d2, camera_resolution, num_iters: int = 60
):
    """Standard-camera twin (src/calib/calib.py:41-49). Distortion is
    applied through the rational model projection."""
    # identical structure with the pinhole projector
    obj = jnp.asarray(np.asarray(obj_pts, np.float64))[:, :2]
    p1 = jnp.asarray(np.asarray(img_pts_1, np.float64).reshape(len(img_pts_1), -1, 2))
    p2 = jnp.asarray(np.asarray(img_pts_2, np.float64).reshape(len(img_pts_2), -1, 2))
    F = p1.shape[0]
    k1 = jnp.asarray(k1); d1j = jnp.asarray(d1).reshape(-1)
    k2 = jnp.asarray(k2); d2j = jnp.asarray(d2).reshape(-1)

    u1 = cam_ops.undistort_points_pinhole(p1, k1, d1j)
    u2 = cam_ops.undistort_points_pinhole(p2, k2, d2j)
    R1s, t1s = jax.vmap(lambda p: pnp.pose_from_homography(
        pnp.homography_dlt(obj, p), jnp.eye(3, dtype=p.dtype)))(u1)
    R2s, t2s = jax.vmap(lambda p: pnp.pose_from_homography(
        pnp.homography_dlt(obj, p), jnp.eye(3, dtype=p.dtype)))(u2)
    R_rel_i = jnp.einsum("fij,fkj->fik", R2s, R1s)
    t_rel_i = t2s - jnp.einsum("fij,fj->fi", R_rel_i, t1s)
    M = R_rel_i.mean(axis=0)
    U, _, Vt = jnp.linalg.svd(M)
    R0 = U @ Vt * jnp.sign(jnp.linalg.det(U @ Vt))
    t0 = t_rel_i.mean(axis=0)

    obj3 = jnp.concatenate([obj, jnp.zeros_like(obj[:, :1])], axis=1)

    def residual(theta):
        rel = theta[:6]
        poses = theta[6:].reshape(F, 6)
        Rr = rodrigues(rel[:3])

        def per_frame(pose, q1, q2):
            Rb = rodrigues(pose[:3])
            tb = pose[3:]
            pr1 = cam_ops.project_points_pinhole(obj3, k1, d1j, Rb, tb)
            pr2 = cam_ops.project_points_pinhole(obj3, k2, d2j, Rr @ Rb, Rr @ tb + rel[3:])
            return jnp.concatenate([(pr1 - q1).reshape(-1), (pr2 - q2).reshape(-1)])

        return jax.vmap(per_frame)(poses, p1, p2).reshape(-1)

    theta0 = jnp.concatenate(
        [rodrigues_inv(R0), t0,
         jnp.concatenate([jax.vmap(rodrigues_inv)(R1s), t1s], axis=1).reshape(-1)]
    )
    out = lm.lm_dense(residual, theta0, num_iters=num_iters)
    rel = out.x[:6]
    rms = jnp.sqrt(2.0 * out.cost / (residual(out.x).shape[0]))
    return rms, rodrigues(rel[:3]), rel[3:].reshape(3, 1)


# --------------------------------------------------------------------------
# Pairwise chaining (src/calib/calib.py:141-194)
# --------------------------------------------------------------------------

WORLD_R1 = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float64)


def _rot_geodesic_deg(Ra, Rb):
    tr = np.trace(Ra @ Rb.T)
    return np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def _align_pair_orderings(
    obj_pts, p1, p2, k1, d1, k2, d2, tol_deg: float = 10.0, tol_t: float = 0.3
):
    """Resolve the per-frame 180-degree corner-ordering ambiguity between
    two cameras' detections of the same board.

    For every shared frame, computes the relative pose cam1->cam2 under
    both orderings of cam2's corners, then keeps per frame the ordering
    closest to the consensus pose (RANSAC over candidate consensus
    poses). Returns (p2 with per-frame orderings fixed, keep mask).
    """
    import jax
    import jax.numpy as jnp

    from . import pnp

    F = p1.shape[0]
    obj2 = jnp.asarray(np.asarray(obj_pts, np.float64)[:, :2])
    q1 = jnp.asarray(p1.reshape(F, -1, 2))
    q2 = jnp.asarray(p2.reshape(F, -1, 2))
    q2r = q2[:, ::-1]
    k1j, d1j = jnp.asarray(k1), jnp.asarray(np.asarray(d1).reshape(-1)[:4])
    k2j, d2j = jnp.asarray(k2), jnp.asarray(np.asarray(d2).reshape(-1)[:4])

    R1s, t1s = jax.vmap(lambda p: pnp.board_pose_fisheye(obj2, p, k1j, d1j))(q1)
    R2a, t2a = jax.vmap(lambda p: pnp.board_pose_fisheye(obj2, p, k2j, d2j))(q2)
    R2b, t2b = jax.vmap(lambda p: pnp.board_pose_fisheye(obj2, p, k2j, d2j))(q2r)

    def rel(R2s, t2s):
        Rr = np.einsum("fij,fkj->fik", np.asarray(R2s), np.asarray(R1s))
        tr = np.asarray(t2s) - np.einsum("fij,fj->fi", Rr, np.asarray(t1s))
        return Rr, tr

    Ra, ta = rel(R2a, t2a)
    Rb, tb = rel(R2b, t2b)

    best_keep, best_choice, best_count = None, None, -1
    for f0 in range(F):
        for cand_R, cand_t in ((Ra[f0], ta[f0]), (Rb[f0], tb[f0])):
            choice = np.zeros(F, dtype=bool)  # False = as-is, True = reversed
            keep = np.zeros(F, dtype=bool)
            for f in range(F):
                da = _rot_geodesic_deg(Ra[f], cand_R) + 90.0 * (
                    np.linalg.norm(ta[f] - cand_t) > tol_t
                )
                db = _rot_geodesic_deg(Rb[f], cand_R) + 90.0 * (
                    np.linalg.norm(tb[f] - cand_t) > tol_t
                )
                if min(da, db) < tol_deg:
                    keep[f] = True
                    choice[f] = db < da
            if keep.sum() > best_count:
                best_keep, best_choice, best_count = keep, choice, keep.sum()
        if best_count >= max(3, F // 2):
            break

    p2_fixed = p2.copy()
    flat = p2_fixed.reshape(F, -1, 2)
    flat[best_choice] = flat[best_choice, ::-1]
    return flat.reshape(p2.shape), best_keep


def calibrate_pairwise_extrinsics(
    calib_func: Callable,
    img_pts_arr: Sequence[np.ndarray],
    fnames_arr: Sequence[List[str]],
    k_arr, d_arr,
    camera_resolution,
    board_shape,
    board_square_len,
):
    """Chain stereo pairs cam1->cam2->...->camN into world extrinsics.

    Exact contract of src/calib/calib.py:141-194: corresponding frames
    matched by filename; world frame fixed at camera 1.
    Returns (r_arr, t_arr) lists.
    """
    n_cam = len(img_pts_arr)
    r_arr = [WORLD_R1.copy()]
    t_arr = [np.zeros((3, 1))]
    R1 = WORLD_R1.copy()
    T1 = np.zeros((3, 1))
    obj_pts = data_io.create_board_object_pts(board_shape, board_square_len)
    for i in range(n_cam - 1):
        fnames_1, fnames_2 = fnames_arr[i], fnames_arr[i + 1]
        img_pts_1, img_pts_2 = [], []
        for a, f in enumerate(fnames_1):
            if f in fnames_2:
                b = fnames_2.index(f)
                img_pts_1.append(img_pts_arr[i][a])
                img_pts_2.append(img_pts_arr[i + 1][b])
        assert img_pts_1, f"No corresponding frames between cams {i} and {i + 1}"
        p1 = np.array(img_pts_1, dtype=np.float64)
        p2 = np.array(img_pts_2, dtype=np.float64)
        # Corner detectors label the board's first corner ambiguously
        # (180-degree rotation), independently per frame and per camera.
        # The reference fixed this by hand (calib_with_gui.ipynb
        # "reversed-order" cell); here each frame's ordering is aligned
        # automatically by relative-pose consensus, and frames that fit
        # no consensus are dropped.
        p2, keep = _align_pair_orderings(
            obj_pts, p1, p2, k_arr[i], d_arr[i], k_arr[i + 1], d_arr[i + 1]
        )
        if keep.sum() < len(keep):
            print(f"Pair {i}->{i + 1}: dropped {len(keep) - keep.sum()} inconsistent frame(s)")
        rms, r, t = calib_func(
            obj_pts, p1[keep], p2[keep],
            k_arr[i], d_arr[i], k_arr[i + 1], d_arr[i + 1],
            camera_resolution,
        )
        r = np.asarray(r)
        t = np.asarray(t).reshape(3, 1)
        print(f"Pair {i}->{i + 1}: RMS reprojection error {float(rms):.3f} px")
        R2 = r @ R1
        T2 = r @ T1 + t
        R1, T1 = R2, T2
        r_arr.append(R2)
        t_arr.append(T2)
    return r_arr, t_arr


# --------------------------------------------------------------------------
# Board bundle adjustment (src/calib/calib.py:210-264, 362-390)
# --------------------------------------------------------------------------


def prepare_calib_board_data(
    img_pts_arr: Sequence[np.ndarray],
    fnames_arr: Sequence[List[str]],
    board_shape: Tuple[int, int],
    k_arr, d_arr, r_arr, t_arr,
    align_tol_px: float = 30.0,
):
    """Build the dense (P, C) observation grid of board corners seen by
    >= 2 cameras, with 3D inits from the first two observing cameras
    (semantics of src/calib/calib.py:210-263).

    Per-frame corner-ordering flips between cameras (the detector's
    180-degree ambiguity — the reference needed manual '_corrections'
    files for these) are resolved automatically: each frame's anchor
    camera defines the board's world pose via the current scene
    estimate; every other camera's corners are kept as-is or reversed,
    whichever reprojects closer, and dropped if neither is within
    align_tol_px median error.
    """
    n_cam = len(img_pts_arr)
    ppi = board_shape[0] * board_shape[1]
    all_names = sorted({f for fn in fnames_arr for f in fn})
    shared = [f for f in all_names if sum(f in fn for fn in fnames_arr) >= 2]

    k_arr = [np.asarray(k) for k in k_arr]
    d4 = [np.asarray(d).reshape(-1)[:4] for d in d_arr]
    r_np = [np.asarray(r) for r in r_arr]
    t_np = [np.asarray(t).reshape(3) for t in t_arr]

    P = len(shared) * ppi
    obs = np.zeros((P, n_cam, 2))
    mask = np.zeros((P, n_cam), dtype=bool)
    pts3d0 = np.zeros((P, 3))
    n_flipped = n_dropped = 0
    for s, fname in enumerate(shared):
        sl = slice(s * ppi, (s + 1) * ppi)
        seen_by = [c for c in range(n_cam) if fname in fnames_arr[c]]
        a = seen_by[0]
        corners_a = np.asarray(img_pts_arr[a][fnames_arr[a].index(fname)]).reshape(ppi, 2)
        obs[sl, a] = corners_a
        mask[sl, a] = True
        for c in seen_by[1:]:
            corners_c = np.asarray(
                img_pts_arr[c][fnames_arr[c].index(fname)]
            ).reshape(ppi, 2)
            # score both orderings by triangulate(a, c) -> reproject-to-c error
            best = None
            for cand in (corners_c, corners_c[::-1]):
                tri = np.asarray(
                    cam_ops.triangulate_points_fisheye(
                        corners_a, cand,
                        k_arr[a], d4[a], r_np[a], t_np[a],
                        k_arr[c], d4[c], r_np[c], t_np[c],
                    )
                )
                pr_a = np.asarray(
                    cam_ops.project_points_fisheye(tri, k_arr[a], d4[a], r_np[a], t_np[a])
                )
                err = np.median(np.linalg.norm(pr_a - corners_a, axis=1))
                if best is None or err < best[0]:
                    best = (err, cand)
            err, cand = best
            if err > align_tol_px:
                n_dropped += 1
                continue
            if cand is not corners_c:
                n_flipped += 1
            obs[sl, c] = cand
            mask[sl, c] = True
        # 3D init from the first two kept cameras
        kept = [c for c in seen_by if mask[s * ppi, c]]
        if len(kept) < 2:
            mask[sl, :] = False
            continue
        a2, b2 = kept[0], kept[1]
        pts3d0[sl] = np.asarray(
            cam_ops.triangulate_points_fisheye(
                obs[sl, a2], obs[sl, b2],
                k_arr[a2], d4[a2], r_np[a2], t_np[a2],
                k_arr[b2], d4[b2], r_np[b2], t_np[b2],
            )
        )
    if n_flipped or n_dropped:
        print(
            f"Board data prep: fixed {n_flipped} reversed corner set(s), "
            f"dropped {n_dropped} inconsistent one(s)"
        )
    return obs, mask, pts3d0


def bundle_adjust_board_points_and_extrinsics(
    img_pts_arr, fnames_arr, board_shape, k_arr, d_arr, r_arr, t_arr,
    num_iters: int = 80,
):
    """Joint board-point + extrinsics refinement (src/calib/calib.py:362-390).

    Returns (pts3d, r_arr, t_arr, residuals dict)."""
    obs, mask, pts0 = prepare_calib_board_data(
        img_pts_arr, fnames_arr, board_shape, k_arr, d_arr, r_arr, t_arr
    )
    pts, r_out, t_out, residuals = lm.sba_points_extrinsics(
        jnp.asarray(obs), jnp.asarray(mask),
        np.asarray(k_arr), np.asarray(d_arr),
        np.asarray(r_arr), np.asarray(t_arr),
        jnp.asarray(pts0), f_scale=1.0, num_iters=num_iters,
    )
    return np.asarray(pts), np.asarray(r_out), np.asarray(t_out), residuals
