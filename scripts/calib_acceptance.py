#!/usr/bin/env python
"""End-to-end calibration acceptance on the raw shipped scene
(VERDICT r4 item 8): chain pairwise extrinsics from the RAW
thursday_kiara corner files (the reference shipped manually
'_corrected' files — our `prepare_calib_board_data` resolves the
per-frame corner-ordering flips automatically,
calib/extrinsics.py:290-377), then board-bundle-adjust the chained
scene and report the reprojection RMS before/after.

Reference twin: /root/reference/src/calib/app.py:201-223 (SBA step) on
/root/reference/data/thursday_kiara/extrinsic_calib. Run on CPU:

    python scripts/calib_acceptance.py | tee docs/r05/calib_acceptance.txt
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from acinoset_tpu.calib import app as calib_app
from acinoset_tpu.calib import extrinsics
from acinoset_tpu.pipeline import data

REF = "/root/reference/data"
BASE = f"{REF}/thursday_kiara/extrinsic_calib"


def main():
    t0 = time.time()
    k_arr, d_arr, r_ref, t_ref, cam_res = data.load_scene(f"{BASE}/4_cam_scene.json")
    d4 = d_arr.reshape(4, -1)[:, :4]
    img_pts_arr, fnames_arr = [], []
    for i in range(1, 5):
        pts, fn, board_shape, edge, _ = data.load_points(
            f"{BASE}/points/points_cam{i}.json"
        )
        img_pts_arr.append(pts)
        fnames_arr.append(fn)
        print(f"cam{i}: {len(fn)} corner frames")

    # stage 1: pairwise chained extrinsics from the RAW points
    r_out, t_out = extrinsics.calibrate_pairwise_extrinsics(
        extrinsics.calibrate_pair_extrinsics_fisheye,
        img_pts_arr, fnames_arr, list(k_arr), list(d4), cam_res,
        board_shape, edge,
    )
    print(f"pairwise chain: {time.time() - t0:.1f} s")
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        Rab_ref = r_ref[b] @ r_ref[a].T
        Rab_our = np.asarray(r_out[b]) @ np.asarray(r_out[a]).T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rab_our @ Rab_ref.T) - 1) / 2, -1, 1)))
        tab_ref = (t_ref[b] - Rab_ref @ t_ref[a]).ravel()
        tab_our = (np.asarray(t_out[b]) - Rab_our @ np.asarray(t_out[a])).ravel()
        print(f"pair {a}-{b}: rotation gap {ang:.3f} deg, "
              f"translation gap {np.linalg.norm(tab_our - tab_ref) * 100:.2f} cm "
              f"vs shipped 4_cam_scene.json")

    # stage 2: board bundle adjustment of OUR chained scene (the raw
    # chain's far pairs accumulate error -> large initial RMS; the
    # Schur-LM board SBA pulls it down)
    pts3d, rN, tN, residuals = extrinsics.bundle_adjust_board_points_and_extrinsics(
        img_pts_arr, fnames_arr, board_shape, k_arr, d4,
        [np.asarray(r) for r in r_out], [np.asarray(t) for t in t_out],
        num_iters=80,
    )
    before = float(np.sqrt(np.mean(np.asarray(residuals["before"]) ** 2)))
    after = float(np.sqrt(np.mean(np.asarray(residuals["after"]) ** 2)))
    print(f"board SBA on the raw chained scene: RMS {before:.1f} -> {after:.1f} px")

    # cross-check vs the SHIPPED sba scene: same SBA on the shipped
    # chained scene should land at a comparable floor
    k2, d2, r2, t2, _ = data.load_scene(f"{BASE}/4_cam_scene.json")
    _p, _r, _t, res2 = extrinsics.bundle_adjust_board_points_and_extrinsics(
        img_pts_arr, fnames_arr, board_shape, k2, d2.reshape(4, -1)[:, :4],
        list(r2), list(t2), num_iters=80,
    )
    b2 = float(np.sqrt(np.mean(np.asarray(res2["before"]) ** 2)))
    a2 = float(np.sqrt(np.mean(np.asarray(res2["after"]) ** 2)))
    print(f"board SBA on the shipped hand-corrected scene: RMS {b2:.1f} -> {a2:.1f} px")
    print(f"total {time.time() - t0:.1f} s")


if __name__ == "__main__":
    main()
