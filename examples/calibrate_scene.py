"""Example: full camera calibration flow for a scene.

Script twin of calib_with_gui.ipynb: extract corners per camera ->
fisheye intrinsics -> pairwise extrinsics chain -> board bundle
adjustment -> scene JSON + render.

    python examples/calibrate_scene.py --scene_dir /data/<scene>/extrinsic_calib \
        --board 9 6 --square_len 0.04
"""
import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acinoset_tpu.calib import app as calib_app
from acinoset_tpu.pipeline.plots import plot_scene

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--board", type=int, nargs=2, default=[9, 6])
    ap.add_argument("--square_len", type=float, default=0.04)
    ap.add_argument("--skip_corners", action="store_true",
                    help="reuse existing points/points_cam*.json")
    args = ap.parse_args()

    frames_root = os.path.join(args.scene_dir, "frames")
    points_dir = os.path.join(args.scene_dir, "points")
    cam_dirs = sorted(glob(os.path.join(frames_root, "*")))
    n = len(cam_dirs)

    if not args.skip_corners:
        for i, cam_dir in enumerate(cam_dirs, start=1):
            calib_app.extract_corners_from_images(
                cam_dir,
                os.path.join(points_dir, f"points_cam{i}.json"),
                tuple(args.board),
                args.square_len,
            )

    points_fpaths = sorted(glob(os.path.join(points_dir, "points_cam*.json")))
    n = len(points_fpaths)

    camera_dir = os.path.join(args.scene_dir, "cameras")
    camera_fpaths = []
    for i, pf in enumerate(points_fpaths, start=1):
        cf = os.path.join(camera_dir, f"camera_{i}.json")
        if not os.path.exists(cf):
            calib_app.calibrate_fisheye_intrinsics(pf, cf)
        camera_fpaths.append(cf)

    scene_fpath = os.path.join(args.scene_dir, f"{n}_cam_scene.json")
    calib_app.calibrate_fisheye_extrinsics_pairwise(camera_fpaths, points_fpaths, scene_fpath)
    calib_app.sba_board_points_fisheye(scene_fpath, points_fpaths)
    plot_scene(
        scene_fpath.replace(".json", "_sba.json"),
        out_fpath=os.path.join(args.scene_dir, "scene.png"),
    )
