"""Command-line pipeline driver — the src/all_optimizations.py twin.

    python -m acinoset_tpu.cli all --data_dir <run_dir> \
        [--start_frame 1] [--end_frame -1] [--dlc_thresh 0.8] [--plot]

Subcommands: dlc | tri | sba | ekf | fte | all (same stage semantics and
flags as the reference __main__, src/all_optimizations.py:950-983), plus
  calib    — corners -> intrinsics -> pairwise extrinsics -> board SBA
  build    — generic-skeleton FTE (src/build.py twin)
  eval     — reprojection metrics for a result pickle vs GT labels
"""
from __future__ import annotations

import os
from argparse import ArgumentParser
from glob import glob


def _add_run_args(p):
    p.add_argument("--data_dir", type=str, required=True,
                   help="The data directory path to the flick/run to be optimized")
    p.add_argument("--start_frame", type=int, default=1,
                   help="The frame at which the optimized reconstruction will start at")
    p.add_argument("--end_frame", type=int, default=-1,
                   help="The frame at which the optimized reconstruction will end at")
    p.add_argument("--dlc_thresh", type=float, default=0.8,
                   help="Likelihood below which dlc points are excluded")
    p.add_argument("--plot", action="store_true", help="Show plots")
    p.add_argument("--uncertainty", action="store_true",
                   help="FTE stage: compute Laplace-posterior per-marker "
                   "1-sigma error bars (marker_std in fte.pickle)")


def main(argv=None):
    parser = ArgumentParser(description="acinoset_tpu — TPU-native AcinoSet pipeline")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ("dlc", "tri", "sba", "ekf", "fte", "all"):
        _add_run_args(sub.add_parser(name))

    pc = sub.add_parser("calib")
    pc.add_argument("--scene_dir", type=str, required=True,
                    help="extrinsic_calib dir with points/points_cam*.json")
    pc.add_argument("--camera_fpaths", type=str, nargs="*", default=None)
    pc.add_argument("--out", type=str, default=None)

    pb = sub.add_parser("build")
    pb.add_argument("--top_dir", type=str, required=True)
    pb.add_argument("--skeleton", type=str, default=None)
    pb.add_argument("--start_frame", type=int, default=60)
    pb.add_argument("--n_frames", type=int, default=100)
    pb.add_argument("--dlc_thresh", type=float, default=0.4)

    ps = sub.add_parser("sweep")
    ps.add_argument("--root_dir", type=str, required=True,
                    help="Dataset root; every dir containing dlc/*.h5 becomes a run")
    ps.add_argument("--dlc_thresh", type=float, default=0.8)
    ps.add_argument("--num_iters", type=int, default=60)
    ps.add_argument("--max_frames", type=int, default=None)
    ps.add_argument("--stages", type=str, default="fte",
                    help="comma list: fte,ekf")
    ps.add_argument("--warm_start", choices=("auto", "on", "off"), default="auto",
                    help="EKF-smoothed FTE init: 'auto' (default) resolves to "
                    "cold — measured better at every horizon (the EKF init's "
                    "third-difference cost lands the GN in a worse basin, "
                    "docs/r04/{cold,warm}_n600.txt); 'on' forces the EKF "
                    "init (e.g. panning rigs where a straight-line fit is "
                    "meaningless); 'off' forces cold")
    ps.add_argument("--relinearize_every", type=int, default=1,
                    help="lagged-Jacobian GN: refresh the measurement "
                    "Jacobian every k iterations (1 = every)")
    ps.add_argument("--uncertainty", action="store_true",
                    help="FTE stage: per-marker 1-sigma error bars in "
                    "each run's results (Laplace posterior)")
    ps.add_argument("--no_rescue", action="store_true",
                    help="disable the automatic 3x-iteration re-solve of "
                    "runs whose stationarity flag is unconverged")
    ps.add_argument("--skeleton", type=str, default=None,
                    help="skeleton pickle: sweep arbitrary build.py-style "
                    "subjects (humans, new animals) instead of the cheetah")
    ps.add_argument("--init_marker", type=str, default="forehead",
                    help="generic sweeps: marker whose triangulated track "
                    "seeds the root-translation init")

    pv = sub.add_parser("view", help="export an interactive HTML 3D viewer "
                        "for a result pickle (drag-orbit, frame scrub/play)")
    pv.add_argument("--result", type=str, required=True,
                    help="fte/ekf/tri result pickle with a positions array")
    pv.add_argument("--out", type=str, default=None,
                    help="output .html (default: alongside the pickle)")
    pv.add_argument("--scene", type=str, default=None,
                    help="scene JSON to draw camera frusta (default: the "
                    "pickle's recorded scene_fpath)")
    pv.add_argument("--fps", type=float, default=30.0)

    pe = sub.add_parser("eval")
    pe.add_argument("--result", type=str, required=True)
    pe.add_argument("--gt_h5", type=str, nargs="+", required=True)
    pe.add_argument("--cams", type=int, nargs="+", required=True)
    pe.add_argument("--hist", type=str, default=None,
                    help="Save the reprojection-error histogram png here")
    pe.add_argument("--start_frame", type=int, default=None,
                    help="GT frame offset of the result window "
                    "(default: the result pickle's start_frame, else 0)")
    pe.add_argument("--scene", type=str, default=None,
                    help="Scene JSON (default: the result pickle's "
                    "scene_fpath, else walk up from the result)")

    args = parser.parse_args(argv)

    from .utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.cmd in ("dlc", "tri", "sba", "ekf", "fte", "all"):
        from .pipeline import app as app_mod

        stages = [args.cmd] if args.cmd != "all" else ["dlc", "tri", "sba", "ekf", "fte"]
        for stage in stages:
            print(f"========== {stage.upper()} ==========\n")
            if stage == "dlc":
                from .pipeline.video import create_labeled_videos

                vids = sorted(glob(os.path.join(args.data_dir, "cam[1-9].mp4")))
                if vids:
                    create_labeled_videos(
                        vids, out_dir=os.path.join(args.data_dir, "dlc"),
                        draw_skeleton=True, pcutoff=args.dlc_thresh,
                    )
                else:
                    print("No videos found; skipping dlc video labeling")
            elif stage == "tri":
                from .pipeline.tri import tri

                tri(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh)
            elif stage == "sba":
                from .pipeline.sba import sba

                sba(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh)
            elif stage == "ekf":
                from .pipeline.ekf import ekf

                ekf(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh)
            elif stage == "fte":
                from .pipeline.fte import fte

                fte(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh,
                    uncertainty=args.uncertainty)
        if args.cmd == "all":
            from .pipeline.plots import plot_multiple_cheetah_reconstructions

            fpaths = [
                os.path.join(args.data_dir, s, f"{s}.pickle") for s in ("sba", "ekf", "fte")
            ]
            fpaths = [f for f in fpaths if os.path.exists(f)]
            plot_multiple_cheetah_reconstructions(
                fpaths, reprojections=False, dark_mode=True,
                out_fpath=os.path.join(args.data_dir, "reconstructions.png"),
            )
        return 0

    if args.cmd == "calib":
        from .calib import app as calib_app

        points_fpaths = sorted(glob(os.path.join(args.scene_dir, "points", "points_cam*.json")))
        n = len(points_fpaths)
        camera_fpaths = args.camera_fpaths or sorted(
            glob(os.path.join(args.scene_dir, "..", "intrinsic_calib", "camera_*.json"))
        )
        out = args.out or os.path.join(args.scene_dir, f"{n}_cam_scene.json")
        calib_app.calibrate_fisheye_extrinsics_pairwise(camera_fpaths, points_fpaths, out)
        calib_app.sba_board_points_fisheye(out, points_fpaths)
        return 0

    if args.cmd == "build":
        from .pipeline.generic import build_and_solve

        skel = args.skeleton or os.path.join(args.top_dir, "skeletons", "new_human.pickle")
        build_and_solve(
            skel, args.top_dir, start_frame=args.start_frame,
            n_frames=args.n_frames, dlc_thresh=args.dlc_thresh,
        )
        return 0

    if args.cmd == "sweep":
        warm = {"auto": "auto", "on": True, "off": False}[args.warm_start]
        if args.skeleton:
            from .pipeline.sweep import sweep_generic

            sweep_generic(
                args.root_dir, args.skeleton, dlc_thresh=args.dlc_thresh,
                num_iters=args.num_iters, max_frames=args.max_frames,
                warm_start=warm,
                rescue=not args.no_rescue,
                uncertainty=args.uncertainty,
                init_marker=args.init_marker,
                stages=tuple(args.stages.split(",")),
                relinearize_every=args.relinearize_every,
            )
            return 0
        from .pipeline.sweep import sweep as run_sweep

        run_sweep(
            args.root_dir, dlc_thresh=args.dlc_thresh,
            num_iters=args.num_iters, max_frames=args.max_frames,
            stages=tuple(args.stages.split(",")),
            warm_start=warm,
            relinearize_every=args.relinearize_every,
            rescue=not args.no_rescue,
            uncertainty=args.uncertainty,
        )
        return 0

    if args.cmd == "view":
        from .models import cheetah
        from .pipeline import data as data_io
        from .pipeline.viewer import export_interactive_html

        payload = data_io.load_pickle(args.result)
        scene_path = args.scene or payload.get("scene_fpath")
        scene = None
        if scene_path and os.path.exists(scene_path):
            k, d, r, t, _res = data_io.load_scene(scene_path)
            scene = (k, d, r, t)
        markers = payload.get("markers") or cheetah.get_markers()
        out = args.out or os.path.splitext(args.result)[0] + ".html"
        export_interactive_html(
            payload["positions"], out, markers=markers, scene=scene, fps=args.fps,
            marker_std=payload.get("marker_std"),
        )
        print(f"Saved {out} — open in any browser")
        return 0

    if args.cmd == "eval":
        import numpy as np

        from .eval.metrics import evaluate_reconstruction
        from .pipeline import data as data_io

        payload = data_io.load_pickle(args.result)
        scene = args.scene or payload.get("scene_fpath")
        if not (scene and os.path.exists(scene)):
            # walk up from the result file (older pickles lack the path)
            *_ignored, scene = data_io.find_scene_file(
                os.path.dirname(args.result), verbose=False
            )
        k, d, r, t, _res = data_io.load_scene(scene)
        N = payload["positions"].shape[0]
        start = args.start_frame
        if start is None:
            start = int(payload.get("start_frame", 0))
        res_markers = payload.get("markers")
        gt = []
        for fp in args.gt_h5:
            _frames, mk, vals = data_io._read_dlc_h5(fp)
            g = vals[start : start + N, :, :2]
            if res_markers is not None and list(mk) != list(res_markers):
                # align GT columns to the result's marker order by name;
                # result markers absent from the GT become NaN (ignored)
                aligned = np.full((g.shape[0], len(res_markers), 2), np.nan)
                for i, m in enumerate(res_markers):
                    if m in mk:
                        aligned[:, i] = g[:, list(mk).index(m)]
                g = aligned
            gt.append(g)
        res = evaluate_reconstruction(
            payload["positions"], gt, k, d.reshape(-1, 4), r, t, cam_indices=args.cams
        )
        for cam, m in res.items():
            print(cam, {k2: round(v, 4) if isinstance(v, float) else v for k2, v in m.items()})
        if args.hist:
            from .eval.metrics import reprojection_errors, save_error_histogram

            errs = reprojection_errors(
                payload["positions"], gt, k, d.reshape(-1, 4), r, t, cam_indices=args.cams
            )
            save_error_histogram(errs, args.hist)
            print(f"saved histogram: {args.hist} ({errs.size} points)")
        return 0


if __name__ == "__main__":
    raise SystemExit(main())
