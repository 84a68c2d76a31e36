"""Batched multi-run sweep (the all_flick.sh workload) on the CPU mesh."""
import json
import os

import numpy as np
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline import data, sweep

import synthetic


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """Three runs with different rigs, lengths, and resolutions (one
    1080p run — per-run camera width must flow into the EKF)."""
    root = tmp_path_factory.mktemp("dataset")
    gts = {}
    widths = {}
    specs = [
        (4, 40, 1, (2704, 1520)),
        (5, 48, 2, (2704, 1520)),
        (4, 32, 3, (1920, 1080)),
    ]
    for ri, (n_cams, N, seed, cam_res) in enumerate(specs):
        run = root / f"2019_03_0{ri + 1}" / "cheetah" / "run"
        dlc = run / "dlc"
        dlc.mkdir(parents=True)
        cams = synthetic.ring_cameras(n_cams=n_cams, res=cam_res)
        k, d, r, t, res = cams
        widths[str(run)] = cam_res[0]
        X = synthetic.cheetah_gallop(N=N, fps=90.0)
        pixels, likelihood, pts3d = synthetic.render_measurements(
            X, cams, noise_px=1.0, outlier_frac=0.01, bad_lik_frac=0.02, seed=seed
        )
        for c in range(n_cams):
            data.save_dlc_points_h5(
                str(dlc / f"cam{c + 1}DLC.h5"), pixels[c], likelihood[c],
                cheetah.get_markers(),
            )
        scene_dir = run.parent / "extrinsic_calib"
        scene_dir.mkdir()
        data.save_scene(
            str(scene_dir / f"{n_cams}_cam_scene_sba.json"), k, d.reshape(-1, 4, 1), r, t, res
        )
        with open(run / "video_info.json", "w") as f:
            json.dump({"resolution": list(res), "fps": 90.0, "tot_frames": N}, f)
        gts[str(run)] = pts3d
    return str(root), gts, widths


def test_sweep_batched(dataset_root):
    root, gts, _widths = dataset_root
    results = sweep.sweep(root, dlc_thresh=0.5, num_iters=40)
    assert len(results) == 3
    for res in results:
        pts3d = gts[res["data_dir"]]
        err = np.linalg.norm(res["positions"] - pts3d, axis=-1)
        assert np.nanmean(err) < 0.06, (res["data_dir"], np.nanmean(err))
        assert os.path.exists(os.path.join(res["data_dir"], "fte", "fte.pickle"))


def test_sweep_batched_ekf(dataset_root):
    root, gts, widths = dataset_root
    results = sweep.sweep(root, dlc_thresh=0.5, stages=("ekf",))
    assert len(results) == 3
    for res in results:
        pts3d = gts[res["data_dir"]]
        n = res["positions"].shape[0]
        # EKF settles after a burn-in; positions should track to ~dm level
        err = np.linalg.norm(res["positions"][n // 2 :] - pts3d[n // 2 :], axis=-1)
        assert np.nanmean(err) < 0.15, (res["data_dir"], np.nanmean(err))
        assert os.path.exists(os.path.join(res["data_dir"], "ekf", "ekf.pickle"))
        # untrusted sigma follows each run's own camera width
        # (src/all_optimizations.py:610) — the 1080p run must use 1920
        assert res["max_pixel_err"] == widths[res["data_dir"]], res["data_dir"]
