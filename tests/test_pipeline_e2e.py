"""Full-pipeline end-to-end test on a synthetic data directory laid out
exactly like a released AcinoSet run (dlc/*.h5 + scene JSON + video-info
sidecar), driven through the CLI-contract entry points."""
import json
import os

import numpy as np
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline import data
from acinoset_tpu.pipeline.ekf import ekf
from acinoset_tpu.pipeline.fte import fte
from acinoset_tpu.pipeline.sba import sba
from acinoset_tpu.pipeline.tri import tri

import synthetic


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("2019_03_09") / "lily" / "run"
    dlc = root / "dlc"
    dlc.mkdir(parents=True)

    cams = synthetic.ring_cameras(n_cams=4)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=60, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=1.0, outlier_frac=0.01, bad_lik_frac=0.03, seed=9
    )
    markers = cheetah.get_markers()
    for c in range(4):
        data.save_dlc_points_h5(
            str(dlc / f"cam{c + 1}DLC_resnet.h5"), pixels[c], likelihood[c], markers
        )
    scene_dir = root.parent / "extrinsic_calib"
    scene_dir.mkdir()
    data.save_scene(str(scene_dir / "4_cam_scene_sba.json"), k, d.reshape(-1, 4, 1), r, t, res)
    with open(root / "video_info.json", "w") as f:
        json.dump({"resolution": list(res), "fps": 90.0, "tot_frames": 60}, f)
    return str(root), pts3d


def test_dlc_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pixels = rng.uniform(0, 100, (10, 3, 2))
    lik = rng.uniform(0, 1, (10, 3))
    fp = str(tmp_path / "x.h5")
    data.save_dlc_points_h5(fp, pixels, lik, ["a", "b", "c"])
    p2d = data.load_dlc_points([fp])
    np.testing.assert_allclose(p2d.pixels[0], pixels, atol=1e-12)
    np.testing.assert_allclose(p2d.likelihood[0], lik, atol=1e-12)
    assert p2d.markers == ["a", "b", "c"]


def test_tri_stage(run_dir):
    root, pts3d = run_dir
    out = tri(root, 1, -1, 0.5)
    pos = out["positions"]
    assert pos.shape == (60, 20, 3)
    err = np.linalg.norm(pos - pts3d, axis=-1)
    assert np.nanmedian(err) < 0.05
    assert os.path.exists(os.path.join(root, "tri", "tri.pickle"))


def test_sba_stage(run_dir):
    root, pts3d = run_dir
    out = sba(root, 1, -1, 0.5)
    err = np.linalg.norm(out["positions"] - pts3d, axis=-1)
    assert np.nanmedian(err) < 0.05
    assert os.path.exists(os.path.join(root, "sba", "sba.pickle"))


def test_ekf_stage(run_dir):
    root, pts3d = run_dir
    out = ekf(root, 1, -1, 0.5)
    assert out["positions"].shape == (60, 20, 3)
    err = np.linalg.norm(out["positions"][20:] - pts3d[20:], axis=-1)
    assert np.nanmean(err) < 0.12, np.nanmean(err)
    payload = data.load_pickle(os.path.join(root, "ekf", "ekf.pickle"))
    assert payload["x"].shape == (60, 25)
    assert payload["smoothed_x"].shape == (60, 25)


def test_fte_stage(run_dir):
    root, pts3d = run_dir
    out = fte(root, 1, -1, 0.5, num_iters=40)
    err = np.linalg.norm(out["positions"] - pts3d, axis=-1)
    assert np.nanmean(err) < 0.05, np.nanmean(err)
    payload = data.load_pickle(os.path.join(root, "fte", "fte.pickle"))
    assert payload["positions"].shape == (60, 20, 3)
    assert payload["x"].shape == (60, 25)
    # reprojection export exists for every camera
    for c in range(4):
        assert os.path.exists(
            os.path.join(root, "fte", f"cheetah_reprojected_cam{c + 1}.pickle")
        ) or os.path.exists(os.path.join(root, "fte", f"cheetah_reprojected_cam{c + 1}.h5"))


def test_eval_metrics(run_dir):
    root, pts3d = run_dir
    from acinoset_tpu.eval import metrics

    k, d, r, t, cam_res, n_cams, scene = data.find_scene_file(root, verbose=False)
    payload = data.load_pickle(os.path.join(root, "fte", "fte.pickle"))
    # use the synthetic noiseless projections as "GT"
    gt = [
        np.asarray(metrics.reproject_positions(pts3d, k[c], d[c], r[c], t[c]))
        for c in range(2)
    ]
    res = metrics.evaluate_reconstruction(
        payload["positions"], gt, k, d, r, t, cam_indices=[0, 1]
    )
    assert res["overall"]["rmse_px"] < 5.0, res["overall"]
    assert res["overall"]["pck"] > 0.95


def test_eval_cli_with_histogram(run_dir, tmp_path):
    """`cli eval --hist` produces the reprojection-error histogram
    artifact (reference src/testing.py:199-221)."""
    root, pts3d = run_dir
    from acinoset_tpu.cli import main as cli_main

    h5s = sorted(
        os.path.join(root, "dlc", f) for f in os.listdir(os.path.join(root, "dlc"))
    )[:2]
    hist = str(tmp_path / "reproj_hist.png")
    rc = cli_main([
        "eval", "--result", os.path.join(root, "fte", "fte.pickle"),
        "--gt_h5", *h5s, "--cams", "0", "1", "--hist", hist,
    ])
    assert rc == 0
    assert os.path.exists(hist) and os.path.getsize(hist) > 1000
