"""Plot layer smoke tests (headless Agg rendering)."""
import os

import numpy as np
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline import data, plots

REF = "/root/reference/data"


@pytest.fixture()
def result_pickle(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.normal(scale=0.2, size=(12, 25))
    X[:, 0] = np.linspace(0, 1, 12)
    import jax

    positions = np.asarray(jax.vmap(cheetah.fk25)(X))
    fp = str(tmp_path / "fte.pickle")
    data.save_pickle(fp, dict(positions=positions, x=X, markers=cheetah.get_markers()))
    return fp


def test_plot_cheetah_states(tmp_path):
    x = np.random.default_rng(0).normal(size=(50, 25))
    out = str(tmp_path / "states.svg")
    plots.plot_cheetah_states(x, smoothed_x=x * 0.9, out_fpath=out)
    assert os.path.getsize(out) > 1000


def test_plot_reconstruction_and_overlay(result_pickle, tmp_path):
    out = str(tmp_path / "recon.png")
    plots.plot_cheetah_reconstruction(result_pickle, out_fpath=out, frame_step=4)
    assert os.path.getsize(out) > 1000
    out2 = str(tmp_path / "multi.png")
    plots.plot_multiple_cheetah_reconstructions([result_pickle], out_fpath=out2)
    assert os.path.getsize(out2) > 1000


def test_plot_results_with_pan(result_pickle, tmp_path):
    enc = np.linspace(0, 5000, 12)
    out = str(tmp_path / "pan.png")
    positions = plots.plot_results_with_pan(result_pickle, enc, out_fpath=out)
    assert positions.shape[0] == 12
    assert os.path.getsize(out) > 1000


def test_animate_reconstruction(result_pickle, tmp_path):
    """mp4 playback export (stand-in for the pyqtgraph viewer)."""
    out = str(tmp_path / "recon.mp4")
    skel = cheetah.to_skeleton_dict()
    plots.animate_reconstruction(result_pickle, out, skel_links=skel["links"],
                                 fps=10.0, max_frames=6)
    assert os.path.getsize(out) > 5000


def test_calibration_plots(tmp_path):
    pts_file = f"{REF}/thursday_kiara/extrinsic_calib/points/points_cam1.json"
    plots.plot_corners(pts_file, out_fpath=str(tmp_path / "corners.png"))
    cam_file = f"{REF}/intrinsic_calib/2021/camera_1.json"
    pts2 = f"{REF}/intrinsic_calib/2021/points_1.json"
    plots.plot_points_fisheye_undistort(pts2, cam_file, out_fpath=str(tmp_path / "und.png"))
    plots.plot_scene(
        f"{REF}/4_cam_scene_static_sba.json", out_fpath=str(tmp_path / "scene.png")
    )
    for f in ["corners.png", "und.png", "scene.png"]:
        assert os.path.getsize(tmp_path / f) > 1000


def test_interactive_html_viewer(tmp_path):
    """The headless twin of the reference's pyqtgraph scene viewer
    (src/calib/plotting.py:133-196): a standalone HTML export with the
    trajectory embedded as a JS object."""
    import json
    import re

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.pipeline.viewer import export_interactive_html

    import synthetic

    cams = synthetic.ring_cameras(n_cams=3)
    k, d, r, t, _res = cams
    X = synthetic.cheetah_gallop(N=12, fps=90.0)
    import jax, jax.numpy as jnp

    pos = np.array(jax.vmap(cheetah.fk25)(jnp.asarray(X)))
    pos[3, 5] = np.nan  # missing marker must survive the export
    std = np.full((12, cheetah.N_MARKERS, 3), 0.01)
    std[3, 5] = np.nan  # non-finite std must export as 0, not NaN
    out = export_interactive_html(
        pos, str(tmp_path / "traj.html"), markers=cheetah.get_markers(),
        scene=(k, d, r, t), marker_std=std,
    )
    html = open(out).read()
    assert "getContext('2d')" in html and "const DATA =" in html
    blob = re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1)
    data = json.loads(blob.replace("NaN", "null"))  # NaN is JS-legal, not JSON
    assert len(data["positions"]) == 12
    assert len(data["positions"][0]) == cheetah.N_MARKERS
    assert data["positions"][3][5][0] is None  # the NaN marker
    assert len(data["cameras"]) == 3
    assert data["links"], "skeleton edges resolved by marker name"
    # posterior error bars: scalar RMS std per marker per frame
    s = np.array(data["std"])
    assert s.shape == (12, cheetah.N_MARKERS)
    np.testing.assert_allclose(s[0, 0], 0.01, rtol=1e-12)
    assert s[3, 5] == 0.0


def test_cli_view_roundtrip(tmp_path):
    """`cli view` exports a viewer HTML from a result pickle."""
    import subprocess
    import sys

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.pipeline import app

    import synthetic
    import jax, jax.numpy as jnp

    X = synthetic.cheetah_gallop(N=8, fps=90.0)
    pos = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(X)))
    pkl = tmp_path / "fte.pickle"
    app.save_optimised_cheetah(pos, str(pkl))
    r = subprocess.run(
        [sys.executable, "-m", "acinoset_tpu.cli", "view", "--result", str(pkl)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "fte.html").exists()
