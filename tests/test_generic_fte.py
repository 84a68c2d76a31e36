"""Generic-skeleton FTE on the real shipped human data (build.py path)."""
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from acinoset_tpu.models.skeleton import build_skeleton_model
from acinoset_tpu.pipeline import data, generic

REF = "/root/reference"


def test_generic_fte_on_real_human_data():
    skel = data.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    k, d, r, t, _res = data.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    fpaths = sorted(glob(f"{REF}/data/*.h5"))
    p2d = data.load_dlc_points(fpaths, markers=model.markers)
    win = p2d.window(60, 160)  # the reference build.py window (start 60, N=100)

    result = generic.fte_generic_run(
        skel, win.pixels, win.likelihood, k, d.reshape(-1, 4), r, t,
        fps=120.0, dlc_thresh=0.4, num_iters=40,
    )
    assert result["x"].shape == (100, 48)  # matches the fixture layout
    assert result["positions"].shape == (100, 15, 3)
    assert result["cost"] < result["cost0"] * 0.05

    # reprojection error on trusted measurements at the few-px level
    h = generic.make_h_fn_generic(model, k, d.reshape(-1, 4), r, t)
    proj = np.asarray(jax.vmap(h)(jnp.asarray(result["x"])))
    meas = win.pixels.transpose(1, 0, 2, 3)
    lik = np.nan_to_num(win.likelihood.transpose(1, 0, 2), nan=-1)
    trusted = lik > 0.4
    trusted[:, :, model.markers.index("neck")] = False
    err = np.linalg.norm(proj - meas, axis=-1)[trusted]
    assert np.median(err) < 4.0, np.median(err)

    # skeleton stays in the capture volume the fixture occupies
    fix = data.load_pickle(f"{REF}/data/results/traj_results.pickle")
    assert np.linalg.norm(
        np.nanmean(result["positions"], axis=(0, 1)) - np.nanmean(fix["positions"], axis=(0, 1))
    ) < 1.0
