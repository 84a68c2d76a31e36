"""Regenerate golden fixtures (run after *verified* algorithm changes)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import synthetic
from acinoset_tpu.pipeline.fte import fte_run

if __name__ == "__main__":
    cams = synthetic.ring_cameras(n_cams=4)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=30, fps=90.0)
    pixels, likelihood, _ = synthetic.render_measurements(
        X, cams, noise_px=1.0, outlier_frac=0.01, bad_lik_frac=0.02, seed=11
    )
    out = fte_run(pixels, likelihood, k, d, r, t, fps=90.0, dlc_thresh=0.5, num_iters=40)
    np.savez_compressed(
        os.path.join(os.path.dirname(__file__), "fte_synthetic_n30.npz"),
        positions=out["positions"], x=out["x"], cost=out["cost"],
    )
    print("regenerated; cost:", out["cost"])
