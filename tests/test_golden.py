"""Golden-file regression: solver outputs stay put across refactors.

The reference repo's only regression anchors are its released result
pickles (SURVEY.md §4); this framework adds its own golden fixtures on
deterministic synthetic data so solver changes that shift results are
caught immediately. Regenerate intentionally with
tests/golden/regenerate.py after verified algorithm changes.
"""
import os

import numpy as np

import synthetic
from acinoset_tpu.pipeline.fte import fte_run

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_fte_matches_golden():
    cams = synthetic.ring_cameras(n_cams=4)
    k, d, r, t, res = cams
    X = synthetic.cheetah_gallop(N=30, fps=90.0)
    pixels, likelihood, _ = synthetic.render_measurements(
        X, cams, noise_px=1.0, outlier_frac=0.01, bad_lik_frac=0.02, seed=11
    )
    out = fte_run(pixels, likelihood, k, d, r, t, fps=90.0, dlc_thresh=0.5, num_iters=40)
    ref = np.load(os.path.join(GOLDEN, "fte_synthetic_n30.npz"))
    # positions to sub-mm; cost to 0.1% (tolerances absorb BLAS/platform noise)
    np.testing.assert_allclose(out["positions"], ref["positions"], atol=5e-4)
    assert abs(out["cost"] - float(ref["cost"])) < 0.001 * float(ref["cost"]) + 1.0
