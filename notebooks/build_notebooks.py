"""Generate the notebook front-ends (twins of the reference's
src/{TRI,SBA,EKF,FTE,calib_with_gui}.ipynb).

The notebooks are committed as .ipynb files; regenerate with
    python notebooks/build_notebooks.py
after editing the cell sources below. tests/test_notebooks.py executes
them end-to-end with nbclient on CPU.
"""
import os

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))

SETUP = """\
# Setup: CPU JAX + a synthetic reference-layout dataset.
# (Swap `run_dir` for a real AcinoSet data directory — e.g.
#  /data/2019_03_09/lily/run — to process real captures.)
import os, sys, tempfile
sys.path.insert(0, os.path.abspath(".."))  # repo root (or pip install -e .)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from acinoset_tpu.utils.synthetic import make_synthetic_run_dir

workdir = tempfile.mkdtemp(prefix="acinoset_nb_")
run_dir, cams, X_true, pts3d_true = make_synthetic_run_dir(workdir, n_cams=4, N=30)
print("run dir:", run_dir)"""


def nb(title_md, cells, fname):
    n = nbf.v4.new_notebook()
    n.cells = [nbf.v4.new_markdown_cell(title_md)]
    for kind, src in cells:
        if kind == "md":
            n.cells.append(nbf.v4.new_markdown_cell(src))
        else:
            n.cells.append(nbf.v4.new_code_cell(src))
    n.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    path = os.path.join(HERE, fname)
    with open(path, "w") as f:
        nbf.write(n, f)
    print("wrote", path)


nb(
    """# TRI — pairwise triangulation
Runnable twin of the reference's `src/TRI.ipynb`: triangulate DLC 2D
keypoints from all camera pairs and average (reference
`src/all_optimizations.py:898-939`). Every cell runs headlessly on CPU.""",
    [
        ("code", SETUP),
        ("md", "Run the TRI stage (writes `tri/tri.pickle` in the reference schema):"),
        ("code", """\
from acinoset_tpu.pipeline.tri import tri
result = tri(run_dir, start_frame=1, end_frame=-1, dlc_thresh=0.5)
positions = result["positions"]
positions.shape"""),
        ("md", "Accuracy against the synthetic ground truth:"),
        ("code", """\
err = np.linalg.norm(positions - pts3d_true, axis=-1)
print(f"mean marker error: {np.nanmean(err)*1000:.1f} mm")"""),
        ("md", "Export an interactive 3D viewer (drag to orbit, play to scrub):"),
        ("code", """\
from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline.viewer import export_interactive_html
export_interactive_html(positions, os.path.join(workdir, "tri.html"),
                        markers=cheetah.get_markers(),
                        scene=(cams[0], cams[1], cams[2], cams[3]))"""),
    ],
    "TRI.ipynb",
)

nb(
    """# SBA — sparse bundle adjustment over 3D points
Runnable twin of the reference's `src/SBA.ipynb`: robust batched
Levenberg–Marquardt refinement of the triangulated points (reference
`src/all_optimizations.py:868-895`; scipy-TRF there, batched LM with a
Cauchy loss here).""",
    [
        ("code", SETUP),
        ("code", """\
from acinoset_tpu.pipeline.sba import sba
result = sba(run_dir, start_frame=1, end_frame=-1, dlc_thresh=0.5)
positions = result["positions"]"""),
        ("code", """\
err = np.linalg.norm(positions - pts3d_true, axis=-1)
print(f"mean marker error after SBA: {np.nanmean(err)*1000:.1f} mm")"""),
    ],
    "SBA.ipynb",
)

nb(
    """# EKF — extended Kalman filter + RTS smoother
Runnable twin of the reference's `src/EKF.ipynb` (reference
`src/all_optimizations.py:569-865`): constant-acceleration dynamics over
the 25 active pose states, all-camera measurement model through FK +
fisheye projection, 3σ innovation gating, an exact pose-block conditioning gain, and a
temporally-parallel (associative-scan) RTS backward pass.""",
    [
        ("code", SETUP),
        ("code", """\
from acinoset_tpu.pipeline.ekf import ekf
result = ekf(run_dir, start_frame=1, end_frame=-1, dlc_thresh=0.5)
states = result["states"]
print("outliers gated:", result["outliers"])"""),
        ("md", "Filtered vs smoothed root track against ground truth:"),
        ("code", """\
err_f = np.linalg.norm(states["x"][:, :3] - X_true[:, :3], axis=1)
err_s = np.linalg.norm(states["smoothed_x"][:, :3] - X_true[:, :3], axis=1)
print(f"root error filtered {err_f.mean()*1000:.1f} mm / smoothed {err_s.mean()*1000:.1f} mm")"""),
    ],
    "EKF.ipynb",
)

nb(
    """# FTE — full-trajectory estimation (the flagship solver)
Runnable twin of the reference's `src/FTE.ipynb` (reference
`src/all_optimizations.py:22-566`): the Pyomo→IPOPT collocation NLP
re-expressed as an unconstrained banded Gauss–Newton program — the
equality constraints are eliminated analytically, the banded normal
equations are solved by spectrally-preconditioned CG, and the whole
solve is one jit program that `vmap`s across trajectories (hundreds per
chip in parallel — `pipeline/sweep.py`).""",
    [
        ("code", SETUP),
        ("code", """\
from acinoset_tpu.pipeline.fte import fte
result = fte(run_dir, start_frame=1, end_frame=-1, dlc_thresh=0.5, num_iters=30)
print("converged:", result["converged"], " grad_norm:", f"{result['grad_norm']:.3g}")"""),
        ("md", """The per-iteration cost history shows the graduated robust
schedule (plain → redescending) and the solver's true convergence —
`converged` is a Jacobi-scaled gradient-norm stationarity test, the
analog of IPOPT's dual-infeasibility status:"""),
        ("code", """\
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
fig, ax = plt.subplots(figsize=(6, 3))
ax.semilogy(result["cost_history"])
ax.set_xlabel("GN iteration"); ax.set_ylabel("objective")
fig.savefig(os.path.join(workdir, "fte_cost.png"), dpi=80)"""),
        ("code", """\
err = np.linalg.norm(result["positions"] - pts3d_true, axis=-1)
print(f"mean marker error: {np.nanmean(err)*1000:.1f} mm")"""),
        ("md", "Export the interactive viewer for the optimized trajectory:"),
        ("code", """\
from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline.viewer import export_interactive_html
export_interactive_html(result["positions"], os.path.join(workdir, "fte.html"),
                        markers=cheetah.get_markers(),
                        scene=(cams[0], cams[1], cams[2], cams[3]))"""),
    ],
    "FTE.ipynb",
)

nb(
    """# Camera calibration
Runnable twin of the reference's `src/calib_with_gui.ipynb`: fisheye
intrinsics from detected checkerboard corners, pairwise extrinsics
chaining, and board bundle adjustment (reference `src/calib/calib.py`).
This notebook calibrates from synthetic checkerboard observations so it
runs anywhere; point the paths at `extract_corners_from_images` output
for real captures.""",
    [
        ("code", """\
import os, sys, tempfile, json
sys.path.insert(0, os.path.abspath(".."))  # repo root (or pip install -e .)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

workdir = tempfile.mkdtemp(prefix="acinoset_calib_nb_")"""),
        ("md", "Synthesize checkerboard observations through a known fisheye camera:"),
        ("code", """\
from acinoset_tpu.ops import camera as cam_ops
from acinoset_tpu.ops.rotations import rodrigues
import jax.numpy as jnp

rng = np.random.default_rng(0)
board, square = (9, 6), 0.04
obj = np.zeros((board[0] * board[1], 3))
obj[:, :2] = np.mgrid[0:board[0], 0:board[1]].T.reshape(-1, 2) * square
K = np.array([[700.0, 0, 640.0], [0, 700.0, 360.0], [0, 0, 1.0]])
D = np.array([0.05, 0.01, -0.008, 0.002])
frames = []
for i in range(24):
    rvec = rng.normal(scale=0.25, size=3)
    t = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.2, 0.2), rng.uniform(0.8, 1.6)])
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    pix = np.asarray(cam_ops.project_points_fisheye(
        jnp.asarray(obj), jnp.asarray(K), jnp.asarray(D), jnp.asarray(R), jnp.asarray(t)))
    frames.append(pix + rng.normal(scale=0.2, size=pix.shape))
points = np.stack(frames)
points.shape"""),
        ("md", "Fisheye intrinsics (Zhang-style init + Gauss–Newton refinement):"),
        ("code", """\
from acinoset_tpu.calib.intrinsics import calibrate_fisheye_camera
calib = calibrate_fisheye_camera(obj, points, (1280, 720))
K_est = np.asarray(calib.k)
print("rms reprojection:", float(calib.rms), "px;",
      int(calib.used.sum()), "/", len(points), "frames used")
np.testing.assert_allclose(np.diag(K_est), np.diag(K), rtol=0.02)
np.testing.assert_allclose(K_est[:2, 2], K[:2, 2], rtol=0.02)
# The raw k3/k4 coefficients are not identifiable from this board's
# narrow angular range (higher-order terms trade off against each other)
# — the meaningful check is the distortion *function* theta_d(theta)
# over the observed angles, in pixels at the focal length:
theta = np.linspace(0.01, 0.35, 50)
def theta_d(th, d):
    t2 = th * th
    return th * (1 + d[0]*t2 + d[1]*t2**2 + d[2]*t2**3 + d[3]*t2**4)
err_px = 700.0 * np.abs(theta_d(theta, np.asarray(calib.d).ravel())
                        - theta_d(theta, D))
print("max distortion-curve error:", err_px.max(), "px")
assert err_px.max() < 1.0"""),
    ],
    "calibration.ipynb",
)
