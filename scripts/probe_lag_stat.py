"""Probe: stationarity values + lagged-Jacobian cost parity (CPU).

Runs the synthetic flagship trajectory cold at k=1/2/3 relinearization
and prints final cost, grad_norm, converged per mode — used to calibrate
FteConfig.stat_tol and confirm chord-GN parity before TPU timing.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from dataclasses import replace

from acinoset_tpu.pipeline.ekf import make_h_fn, make_hj_parts_fn
from acinoset_tpu.pipeline.fte import default_config, initial_trajectory
from acinoset_tpu.solvers import trajopt
from acinoset_tpu.utils import synthetic

N = int(os.environ.get("PROBE_FRAMES", 100))
iters = int(os.environ.get("PROBE_ITERS", 40))
dtype = jnp.float64 if os.environ.get("PROBE_F64") else jnp.float32

cams = synthetic.ring_cameras(n_cams=6)
k_arr, d_arr, r_arr, t_arr, res = cams
X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
pixels, likelihood, pts3d = synthetic.render_measurements(
    X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
)

h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)
X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr, np.arange(N), 0.5)
meas = jnp.asarray(pixels.transpose(1, 0, 2, 3), dtype)
w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / 5.0, dtype)

base = default_config(90.0, num_iters=iters)
for k in (1, 2, 3):
    cfg = replace(base, relinearize_every=k)
    X, info = jax.jit(
        lambda a, b, c: trajopt.fte_solve(h, a, b, c, cfg, hj_parts_fn=hj_parts)
    )(jnp.asarray(X0, dtype), meas, w)
    from acinoset_tpu.models import cheetah

    mk = np.asarray(jax.vmap(cheetah.fk25)(X))
    mk_err = float(np.nanmean(np.linalg.norm(mk - pts3d, axis=-1)))
    print(
        f"k={k}: cost {float(info['cost0']):.2f} -> {float(info['cost']):.4f} "
        f"grad_norm={float(info['grad_norm']):.4g} converged={bool(info['converged'])} "
        f"marker_err={mk_err*1000:.2f}mm"
    )
    gh = np.asarray(info["cost_history"])
    print("  cost tail:", np.round(gh[-6:], 3))
