"""FTE parity vs an independent general-purpose NLP solver.

The reference solves the FTE objective with IPOPT (unavailable here).
As a proxy, scipy's L-BFGS-B minimizes the *identical* reduced objective
(same redescending measurement loss, model term, and box joint limits)
from the same initialization, with exact JAX gradients. The banded
Gauss-Newton solver must reach an equal-or-better objective value and
comparable reprojection accuracy — the north-star acceptance criterion
('within 2% of the IPOPT reference') tested against a stand-in solver.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline.ekf import make_h_fn
from acinoset_tpu.pipeline.fte import default_config, initial_trajectory
from acinoset_tpu.solvers import trajopt

import synthetic


def test_banded_gn_matches_lbfgsb_optimum():
    cams = synthetic.ring_cameras(n_cams=4)
    k, d, r, t, res = cams
    N = 40
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=3
    )
    cfg = default_config(90.0, num_iters=60)
    h = make_h_fn(k, d, r, t)
    X0 = initial_trajectory(pixels, likelihood, k, d, r, t, np.arange(N), 0.5)
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px)

    # ---- ours
    X_gn, info = trajopt.fte_solve(h, jnp.asarray(X0), meas, w, cfg)
    cost_gn = float(trajopt.fte_objective(X_gn, h, meas, w, cfg))

    # ---- independent solver on the identical objective, with bounds
    P = cheetah.N_ACTIVE
    obj = jax.jit(
        lambda xflat: trajopt.fte_objective(xflat.reshape(N, P), h, meas, w, cfg)
    )
    grad = jax.jit(jax.grad(lambda xflat: trajopt.fte_objective(
        xflat.reshape(N, P), h, meas, w, cfg
    )))
    lo, hi = cheetah.pose_limits_25()
    bounds = [(l, u) for _ in range(N) for l, u in zip(lo, hi)]
    out = minimize(
        lambda x: float(obj(jnp.asarray(x))),
        X0.reshape(-1),
        jac=lambda x: np.asarray(grad(jnp.asarray(x)), np.float64),
        method="L-BFGS-B",
        bounds=bounds,
        options=dict(maxiter=800, ftol=1e-12),
    )
    cost_ref = float(out.fun)

    # our solver within 2% of (or better than) the independent optimum
    assert cost_gn <= cost_ref * 1.02, (cost_gn, cost_ref)

    # and marker accuracy at least as good as the reference solver's
    # (measured: err_gn ~ 0.011 m vs err_ref ~ 0.138 m — GN reaches a
    # much deeper optimum; the bound leaves 5% + 2 mm slack only)
    X_ref = out.x.reshape(N, P)
    mk_gn = np.asarray(jax.vmap(cheetah.fk25)(X_gn))
    mk_ref = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(X_ref)))
    err_gn = np.nanmean(np.linalg.norm(mk_gn - pts3d, axis=-1))
    err_ref = np.nanmean(np.linalg.norm(mk_ref - pts3d, axis=-1))
    assert err_gn <= err_ref * 1.05 + 0.002, (err_gn, err_ref)
