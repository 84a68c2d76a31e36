"""Iterations-to-cost study: cold (TRI+linreg) vs EKF-warm-started FTE.

Measures, on the flagship synthetic workload, how many GN iterations each
init needs to reach within 1% of the 40-iteration converged cost
(VERDICT r2 item 2). Runs anywhere (CPU by default); the *rate* numbers
come from bench.py on the TPU — this script answers the iteration-count
question only, via the per-iteration cost history of a single solve.

Usage: python scripts/warm_start_study.py  [STUDY_FRAMES=100]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    if os.environ.get("STUDY_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.pipeline.ekf import make_h_fn, make_hj_parts_fn, run_cheetah_ekf
    from acinoset_tpu.pipeline.fte import default_config, initial_trajectory
    from acinoset_tpu.solvers import trajopt
    from acinoset_tpu.utils import synthetic

    N = int(os.environ.get("STUDY_FRAMES", 100))
    dtype = jnp.float32

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
    )

    h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3), dtype)
    lik_t = likelihood.transpose(1, 0, 2)

    cfg = default_config(90.0, num_iters=40)
    w = jnp.asarray((lik_t > 0.5) / cfg.meas_std_px, dtype)

    X0_cold = initial_trajectory(
        pixels, likelihood, k_arr, d_arr, r_arr, t_arr, np.arange(N), 0.5
    )

    # EKF warm start (same init the sweep/bench warm path uses)
    pp = cheetah.get_pose_params()
    x0e = np.zeros(3 * cheetah.N_ACTIVE)
    x0e[: cheetah.N_ACTIVE] = X0_cold[0]
    x0e[cheetah.N_ACTIVE : cheetah.N_ACTIVE + 3] = (X0_cold[1, :3] - X0_cold[0, :3]) * 90.0
    states = run_cheetah_ekf(
        pixels.transpose(1, 0, 2, 3), lik_t, k_arr, d_arr, r_arr, t_arr,
        fps=90.0, cam_res=res, dlc_thresh=0.5,
        x0_pose=x0e[: cheetah.N_ACTIVE * 3], dtype=dtype,
    )
    X0_warm = np.asarray(states["smoothed_x"], np.float64)

    from dataclasses import replace

    variants = (
        ("cold", X0_cold, cfg),
        ("warm", X0_warm, cfg),
        # the shipped warm config: robust weights on almost immediately
        ("warm_p4", X0_warm, replace(cfg, plain_iters=4)),
    )
    results = {}
    for name, X0, cfg_v in variants:
        _X, info = jax.jit(
            lambda a, b, c, _cfg=cfg_v: trajopt.fte_solve(
                h, a, b, c, _cfg, hj_parts_fn=hj_parts
            )
        )(jnp.asarray(X0, dtype), meas, w)
        hist = np.asarray(info["cost_history"], np.float64)
        results[name] = (float(info["cost0"]), hist)

    target = min(h_[1][-1] for h_ in results.values()) * 1.01
    names = [v[0] for v in variants]
    print(f"{'iters':>5} " + " ".join(f"{n:>12}" for n in names)
          + f"   (target ≤ {target:.1f})")
    for i in range(len(results["cold"][1])):
        row = " ".join(
            f"{results[n][1][i]:>11.1f}{'*' if results[n][1][i] <= target else ' '}"
            for n in names
        )
        print(f"{i + 1:>5} {row}")
    for name in names:
        hist = results[name][1]
        k = int(np.argmax(hist <= target)) + 1 if (hist <= target).any() else -1
        print(f"{name}: cost0={results[name][0]:.1f}, iters-to-1%={k}, final={hist[-1]:.1f}")


if __name__ == "__main__":
    main()
