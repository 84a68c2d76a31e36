"""FTE banded Gauss-Newton solver on synthetic cheetah data."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline.ekf import make_h_fn
from acinoset_tpu.pipeline.fte import fte_run, default_config
from acinoset_tpu.solvers import trajopt

import synthetic


def test_third_difference_and_adjoint(rng):
    N, P = 20, 4
    Ts = 0.01
    X = rng.normal(size=(N, P))
    d3 = np.asarray(trajopt.third_difference(jnp.asarray(X), Ts))
    # explicit check
    for n in range(3, N):
        np.testing.assert_allclose(
            d3[n - 3], (X[n] - 3 * X[n - 1] + 3 * X[n - 2] - X[n - 3]) / Ts**2, atol=1e-9
        )
    # adjoint: <D3 x, v> == <x, D3^T v>
    v = rng.normal(size=(N - 3, P))
    lhs = np.sum(d3 * v)
    rhs = np.sum(X * np.asarray(trajopt._d3_correlate(jnp.asarray(v), Ts)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    # gram bands match D^T D
    bands = trajopt._d3_gram_bands(N, Ts)
    c = np.array([-1, 3, -3, 1.0]) / Ts**2
    D = np.zeros((N - 3, N))
    for r in range(N - 3):
        D[r, r : r + 4] = c
    G = D.T @ D
    for k in range(4):
        for n in range(k, N):
            np.testing.assert_allclose(bands[k, n], G[n, n - k], rtol=1e-12)


@pytest.fixture(scope="module")
def synth():
    cams = synthetic.ring_cameras(n_cams=6)
    X = synthetic.cheetah_gallop(N=50, fps=90.0)
    pixels, likelihood, pts3d = synthetic.render_measurements(
        X, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=2
    )
    return cams, X, pixels, likelihood, pts3d


def test_fte_recovers_synthetic_run(synth):
    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    result = fte_run(
        pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
        fps=90.0, dlc_thresh=0.5, num_iters=50,
    )
    # cost must strictly decrease from the linear init
    assert result["cost"] < result["cost0"] * 0.12, (result["cost"], result["cost0"])
    # marker positions recovered to cm level despite outliers
    mk_err = np.linalg.norm(result["positions"] - pts3d, axis=-1)
    assert np.nanmean(mk_err) < 0.05, np.nanmean(mk_err)
    # reprojection error of trusted points ~ noise level
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    proj = np.asarray(jax.vmap(h)(jnp.asarray(result["x"])))  # (N, C, L, 2)
    meas = pixels.transpose(1, 0, 2, 3)
    trusted = likelihood.transpose(1, 0, 2) > 0.5
    err = np.linalg.norm(proj - meas, axis=-1)[trusted]
    # median is robust to the injected outliers
    assert np.median(err) < 4.0, np.median(err)
    # joint limits respected
    lo, hi = cheetah.pose_limits_25()
    assert np.all(result["x"] >= lo - 1e-9) and np.all(result["x"] <= hi + 1e-9)


def test_fte_vmappable(synth):
    """The solver vmaps over a batch of trajectories (the TPU scaling axis).

    Identical batch rows must agree bitwise, which needs the exact direct
    solver — the iterative pcg default amplifies reduction-order noise
    through accept/reject branches (~1e-6 relative row spread)."""
    from dataclasses import replace

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    cfg = replace(default_config(90.0, num_iters=8), linear_solver="chol_unrolled")
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)

    from acinoset_tpu.pipeline.fte import initial_trajectory

    N = pixels.shape[1]
    X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                            np.arange(N), 0.5)
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px)

    batch = 3
    X0b = jnp.stack([jnp.asarray(X0)] * batch)
    measb = jnp.stack([meas] * batch)
    wb = jnp.stack([w] * batch)

    solve = jax.vmap(lambda a, b, c: trajopt.fte_solve(h, a, b, c, cfg)[0])
    Xb = solve(X0b, measb, wb)
    assert Xb.shape == (batch, N, 25)
    np.testing.assert_allclose(np.asarray(Xb[0]), np.asarray(Xb[2]), atol=1e-10)


def test_fte_linear_solver_variants_agree(synth):
    """Every linear-solver backend reaches the 'chol_unrolled' reference:
    exact backends (grouped, cr) per-iterate, inexact-Newton backends
    (cg, pcg, pallas) by cost progress on the same objective."""
    from dataclasses import replace

    from acinoset_tpu.pipeline.fte import initial_trajectory

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    cfg = replace(default_config(90.0, num_iters=8), linear_solver="chol_unrolled")
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    N = pixels.shape[1]
    X0 = jnp.asarray(
        initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                           np.arange(N), 0.5)
    )
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px)

    X_ref, info_ref = trajopt.fte_solve(h, X0, meas, w, cfg)
    X_grp, info_grp = trajopt.fte_solve(
        h, X0, meas, w, replace(cfg, linear_solver="grouped")
    )
    np.testing.assert_allclose(np.asarray(X_grp), np.asarray(X_ref), atol=1e-6)
    np.testing.assert_allclose(
        float(info_grp["cost"]), float(info_ref["cost"]), rtol=1e-8
    )
    X_cg, info_cg = trajopt.fte_solve(h, X0, meas, w, replace(cfg, linear_solver="cg"))
    # truncated CG is inexact-Newton: iterates differ, but it must make
    # comparable progress on the same objective (band 1.3: the exact
    # backends got faster with lam_down=0.5, widening the 8-iteration
    # gap to ~1.2x while converged solutions remain equal)
    assert float(info_cg["cost"]) < float(info_ref["cost"]) * 1.3 + 1e-6

    # spectrally-preconditioned CG: same inexact-Newton class, must make
    # the same progress with ~16 inner iterations
    X_pcg, info_pcg = trajopt.fte_solve(
        h, X0, meas, w, replace(cfg, linear_solver="pcg")
    )
    assert float(info_pcg["cost"]) < float(info_ref["cost"]) * 1.2 + 1e-6

    X_cr, info_cr = trajopt.fte_solve(h, X0, meas, w, replace(cfg, linear_solver="cr"))
    np.testing.assert_allclose(np.asarray(X_cr), np.asarray(X_ref), atol=1e-5)
    np.testing.assert_allclose(
        float(info_cr["cost"]), float(info_ref["cost"]), rtol=1e-6
    )

    # pallas (Newton-Schulz Schur inverses; interpret mode on CPU): the
    # NS inverse is inexact-class once LM damping decays (solve error
    # ~kappa*eps flips accept decisions), so like CG it is held to
    # cost-progress on the same objective, not per-iterate equality
    X_pl, info_pl = trajopt.fte_solve(
        h, X0, meas, w, replace(cfg, linear_solver="pallas")
    )
    assert float(info_pl["cost"]) < float(info_ref["cost"]) * 1.2 + 1e-6


def test_vpu_assembly_matches_einsum(synth):
    """The VPU broadcast-multiply-reduce H/g assembly (the TPU default,
    FteConfig.assembly) reaches the same solution as the legacy einsum
    contraction in hj_parts mode — they differ only in summation order,
    so f64 solves must agree to solver tolerance. Also pins the 'auto'
    resolution: einsum on CPU (bit-exact with the explicit setting)."""
    from dataclasses import replace

    from acinoset_tpu.pipeline.ekf import make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import initial_trajectory

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    cfg = replace(
        default_config(90.0, num_iters=8),
        linear_solver="chol_unrolled",
        assembly="einsum",
    )
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr)
    N = pixels.shape[1]
    X0 = jnp.asarray(
        initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                           np.arange(N), 0.5)
    )
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px)

    X_ein, info_ein = trajopt.fte_solve(
        h, X0, meas, w, cfg, hj_parts_fn=hj_parts
    )
    X_vpu, info_vpu = trajopt.fte_solve(
        h, X0, meas, w, replace(cfg, assembly="vpu"), hj_parts_fn=hj_parts
    )
    np.testing.assert_allclose(np.asarray(X_vpu), np.asarray(X_ein), atol=1e-6)
    np.testing.assert_allclose(
        float(info_vpu["cost"]), float(info_ein["cost"]), rtol=1e-8
    )
    assert bool(info_vpu["converged"]) == bool(info_ein["converged"])

    # 'auto' resolves to einsum on the CPU backend: bit-identical
    X_auto, _ = trajopt.fte_solve(
        h, X0, meas, w, replace(cfg, assembly="auto"), hj_parts_fn=hj_parts
    )
    np.testing.assert_array_equal(np.asarray(X_auto), np.asarray(X_ein))

    with pytest.raises(ValueError, match="assembly"):
        trajopt.fte_solve(
            h, X0, meas, w, replace(cfg, assembly="mxu"), hj_parts_fn=hj_parts
        )


def test_hj_fn_matches_jacfwd(synth):
    """The chain-rule (h, J) hook equals jacfwd of the composition."""
    import jax as J

    from acinoset_tpu.pipeline.ekf import make_hj_fn

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    hj = make_hj_fn(k_arr, d_arr, r_arr, t_arr)
    x = jnp.asarray(np.linspace(-0.2, 0.2, 25))
    h1 = h(x).reshape(-1)
    J1 = J.jacfwd(lambda p: h(p).reshape(-1))(x)
    h2, J2 = hj(x)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J2), atol=1e-10)


def test_fte_hj_parts_matches_default(synth):
    """The unassembled chain-rule measurement mode (hj_parts_fn) reaches
    the same solution as the default jacfwd path: identical math,
    different contraction order."""
    from acinoset_tpu.pipeline.ekf import make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import initial_trajectory

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    cfg = default_config(90.0, num_iters=8)
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr)
    N = pixels.shape[1]
    X0 = jnp.asarray(
        initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                           np.arange(N), 0.5)
    )
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px)

    X_ref, info_ref = trajopt.fte_solve(h, X0, meas, w, cfg)
    X_p, info_p = trajopt.fte_solve(h, X0, meas, w, cfg, hj_parts_fn=hj_parts)
    # identical math, different contraction order: f64 rounding through 8
    # accept/reject branches leaves a few 1e-5-scale elements apart
    np.testing.assert_allclose(np.asarray(X_p), np.asarray(X_ref), atol=5e-5)
    np.testing.assert_allclose(
        float(info_p["cost"]), float(info_ref["cost"]), rtol=1e-6
    )


def test_fte_lagged_jacobian_reaches_same_cost(synth):
    """Lagged/chord Gauss-Newton (relinearize_every=k) must reach the
    same final cost as fully-relinearized GN — the residual and
    accept/reject objective stay exact; only the linearization lags
    (VERDICT r2 item 3). Calibrated on the flagship workload:
    k=2/3 land within 0.01% of k=1 (scripts/probe_lag_stat.py)."""
    from dataclasses import replace

    from acinoset_tpu.pipeline.ekf import make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import initial_trajectory

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr)
    N = pixels.shape[1]
    X0 = jnp.asarray(
        initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                           np.arange(N), 0.5)
    )
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    cfg1 = default_config(90.0, num_iters=30)
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg1.meas_std_px)

    costs = {}
    for k in (1, 3):
        cfg = replace(cfg1, relinearize_every=k)
        _X, info = trajopt.fte_solve(h, X0, meas, w, cfg, hj_parts_fn=hj_parts)
        costs[k] = float(info["cost"])
    assert abs(costs[3] - costs[1]) < 0.005 * costs[1], costs


def test_fte_stationarity_status(synth):
    """converged is a scaled-gradient stationarity flag: True after a
    full solve, False when the iteration budget is clearly too small,
    and grad_norm is surfaced (VERDICT r2 item 7)."""
    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    full = fte_run(
        pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
        fps=90.0, dlc_thresh=0.5, num_iters=50,
    )
    assert full["converged"] is True
    assert full["grad_norm"] < 0.05, full["grad_norm"]
    short = fte_run(
        pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
        fps=90.0, dlc_thresh=0.5, num_iters=4,
    )
    assert short["converged"] is False
    assert short["grad_norm"] > 0.05, short["grad_norm"]


def test_fte_polish_tail_matches_single_segment(synth):
    """The pinned-f32 polish tail (polish_iters, the TPU stationarity
    fix) must be a pure precision change: on CPU the matmul-precision
    pin is a no-op, so splitting the budget into bf16+polish segments
    — including the boundary re-evaluation of h/J/cost — reaches the
    same solution and the same status as the single-segment schedule.
    Precondition (ADVICE r3): this workload converges with lam still
    <= lam0 at the segment boundary, so the deliberate boundary lam
    clamp is inactive; a reject-heavy run that ratcheted lam above
    lam0 is ALLOWED to land on a (better) different point — that path
    is exercised separately below."""
    from dataclasses import replace

    from acinoset_tpu.pipeline.ekf import make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import initial_trajectory

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr)
    N = pixels.shape[1]
    X0 = jnp.asarray(
        initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                           np.arange(N), 0.5)
    )
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    cfg1 = default_config(90.0, num_iters=30)
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg1.meas_std_px)

    results = {}
    for n_pol in (0, 1, 2):
        cfg = replace(cfg1, polish_iters=n_pol)
        X, info = trajopt.fte_solve(h, X0, meas, w, cfg, hj_parts_fn=hj_parts)
        results[n_pol] = (np.asarray(X), info)
        assert info["cost_history"].shape == (30,)
    X_ref, info_ref = results[0]
    for n_pol in (1, 2):
        X_p, info_p = results[n_pol]
        np.testing.assert_allclose(X_p, X_ref, atol=5e-5)
        np.testing.assert_allclose(
            float(info_p["cost"]), float(info_ref["cost"]), rtol=1e-6
        )
        assert bool(info_p["converged"]) == bool(info_ref["converged"])
        np.testing.assert_allclose(
            float(info_p["grad_norm"]), float(info_ref["grad_norm"]),
            rtol=0.05, atol=1e-4,
        )


def test_fte_polish_lam_clamp_path(synth):
    """Exercise the boundary LM-damping clamp (ADVICE r3). CPU f64 LM
    virtually never rejects on this problem family (measured: even
    15%-outlier runs accept every step), so a naturally ratcheted lam
    cannot be produced here — `lam_init` hands the solver a damping
    that has ratcheted to 1e6 (the measured TPU plateau value). With
    num_iters=4, polish_iters=4 the main segment is empty and the
    polish boundary sees lam=1e6: the clamp must undamp to lam0 so the
    (inexact-pcg) exact-model steps restore stationarity from a
    perturbed start — while the unclamped control (polish_iters=0) is
    over-damped (lam decays only 0.5x per accept: 1e6 -> 6e4), barely
    moves, and stays unconverged."""
    from dataclasses import replace

    from acinoset_tpu.pipeline.ekf import make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import initial_trajectory

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr)
    N = pixels.shape[1]
    X0 = jnp.asarray(initial_trajectory(
        pixels, likelihood, k_arr, d_arr, r_arr, t_arr, np.arange(N), 0.5))
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3))
    cfg = default_config(90.0, num_iters=40)
    w = jnp.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px)
    X_star, info_star = trajopt.fte_solve(h, X0, meas, w, cfg,
                                          hj_parts_fn=hj_parts)
    assert bool(info_star["converged"])

    # small perturbation off the optimum: enough to break stationarity
    rng = np.random.default_rng(7)
    X_pert = X_star + jnp.asarray(
        0.005 * rng.standard_normal(np.shape(X_star)))
    # robust weights on from iteration 0 so the objective matches the
    # converged solve's
    cfg1 = replace(cfg, num_iters=4, plain_iters=0, polish_iters=4,
                   lam_init=1e6)
    # over-damped control: one lam=1e6 step cannot restore stationarity
    _Xn, info_n = trajopt.fte_solve(
        h, X_pert, meas, w, replace(cfg1, polish_iters=0),
        hj_parts_fn=hj_parts)
    assert not bool(info_n["converged"]), float(info_n["grad_norm"])
    # clamped polish step: undamped exact step from the boundary
    X_p, info_p = trajopt.fte_solve(h, X_pert, meas, w, cfg1,
                                    hj_parts_fn=hj_parts)
    assert bool(info_p["converged"]), float(info_p["grad_norm"])
    assert float(info_p["cost"]) <= float(info_star["cost"]) * (1 + 1e-3)
    # same reconstruction in marker space (pose coords may differ along
    # floppy directions at equal cost — measured up to 0.03 here)
    mk_p = np.asarray(jax.vmap(cheetah.fk25)(X_p))
    mk_s = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(X_star)))
    d = np.linalg.norm(mk_p - mk_s, axis=-1)
    assert d.mean() < 0.02, d.mean()


def test_fte_cov_ridge_flag(synth):
    """The f32 posterior's stabilizing ridge shrinks near-floppy error
    bars (~30% at the 5th pct vs f64) — users must see WHICH bars are
    affected (VERDICT r3 item 7). The flag is measured, not modeled:
    the covariance recurrence runs at ridge r and 2r and Richardson-
    extrapolates each variance to r=0. On the flagship fixture almost
    no marker cells are affected; zeroing the tail markers' weights
    makes the tail DoFs genuinely floppy and the flag must fire there
    (and concentrate on the tail markers)."""
    from dataclasses import replace

    from acinoset_tpu.pipeline.ekf import make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import initial_trajectory

    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    dt = jnp.float32
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dt)
    hj = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dt)
    cfg = default_config(90.0, num_iters=30)
    N = pixels.shape[1]
    X0 = jnp.asarray(
        initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                           np.arange(N), 0.5), dt)
    meas = jnp.asarray(pixels.transpose(1, 0, 2, 3), dt)
    w = np.asarray((likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px,
                   np.float32)
    solve = jax.jit(lambda w_: trajopt.fte_solve(
        h, X0, meas, jnp.asarray(w_), cfg, hj_parts_fn=hj, compute_cov=True))

    _X1, flagship = solve(w)
    assert float(flagship["cov_ridge_frac"]) < 0.02, (
        float(flagship["cov_ridge_frac"]))

    w_floppy = w.copy()
    mi = [cheetah.MARKERS.index(m) for m in ("tail1", "tail2")]
    w_floppy[:, :, mi] = 0.0
    _X2, floppy = solve(w_floppy)
    frac = float(floppy["cov_ridge_frac"])
    assert frac > 0.05, frac
    rel = np.asarray(floppy["marker_std_ridge_shrink"])  # (N, L, 3)
    # the shrink concentrates on the now-unobserved tail markers
    assert rel[:, mi].max() > 0.25, rel[:, mi].max()
    assert rel[:, mi].mean() > 5 * np.delete(rel, mi, axis=1).mean()
    # f64 has no ridge: flag exactly zero (and no per-cell field)
    _X3, f64info = trajopt.fte_solve(
        make_h_fn(k_arr, d_arr, r_arr, t_arr),
        jnp.asarray(X0, jnp.float64),
        jnp.asarray(meas, jnp.float64),
        jnp.asarray(w, jnp.float64), cfg,
        hj_parts_fn=make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr),
        compute_cov=True)
    assert float(f64info["cov_ridge_shrink"]) == 0.0
    assert "marker_std_ridge_shrink" not in f64info


def test_fte_posterior_uncertainty_calibrated(synth):
    """Laplace-posterior error bars (compute_cov / fte_run uncertainty):
    per-marker 1-sigma stds must be positive, mm-to-cm scale, and
    statistically calibrated against the known synthetic ground truth —
    conservative is acceptable (the Q smoothness prior contributes
    variance the synthetic gallop doesn't use), wildly off is not.
    Capability the reference never had: IPOPT discards its KKT
    factorization (src/all_optimizations.py:503-516)."""
    cams, X_true, pixels, likelihood, pts3d = synth
    k_arr, d_arr, r_arr, t_arr, res = cams
    result = fte_run(
        pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
        fps=90.0, dlc_thresh=0.5, num_iters=40, uncertainty=True,
    )
    std = result["marker_std"]  # (N, L, 3)
    N = std.shape[0]
    assert std.shape == (N, cheetah.N_MARKERS, 3)
    assert np.all(np.isfinite(std)) and std.min() > 0
    # sane scale: noisy-pixel triangulation at ~2 m range -> mm..cm
    assert 1e-3 < np.median(std) < 5e-2, np.median(std)
    # pose covariance: symmetric PSD diagonal
    pc = result["pose_cov"]
    d = np.diagonal(pc, axis1=-2, axis2=-1)
    assert d.min() > 0
    np.testing.assert_allclose(pc, np.swapaxes(pc, -1, -2), atol=1e-10)
    # calibration: z-scores of the actual error (boundary frames have
    # weaker smoothness support — trim 3). Measured on this fixture:
    # std(z) ~ 0.50 (2x conservative), 99.8% within 2 sigma.
    err = result["positions"] - pts3d
    z = err[3:-3] / std[3:-3]
    z = z[np.isfinite(z)]
    assert 0.2 < np.std(z) < 1.5, np.std(z)
    assert np.mean(np.abs(z) < 3.0) > 0.99
