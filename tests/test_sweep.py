"""Batched multi-run sweep (the all_flick.sh workload) on the CPU mesh."""
import json
import os

import numpy as np
import pytest

from acinoset_tpu.models import cheetah
from acinoset_tpu.pipeline import data, sweep

import synthetic


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """Three runs with different rigs, lengths, and resolutions (one
    1080p run — per-run camera width must flow into the EKF)."""
    root = tmp_path_factory.mktemp("dataset")
    gts = {}
    widths = {}
    specs = [
        (4, 40, 1, (2704, 1520)),
        (5, 48, 2, (2704, 1520)),
        (4, 32, 3, (1920, 1080)),
    ]
    for ri, (n_cams, N, seed, cam_res) in enumerate(specs):
        run = root / f"2019_03_0{ri + 1}" / "cheetah" / "run"
        dlc = run / "dlc"
        dlc.mkdir(parents=True)
        cams = synthetic.ring_cameras(n_cams=n_cams, res=cam_res)
        k, d, r, t, res = cams
        widths[str(run)] = cam_res[0]
        X = synthetic.cheetah_gallop(N=N, fps=90.0)
        pixels, likelihood, pts3d = synthetic.render_measurements(
            X, cams, noise_px=1.0, outlier_frac=0.01, bad_lik_frac=0.02, seed=seed
        )
        for c in range(n_cams):
            data.save_dlc_points_h5(
                str(dlc / f"cam{c + 1}DLC.h5"), pixels[c], likelihood[c],
                cheetah.get_markers(),
            )
        scene_dir = run.parent / "extrinsic_calib"
        scene_dir.mkdir()
        data.save_scene(
            str(scene_dir / f"{n_cams}_cam_scene_sba.json"), k, d.reshape(-1, 4, 1), r, t, res
        )
        with open(run / "video_info.json", "w") as f:
            json.dump({"resolution": list(res), "fps": 90.0, "tot_frames": N}, f)
        gts[str(run)] = pts3d
    return str(root), gts, widths


def test_sweep_batched(dataset_root):
    root, gts, _widths = dataset_root
    results = sweep.sweep(root, dlc_thresh=0.5, num_iters=40)
    assert len(results) == 3
    for res in results:
        pts3d = gts[res["data_dir"]]
        err = np.linalg.norm(res["positions"] - pts3d, axis=-1)
        assert np.nanmean(err) < 0.06, (res["data_dir"], np.nanmean(err))
        assert os.path.exists(os.path.join(res["data_dir"], "fte", "fte.pickle"))


def test_sweep_batched_ekf(dataset_root):
    root, gts, widths = dataset_root
    results = sweep.sweep(root, dlc_thresh=0.5, stages=("ekf",))
    assert len(results) == 3
    for res in results:
        pts3d = gts[res["data_dir"]]
        n = res["positions"].shape[0]
        # EKF settles after a burn-in; positions should track to ~dm level
        err = np.linalg.norm(res["positions"][n // 2 :] - pts3d[n // 2 :], axis=-1)
        assert np.nanmean(err) < 0.15, (res["data_dir"], np.nanmean(err))
        # EKF-stage error bars ride through the batched path too
        ms = res["states"]["marker_std"]
        assert ms.shape == res["positions"].shape and (ms > 0).all()
        assert os.path.exists(os.path.join(res["data_dir"], "ekf", "ekf.pickle"))
        # untrusted sigma follows each run's own camera width
        # (src/all_optimizations.py:610) — the 1080p run must use 1920
        assert res["max_pixel_err"] == widths[res["data_dir"]], res["data_dir"]


def test_sweep_warm_start_matches_cold(dataset_root):
    """EKF-warm-started FTE: at an equal iteration budget the smoothed
    EKF init must land on the same solutions as the cold TRI+linreg
    start (the init is valid, never corrupting), with per-run solver
    status surfaced. (At long horizons the warm init is measurably
    HARMFUL — see test_sweep_auto_warm_start_resolves_cold — so
    equality on short well-behaved runs, not speedup, is the whole
    contract: forcing warm_start=True must never corrupt a solve that
    works cold.)"""
    root, gts, _widths = dataset_root
    cold = sweep.sweep(root, dlc_thresh=0.5, num_iters=40, save=False)
    warm = sweep.sweep(root, dlc_thresh=0.5, num_iters=40, save=False,
                       warm_start=True)
    assert len(cold) == len(warm) == 3
    by_dir = {r["data_dir"]: r for r in cold}
    for res in warm:
        # status fields ride out of the jitted batch per run
        assert set(res) >= {"cost", "cost0", "converged", "grad_norm"}
        assert res["cost"] < res["cost0"]
        assert res["converged"], (res["data_dir"], res["grad_norm"])
        pts3d = gts[res["data_dir"]]
        err = np.linalg.norm(res["positions"] - pts3d, axis=-1)
        assert np.nanmean(err) < 0.06, (res["data_dir"], np.nanmean(err))
        # same optimum as the cold start (marker space, mm scale)
        d = np.linalg.norm(res["positions"] - by_dir[res["data_dir"]]["positions"],
                           axis=-1)
        assert np.nanmean(d) < 0.01, (res["data_dir"], np.nanmean(d))


def _cheetah_batch_runs(n_runs, N=16, n_cams=2, fps=90.0, seed=0):
    """Many small synthetic cheetah runs sharing one rig — the oversized-
    group harness for the chunked-batch tests."""
    cams = synthetic.ring_cameras(n_cams=n_cams)
    k, d, r, t, res = cams
    rng = np.random.default_rng(seed)
    runs = []
    for ri in range(n_runs):
        X = synthetic.cheetah_gallop(N=N, fps=fps)
        pixels, likelihood, _pts = synthetic.render_measurements(
            X, cams, noise_px=1.0, outlier_frac=0.0, bad_lik_frac=0.0,
            seed=int(rng.integers(1 << 30)),
        )
        runs.append(sweep.RunData(
            data_dir=f"chunk_run_{ri}", pixels=pixels, likelihood=likelihood,
            cams=(k, d.reshape(-1, 4), r, np.asarray(t).reshape(-1, 3)),
            fps=fps, start_frame=0, scene_fpath="",
        ))
    return runs


def test_solve_batch_chunked_matches_unchunked():
    """Groups beyond MAX_PROGRAM_BATCH solve as sequential chunks padded
    to ONE compile signature (VERDICT r3 item 4: an uncapped fps group
    could hand the remote compiler a B>=384/N>=300 program it is
    measured to 500 on).

    What is (and is not) comparable: the FTE solve amplifies bit-level
    input noise ~1e9x on weakly-observed fixtures (measured: a 1e-12
    init perturbation moves the N=16/2-cam solution up to 0.6 — floppy
    directions plus LM accept/reject gates), and XLA's batch tiling
    perturbs within-run reductions at the last bit when the batch shape
    changes, so chunked-vs-unchunked X equality across DIFFERENT batch
    shapes is meaningless. The exactness contract is per-shape: the
    chunked solve must be BIT-IDENTICAL to manually solving each padded
    64-row chunk (same shapes, same program — catches any slicing/
    padding/alignment bug), and quality-equivalent (per-run cost) to
    the unchunked solve."""
    import jax.numpy as jnp

    runs = _cheetah_batch_runs(200)
    kw = dict(dlc_thresh=0.5, num_iters=3, plain_iters=1, dtype=jnp.float64)
    chunked = sweep.solve_batch(runs, max_batch=64, **kw)
    assert len(chunked) == 200
    # one compile signature: every chunk hit the same jitted solver at
    # the same (64-row) shapes
    solver = next(iter(sweep._SOLVER_CACHE.values()))
    if hasattr(solver, "_cache_size"):
        assert solver._cache_size() == 1
    # bit-exact vs manual per-chunk solves (the last chunk padded by
    # repeating its final run, exactly the _solve_chunked contract)
    manual = []
    for lo in range(0, 200, 64):
        chunk = runs[lo : lo + 64]
        if len(chunk) < 64 and lo > 0:
            chunk = chunk + [chunk[-1]] * (64 - len(chunk))
        out = sweep.solve_batch(chunk, max_batch=None, **kw)
        manual.extend(out[: len(runs[lo : lo + 64])])
    for rc, rm in zip(chunked, manual):
        np.testing.assert_array_equal(rc["x"], rm["x"])
        assert rc["converged"] == rm["converged"]
    # quality parity vs the unchunked 200-row program: same optima to
    # cost tolerance (X itself may differ along floppy directions)
    full = sweep.solve_batch(runs, max_batch=None, **kw)
    for rc, rf in zip(chunked, full):
        assert abs(rc["cost"] - rf["cost"]) <= 2e-2 * abs(rf["cost"]), (
            rc["data_dir"], rc["cost"], rf["cost"])
    # X0_override rides through the chunking aligned per-run: a
    # misaligned slice would hand some run its neighbor's init — with
    # per-run DISTINCT inits, chunked must stay bit-identical to the
    # manual per-chunk solve of the same inits
    X0s = [r["x"] + 1e-3 * (i + 1) for i, r in enumerate(full)]
    warm_c = sweep.solve_batch(runs, max_batch=64, X0_override=X0s, **kw)
    warm_m = []
    for lo in range(0, 200, 64):
        chunk = runs[lo : lo + 64]
        Xc = X0s[lo : lo + 64]
        if len(chunk) < 64 and lo > 0:
            chunk = chunk + [chunk[-1]] * (64 - len(chunk))
            Xc = Xc + [Xc[-1]] * (64 - len(Xc))
        out = sweep.solve_batch(chunk, max_batch=None, X0_override=Xc, **kw)
        warm_m.extend(out[: len(runs[lo : lo + 64])])
    for rw, rm in zip(warm_c, warm_m):
        np.testing.assert_array_equal(rw["x"], rm["x"])


def test_initial_trajectory_batch_matches_single():
    """The batched cold init (one vmapped triangulation program + one
    host transfer for the whole group — the per-run loop paid a tunnel
    round-trip per run, 196 s at B=96/N=300) must reproduce per-run
    initial_trajectory to f64 noise."""
    from acinoset_tpu.pipeline.fte import (initial_trajectory,
                                           initial_trajectory_batch)

    runs = _cheetah_batch_runs(3, N=12, n_cams=3)
    N, C = 12, 3
    pix_b, lik_b, cams_b = [], [], []
    for run in runs:
        pix, lik, cams, _n0 = sweep._pad_run(run, N, C)
        pix_b.append(pix)
        lik_b.append(lik)
        cams_b.append(cams)
    aux = tuple(np.stack([c[j] for c in cams_b]) for j in range(4))
    batch = initial_trajectory_batch(
        np.stack(pix_b), np.stack(lik_b), aux, np.arange(N), 0.5)
    for i, run in enumerate(runs):
        single = initial_trajectory(
            pix_b[i], lik_b[i], cams_b[i][0], cams_b[i][1], cams_b[i][2],
            cams_b[i][3], np.arange(N), 0.5)
        np.testing.assert_allclose(batch[i], single, rtol=1e-9, atol=1e-11)


def test_solve_batch_ekf_chunked_matches_unchunked():
    import jax.numpy as jnp

    runs = _cheetah_batch_runs(10, N=12)
    chunked = sweep.solve_batch_ekf(runs, 0.5, max_batch=4, dtype=jnp.float64)
    full = sweep.solve_batch_ekf(runs, 0.5, max_batch=None, dtype=jnp.float64)
    assert len(chunked) == len(full) == 10
    for rc, rf in zip(chunked, full):
        np.testing.assert_allclose(
            rc["states"]["smoothed_x"], rf["states"]["smoothed_x"],
            rtol=1e-5, atol=1e-7,
        )
        assert rc["outliers"] == rf["outliers"]


def test_sweep_ekf_surfaces_outliers(dataset_root):
    root, _gts, _widths = dataset_root
    results = sweep.sweep(root, dlc_thresh=0.5, stages=("ekf",), save=False)
    for res in results:
        assert "outliers" in res and res["outliers"] >= 0


def _tree_skeleton_runs(n_runs=2, n_cams=4, N=40, fps=90.0, seed=0):
    """Synthetic 3-link tree skeleton + measurements rendered through its
    own FK (the generic-sweep ground-truth harness)."""
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.ops import camera as cam_ops

    skel = dict(
        links=[["root"], ["root", "mid"], ["mid", "tip"]],
        positions=dict(root=[0.0, 0.0, 0.0], mid=[0.4, 0.0, 0.0],
                       tip=[0.8, 0.0, 0.0]),
        dofs=dict(root=[1, 1, 1], mid=[0, 1, 1], tip=[0, 1, 0]),
        markers=["root", "mid", "tip"],
    )
    model = build_skeleton_model(skel)
    rng = np.random.default_rng(seed)
    runs, gts = [], []
    for ri in range(n_runs):
        n = N - 8 * ri  # ragged lengths across the batch
        t = np.arange(n) / fps
        X = np.zeros((n, model.n_pose))
        X[:, 0] = -1.0 + 6.0 * t
        X[:, 1] = 0.2 * np.sin(2 * np.pi * t + ri)
        X[:, 2] = 0.6 + 0.05 * np.sin(2 * np.pi * 2 * t)
        X[:, 3:] = 0.3 * np.sin(
            2 * np.pi * t[:, None] * rng.uniform(0.5, 1.5, model.n_pose - 3)
            + rng.uniform(0, 6, model.n_pose - 3)
        )
        cams = synthetic.ring_cameras(n_cams=n_cams)
        k, d, r, tt, res = cams
        pts = np.asarray(jax.vmap(model.fk)(jnp.asarray(X)))  # (n, L, 3)
        pix = np.stack([
            np.asarray(jax.vmap(
                lambda p, c=c: cam_ops.project_points_fisheye(
                    p, jnp.asarray(k[c]), jnp.asarray(d[c]),
                    jnp.asarray(r[c]), jnp.asarray(tt[c]))
            )(jnp.asarray(pts)))
            for c in range(n_cams)
        ])  # (C, n, L, 2)
        pix += rng.normal(scale=1.0, size=pix.shape)
        lik = np.ones((n_cams, n, len(model.markers)))
        runs.append(sweep.RunData(
            data_dir=f"tree_run_{ri}", pixels=pix, likelihood=lik,
            cams=(k, d.reshape(-1, 4), r, np.asarray(tt).reshape(-1, 3)),
            fps=fps, start_frame=0, scene_fpath="",
        ))
        gts.append(pts)
    return model, runs, gts


def test_sweep_generic_batched_tree_analytic():
    """Generic-skeleton batched sweep (VERDICT r2 item 4): ≥2 ragged runs
    of an arbitrary tree skeleton solve through ONE jitted program,
    reusing the skeleton's analytic FK Jacobian."""
    model, runs, gts = _tree_skeleton_runs()
    # the analytic-Jacobian path must actually be in play for a tree
    assert sweep.make_hj_parts_aux_generic(model.fk_and_jac) is not None
    results = sweep.solve_batch_generic(
        model, runs, dlc_thresh=0.5, num_iters=30,
        init_marker="root", exclude_markers=(),
    )
    assert len(results) == 2
    for res, pts in zip(results, gts):
        assert res["positions"].shape == pts.shape  # ragged length honored
        assert res["cost"] < res["cost0"]
        err = np.linalg.norm(res["positions"] - pts, axis=-1)
        assert np.nanmean(err) < 0.05, (res["data_dir"], np.nanmean(err))


def test_sweep_generic_batched_human_fallback():
    """The shipped human skeleton has a non-tree link graph (two-parent
    hip); since r5 that gets the DAG-generalized analytic FK Jacobian,
    but this test pins the jacfwd-over-FK-only FALLBACK (fk_and_jac
    stripped — the reference-compat mode's path) still batching 2
    ragged windows of the real shipped data in one program."""
    from dataclasses import replace as dc_replace
    from glob import glob

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io

    REF = "/root/reference"
    skel = data_io.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    assert model.fk_and_jac is not None  # DAG analytic path exists (r5)
    model = dc_replace(model, fk_and_jac=None)  # pin the jacfwd fallback
    k, d, r, t, _res = data_io.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    fpaths = sorted(glob(f"{REF}/data/*.h5"))
    p2d = data_io.load_dlc_points(fpaths, markers=model.markers)
    runs = []
    for start, n in ((60, 40), (100, 32)):
        win = p2d.window(start, start + n)
        runs.append(sweep.RunData(
            data_dir=f"human_{start}", pixels=win.pixels,
            likelihood=np.nan_to_num(win.likelihood, nan=-1.0),
            cams=(k, d.reshape(-1, 4), r, np.asarray(t).reshape(-1, 3)),
            fps=120.0, start_frame=start, scene_fpath="",
        ))
    results = sweep.solve_batch_generic(model, runs, dlc_thresh=0.4, num_iters=20,
                                        rescue=False)
    assert len(results) == 2
    for res, (start, n) in zip(results, ((60, 40), (100, 32))):
        assert res["x"].shape == (n, model.n_pose)
        assert res["cost"] < res["cost0"], res["data_dir"]
        assert np.isfinite(res["grad_norm"])


def test_sweep_generic_rescue():
    """Generic-batch twin of the cheetah rescue: a starved iteration
    budget leaves runs unconverged; solve_batch_generic re-solves
    exactly those at 3x budget from their current solutions."""
    from glob import glob

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io

    REF = "/root/reference"
    skel = data_io.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    k, d, r, t, _res = data_io.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    fpaths = sorted(glob(f"{REF}/data/*.h5"))
    p2d = data_io.load_dlc_points(fpaths, markers=model.markers)
    runs = []
    for start, n in ((60, 24), (100, 16)):
        win = p2d.window(start, start + n)
        runs.append(sweep.RunData(
            data_dir=f"human_{start}", pixels=win.pixels,
            likelihood=np.nan_to_num(win.likelihood, nan=-1.0),
            cams=(k, d.reshape(-1, 4), r, np.asarray(t).reshape(-1, 3)),
            fps=120.0, start_frame=start, scene_fpath="",
        ))
    starved = sweep.solve_batch_generic(model, runs, dlc_thresh=0.4,
                                        num_iters=4, rescue=False)
    n_bad = sum(1 for r in starved if not r["converged"])
    assert n_bad > 0, [r["grad_norm"] for r in starved]
    rescued = sweep.solve_batch_generic(model, runs, dlc_thresh=0.4,
                                        num_iters=4, rescue=True)
    # `cost` is the true robust objective regardless of plain_iters, so
    # this comparison is apples-to-apples (grad_norm is NOT: the starved
    # pass reports the plain-surrogate gradient, the rescue the
    # Huber-weighted one)
    for res, cold in zip(rescued, starved):
        assert res["cost"] < cold["cost"], (res["data_dir"], res["cost"], cold["cost"])
        assert np.isfinite(res["grad_norm"])


def test_sweep_rescue_recovers_unconverged(dataset_root):
    """The rescue pass: a deliberately-starved iteration budget leaves
    runs unconverged; sweep re-solves exactly those at 3x budget from
    their current solutions and the final results converge."""
    root, gts, _widths = dataset_root
    starved = sweep.sweep(root, dlc_thresh=0.5, num_iters=6, save=False,
                          warm_start=False, rescue=False)
    n_bad = sum(1 for r in starved if not r["converged"])
    assert n_bad > 0, "6 iterations should not satisfy the stationarity test"
    rescued = sweep.sweep(root, dlc_thresh=0.5, num_iters=6, save=False,
                          warm_start=False, rescue=True)
    assert all(r["converged"] for r in rescued), \
        [(r["data_dir"], r["grad_norm"]) for r in rescued]
    for res in rescued:
        pts3d = gts[res["data_dir"]]
        err = np.linalg.norm(res["positions"] - pts3d, axis=-1)
        assert np.nanmean(err) < 0.06, (res["data_dir"], np.nanmean(err))


def test_sweep_auto_warm_start_resolves_cold():
    """warm_start='auto' resolves to the cold TRI+linreg init at EVERY
    horizon: round 3's auto-on threshold was calibrated on a broken
    fixture (the synthetic gallop left the camera ring beyond ~N=130),
    and re-measurement on the repaired fixture showed the EKF warm init
    lands the GN in a WORSE basin (cold N=300: 6.8 mm converged; warm:
    0.04-0.065 m unconverged even at 3x budget). The EKF init remains an
    explicit opt-in (warm_start=True)."""
    assert sweep.resolve_warm_start("auto") is False
    assert sweep.resolve_warm_start(True) is True
    assert sweep.resolve_warm_start(False) is False


def test_sweep_uncertainty_batched(dataset_root):
    """Laplace-posterior error bars through the batched f32 sweep path:
    marker_std rides out of the jitted vmapped program per run, stays
    positive/finite, and agrees with the f64 single-run fte_run posterior
    to within a factor ~2 (different init + f32 RGF recurrence)."""
    from acinoset_tpu.pipeline.fte import fte_run

    root, _gts, _widths = dataset_root
    results = sweep.sweep(root, dlc_thresh=0.5, num_iters=40, save=False,
                          warm_start=False, uncertainty=True)
    assert len(results) == 3
    for res in results:
        std = res["marker_std"]
        n = res["positions"].shape[0]
        assert std.shape == (n, cheetah.N_MARKERS, 3)
        assert np.all(np.isfinite(std)) and std.min() > 0
        assert 1e-3 < np.median(std) < 5e-2, np.median(std)
    # f64 single-run cross-check on one run
    res = results[0]
    from glob import glob as _glob
    import os as _os
    dlc = sorted(_glob(_os.path.join(res["data_dir"], "dlc", "*.h5")))
    p2d = data.load_dlc_points(dlc, markers=cheetah.get_markers())
    k, d, r, t, _ = data.load_scene(res["scene_fpath"])
    single = fte_run(p2d.pixels, p2d.likelihood, k, d, r, t,
                     fps=90.0, dlc_thresh=0.5, num_iters=40, uncertainty=True)
    ratio = np.median(res["marker_std"]) / np.median(single["marker_std"])
    assert 0.5 < ratio < 2.0, ratio


def test_sweep_generic_uncertainty():
    """Error bars through the generic-skeleton batch path (analytic
    FK Jacobian skeletons get marker_std like the cheetah)."""
    model, runs, gts = _tree_skeleton_runs()
    results = sweep.solve_batch_generic(
        model, runs, dlc_thresh=0.5, num_iters=30,
        init_marker="root", exclude_markers=(), uncertainty=True,
    )
    for res, pts in zip(results, gts):
        std = res["marker_std"]
        assert std.shape == (pts.shape[0], len(model.markers), 3)
        assert np.all(np.isfinite(std)) and std.min() > 0
        # clean synthetic data with exact cameras: sub-cm posterior
        assert np.median(std) < 0.02, np.median(std)


def test_ekf_mem_cap_pins_measured_envelope():
    """The EKF HBM chunk cap must keep every measured-good config
    unchunked and chunk the measured OOM config (the 144-state human at
    B=96/N=300 demanded 22.65G of 15.75G HBM,
    docs/r05/bench_generic_n300.txt)."""
    from acinoset_tpu.pipeline.sweep import _ekf_mem_cap

    assert _ekf_mem_cap(600, 25) >= 96   # cheetah N=600 ran at B=96
    assert _ekf_mem_cap(100, 48) >= 96   # human N=100 ran at B=96
    assert _ekf_mem_cap(300, 48) < 96    # the OOM config must chunk
    assert _ekf_mem_cap(300, 48) * 9.5 * 300 * 144**2 * 4 < 15.75e9


def test_sweep_generic_ekf_and_warm_start():
    """Generic-skeleton EKF stage (beyond the reference: build.py has no
    EKF) and the warm-started generic FTE batch built on it."""
    from glob import glob

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io

    REF = "/root/reference"
    skel = data_io.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    k, d, r, t, _res = data_io.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    fpaths = sorted(glob(f"{REF}/data/*.h5"))
    p2d = data_io.load_dlc_points(fpaths, markers=model.markers)
    runs = []
    for start, n in ((60, 24), (100, 16)):
        win = p2d.window(start, start + n)
        runs.append(sweep.RunData(
            data_dir=f"human_{start}", pixels=win.pixels,
            likelihood=np.nan_to_num(win.likelihood, nan=-1.0),
            cams=(k, d.reshape(-1, 4), r, np.asarray(t).reshape(-1, 3)),
            fps=120.0, start_frame=start, scene_fpath="",
        ))

    ekf_res = sweep.solve_batch_ekf_generic(model, runs, dlc_thresh=0.4)
    assert len(ekf_res) == 2
    for res, (start, n) in zip(ekf_res, ((60, 24), (100, 16))):
        assert res["positions"].shape == (n, model.n_markers, 3)
        assert np.isfinite(res["positions"]).all(), res["data_dir"]
        assert res["states"]["smoothed_x"].shape == (n, model.n_pose)
        ms = res["states"]["marker_std"]
        assert ms.shape == (n, model.n_markers, 3) and (ms > 0).all()
        # lock-on guard (r5): the cheetah-scale defaults this replaced
        # gated ~87% of pairs by frame 5 and random-walked the pose past
        # 5 rad (docs/r05/probe_generic_ekf_divergence.txt); the measured
        # soft-measurement defaults keep gating rare and the pose sane
        n_pairs = n * win.pixels.shape[0] * model.n_markers
        assert res["outliers"] < 0.2 * n_pairs, (res["data_dir"],
                                                 res["outliers"], n_pairs)
        sm = res["states"]["smoothed_x"]
        assert np.abs(sm[:, 3:]).max() < np.pi, "pose angles ran away"

    warm = sweep.solve_batch_generic(model, runs, dlc_thresh=0.4,
                                     num_iters=8, warm_start=True,
                                     rescue=False)
    for res in warm:
        assert np.isfinite(res["x"]).all()
        assert res["cost"] < res["cost0"], res["data_dir"]


def test_sweep_generic_cli_layout(tmp_path):
    """File-driven generic sweep (cli sweep --skeleton): discovers runs
    under a dataset root, solves via solve_batch_generic, writes
    traj_results.pickle in build.py's schema + solver status."""
    import shutil
    from glob import glob

    from acinoset_tpu.pipeline import data as data_io
    from acinoset_tpu.pipeline.sweep import sweep_generic

    REF = "/root/reference"
    run = tmp_path / "2019_09_01" / "human" / "walk"
    (run / "dlc").mkdir(parents=True)
    (run.parent / "extrinsic_calib").mkdir()
    for f in glob(f"{REF}/data/*.h5"):
        shutil.copy(f, run / "dlc")
    shutil.copy(f"{REF}/data/4_cam_scene_static_sba.json",
                run.parent / "extrinsic_calib")
    with open(run / "video_info.json", "w") as fh:
        json.dump({"resolution": [1920, 1080], "fps": 120.0,
                   "tot_frames": 200}, fh)

    results = sweep_generic(
        str(tmp_path), f"{REF}/skeletons/new_human.pickle",
        dlc_thresh=0.4, num_iters=8, max_frames=24, rescue=False,
    )
    assert len(results) == 1
    out = run / "fte" / "traj_results.pickle"
    assert out.exists()
    saved = data_io.load_pickle(str(out))
    assert saved["positions"].shape == (24, 15, 3)
    assert {"x", "dx", "ddx", "markers", "converged", "grad_norm"} <= set(saved)
    assert saved["cost"] < saved["cost0"]

    # the generic EKF stage routes through the same file contract
    sweep_generic(
        str(tmp_path), f"{REF}/skeletons/new_human.pickle",
        dlc_thresh=0.4, max_frames=24, stages=("ekf",),
    )
    ekf_out = run / "ekf" / "ekf.pickle"
    assert ekf_out.exists()
    ekf_saved = data_io.load_pickle(str(ekf_out))
    ms = np.asarray(ekf_saved["marker_std"])
    assert ms.shape == (24, 15, 3) and (ms > 0).all()


def test_sweep_ekf_sharded_matches_single_device(dataset_root):
    """The data-axis-sharded batched EKF reproduces the single-device
    solve. No cross-run reductions exist, but the f32 75-state scan
    accumulates compiler-scheduling reassociation drift over N frames
    (measured max ~0.026 in state units), so the state assertion is at
    f32-scan tolerance while the 3-sigma gating decisions — the filter's
    discrete behavior — must match exactly."""
    from acinoset_tpu.parallel import mesh as mesh_lib

    root, _gts, _widths = dataset_root
    runs = [sweep.load_run(d) for d in sweep.discover_runs(root)]
    r8 = sweep.solve_batch_ekf(runs, 0.5, mesh=mesh_lib.make_mesh(8))
    r1 = sweep.solve_batch_ekf(runs, 0.5, mesh=mesh_lib.make_mesh(1))
    for a, b in zip(r8, r1):
        np.testing.assert_allclose(
            a["states"]["smoothed_x"], b["states"]["smoothed_x"],
            rtol=0, atol=0.1,
        )
        assert a["outliers"] == b["outliers"]
