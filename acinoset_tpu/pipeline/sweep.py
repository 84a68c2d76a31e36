"""Full-dataset sweep — the src/all_flick.sh workload as sharded batches.

The reference processed its 59 released runs strictly sequentially (one
`all_optimizations.py` invocation each, src/all_flick.sh:3-61), with an
IPOPT solve per run budgeted at up to an hour. Here every run becomes a
row of a padded batch: runs are grouped by compile signature
(fps, padded frame count), each group's trajectories are solved by ONE
jitted, mesh-sharded banded-GN program (`vmap` over runs, trajectories
sharded over the 'data' mesh axis, cameras over 'model'), and results
are scattered back to per-run pickles in the reference layout.

Per-run camera rigs differ, so camera parameters ride along as vmapped
`aux` inputs instead of being closed over.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import cheetah
from ..ops import camera as cam_ops
from ..parallel import mesh as mesh_lib
from ..solvers import trajopt
from . import app
from . import data as data_io
from .fte import default_config


@dataclass
class RunData:
    data_dir: str
    pixels: np.ndarray  # (C, N, L, 2)
    likelihood: np.ndarray  # (C, N, L)
    cams: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]  # k, d, r, t
    fps: float
    start_frame: int
    scene_fpath: str
    cam_res: Tuple[int, int] = (2704, 1520)  # per-run sensor resolution


def discover_runs(root_dir: str) -> List[str]:
    """Find run directories: any dir containing a dlc/ subdir with .h5
    files and a scene file somewhere above it."""
    out = []
    for dirpath, dirnames, _filenames in os.walk(root_dir):
        if os.path.basename(dirpath) == "dlc" and glob(os.path.join(dirpath, "*.h5")):
            out.append(os.path.dirname(dirpath))
    return sorted(out)


def load_run(
    data_dir: str,
    start_frame: int = 1,
    end_frame: int = -1,
    max_cams: Optional[int] = None,
    markers: Optional[Sequence[str]] = None,
) -> RunData:
    k_arr, d_arr, r_arr, t_arr, cam_res, n_cams, scene_fpath = data_io.find_scene_file(
        data_dir, verbose=False
    )
    try:
        _res, fps, tot, _ = app.get_vid_info(data_dir)
    except FileNotFoundError:
        fps, tot = 120.0, None
    fpaths = sorted(glob(os.path.join(data_dir, "dlc", "*.h5")))
    p2d = data_io.load_dlc_points(fpaths, markers=(markers or cheetah.get_markers()))
    start0 = start_frame - 1
    end = p2d.pixels.shape[1] if end_frame == -1 else end_frame
    win = p2d.window(start0, end)
    return RunData(
        data_dir=data_dir,
        pixels=win.pixels,
        likelihood=np.nan_to_num(win.likelihood, nan=-1.0),
        cams=(k_arr, d_arr.reshape(-1, 4), r_arr, np.asarray(t_arr).reshape(-1, 3)),
        fps=float(fps),
        start_frame=start0,
        scene_fpath=scene_fpath,
        cam_res=tuple(int(v) for v in cam_res),
    )


def _pad_run(run: RunData, N: int, C: int):
    """Pad a run to (C, N, L, 2) frames/cameras; padded entries weight 0."""
    c0, n0, L, _ = run.pixels.shape
    pix = np.zeros((C, N, L, 2))
    lik = np.full((C, N, L), -1.0)
    pix[:c0, :n0] = np.nan_to_num(run.pixels)
    lik[:c0, :n0] = run.likelihood
    k, d, r, t = run.cams
    K = np.tile(np.eye(3), (C, 1, 1))
    D = np.zeros((C, 4))
    R = np.tile(np.eye(3), (C, 1, 1))
    T = np.zeros((C, 3))
    T[:, 2] = 10.0  # benign pose for padded cameras
    K[:c0], D[:c0], R[:c0], T[:c0] = k, d, r, t
    return pix, lik, (K, D, R, T), n0


#: per-program batch cap — the measured throughput knee (docs/
#: scaling.jsonl: frames/s is FLAT from B=96 to 768, one batch-96
#: program saturates the chip) AND a hard safety wall (B>=384 at
#: N>=300 reproducibly 500s the remote TPU compiler). Groups larger
#: than this are solved as sequential chunks of exactly this size (the
#: final partial chunk is padded with repeated runs so every chunk
#: reuses ONE compiled program); since throughput is flat beyond the
#: knee, chunking costs nothing.
MAX_PROGRAM_BATCH = 96

#: HBM working-set budget for the EKF chunk cap below (bytes). The v5e
#: exposes 15.75G; 13G leaves headroom for the measurement buffers.
EKF_HBM_BUDGET = 13e9


def _ekf_mem_cap(N: int, n_pose: int) -> int:
    """Largest per-program batch the EKF+RTS stage fits in HBM.

    The filter/smoother history materializes ~9.5 full-state
    (N, 3n, 3n) f32 buffers per run (calibrated from the measured OOM:
    the 144-state human at B=96/N=300 demanded 22.65G = 236 MB/run,
    docs/r05/bench_generic_n300.txt — 9.5 x 300 x 432^2 x 4B; the
    known-good 75-state cheetah at B=96/N=600 fits at the same
    coefficient: 12.3G < 15.75G, docs/r05/probe_ekf_n600_fix.txt).
    Groups beyond the cap chunk through the existing _solve_chunked
    path; results are identical (chunked == unchunked tests)."""
    bytes_per_run = 9.5 * N * (3 * n_pose) ** 2 * 4
    return max(1, int(EKF_HBM_BUDGET / bytes_per_run))


def _solve_chunked(runs, max_batch, solve_chunk, X0_override=None):
    """Split an oversized group into <=max_batch chunks and solve each
    with ``solve_chunk(chunk_runs, chunk_X0) -> results``. The last
    partial chunk is padded by repeating its final run (results
    discarded) so all chunks share one compile signature."""
    results = []
    for i in range(0, len(runs), max_batch):
        chunk = list(runs[i : i + max_batch])
        Xc = (list(X0_override[i : i + max_batch])
              if X0_override is not None else None)
        n_real = len(chunk)
        if n_real < max_batch and i > 0:  # pad to the compiled signature
            chunk += [chunk[-1]] * (max_batch - n_real)
            if Xc is not None:
                Xc += [Xc[-1]] * (max_batch - n_real)
        results.extend(solve_chunk(chunk, Xc)[:n_real])
    return results


#: in-process cache of jitted batch solvers — repeated sweep calls with
#: the same config reuse the traced program (jit itself then caches per
#: input shape) instead of re-tracing a fresh closure every call
_SOLVER_CACHE: Dict = {}


def _cached_batch_solver(cfg, dtype, uncertainty=False, with_init=False,
                         dlc_thresh=0.0):
    """Fused cheetah FTE stage program (r5, same scheme as the generic
    twin _cached_batch_solver_generic): one packed (C, N, L, 3)
    pixels+likelihood upload + one (C, 25) camera block per run, the
    TRI+linreg cold init (nose line + psi_0, hold-last-valid through
    padding) computed in-jit when ``with_init``, the FK of the solution
    inside, and every output in ONE flat download — each host<->device
    crossing costs ~0.1-0.2 s fixed through the remote tunnel."""
    key = (cfg, str(dtype), uncertainty, with_init, float(dlc_thresh))
    if key not in _SOLVER_CACHE:
        h = _h_fn_aux(dtype)

        from .ekf import hj_parts_aux

        P_ = cheetah.N_ACTIVE
        L_ = len(cheetah.get_markers())
        nose = cheetah.get_markers().index("nose")
        pp = cheetah.get_pose_params()
        line_cols = jnp.asarray([pp["x_0"], pp["y_0"], pp["z_0"]])
        psi_col = pp["psi_0"]
        thresh = float(dlc_thresh)

        def solve_one(packed, X0, auxp, n):
            K = auxp[:, :9].reshape(-1, 3, 3)
            D = auxp[:, 9:13]
            R = auxp[:, 13:22].reshape(-1, 3, 3)
            T = auxp[:, 22:25]
            pix = packed[..., :2]  # (C, N, L, 2)
            lik = packed[..., 2]
            Nn = pix.shape[1]
            fidx = jnp.arange(Nn)
            live = fidx < n
            w = (lik > thresh).astype(dtype) / cfg.meas_std_px
            w = w * live[None, :, None].astype(dtype)
            meas = pix.transpose(1, 0, 2, 3)
            wT = w.transpose(1, 0, 2)
            if with_init:
                slope, intercept = _jit_track_linreg(
                    pix, lik, (K, D, R, T), nose, thresh, live)
                # hold the last valid frame through padding (the
                # host-side init pinned X0[n0:] = X0[n0-1])
                f_eff = jnp.minimum(fidx, n - 1).astype(dtype)
                X0 = jnp.zeros((Nn, P_), dtype)
                X0 = X0.at[:, line_cols].set(
                    f_eff[:, None] * slope[None] + intercept[None])
                X0 = X0.at[:, psi_col].set(jnp.arctan2(slope[1], slope[0]))
            X, info = trajopt.fte_solve(
                h, X0, meas, wT, cfg, aux=(K, D, R, T), n_valid=n,
                hj_parts_fn=hj_parts_aux, compute_cov=uncertainty,
            )
            pts = jax.vmap(cheetah.fk25)(X)  # (N, L, 3)
            # per-run solver status rides out of the jit alongside X
            # (the reference surfaced IPOPT's termination status)
            out = [X.reshape(-1), pts.reshape(-1),
                   jnp.stack([info["cost"], info["cost0"],
                              info["converged"].astype(dtype),
                              info["grad_norm"]])]
            if uncertainty:
                out += [info["marker_std"].reshape(-1),
                        info["cov_ridge_shrink"].reshape(1),
                        info.get("cov_ridge_frac", jnp.zeros(())).reshape(1)]
            return jnp.concatenate(out)

        if with_init:
            def batched(packed, auxp, nv):
                return jax.vmap(
                    lambda p, a, n: solve_one(p, None, a, n)
                )(packed, auxp, nv)
        else:
            def batched(packed, X0, auxp, nv):
                return jax.vmap(solve_one)(packed, X0, auxp, nv)

        _SOLVER_CACHE[key] = jax.jit(batched)
    return _SOLVER_CACHE[key]


_FK_BATCH = None


def _cached_fk_batch():
    global _FK_BATCH
    if _FK_BATCH is None:
        _FK_BATCH = jax.jit(jax.vmap(jax.vmap(cheetah.fk25)))
    return _FK_BATCH


def _h_fn_aux(dtype):
    def h(pose25, aux):
        K, D, R, T = aux
        D = D.reshape(K.shape[0], -1)[:, :4]  # same d-normalization as make_h_fn
        pts = cheetah.fk25(pose25)
        return jax.vmap(
            lambda k, d, r, t: cam_ops.project_points_fisheye(pts, k, d, r, t)
        )(K, D, R, T)

    return h


def solve_batch(
    runs: Sequence[RunData],
    dlc_thresh: float,
    num_iters: int = 60,
    mesh=None,
    dtype=jnp.float32,
    X0_override: Optional[Sequence[np.ndarray]] = None,
    relinearize_every: int = 1,
    plain_iters: Optional[int] = None,
    uncertainty: bool = False,
    max_batch: Optional[int] = MAX_PROGRAM_BATCH,
    pad_frames: Optional[int] = None,
    pad_cams: Optional[int] = None,
) -> List[Dict]:
    """Solve a group of runs (same fps) as one sharded batched program.

    Groups beyond ``max_batch`` runs (default MAX_PROGRAM_BATCH — the
    measured throughput knee and remote-compiler safety wall) solve as
    sequential chunks padded to a shared (frames, cams, batch)
    signature; results are identical to the unchunked solve
    (tests/test_sweep.py). ``pad_frames``/``pad_cams`` pin the padded
    shapes (used by the chunk recursion).

    ``uncertainty`` adds the Laplace-posterior pass inside the same
    jitted batch (trajopt.fte_solve compute_cov): each result dict gains
    ``marker_std`` (n_i, L, 3) — per-marker 1-sigma error bars.

    ``X0_override`` (optional, one (n_i, P) array per run — e.g. the
    batched EKF stage's smoothed poses) replaces the TRI+linreg
    cold-start initialization; rows beyond each run's length are held at
    the last valid frame. ``relinearize_every`` forwards to
    FteConfig (lagged/chord Gauss-Newton). ``plain_iters`` overrides the
    graduated-robustness schedule (warm starts are already near the
    optimum and gated for outliers, so they skip most of the plain
    phase).
    """
    from dataclasses import replace as dc_replace

    fps = runs[0].fps
    N = pad_frames or max(r.pixels.shape[1] for r in runs)
    C = pad_cams or max(r.pixels.shape[0] for r in runs)
    if max_batch and len(runs) > max_batch:
        return _solve_chunked(
            runs, max_batch,
            lambda chunk, Xc: solve_batch(
                chunk, dlc_thresh, num_iters=num_iters, mesh=mesh,
                dtype=dtype, X0_override=Xc,
                relinearize_every=relinearize_every,
                plain_iters=plain_iters, uncertainty=uncertainty,
                max_batch=None, pad_frames=N, pad_cams=C,
            ),
            X0_override=X0_override,
        )
    cfg = default_config(fps, num_iters=num_iters)
    if relinearize_every != 1:
        cfg = dc_replace(cfg, relinearize_every=relinearize_every)
    if plain_iters is not None:
        cfg = dc_replace(cfg, plain_iters=plain_iters)

    # ONE packed upload per group + ONE flat download (fused-stage
    # scheme, see _cached_batch_solver: crossings, not math, dominate
    # batch-stage wall time through the remote tunnel)
    packed_b, auxp_b, n_valid, X0_b = [], [], [], []
    for run in runs:
        pix, lik, cams, n0 = _pad_run(run, N, C)
        packed_b.append(np.concatenate([pix, lik[..., None]], axis=-1))
        K, D, R, T = cams
        auxp_b.append(np.concatenate([
            K.reshape(C, 9), D.reshape(C, 4), R.reshape(C, 9),
            np.asarray(T).reshape(C, 3),
        ], axis=1))
        n_valid.append(n0)
    if X0_override is not None:
        for i in range(len(runs)):
            Xw = np.asarray(X0_override[i], np.float64)
            X0 = np.zeros((N, Xw.shape[1]))
            X0[: len(Xw)] = Xw
            X0[len(Xw):] = Xw[-1]  # hold the last frame through padding
            X0_b.append(X0)

    mesh = mesh or mesh_lib.make_mesh(model_axis=False)

    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))
    solver = _cached_batch_solver(
        cfg, dtype, uncertainty, with_init=(X0_override is None),
        dlc_thresh=dlc_thresh,
    )

    # pad batch to the data-axis size
    n_dev = mesh.shape["data"]
    (packedp, auxpp), B0 = mesh_lib.pad_batch(
        [np.stack(packed_b), np.stack(auxp_b)], n_dev
    )
    (nvp,), _ = mesh_lib.pad_batch([np.asarray(n_valid, np.int32)], n_dev)
    dev_args = [
        jax.device_put(jnp.asarray(packedp, dtype), shard),
        jax.device_put(jnp.asarray(auxpp, dtype), shard),
        jax.device_put(jnp.asarray(nvp), shard),
    ]
    if X0_override is not None:
        (X0p,), _ = mesh_lib.pad_batch([np.stack(X0_b)], n_dev)
        dev_args.insert(1, jax.device_put(jnp.asarray(X0p, dtype), shard))
    flat = np.asarray(solver(*dev_args)[:B0])  # ONE download
    P_ = cheetah.N_ACTIVE
    L_ = len(cheetah.get_markers())
    sz_x, sz_p = N * P_, N * L_ * 3
    Xb = flat[:, :sz_x].reshape(B0, N, P_)
    positions_b = flat[:, sz_x:sz_x + sz_p].reshape(B0, N, L_, 3)
    stat = flat[:, sz_x + sz_p:sz_x + sz_p + 4]
    status = dict(cost=stat[:, 0], cost0=stat[:, 1],
                  converged=stat[:, 2] > 0.5, grad_norm=stat[:, 3])
    if uncertainty:
        o = sz_x + sz_p + 4
        status["marker_std"] = flat[:, o:o + sz_p].reshape(B0, N, L_, 3)
        status["cov_ridge_shrink"] = flat[:, o + sz_p]
        status["cov_ridge_frac"] = flat[:, o + sz_p + 1]

    results = []
    Ts = 1.0 / fps
    for i, run in enumerate(runs):
        n0 = n_valid[i]
        X = Xb[i, :n0].astype(np.float64)
        # backward-difference derivatives on host (cheap numpy)
        dx = np.diff(X, axis=0) / Ts
        dx = np.concatenate([dx[:1], dx], axis=0) if len(X) > 1 else np.zeros_like(X)
        ddx = np.diff(dx, axis=0) / Ts
        ddx = (
            np.concatenate([ddx[1:2], ddx[1:2], ddx[1:]], axis=0)
            if len(X) > 2 else np.zeros_like(X)
        )
        results.append(
            dict(
                data_dir=run.data_dir,
                positions=positions_b[i, :n0].astype(np.float64),
                x=X,
                dx=dx,
                ddx=ddx,
                start_frame=run.start_frame,
                scene_fpath=run.scene_fpath,
                cost=float(status["cost"][i]),
                cost0=float(status["cost0"][i]),
                converged=bool(status["converged"][i]),
                grad_norm=float(status["grad_norm"][i]),
                **({"marker_std": status["marker_std"][i, :n0].astype(np.float64),
                    "cov_ridge_shrink": float(status["cov_ridge_shrink"][i]),
                    "cov_ridge_frac": float(status["cov_ridge_frac"][i])}
                   if uncertainty else {}),
            )
        )
    return results


def ekf_warm_starts(ekf_results: Sequence[Dict]) -> List[np.ndarray]:
    """Extract per-run FTE initializations from a solve_batch_ekf result:
    the RTS-smoothed pose block, one (n_i, P) array per run — the
    reference pipeline's own stage order tri→sba→ekf→fte
    (src/all_optimizations.py:950-983) makes this init free."""
    return [np.asarray(r["states"]["smoothed_x"], np.float64) for r in ekf_results]


def make_h_fn_aux_generic(fk):
    """Aux-parameterized measurement fn for an arbitrary skeleton FK:
    ``aux = (K, D, R, T)`` rides along as traced per-run camera
    parameters (the generic twin of the module-level cheetah
    ``_h_fn_aux``)."""

    def h(pose, aux):
        K, D, R, T = aux
        D = D.reshape(K.shape[0], -1)[:, :4]
        pts = fk(pose)
        return jax.vmap(
            lambda k, d, r, t: cam_ops.project_points_fisheye(pts, k, d, r, t)
        )(K, D, R, T)

    return h


def make_hj_parts_aux_generic(fk_and_jac):
    """Aux-parameterized unassembled chain-rule Jacobian for an arbitrary
    skeleton (see pipeline.ekf.hj_parts_aux): FK Jacobian (analytic or
    jacfwd-over-FK-only, models.skeleton.fk_and_jac_any) + fused
    analytic projection Jacobian."""

    def hj(pose, aux):
        K, D, R, T = aux
        D = D.reshape(K.shape[0], -1)[:, :4]
        pts, Jfk = fk_and_jac(pose)
        h, Jp = cam_ops.project_rig_and_jac(pts, K, D, R, T)
        return h.reshape(-1), Jp, Jfk

    return hj


def _rescue_unconverged(results, label, num_iters, resolve):
    """Shared rescue policy (cheetah sweep + generic batch): runs whose
    stationarity flag came back unconverged re-solve as their own batch,
    warm-started from their current solutions (the caller's ``resolve``
    continues the graduated solve with robust weights on from iteration
    0). Two-stage budget since r5: a 1x continuation first — measured
    at N=300/B=96 generic, the cold solutions already sit within 0.1%
    of the optimum cost and the 1x continuation proves ALL 96
    stationary (docs/r05/probe_generic_rescue_budget.txt), so the 3x
    top-up only runs for genuine holdouts. Only the failures pay; a
    rescued run can honestly remain unconverged."""
    for mult in (1, 3):
        bad = [i for i, r in enumerate(results) if not r["converged"]]
        if not bad:
            return results
        print(f"rescue: {len(bad)} unconverged {label}runs re-solved at "
              f"{mult * num_iters} iterations")
        # pad the rescue batch to the next power of two (results of the
        # repeated rows discarded): every distinct batch size is a fresh
        # XLA compile — minutes each through the remote tunnel — so
        # bucket the signatures instead of compiling one per failure
        # count
        n_pad = 1 << (len(bad) - 1).bit_length()
        bad_p = bad + [bad[-1]] * (n_pad - len(bad))
        rr = resolve(bad_p, [results[i]["x"] for i in bad_p],
                     mult * num_iters)
        for i, res in zip(bad, rr[: len(bad)]):
            results[i] = res
    return results


#: generic-skeleton solver cache; entries hold a strong reference to the
#: SkeletonModel so the id() key can never be silently reused
_GENERIC_SOLVER_CACHE: Dict = {}


def _jit_track_linreg(pix, lik, cams, marker, thresh, live):
    """In-jit twin of the nose_track_linreg init: triangulate ONE
    marker's track and fit the straight line by weighted normal
    equations over finite live frames (same <2-point fallback to the
    track mean). Returns (slope (3,), intercept (3,)) in frame units.

    Runs inside the fused stage programs so the init costs zero extra
    host<->device crossings (the standalone path paid a full (B, N, L,
    3) triangulation download to use one marker of it)."""
    K, D, R, T = cams
    dtype = pix.dtype
    Nn = pix.shape[1]
    valid = (lik[:, :, marker:marker + 1] > thresh) & live[None, :, None]
    track = cam_ops.triangulate_pairwise_mean(
        pix[:, :, marker:marker + 1], valid, K, D, R, T
    )[0][:, 0]  # (N, 3)
    ok = jnp.all(jnp.isfinite(track), axis=1) & live
    okf = ok.astype(dtype)
    tr0 = jnp.where(ok[:, None], track, 0.0)
    nok = jnp.sum(okf)
    f = jnp.arange(Nn, dtype=dtype)
    Sx = jnp.sum(okf * f)
    Sxx = jnp.sum(okf * f * f)
    Sy = jnp.sum(okf[:, None] * tr0, axis=0)
    Sxy = jnp.sum((okf * f)[:, None] * tr0, axis=0)
    det = nok * Sxx - Sx * Sx
    fit = (nok >= 2.0) & (jnp.abs(det) > 1e-12)
    slope = jnp.where(
        fit,
        (nok * Sxy - Sx * Sy) / jnp.where(jnp.abs(det) > 1e-12, det, 1.0),
        0.0)
    intercept = jnp.where(
        fit, (Sy - slope * Sx) / jnp.maximum(nok, 1.0),
        Sy / jnp.maximum(nok, 1.0))
    return slope, intercept


def _cached_batch_solver_generic(model, cfg, dtype, uncertainty=False,
                                 with_init=None, dlc_thresh=0.4,
                                 excl_idx=()):
    """Fused generic stage program (r5): measurement weights, the init-
    marker triangulation + linreg straight-line init (build.py:151-165),
    the FTE solve, and the FK of the solution ALL run inside ONE jitted
    program, inputs packed into one (C, N, L, 3) pixels+likelihood
    buffer per run and outputs into one flat vector per run.

    Motivation (measured): through the remote-TPU tunnel every
    host<->device crossing costs ~0.1-0.2 s fixed (35 ms dispatch +
    per-transfer setup, docs/r05 tunnel microbench), and the B=96
    generic stage spent ~2.8 s/call on ~15 crossings while the solver
    iteration count measured IN THE NOISE (iters 10 vs 30: 3.20 vs
    2.79 s, docs/r05/probe_generic_iter_cost.txt). Batching crossings,
    not math, is the lever; on PCIe-attached chips this is merely tidy.

    ``with_init``: init-marker index for the in-jit tri+linreg init, or
    None when the caller uploads X0 (rescue / EKF warm start). The
    in-jit linreg is the weighted-normal-equations form of
    nose_track_linreg (same <2-point fallback to the track mean).
    """
    key = (id(model), cfg, str(dtype), uncertainty, with_init,
           float(dlc_thresh), tuple(excl_idx))
    entry = _GENERIC_SOLVER_CACHE.get(key)
    if entry is None:
        from ..models.skeleton import fk_and_jac_any

        h = make_h_fn_aux_generic(model.fk)
        hj = make_hj_parts_aux_generic(fk_and_jac_any(model))
        P_ = model.n_pose
        thresh = float(dlc_thresh)

        def solve_one(packed, X0, auxp, n):
            K = auxp[:, :9].reshape(-1, 3, 3)
            D = auxp[:, 9:13]
            R = auxp[:, 13:22].reshape(-1, 3, 3)
            T = auxp[:, 22:25]
            pix = packed[..., :2]  # (C, N, L, 2)
            lik = packed[..., 2]  # (C, N, L)
            Nn = pix.shape[1]
            fidx = jnp.arange(Nn)
            live = fidx < n
            w = (lik > thresh).astype(dtype) / cfg.meas_std_px
            for mx in excl_idx:
                w = w.at[:, :, mx].set(0.0)
            w = w * live[None, :, None].astype(dtype)
            meas = pix.transpose(1, 0, 2, 3)  # (N, C, L, 2)
            wT = w.transpose(1, 0, 2)
            if with_init is not None:
                slope, intercept = _jit_track_linreg(
                    pix, lik, (K, D, R, T), with_init, thresh, live)
                f = fidx.astype(dtype)
                X0 = jnp.zeros((Nn, P_), dtype)
                X0 = X0.at[:, 0:3].set(
                    f[:, None] * slope[None] + intercept[None])
            X, info = trajopt.fte_solve(
                h, X0, meas, wT, cfg, aux=(K, D, R, T), n_valid=n,
                hj_parts_fn=hj, compute_cov=uncertainty,
            )
            pts = jax.vmap(model.fk)(X)  # (N, L, 3)
            out = [X.reshape(-1), pts.reshape(-1),
                   jnp.stack([info["cost"], info["cost0"],
                              info["converged"].astype(dtype),
                              info["grad_norm"]])]
            if uncertainty:
                out += [info["marker_std"].reshape(-1),
                        info["cov_ridge_shrink"].reshape(1),
                        info.get("cov_ridge_frac", jnp.zeros(())).reshape(1)]
            return jnp.concatenate(out)

        if with_init is not None:
            def batched(packed, auxp, nv):
                # X0 arg unused on this trace: solve_one builds the
                # in-jit init before any use
                return jax.vmap(
                    lambda p, a, n: solve_one(p, None, a, n)
                )(packed, auxp, nv)
        else:
            def batched(packed, X0, auxp, nv):
                return jax.vmap(solve_one)(packed, X0, auxp, nv)

        entry = (model, jax.jit(batched))
        _GENERIC_SOLVER_CACHE[key] = entry
    return entry[1]


def solve_batch_generic(
    model,
    runs: Sequence[RunData],
    dlc_thresh: float = 0.4,
    num_iters: int = 60,
    mesh=None,
    dtype=jnp.float32,
    init_marker: str = "forehead",
    huber_delta: float = 3.0,
    exclude_markers: Sequence[str] = ("neck",),
    X0_override: Optional[Sequence[np.ndarray]] = None,
    uncertainty: bool = False,
    rescue: bool = True,
    plain_iters: Optional[int] = None,
    warm_start="auto",
    relinearize_every: int = 1,
    max_batch: Optional[int] = MAX_PROGRAM_BATCH,
    pad_frames: Optional[int] = None,
    pad_cams: Optional[int] = None,
    _cfg_override: Optional[Dict] = None,
) -> List[Dict]:
    """Batched generic-skeleton FTE — the src/build.py path at sweep
    scale: N runs of any subject (humans, new animals) solve as ONE
    jitted, mesh-sharded program, per-run rigs riding along as vmapped
    aux, on the unassembled measurement path for every skeleton
    (analytic FK Jacobian for tree graphs, jacfwd over FK alone
    otherwise — models.skeleton.fk_and_jac_any). ``runs[i].pixels``
    must be in the model's marker order. ``rescue`` mirrors the cheetah
    sweep: runs whose stationarity flag comes back unconverged re-solve
    once as their own batch at 3x the budget from their current
    solution (robust weights on from iteration 0). ``warm_start``
    mirrors it too: the batched generic EKF's smoothed poses replace
    the TRI+linreg cold init when forced with True ("auto" = cold — the
    EKF init measurably lands the GN in a worse basin — see the
    warm-start policy note above sweep()).
    """
    from ..models.skeleton import SkeletonModel  # noqa: F401 (doc type)
    from .generic import generic_config

    fps = runs[0].fps
    N = pad_frames or max(r.pixels.shape[1] for r in runs)
    C = pad_cams or max(r.pixels.shape[0] for r in runs)
    if max_batch and len(runs) > max_batch:
        # chunk BEFORE the warm-start EKF so that stage's program is
        # bounded at the knee too (see MAX_PROGRAM_BATCH)
        return _solve_chunked(
            runs, max_batch,
            lambda chunk, Xc: solve_batch_generic(
                model, chunk, dlc_thresh, num_iters=num_iters, mesh=mesh,
                dtype=dtype, init_marker=init_marker,
                huber_delta=huber_delta, exclude_markers=exclude_markers,
                X0_override=Xc, uncertainty=uncertainty, rescue=rescue,
                plain_iters=plain_iters, warm_start=warm_start,
                relinearize_every=relinearize_every,
                max_batch=None, pad_frames=N, pad_cams=C,
                _cfg_override=_cfg_override,
            ),
            X0_override=X0_override,
        )
    cfg = generic_config(model, fps, num_iters=num_iters, huber_delta=huber_delta)
    if _cfg_override:
        # probe/engineering knob: raw FteConfig field overrides
        from dataclasses import replace as _replace0

        cfg = _replace0(cfg, **_cfg_override)
    warm = resolve_warm_start(warm_start)
    if X0_override is None and warm:
        ekf_results = solve_batch_ekf_generic(
            model, runs, dlc_thresh, dtype=dtype, init_marker=init_marker,
            pad_frames=N, pad_cams=C,
        )
        X0_override = ekf_warm_starts(ekf_results)
        if plain_iters is None:
            # the EKF init is already near the optimum and 3σ-gated
            plain_iters = 4
    if plain_iters is not None or relinearize_every != 1:
        from dataclasses import replace as _replace

        if plain_iters is not None:
            cfg = _replace(cfg, plain_iters=plain_iters)
        if relinearize_every != 1:
            cfg = _replace(cfg, relinearize_every=relinearize_every)

    # ONE packed upload per group — pixels+likelihood ride together as
    # (B, C, N, L, 3) and the cameras as (B, C, 25); the init, weights,
    # solve, and FK all happen inside the fused program (see
    # _cached_batch_solver_generic: crossings, not math, were the cost)
    packed_b, auxp_b, n_valid, X0_b = [], [], [], []
    for run in runs:
        pix, lik, cams, n0 = _pad_run(run, N, C)
        packed_b.append(np.concatenate([pix, lik[..., None]], axis=-1))
        K, D, R, T = cams
        auxp_b.append(np.concatenate([
            K.reshape(C, 9), D.reshape(C, 4), R.reshape(C, 9),
            np.asarray(T).reshape(C, 3),
        ], axis=1))
        n_valid.append(n0)
    if X0_override is not None:
        for i in range(len(runs)):
            Xw = np.asarray(X0_override[i], np.float64)
            X0 = np.zeros((N, model.n_pose))
            X0[: len(Xw)] = Xw
            X0[len(Xw):] = Xw[-1]
            X0_b.append(X0)

    mi = model.markers.index(init_marker)
    excl_idx = tuple(sorted(
        model.markers.index(m) for m in (exclude_markers or ())
        if m in model.markers
    ))
    mesh = mesh or mesh_lib.make_mesh(model_axis=False)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))
    solver = _cached_batch_solver_generic(
        model, cfg, dtype, uncertainty,
        with_init=(None if X0_override is not None else mi),
        dlc_thresh=dlc_thresh, excl_idx=excl_idx,
    )
    n_dev = mesh.shape["data"]
    (packedp, auxpp), B0 = mesh_lib.pad_batch(
        [np.stack(packed_b), np.stack(auxp_b)], n_dev
    )
    (nvp,), _ = mesh_lib.pad_batch([np.asarray(n_valid, np.int32)], n_dev)
    dev_args = [
        jax.device_put(jnp.asarray(packedp, dtype), shard),
        jax.device_put(jnp.asarray(auxpp, dtype), shard),
        jax.device_put(jnp.asarray(nvp), shard),
    ]
    if X0_override is not None:
        (X0p,), _ = mesh_lib.pad_batch([np.stack(X0_b)], n_dev)
        dev_args.insert(1, jax.device_put(jnp.asarray(X0p, dtype), shard))
    flat = np.asarray(solver(*dev_args)[:B0])  # ONE download
    P_, L_ = model.n_pose, model.n_markers
    sz_x, sz_p = N * P_, N * L_ * 3
    Xb = flat[:, :sz_x].reshape(B0, N, P_)
    positions_b = flat[:, sz_x:sz_x + sz_p].reshape(B0, N, L_, 3)
    stat = flat[:, sz_x + sz_p:sz_x + sz_p + 4]
    status = dict(cost=stat[:, 0], cost0=stat[:, 1],
                  converged=stat[:, 2] > 0.5, grad_norm=stat[:, 3])
    if uncertainty:
        o = sz_x + sz_p + 4
        status["marker_std"] = flat[:, o:o + sz_p].reshape(B0, N, L_, 3)
        status["cov_ridge_shrink"] = flat[:, o + sz_p]
        status["cov_ridge_frac"] = flat[:, o + sz_p + 1]

    results = []
    Ts = 1.0 / fps
    for i, run in enumerate(runs):
        n0 = n_valid[i]
        X = Xb[i, :n0].astype(np.float64)
        # backward-difference derivatives on host (cheap numpy — eager
        # per-run jnp calls would pay remote-dispatch per op)
        dx = np.diff(X, axis=0) / Ts
        dx = np.concatenate([dx[:1], dx], axis=0) if len(X) > 1 else np.zeros_like(X)
        ddx = np.diff(dx, axis=0) / Ts
        ddx = (
            np.concatenate([ddx[1:2], ddx[1:2], ddx[1:]], axis=0)
            if len(X) > 2 else np.zeros_like(X)
        )
        results.append(
            dict(
                data_dir=run.data_dir,
                positions=positions_b[i, :n0].astype(np.float64),
                x=X, dx=dx, ddx=ddx,
                markers=list(model.markers),
                start_frame=run.start_frame,
                scene_fpath=run.scene_fpath,
                cost=float(status["cost"][i]),
                cost0=float(status["cost0"][i]),
                converged=bool(status["converged"][i]),
                grad_norm=float(status["grad_norm"][i]),
                **({"marker_std": status["marker_std"][i, :n0].astype(np.float64),
                    "cov_ridge_shrink": float(status["cov_ridge_shrink"][i]),
                    "cov_ridge_frac": float(status["cov_ridge_frac"][i])}
                   if uncertainty else {}),
            )
        )

    if rescue:
        results = _rescue_unconverged(
            results, "generic ", num_iters,
            lambda bad, X0s, budget: solve_batch_generic(
                model, [runs[i] for i in bad], dlc_thresh,
                num_iters=budget, mesh=mesh, dtype=dtype,
                init_marker=init_marker, huber_delta=huber_delta,
                exclude_markers=exclude_markers, X0_override=X0s,
                uncertainty=uncertainty, rescue=False,
                plain_iters=0,  # continuing a graduated solve
                relinearize_every=relinearize_every,
            ),
        )
    return results


_EKF_SOLVER_CACHE: Dict = {}


def _cached_batch_ekf_solver(cfg, N, C, dtype_str, p0_bytes):
    """Fused cheetah EKF stage program, cached by (config, padded
    shapes) so repeated sweep() calls in one process re-trace nothing.
    Same fused-stage scheme as _cached_batch_solver: one packed
    pixels+likelihood upload, the TRI+linreg x0 (first-frame pose +
    straight-line velocity) in-jit, EKF+RTS + marker_std + FK inside,
    ONE flat download."""
    key = (cfg, N, C, dtype_str, p0_bytes)
    if key not in _EKF_SOLVER_CACHE:
        from dataclasses import replace as dc_replace

        from ..solvers import ekf as ekf_solver
        from .ekf import hj_parts_aux, make_marker_std_fn

        dtype = jnp.float32 if "32" in dtype_str else jnp.float64
        n_pose = cheetah.N_ACTIVE
        n_states = 3 * n_pose
        assert len(p0_bytes) == n_states * n_states * 8, len(p0_bytes)
        P0 = np.frombuffer(p0_bytes, dtype=np.float64).reshape(n_states, n_states)
        h_aux = _h_fn_aux(dtype)
        mstd = make_marker_std_fn(cheetah.fk25_and_jac, cheetah.N_ACTIVE)
        nose = cheetah.get_markers().index("nose")
        pp = cheetah.get_pose_params()
        line_cols = jnp.asarray([pp["x_0"], pp["y_0"], pp["z_0"]])
        psi_col = pp["psi_0"]
        thresh = float(cfg.dlc_thresh)
        fps = 1.0 / float(cfg.dt)

        def one(packed, auxp, n, mpe_i):
            K = auxp[:, :9].reshape(-1, 3, 3)
            D = auxp[:, 9:13]
            R = auxp[:, 13:22].reshape(-1, 3, 3)
            T = auxp[:, 22:25]
            auxi = (K, D, R, T)
            pix_cn = packed[..., :2]  # (C, N, L, 2)
            lik_cn = packed[..., 2]
            Nn = pix_cn.shape[1]
            live = jnp.arange(Nn) < n
            slope, intercept = _jit_track_linreg(
                pix_cn, lik_cn, auxi, nose, thresh, live)
            x0 = jnp.zeros(n_states, dtype)
            x0 = x0.at[line_cols].set(intercept)
            x0 = x0.at[psi_col].set(jnp.arctan2(slope[1], slope[0]))
            x0 = x0.at[n_pose + line_cols].set(slope * fps)

            def hj(p):
                hh, Jp, Jfk = hj_parts_aux(p, auxi)
                J = jnp.einsum("clij,ljk->clik", Jp, Jfk)
                return hh, J.reshape(hh.shape[0], -1)

            out = ekf_solver.run_ekf(
                lambda p: h_aux(p, auxi),
                pix_cn.transpose(1, 0, 2, 3), lik_cn.transpose(1, 0, 2),
                x0, jnp.asarray(P0, dtype), cheetah.EKF_QB,
                dc_replace(cfg, max_pixel_err=mpe_i),
                hj_fn=hj,
            )
            # EKF-stage error bars inside the same jitted program (the
            # single-run stage's always-on contract; a separate program
            # would round-trip smoothed_P and re-compile per call)
            marker_std = jax.vmap(mstd)(out["smoothed_x"], out["smoothed_P"])
            pts = jax.vmap(cheetah.fk25)(out["smoothed_x"])
            state_keys = ("x", "dx", "ddx",
                          "smoothed_x", "smoothed_dx", "smoothed_ddx")
            flat = [out[k].reshape(-1) for k in state_keys]
            flat += [marker_std.reshape(-1), pts.reshape(-1),
                     out["outliers"].astype(dtype).reshape(1)]
            return jnp.concatenate(flat)

        _EKF_SOLVER_CACHE[key] = jax.jit(jax.vmap(one))
    return _EKF_SOLVER_CACHE[key]


def solve_batch_ekf(
    runs: Sequence[RunData],
    dlc_thresh: float,
    dtype=jnp.float32,
    mesh=None,
    max_batch: Optional[int] = MAX_PROGRAM_BATCH,
    pad_frames: Optional[int] = None,
    pad_cams: Optional[int] = None,
) -> List[Dict]:
    """Batched EKF+RTS across runs (same padding scheme as the FTE batch;
    per-run rigs ride along as vmapped camera params; runs sharded over
    the mesh's 'data' axis like the FTE batch). Groups beyond
    ``max_batch`` chunk at the knee like solve_batch."""
    from ..solvers import ekf as ekf_solver

    fps = runs[0].fps
    N = pad_frames or max(r.pixels.shape[1] for r in runs)
    C = pad_cams or max(r.pixels.shape[0] for r in runs)
    # the HBM cap applies even at max_batch=None — it is a hard memory
    # wall, not the throughput knee (see _ekf_mem_cap)
    cap = _ekf_mem_cap(N, cheetah.N_ACTIVE)
    eff_max = min(max_batch, cap) if max_batch else cap
    if len(runs) > eff_max:
        return _solve_chunked(
            runs, eff_max,
            lambda chunk, _Xc: solve_batch_ekf(
                chunk, dlc_thresh, dtype=dtype, mesh=mesh,
                max_batch=None, pad_frames=N, pad_cams=C,
            ),
        )
    n_pose = cheetah.N_ACTIVE

    # untrusted-measurement sigma = each run's own camera width
    # (src/all_optimizations.py:610) — rides along as a vmapped operand
    # so mixed-resolution runs batch correctly
    cfg = ekf_solver.EkfConfig(
        dt=1.0 / fps, dlc_thresh=dlc_thresh, meas_std_px=cheetah.MEAS_STD_PX,
    )
    mpe = np.asarray([float(r.cam_res[0]) for r in runs])
    # shared initial covariance (pipeline/ekf constants)
    p_ang = np.ones(n_pose - 3)
    P0 = np.diag(np.concatenate([
        np.ones(3) * 9.0, p_ang * (np.pi / 4) ** 2,
        np.ones(3) * 25.0, p_ang * 9.0,
        np.ones(3) * 9.0, np.concatenate([p_ang[:10] * 9.0, p_ang[10:] * 25.0]),
    ]))

    # ONE packed upload per group + ONE flat download (fused-stage
    # scheme, see _cached_batch_ekf_solver; the x0 init now runs in-jit
    # so the batched triangulation program + its download are gone too)
    packed_b, auxp_b, n_valid = [], [], []
    for run in runs:
        pix, lik, cams, n0 = _pad_run(run, N, C)
        packed_b.append(np.concatenate([pix, lik[..., None]], axis=-1))
        K, D, R, T = cams
        auxp_b.append(np.concatenate([
            K.reshape(C, 9), D.reshape(C, 4), R.reshape(C, 9),
            np.asarray(T).reshape(C, 3),
        ], axis=1))
        n_valid.append(n0)

    mesh = mesh or mesh_lib.make_mesh(model_axis=False)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))
    n_dev = mesh.shape["data"]
    (packedp, auxpp, mpep), B0 = mesh_lib.pad_batch(
        [np.stack(packed_b), np.stack(auxp_b), mpe], n_dev
    )
    (nvp,), _ = mesh_lib.pad_batch([np.asarray(n_valid, np.int32)], n_dev)
    flat = np.asarray(_cached_batch_ekf_solver(
        cfg, N, C, str(dtype), P0.tobytes()
    )(
        jax.device_put(jnp.asarray(packedp, dtype), shard),
        jax.device_put(jnp.asarray(auxpp, dtype), shard),
        jax.device_put(jnp.asarray(nvp), shard),
        jax.device_put(jnp.asarray(mpep, dtype), shard),
    )[:B0])
    L_ = len(cheetah.get_markers())
    sz_s, sz_m = N * n_pose, N * L_ * 3
    state_keys = ("x", "dx", "ddx", "smoothed_x", "smoothed_dx",
                  "smoothed_ddx")
    host = {k2: flat[:, j * sz_s:(j + 1) * sz_s].reshape(B0, N, n_pose)
            for j, k2 in enumerate(state_keys)}
    o = 6 * sz_s
    host["marker_std"] = flat[:, o:o + sz_m].reshape(B0, N, L_, 3)
    pos_all = flat[:, o + sz_m:o + 2 * sz_m].reshape(B0, N, L_, 3)
    outliers = flat[:, o + 2 * sz_m]
    results = []
    for i, run in enumerate(runs):
        n0 = n_valid[i]
        states = {k2: v[i][:n0] for k2, v in host.items()}
        results.append(dict(data_dir=run.data_dir,
                            positions=pos_all[i, :n0].astype(np.float64),
                            states=states,
                            start_frame=run.start_frame, scene_fpath=run.scene_fpath,
                            max_pixel_err=float(mpe[i]),
                            # per-run filter status (gated-pair count —
                            # the EKF's failure-detection signal, parity
                            # with the FTE stage's converged/grad_norm)
                            outliers=int(outliers[i])))
    return results


_GENERIC_EKF_CACHE: Dict = {}


def _cached_batch_ekf_solver_generic(model, cfg, N, C, dtype_str,
                                     qb_bytes, p0_bytes,
                                     smoother: str = "auto",
                                     marker_idx: int = 0):
    """Generic-skeleton twin of _cached_batch_ekf_solver: one fused
    jitted vmapped stage program per (model, config, padded shapes).
    ``smoother`` passes through to run_ekf — once the stage was fused
    (transfer overhead out of the way) the associative form measured
    1.48x faster than sequential at the human's 144-state size
    (0.90 vs 1.32 s at B=96/N=100, docs/r05/probe_generic_ekf_fused.
    txt; the pre-fuse 'tie' was transfer-masked), so the cheetah-tuned
    'auto' knee (associative <= 256 frames) stands for generic models."""
    key = (id(model), cfg, N, C, dtype_str, qb_bytes, p0_bytes, smoother,
           marker_idx)
    entry = _GENERIC_EKF_CACHE.get(key)
    if entry is None:
        from dataclasses import replace as dc_replace

        from ..models.skeleton import fk_and_jac_any
        from ..solvers import ekf as ekf_solver

        mi = int(marker_idx)
        dtype = jnp.float32 if "32" in dtype_str else jnp.float64
        n_pose = model.n_pose
        qb = np.frombuffer(qb_bytes, dtype=np.float64)
        P0 = np.frombuffer(p0_bytes, dtype=np.float64).reshape(
            3 * n_pose, 3 * n_pose
        )
        from .ekf import make_marker_std_fn

        fkj = fk_and_jac_any(model)
        h_aux = make_h_fn_aux_generic(model.fk)
        hj_aux = make_hj_parts_aux_generic(fkj)
        mstd = make_marker_std_fn(fkj, n_pose)
        thresh = float(cfg.dlc_thresh)
        fps = 1.0 / float(cfg.dt)

        def one(packed, auxp, n, mpe_i):
            # fused stage (see _cached_batch_solver_generic): unpack the
            # single pixels+likelihood buffer + camera block, build the
            # track-linreg x0 in-jit, run EKF+RTS, FK the smoothed
            # poses, and pack every output into one flat vector
            K = auxp[:, :9].reshape(-1, 3, 3)
            D = auxp[:, 9:13]
            R = auxp[:, 13:22].reshape(-1, 3, 3)
            T = auxp[:, 22:25]
            auxi = (K, D, R, T)
            pix_cn = packed[..., :2]  # (C, N, L, 2)
            lik_cn = packed[..., 2]
            Nn = pix_cn.shape[1]
            live = jnp.arange(Nn) < n
            slope, intercept = _jit_track_linreg(
                pix_cn, lik_cn, auxi, mi, thresh, live)
            x0 = jnp.zeros(3 * n_pose, dtype)
            x0 = x0.at[0:3].set(intercept)
            x0 = x0.at[n_pose:n_pose + 3].set(slope * fps)

            def hj(p):
                hh, Jp, Jfk = hj_aux(p, auxi)
                J = jnp.einsum("clij,ljk->clik", Jp, Jfk)
                return hh, J.reshape(hh.shape[0], -1)

            out = ekf_solver.run_ekf(
                lambda p: h_aux(p, auxi),
                pix_cn.transpose(1, 0, 2, 3), lik_cn.transpose(1, 0, 2),
                x0, jnp.asarray(P0, dtype), qb,
                dc_replace(cfg, max_pixel_err=mpe_i),
                hj_fn=hj, smoother=smoother,
            )
            pts = jax.vmap(model.fk)(out["smoothed_x"])  # (N, L, 3)
            marker_std = jax.vmap(mstd)(out["smoothed_x"], out["smoothed_P"])
            state_keys = ("x", "dx", "ddx",
                          "smoothed_x", "smoothed_dx", "smoothed_ddx")
            flat = [out[k].reshape(-1) for k in state_keys]
            flat += [marker_std.reshape(-1), pts.reshape(-1),
                     out["outliers"].astype(dtype).reshape(1)]
            return jnp.concatenate(flat)

        entry = (model, jax.jit(jax.vmap(one)))
        _GENERIC_EKF_CACHE[key] = entry
    return entry[1]


def solve_batch_ekf_generic(
    model,
    runs: Sequence[RunData],
    dlc_thresh: float,
    dtype=jnp.float32,
    init_marker: str = "forehead",
    meas_std_px: float = 8.0,
    pos_process_std: float = 5.0,
    ang_process_std: float = 5.0,
    ang_prior_std: float = np.pi / 8,
    mesh=None,
    max_batch: Optional[int] = MAX_PROGRAM_BATCH,
    pad_frames: Optional[int] = None,
    pad_cams: Optional[int] = None,
    smoother: str = "auto",
) -> List[Dict]:
    """Batched EKF+RTS for arbitrary skeletons — capability beyond the
    reference (src/build.py has no EKF stage; src/all_optimizations.py
    runs it only for the hard-coded cheetah). Same padding/aux scheme as
    solve_batch_ekf; process-noise stds are blanket per-kind defaults
    (root-translation jerk ``pos_process_std`` m/s^3, angle jerk
    ``ang_process_std`` rad/s^3) since generic skeletons carry no tuned
    qb table.

    Defaults were MEASURED on the shipped human fixture (2 cams, 15
    markers, 48-DoF; scripts/debug_generic_ekf.py, docs/r05): the
    cheetah-scale trio (meas 3 px, angle jerk 25 rad/s^3, angle prior
    pi/4) never locks on — 49% of pairs gated by frame 5, angles random-
    walk past 5 rad and the f32 filter diverges outright (pos spread
    ~1e12 on-device). The soft-measurement set (8 px, 5 rad/s^3, pi/8)
    tracks the whole window at 69/3000 gated pairs with a stable pose.
    Under-weighting well-conditioned rigs is the cheap direction —
    tighten ``meas_std_px`` only with >2 cameras or a tuned skeleton."""
    from ..solvers import ekf as ekf_solver

    fps = runs[0].fps
    N = pad_frames or max(r.pixels.shape[1] for r in runs)
    C = pad_cams or max(r.pixels.shape[0] for r in runs)
    # the HBM cap applies even at max_batch=None — it is a hard memory
    # wall, not the throughput knee; large-state skeletons hit it well
    # below the knee (human 144-state at N=300: cap ~55 vs the measured
    # 22.65G OOM at B=96 — see _ekf_mem_cap)
    cap = _ekf_mem_cap(N, model.n_pose)
    eff_max = min(max_batch, cap) if max_batch else cap
    if len(runs) > eff_max:
        return _solve_chunked(
            runs, eff_max,
            lambda chunk, _Xc: solve_batch_ekf_generic(
                model, chunk, dlc_thresh, dtype=dtype,
                init_marker=init_marker, meas_std_px=meas_std_px,
                pos_process_std=pos_process_std,
                ang_process_std=ang_process_std,
                ang_prior_std=ang_prior_std, mesh=mesh,
                max_batch=None, pad_frames=N, pad_cams=C,
                smoother=smoother,
            ),
        )
    n_pose = model.n_pose

    cfg = ekf_solver.EkfConfig(
        dt=1.0 / fps, dlc_thresh=dlc_thresh, meas_std_px=meas_std_px,
    )
    mpe = np.asarray([float(r.cam_res[0]) for r in runs])
    qb = np.concatenate([
        np.full(3, pos_process_std), np.full(n_pose - 3, ang_process_std),
    ])
    p_ang = np.ones(n_pose - 3)
    P0 = np.diag(np.concatenate([
        np.ones(3) * 9.0, p_ang * ang_prior_std**2,  # pose
        np.ones(3) * 25.0, p_ang * 9.0,              # velocity
        np.ones(3) * 9.0, p_ang * 25.0,              # acceleration
    ]))

    # ONE packed upload per group + ONE flat download (the fused-stage
    # scheme of _cached_batch_solver_generic: through the remote tunnel
    # each host<->device crossing costs ~0.1-0.2 s fixed — the previous
    # structure paid ~14 of them per call around a ~1 s device program)
    mi = model.markers.index(init_marker)
    packed_b, auxp_b, n_valid = [], [], []
    for run in runs:
        pix, lik, cams, n0 = _pad_run(run, N, C)
        packed_b.append(np.concatenate([pix, lik[..., None]], axis=-1))
        K, D, R, T = cams
        auxp_b.append(np.concatenate([
            K.reshape(C, 9), D.reshape(C, 4), R.reshape(C, 9),
            np.asarray(T).reshape(C, 3),
        ], axis=1))
        n_valid.append(n0)

    mesh = mesh or mesh_lib.make_mesh(model_axis=False)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("data"))
    n_dev = mesh.shape["data"]
    (packedp, auxpp, mpep), B0 = mesh_lib.pad_batch(
        [np.stack(packed_b), np.stack(auxp_b), mpe], n_dev
    )
    (nvp,), _ = mesh_lib.pad_batch([np.asarray(n_valid, np.int32)], n_dev)
    flat = np.asarray(_cached_batch_ekf_solver_generic(
        model, cfg, N, C, str(dtype), qb.tobytes(), P0.tobytes(),
        smoother=smoother, marker_idx=mi,
    )(
        jax.device_put(jnp.asarray(packedp, dtype), shard),
        jax.device_put(jnp.asarray(auxpp, dtype), shard),
        jax.device_put(jnp.asarray(nvp), shard),
        jax.device_put(jnp.asarray(mpep, dtype), shard),
    )[:B0])
    P_, L_ = n_pose, model.n_markers
    sz_s, sz_m = N * P_, N * L_ * 3
    state_keys = ("x", "dx", "ddx", "smoothed_x", "smoothed_dx",
                  "smoothed_ddx")
    host = {k2: flat[:, j * sz_s:(j + 1) * sz_s].reshape(B0, N, P_)
            for j, k2 in enumerate(state_keys)}
    o = 6 * sz_s
    host["marker_std"] = flat[:, o:o + sz_m].reshape(B0, N, L_, 3)
    pos_all = flat[:, o + sz_m:o + 2 * sz_m].reshape(B0, N, L_, 3)
    outliers = flat[:, o + 2 * sz_m]
    results = []
    for i, run in enumerate(runs):
        n0 = n_valid[i]
        states = {k2: v[i][:n0] for k2, v in host.items()}
        results.append(dict(
            data_dir=run.data_dir, positions=pos_all[i, :n0].astype(np.float64),
            states=states, start_frame=run.start_frame,
            scene_fpath=run.scene_fpath, max_pixel_err=float(mpe[i]),
            outliers=int(outliers[i]),
        ))
    return results


# WARM-START POLICY (r4 measurement, docs/r04/{cold,warm}_n600.txt):
# round 3 auto-enabled the EKF warm start beyond a frame-count
# threshold, but that conclusion was measured on a BROKEN fixture (the
# synthetic gallop ran out of the camera ring beyond ~N=130;
# utils/synthetic.cheetah_gallop). Re-measured on the fixed fixture:
# cold at N=300 converges to 6.8 mm (gn 0.006) while the EKF-warm
# solve lands in a WORSE basin it cannot leave even at 3x budget (cost
# 54k vs cold 20k; the EKF output carries ~1e9 of third-difference
# cost, the early violent smoothing wrecks the measurement fit, and
# the redescending loss then disowns the data). warm_start="auto"
# therefore resolves to the cold init at EVERY horizon; pass
# warm_start=True only to force the EKF init explicitly (e.g. panning
# rigs where a straight-line track fit is meaningless).


def resolve_warm_start(warm_start) -> bool:
    """Resolve the user-facing warm_start knob ('auto'/True/False) to
    the effective boolean. 'auto' = cold everywhere (see the policy
    note above); truthy values force the EKF init."""
    return False if warm_start == "auto" else bool(warm_start)



def sweep(
    root_dir: str,
    dlc_thresh: float = 0.8,
    num_iters: int = 60,
    save: bool = True,
    max_frames: Optional[int] = None,
    stages: Sequence[str] = ("fte",),
    warm_start="auto",
    relinearize_every: int = 1,
    rescue: bool = True,
    uncertainty: bool = False,
) -> List[Dict]:
    """Run batched reconstruction over every run under root_dir
    (all_flick twin). Groups runs by fps (compile signature), solves
    each group as one sharded program per requested stage ('fte' and/or
    'ekf'), writes per-run pickles.

    ``warm_start=True`` initializes the FTE from the batched EKF stage's
    smoothed poses (the reference's own tri→sba→ekf→fte stage order,
    src/all_optimizations.py:950-983) instead of the TRI+linreg cold
    start — the EKF then runs regardless of whether 'ekf' is in
    ``stages``. Default "auto" = cold at every horizon: on the repaired
    long-horizon fixture the cold init converges (N=300: 6.8 mm,
    gn 0.006) while the EKF init's ~1e9 third-difference cost drives
    the GN into a worse basin it cannot leave even at 3x budget (see
    the warm-start policy note above). Use True only when a straight-line track fit is
    meaningless (e.g. panning rigs).

    ``rescue``: runs whose stationarity flag comes back unconverged are
    re-solved once as their own batch at 3x the iteration budget, warm-
    started from their current solution (robust weights on from
    iteration 0) — a second chance only the failures pay for.
    """
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    run_dirs = discover_runs(root_dir)
    print(f"Found {len(run_dirs)} runs under {root_dir}")
    runs = [load_run(d, end_frame=(max_frames or -1)) for d in run_dirs]
    groups: Dict[float, List[RunData]] = {}
    for r in runs:
        groups.setdefault(r.fps, []).append(r)

    all_results = []
    for fps, group in groups.items():
        warm = resolve_warm_start(warm_start)
        ekf_results = None
        if "ekf" in stages or (warm and "fte" in stages):
            print(f"EKF: {len(group)} runs @ {fps} fps as one batch")
            ekf_results = solve_batch_ekf(group, dlc_thresh)
            if save and "ekf" in stages:
                for res in ekf_results:
                    out_dir = os.path.join(res["data_dir"], "ekf")
                    os.makedirs(out_dir, exist_ok=True)
                    app.save_ekf(res["states"], out_dir, res["scene_fpath"],
                                 res["start_frame"], dlc_thresh,
                                 positions=res["positions"])
            if "fte" not in stages:
                all_results.extend(ekf_results)
        if "fte" in stages:
            print(f"FTE: {len(group)} runs @ {fps} fps as one batch"
                  + (" (EKF warm start)" if warm else ""))
            X0_override = ekf_warm_starts(ekf_results) if warm else None
            results = solve_batch(
                group, dlc_thresh, num_iters=num_iters,
                X0_override=X0_override, relinearize_every=relinearize_every,
                # the EKF init is already near the optimum and 3σ-gated:
                # switch the redescending weights on almost immediately
                plain_iters=(4 if warm else None),
                uncertainty=uncertainty,
            )
            if rescue:
                results = _rescue_unconverged(
                    results, "", num_iters,
                    lambda bad, X0s, budget: solve_batch(
                        [group[i] for i in bad], dlc_thresh,
                        num_iters=budget, X0_override=X0s,
                        relinearize_every=relinearize_every,
                        plain_iters=0,  # continuing a graduated solve
                        uncertainty=uncertainty,
                    ),
                )
            all_results.extend(results)
            if save:
                for res in results:
                    out_dir = os.path.join(res["data_dir"], "fte")
                    os.makedirs(out_dir, exist_ok=True)
                    app.save_optimised_cheetah(
                        res["positions"],
                        os.path.join(out_dir, "fte.pickle"),
                        extra_data=dict(
                            x=res["x"], dx=res["dx"], ddx=res["ddx"],
                            start_frame=res["start_frame"],
                            cost=res["cost"], cost0=res["cost0"],
                            converged=res["converged"],
                            grad_norm=res["grad_norm"],
                            **({"marker_std": res["marker_std"],
                                "cov_ridge_shrink": res["cov_ridge_shrink"],
                                "cov_ridge_frac": res["cov_ridge_frac"]}
                               if uncertainty else {}),
                        ),
                    )
    return all_results


def sweep_generic(
    root_dir: str,
    skeleton_fpath: str,
    dlc_thresh: float = 0.4,
    num_iters: int = 60,
    save: bool = True,
    max_frames: Optional[int] = None,
    warm_start="auto",
    rescue: bool = True,
    uncertainty: bool = False,
    init_marker: str = "forehead",
    stages: Sequence[str] = ("fte",),
    relinearize_every: int = 1,
) -> List[Dict]:
    """Batched generic-skeleton reconstruction over every run under
    root_dir — the all_flick twin for the src/build.py model family
    (humans, new animals). Groups runs by fps, solves each group as one
    jitted sharded program per requested stage: 'fte' via
    solve_batch_generic (EKF warm start, unconverged-run rescue,
    optional error bars), writing per-run
    ``<run>/fte/traj_results.pickle`` in build.py's result schema
    (src/build.py:344-378) plus solver-status extras; 'ekf' via
    solve_batch_ekf_generic, writing ``<run>/ekf/ekf.pickle`` with the
    smoothed states and error bars (beyond the reference — build.py has
    no EKF stage)."""
    from ..models.skeleton import build_skeleton_model
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    model = build_skeleton_model(data_io.load_skeleton(skeleton_fpath))
    run_dirs = discover_runs(root_dir)
    print(f"Found {len(run_dirs)} runs under {root_dir}")
    runs = [
        load_run(d, end_frame=(max_frames or -1), markers=model.markers)
        for d in run_dirs
    ]
    groups: Dict[float, List[RunData]] = {}
    for r in runs:
        groups.setdefault(r.fps, []).append(r)

    all_results = []
    for fps, group in groups.items():
        # one EKF solve per group, shared by the ekf-stage output AND the
        # FTE warm start (mirrors the cheetah sweep's stage order)
        warm = resolve_warm_start(warm_start)
        ekf_results = None
        if "ekf" in stages or (warm and "fte" in stages):
            print(f"generic EKF: {len(group)} runs @ {fps} fps as one batch")
            ekf_results = solve_batch_ekf_generic(
                model, group, dlc_thresh, init_marker=init_marker,
            )
            if save and "ekf" in stages:
                for res in ekf_results:
                    out_dir = os.path.join(res["data_dir"], "ekf")
                    os.makedirs(out_dir, exist_ok=True)
                    app.save_ekf(res["states"], out_dir, res["scene_fpath"],
                                 res["start_frame"], dlc_thresh,
                                 positions=res["positions"])
            if "fte" not in stages:
                all_results.extend(ekf_results)
        if "fte" not in stages:
            continue
        print(f"generic FTE: {len(group)} runs @ {fps} fps as one batch"
              + (" (EKF warm start)" if warm else ""))
        results = solve_batch_generic(
            model, group, dlc_thresh, num_iters=num_iters,
            warm_start=False,
            X0_override=(ekf_warm_starts(ekf_results) if warm else None),
            plain_iters=(4 if warm else None),
            rescue=rescue, uncertainty=uncertainty,
            init_marker=init_marker, relinearize_every=relinearize_every,
        )
        all_results.extend(results)
        if save:
            for res in results:
                out = os.path.join(res["data_dir"], "fte", "traj_results.pickle")
                os.makedirs(os.path.dirname(out), exist_ok=True)
                data_io.save_pickle(out, dict(
                    positions=res["positions"], x=res["x"],
                    dx=res["dx"], ddx=res["ddx"],
                    markers=res["markers"], start_frame=res["start_frame"],
                    scene_fpath=res["scene_fpath"],
                    cost=res["cost"], cost0=res["cost0"],
                    converged=res["converged"], grad_norm=res["grad_norm"],
                    **({"marker_std": res["marker_std"],
                        "cov_ridge_shrink": res["cov_ridge_shrink"],
                        "cov_ridge_frac": res["cov_ridge_frac"]}
                       if uncertainty else {}),
                ))
    return all_results
