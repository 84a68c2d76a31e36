#!/usr/bin/env python
"""Long-horizon scaling rows ON DEVICE (VERDICT r3 item 2).

Round 3 recorded long-horizon rows on a BROKEN fixture (the 8 m/s
synthetic gallop left the 12 m camera ring at N>=300;
utils/synthetic.cheetah_gallop now caps travel to the ring) and
concluded the cold init diverges there. Re-measured on the repaired
fixture, the conclusion INVERTED: cold converges (N=300: 6.8 mm,
gn 0.006 on CPU f64) while the EKF warm init's ~1e9 third-difference
cost drives the GN into a worse basin (0.04-0.065 m, unconverged even
at 3x budget) — so the production sweep path is now cold at every
horizon (pipeline/sweep.AUTO_WARM_N) and this script measures exactly
that: solve_batch (batched TRI+linreg init) -> rescue of unconverged
runs, every stage's device+host cost in the reported rate, appended as
mode="cold_sweep" rows to docs/scaling.jsonl. WARM_START=1 measures
the explicit EKF-init path for comparison (mode="warm_sweep").

Each run is a DISTINCT measurement render (per-run noise/outlier seed)
of the shared gallop trajectory, so the rescue pass and convergence
stats are meaningful rather than 96 copies of one problem.

Env: WARM_B (96), WARM_NS (300,600), WARM_ITERS (60), WARM_REPEATS (2),
WARM_START=1 (EKF init instead of cold), WARM_PLAIN (plain_iters for
the warm path, default 4), WARM_DEBUG=1 (print EKF-stage marker error,
grad-norm percentiles, worst runs).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from acinoset_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.pipeline import sweep as sweep_lib
    from acinoset_tpu.utils import synthetic

    B = int(os.environ.get("WARM_B", 96))
    Ns = [int(x) for x in os.environ.get("WARM_NS", "300,600").split(",")]
    num_iters = int(os.environ.get("WARM_ITERS", 60))
    repeats = int(os.environ.get("WARM_REPEATS", 2))
    warm = bool(int(os.environ.get("WARM_START", 0)))
    plain_iters = int(os.environ.get("WARM_PLAIN", 4)) if warm else None
    debug = bool(os.environ.get("WARM_DEBUG"))
    fps = 90.0

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "docs", "scaling.jsonl")

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    cams_tuple = (k_arr, d_arr.reshape(-1, 4), r_arr,
                  np.asarray(t_arr).reshape(-1, 3))

    for N in Ns:
        X_true = synthetic.cheetah_gallop(N=N, fps=fps)
        pts3d = np.asarray(jax.vmap(cheetah.fk25)(X_true))  # (N, L, 3)
        runs = []
        for ri in range(B):
            pixels, likelihood, _ = synthetic.render_measurements(
                X_true, cams, noise_px=1.5, outlier_frac=0.02,
                bad_lik_frac=0.05, seed=1000 + ri,
            )
            runs.append(sweep_lib.RunData(
                data_dir=f"warm_{N}_{ri}", pixels=pixels,
                likelihood=likelihood, cams=cams_tuple, fps=fps,
                start_frame=0, scene_fpath="",
            ))

        def one_pass():
            ekf_results, t_ekf, X0s = [], 0.0, None
            if warm:
                t0 = time.perf_counter()
                ekf_results = sweep_lib.solve_batch_ekf(runs, 0.5)
                t_ekf = time.perf_counter() - t0
                X0s = sweep_lib.ekf_warm_starts(ekf_results)
            t0 = time.perf_counter()
            results = sweep_lib.solve_batch(
                runs, 0.5, num_iters=num_iters, X0_override=X0s,
                plain_iters=plain_iters,
            )
            t_fte = time.perf_counter() - t0
            t0 = time.perf_counter()
            results = sweep_lib._rescue_unconverged(
                results, "", num_iters,
                lambda bad, Xs, budget: sweep_lib.solve_batch(
                    [runs[i] for i in bad], 0.5, num_iters=budget,
                    X0_override=Xs, plain_iters=0,
                ),
            )
            t_rescue = time.perf_counter() - t0
            return results, ekf_results, t_ekf, t_fte, t_rescue

        # warmup (compiles), then timed passes
        results, ekf_results, *_ = one_pass()
        best = (1e30, None)
        for _ in range(repeats):
            results, ekf_results, t_ekf, t_fte, t_rescue = one_pass()
            tot = t_ekf + t_fte + t_rescue
            if tot < best[0]:
                best = (tot, (t_ekf, t_fte, t_rescue))
        t_ekf, t_fte, t_rescue = best[1]

        errs = []
        for r in results:
            mk = np.asarray(r["positions"])  # (n, L, 3)
            errs.append(float(np.nanmean(
                np.linalg.norm(mk - pts3d[: len(mk)], axis=-1))))
        if debug:
            ekf_errs = [float(np.nanmean(np.linalg.norm(
                np.asarray(r["positions"]) - pts3d, axis=-1)))
                for r in ekf_results] or [float("nan")]
            gns = np.asarray([r["grad_norm"] for r in results])
            print(json.dumps(dict(
                debug=True, N=N,
                ekf_err_median=round(float(np.median(ekf_errs)), 4),
                ekf_err_max=round(float(np.max(ekf_errs)), 4),
                gn_pct=[round(float(np.percentile(gns, p)), 4)
                        for p in (50, 75, 90, 99, 100)],
                worst=[dict(i=int(i), err=round(errs[i], 3),
                            gn=round(float(gns[i]), 3),
                            conv=bool(results[i]["converged"]))
                       for i in np.argsort(errs)[-5:]],
            )), flush=True)
        row = dict(
            mode=("warm_sweep" if warm else "cold_sweep"), B=B, N=N,
            iters=num_iters,
            plain_iters=plain_iters,
            ekf_sec=round(t_ekf, 3), fte_sec=round(t_fte, 3),
            rescue_sec=round(t_rescue, 3),
            traj_per_sec=round(B / best[0], 2),
            frames_per_sec=round(B * N / best[0], 1),
            median_marker_err_m=round(float(np.median(errs)), 4),
            max_marker_err_m=round(float(np.max(errs)), 4),
            n_converged=sum(int(r["converged"]) for r in results),
            platform=jax.devices()[0].platform,
        )
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
