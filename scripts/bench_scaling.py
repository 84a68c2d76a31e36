"""B x N throughput-scaling study on the TPU (VERDICT r2 item 1).

Runs bench.py's flagship FTE program over a grid of batch sizes and
frame counts, printing traj/s and XLA cost-analysis sustained FLOP/s for
each point — the data that locates the throughput knee. Each point is
one fresh jit compile (cached persistently), then timed over REPEATS
runs taking the best.

Usage (on the TPU):
  python scripts/bench_scaling.py                 # default grid
  SCALE_BS=96,384,1536 SCALE_NS=100,300 python scripts/bench_scaling.py

Writes one JSON line per point to stdout AND docs/scaling.jsonl.
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
    import jax.numpy as jnp

    from acinoset_tpu.models import cheetah
    from acinoset_tpu.parallel import mesh as mesh_lib
    from acinoset_tpu.pipeline.ekf import make_h_fn, make_hj_parts_fn
    from acinoset_tpu.pipeline.fte import default_config, initial_trajectory
    from acinoset_tpu.utils import synthetic

    Bs = [int(x) for x in os.environ.get("SCALE_BS", "96,192,384,768,1536").split(",")]
    Ns = [int(x) for x in os.environ.get("SCALE_NS", "100,300,600").split(",")]
    iters = int(os.environ.get("SCALE_ITERS", 40))
    repeats = int(os.environ.get("SCALE_REPEATS", 3))
    dtype = jnp.float32

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    hj_parts = make_hj_parts_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    cfg = default_config(90.0, num_iters=iters)
    mesh = mesh_lib.make_mesh(model_axis=(len(jax.devices()) % 2 == 0 and len(jax.devices()) > 1))

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "docs", "scaling.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    log = open(out_path, "a")

    for N in Ns:
        X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
        pixels, likelihood, pts3d = synthetic.render_measurements(
            X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
        )
        X0 = initial_trajectory(
            pixels, likelihood, k_arr, d_arr, r_arr, t_arr, np.arange(N), 0.5
        )
        meas = pixels.transpose(1, 0, 2, 3)
        w = (likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px
        solver = mesh_lib.sharded_fte_solver(mesh, h, cfg, hj_parts_fn=hj_parts)
        for B in Bs:
            rng = np.random.default_rng(1)
            X0b = np.stack([X0 + rng.normal(scale=1e-3, size=X0.shape) for _ in range(B)])
            measb = np.broadcast_to(meas, (B,) + meas.shape).copy()
            wb = np.broadcast_to(w, (B,) + w.shape).copy()
            try:
                with mesh:
                    X0s, meass, ws = mesh_lib.shard_batch(
                        mesh, jnp.asarray(X0b, dtype), jnp.asarray(measb, dtype),
                        jnp.asarray(wb, dtype)
                    )
                    t_c0 = time.perf_counter()
                    X = solver(X0s, meass, ws)
                    X.block_until_ready()
                    t_compile = time.perf_counter() - t_c0
                    times = []
                    for _ in range(repeats):
                        t0 = time.perf_counter()
                        solver(X0s, meass, ws).block_until_ready()
                        times.append(time.perf_counter() - t0)
                    best = min(times)
                    try:
                        fl = solver.lower(X0s, meass, ws).compile().cost_analysis()
                        flops = float(fl.get("flops", 0.0)) if fl else 0.0
                    except Exception:
                        flops = 0.0
                    mk = np.asarray(jax.vmap(cheetah.fk25)(jnp.asarray(np.asarray(X[0]))))
                    mk_err = float(np.nanmean(np.linalg.norm(mk - pts3d, axis=-1)))
                rec = dict(
                    B=B, N=N, iters=iters, sec=round(best, 4),
                    traj_per_sec=round(B / best, 2),
                    tflops_sustained=round(flops / best / 1e12, 3),
                    mean_marker_err_m=round(mk_err, 5),
                    compile_s=round(t_compile, 1),
                )
            except Exception as e:
                rec = dict(B=B, N=N, iters=iters, error=str(e)[:200])
            line = json.dumps(rec)
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
            del X0b, measb, wb
    log.close()


if __name__ == "__main__":
    main()
