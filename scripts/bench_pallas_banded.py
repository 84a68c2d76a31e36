#!/usr/bin/env python
"""Pallas batched banded kernel vs XLA unrolled path on TPU.

VERDICT round-1 item 2 acceptance: kernel >= parity with
block_banded_solve_unrolled at B=96, N=100, P=25 on v5e.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.kernels.banded_pallas import banded_solve_pallas
    from acinoset_tpu.solvers.banded import block_banded_solve_unrolled

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    P = int(os.environ.get("BENCH_P", 25))
    TB = os.environ.get("BENCH_TILE")
    reps = int(os.environ.get("BENCH_REPEATS", 5))

    rng = np.random.default_rng(0)
    # SPD banded batch: random bands + diagonal dominance
    bands = [rng.normal(size=(B, N, P, P)).astype(np.float32) for _ in range(4)]
    for k in range(1, 4):
        bands[k][:, :k] = 0.0
    bands[0] = 0.5 * (bands[0] + bands[0].transpose(0, 1, 3, 2))
    bands[0][:, :, np.arange(P), np.arange(P)] += 30.0
    g = rng.normal(size=(B, N, P)).astype(np.float32)

    jb = [jnp.asarray(b) for b in bands]
    jg = jnp.asarray(g)

    chain = int(os.environ.get("BENCH_CHAIN", 20))

    def timed(solve, g0):
        """Steady-state latency: chain each solve's output into the next
        rhs so calls cannot overlap (matches the GN loop's dependency)."""
        x = solve(g0)
        x.block_until_ready()
        ts = []
        for _ in range(reps):
            xx = g0
            t0 = time.perf_counter()
            for _ in range(chain):
                xx = solve(xx)
            xx.block_until_ready()
            ts.append((time.perf_counter() - t0) / chain)
        return min(ts), x

    # ---- XLA path (vmapped unrolled)
    xla_solve = jax.jit(
        jax.vmap(lambda a0, a1, a2, a3, gg: block_banded_solve_unrolled([a0, a1, a2, a3], gg))
    )
    t_xla, x_ref = timed(lambda gg: xla_solve(*jb, gg), jg)

    # ---- Pallas kernel
    kw = dict(batch_tile=int(TB)) if TB else {}
    pl_fn = jax.jit(lambda bb, gg: banded_solve_pallas(bb, gg, **kw))
    t0 = time.perf_counter()
    pl_fn(jb, jg).block_until_ready()
    compile_s = time.perf_counter() - t0
    t_pl, x_pl = timed(lambda gg: pl_fn(jb, gg), jg)

    err = float(jnp.max(jnp.abs(x_pl - x_ref)) / jnp.max(jnp.abs(x_ref)))
    print(json.dumps(dict(
        B=B, N=N, P=P, tile=kw.get("batch_tile", "auto"),
        xla_s=round(t_xla, 5), pallas_s=round(t_pl, 5),
        speedup=round(t_xla / t_pl, 2), rel_err=err,
        compile_s=round(compile_s, 1),
        device=jax.devices()[0].platform,
    )))


if __name__ == "__main__":
    main()
