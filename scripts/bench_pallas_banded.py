#!/usr/bin/env python
"""Banded-solve backends head-to-head on TPU: XLA unrolled vs cyclic
reduction vs the Pallas single-launch kernel.

Timing methodology: every call gets a DISTINCT pre-generated rhs and is
individually blocked. (Round-1 used a self-feeding chain `x = solve(x)`
whose iterates decay to zero — identical all-zero inputs made repeat
calls nearly free and inflated the XLA path to 37 ms; the real number
is ~0.23 ms.)
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
    from acinoset_tpu.solvers.cyclic import banded_solve_cr

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    P = int(os.environ.get("BENCH_P", 25))
    TB = os.environ.get("BENCH_TILE")
    reps = int(os.environ.get("BENCH_REPEATS", 3))
    calls = int(os.environ.get("BENCH_CALLS", 10))

    rng = np.random.default_rng(0)
    # SPD banded batch: random bands + diagonal dominance
    bands = [rng.normal(size=(B, N, P, P)).astype(np.float32) for _ in range(4)]
    for k in range(1, 4):
        bands[k][:, :k] = 0.0
    bands[0] = 0.5 * (bands[0] + bands[0].transpose(0, 1, 3, 2))
    bands[0][:, :, np.arange(P), np.arange(P)] += 30.0

    jb = [jnp.asarray(b) for b in bands]
    gs = jnp.asarray(rng.normal(size=(calls, B, N, P)).astype(np.float32))

    def timed(solve):
        x = solve(gs[0])
        x.block_until_ready()  # compile + warmup
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(calls):
                solve(gs[i]).block_until_ready()
            ts.append((time.perf_counter() - t0) / calls)
        return min(ts), x

    # ---- XLA path (vmapped unrolled)
    xla_solve = jax.jit(
        jax.vmap(lambda a0, a1, a2, a3, gg: block_banded_solve_unrolled([a0, a1, a2, a3], gg))
    )
    t_xla, x_ref = timed(lambda gg: xla_solve(*jb, gg))

    # ---- cyclic reduction (vmapped XLA)
    cr_solve = jax.jit(
        jax.vmap(lambda a0, a1, a2, a3, gg: banded_solve_cr([a0, a1, a2, a3], gg))
    )
    t_cr, x_cr = timed(lambda gg: cr_solve(*jb, gg))
    err_cr = float(jnp.max(jnp.abs(x_cr - x_ref)) / jnp.max(jnp.abs(x_ref)))

    # ---- Pallas kernel
    kw = dict(batch_tile=int(TB)) if TB else {}
    pl_fn = jax.jit(lambda bb, gg: banded_solve_pallas(bb, gg, **kw))
    t_pl, x_pl = timed(lambda gg: pl_fn(jb, gg))

    err = float(jnp.max(jnp.abs(x_pl - x_ref)) / jnp.max(jnp.abs(x_ref)))
    print(json.dumps(dict(
        B=B, N=N, P=P, tile=kw.get("batch_tile", "auto"),
        xla_ms=round(t_xla * 1e3, 3), cr_ms=round(t_cr * 1e3, 3),
        pallas_ms=round(t_pl * 1e3, 3),
        rel_err_pallas=err, rel_err_cr=err_cr,
        device=jax.devices()[0].platform,
    )))


if __name__ == "__main__":
    main()
