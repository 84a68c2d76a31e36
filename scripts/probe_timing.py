#!/usr/bin/env python
"""Pin down the banded-solve timing discrepancy (0.3 ms vs 14 ms).

Combos: {fixed, distinct} bands x {fixed, distinct} rhs x {block each,
block last}. Plus a known-FLOP matmul to sanity-check the clock.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.solvers.banded import block_banded_solve_unrolled

    B, N, P, K = 96, 100, 25, 8
    rng = np.random.default_rng(0)

    def mk_bands():
        bands = [rng.normal(size=(B, N, P, P)).astype(np.float32) for _ in range(4)]
        bands[0] = 0.5 * (bands[0] + bands[0].transpose(0, 1, 3, 2))
        bands[0][:, :, np.arange(P), np.arange(P)] += 30.0
        return [jnp.asarray(b) for b in bands]

    bands_sets = [mk_bands() for _ in range(K)]
    gs = jnp.asarray(rng.normal(size=(K, B, N, P)).astype(np.float32))

    solve = jax.jit(
        jax.vmap(lambda a0, a1, a2, a3, gg: block_banded_solve_unrolled([a0, a1, a2, a3], gg))
    )
    solve(*bands_sets[0], gs[0]).block_until_ready()

    def run(distinct_bands, distinct_rhs, block_each):
        t0 = time.perf_counter()
        outs = []
        for i in range(K):
            bb = bands_sets[i if distinct_bands else 0]
            gg = gs[i if distinct_rhs else 0]
            out = solve(*bb, gg)
            if block_each:
                out.block_until_ready()
            outs.append(out)
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / K

    for db in (False, True):
        for dr in (False, True):
            for be in (False, True):
                # two passes, report second (warm)
                run(db, dr, be)
                t = run(db, dr, be)
                print(f"bands={'D' if db else 'F'} rhs={'D' if dr else 'F'} "
                      f"block_each={be}: {t*1e3:.2f} ms")

    # clock sanity: 4096^3 matmul = 137 GFLOP
    a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    mm = jax.jit(lambda x: x @ x)
    mm(a).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        mm(a).block_until_ready()
    t = (time.perf_counter() - t0) / 5
    print(f"4096^3 f32 matmul: {t*1e3:.2f} ms -> {2*4096**3/t/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
