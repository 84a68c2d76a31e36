#!/usr/bin/env python
"""Honest FTE stage profile: every stage is chained K times INSIDE one
jit program with real data dependencies (per-call wall timings through
the axon tunnel under-report; only large single-program timings hold —
see scripts/probe_timing.py history).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    from acinoset_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.pipeline.ekf import make_h_fn
    from acinoset_tpu.pipeline.fte import initial_trajectory
    from acinoset_tpu.utils import synthetic

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    K = int(os.environ.get("BENCH_CHAIN", 120))
    P = 25
    dtype = jnp.float32

    cams = synthetic.ring_cameras(n_cams=6)
    k_arr, d_arr, r_arr, t_arr, res = cams
    X_true = synthetic.cheetah_gallop(N=N, fps=90.0)
    pixels, likelihood, _ = synthetic.render_measurements(
        X_true, cams, noise_px=1.5, outlier_frac=0.02, bad_lik_frac=0.05, seed=0
    )
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr, dtype)
    X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr, np.arange(N), 0.5)
    rng = np.random.default_rng(1)
    Xb = jnp.asarray(
        np.stack([X0 + rng.normal(scale=1e-3, size=X0.shape) for _ in range(B)]), dtype
    )

    def chain_time(make_body, init, label):
        # r4 timing rule (CLAUDE.md): block_until_ready on a scan
        # program's output can return BEFORE completion through the
        # tunnel — sync with a host transfer of a QUADRATIC reduction
        # of the carry (so XLA cannot hoist the body), K>=120 deep.
        @jax.jit
        def prog(x0):
            def body(c, k):
                return make_body(c, k), ()
            y, _ = jax.lax.scan(body, x0, jnp.arange(K))
            return jnp.mean(y * y)

        float(prog(init))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(init))  # host transfer = true completion sync
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K
        print(f"{label}: {per*1e3:.2f} ms/step  (total {min(ts)*1e3:.0f} ms / {K})")
        return per

    # ---- measurement pass (h + jacobian), dependency via J-reduction
    h_flat = lambda x: h(x).reshape(-1)
    jac = jax.jacfwd(h_flat)
    hj_one = lambda x: (h_flat(x), jac(x))
    hj_batch = jax.vmap(jax.vmap(hj_one))

    def hj_body(X, k):
        hh, J = hj_batch(X)
        return X + 1e-9 * jnp.sum(J, axis=2) + 1e-12 * hh.sum()

    t_hj = chain_time(hj_body, Xb, "hj_batch (h + jacfwd)")

    # ---- H/g assembly from (J, e)
    m = h(X0[0]).reshape(-1).shape[0]
    J0 = jnp.asarray(rng.normal(size=(B, N, m, P)).astype(np.float32))
    e0 = jnp.asarray(rng.normal(size=(B, N, m)).astype(np.float32))

    def asm_body(e, k):
        H = jnp.einsum("bnmi,bnm,bnmj->bnij", J0, jnp.abs(e), J0)
        g = jnp.einsum("bnmi,bnm,bnm->bni", J0, jnp.abs(e), e)
        return e + 1e-9 * g.sum() + 1e-12 * H.sum()

    t_asm = chain_time(asm_body, e0, "H/g assembly einsums")

    # ---- banded solve; bands rescaled per step so the factor cannot be
    # hoisted out of the scan (it depends on the step index)
    from acinoset_tpu.solvers.banded import block_banded_solve_unrolled
    from acinoset_tpu.solvers.cyclic import banded_solve_cr

    bands = [jnp.asarray(rng.normal(size=(B, N, P, P)).astype(np.float32)) for _ in range(4)]
    bands[0] = 0.5 * (bands[0] + jnp.swapaxes(bands[0], -1, -2)) + 30.0 * jnp.eye(P)
    g0 = jnp.asarray(rng.normal(size=(B, N, P)).astype(np.float32))

    def mk_solve_body(solver):
        vsolve = jax.vmap(lambda a0, a1, a2, a3, r: solver([a0, a1, a2, a3], r))

        def body(g, k):
            s = 1.0 + 1e-4 * (k + 1).astype(jnp.float32)
            x = vsolve(bands[0] * s, bands[1] * s, bands[2] * s, bands[3] * s, g)
            return g0 + 0.1 * x

        return body

    t_solve = chain_time(mk_solve_body(block_banded_solve_unrolled), g0,
                         "banded solve (chol_unrolled)")
    if os.environ.get("PROFILE_CR"):
        chain_time(mk_solve_body(banded_solve_cr), g0,
                   "banded solve (cyclic reduction)")

    # ---- spectral PCG on the unscaled system
    from acinoset_tpu.solvers.banded import banded_pcg_solve
    from acinoset_tpu.solvers.trajopt import _d3_gram_bands, _d3_gram_dense

    Ts = 1.0 / 90.0
    wq = jnp.asarray(1.0 / (0.01 + rng.uniform(size=P)), jnp.float32)
    gram = _d3_gram_bands(N, Ts)
    ubands = []
    for k in range(4):
        Bk = np.zeros((N, P, P), np.float32)
        Bk[:, np.arange(P), np.arange(P)] = 2.0 * gram[k][:, None] * np.asarray(wq)
        ubands.append(jnp.asarray(np.broadcast_to(Bk, (B, N, P, P)).copy()))
    Mm = rng.normal(size=(B, N, 12, P)).astype(np.float32) * 50.0
    H = jnp.asarray(np.einsum("bnmi,bnmj->bnij", Mm, Mm))
    ubands[0] = ubands[0] + H + 1e-4 * jnp.eye(P)
    _e, _U = np.linalg.eigh(_d3_gram_dense(N, Ts))
    U = jnp.asarray(_U, jnp.float32)
    ev = jnp.asarray(np.maximum(_e, 0.0), jnp.float32)
    cvec = jnp.maximum(
        jnp.mean(jnp.diagonal(H, axis1=-2, axis2=-1), axis=(0, 1)), 1e-12
    )
    vpcg = jax.vmap(
        lambda a0, a1, a2, a3, r: banded_pcg_solve(
            [a0, a1, a2, a3], r, U, ev, wq, cvec, num_iters=16
        )
    )

    def pcg_body(g, k):
        s = 1.0 + 1e-4 * (k + 1).astype(jnp.float32)
        x = vpcg(ubands[0] * s, ubands[1] * s, ubands[2] * s, ubands[3] * s, g)
        return g0 + 1e-6 * x

    chain_time(pcg_body, g0, "banded solve (spectral pcg, 16 it)")

    print(f"\nsum of stages: {(t_hj + t_asm + t_solve)*1e3:.1f} ms "
          f"vs measured full GN iter ~38 ms")


if __name__ == "__main__":
    main()
