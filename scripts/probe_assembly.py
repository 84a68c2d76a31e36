#!/usr/bin/env python
"""Measure H/g-assembly formulations on device (the 33% trace bucket,
docs/trace/SUMMARY.md): the GN normal-equation pieces

    A = Jp^T omega Jp   (per-marker 3x3 cores)
    H = Jfk^T A Jfk     (per-frame 25x25)
    g = Jfk^T (Jp^T er)

admit several contraction orders whose HLO quality differs. Each
variant is chained K times inside ONE jit with real data dependencies
(per-call wall timings through the tunnel under-report; see
scripts/probe_timing.py), so times are per-assembly-pass.

Variants:
  v0 current trajopt.meas_normal_pieces order (two einsums via A)
  v1 Y = A Jfk first, then contract (l, x) jointly as one K=60 dot
  v2 sqrt-weighted Jw = sqrt(omega) Jp, A = Jw^T Jw (2-operand einsum)
  v3 full J = Jp @ Jfk materialized (B,N,C,L,2,25), H = J^T omega J —
     the rejected round-2 baseline, kept as the traffic upper bound
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    K = int(os.environ.get("BENCH_CHAIN", 30))
    C, L, P = 6, 20, 25
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    Jp = jnp.asarray(rng.normal(size=(B, N, C, L, 2, 3)), dtype)
    Jfk = jnp.asarray(rng.normal(size=(B, N, L, 3, P)), dtype)
    omega = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, N, C, L, 2)), dtype)
    er = jnp.asarray(rng.normal(size=(B, N, C, L, 2)), dtype)

    def v0(Jp, omega, er, Jfk):
        A = jnp.einsum("znclui,znclu,zncluj->znlij", Jp, omega, Jp)
        H = jnp.einsum("znlxa,znlxy,znlyb->znab", Jfk, A, Jfk)
        bv = jnp.einsum("znclui,znclu->znli", Jp, er)
        g = jnp.einsum("znlxa,znlx->zna", Jfk, bv)
        return H, g

    def v1(Jp, omega, er, Jfk):
        A = jnp.einsum("znclui,znclu,zncluj->znlij", Jp, omega, Jp)
        Y = jnp.einsum("znlxy,znlyb->znlxb", A, Jfk)
        H = jnp.einsum("znlxa,znlxb->znab", Jfk, Y)  # K = L*3 = 60 dot
        bv = jnp.einsum("znclui,znclu->znli", Jp, er)
        g = jnp.einsum("znlxa,znlx->zna", Jfk, bv)
        return H, g

    def v2(Jp, omega, er, Jfk):
        Jw = Jp * jnp.sqrt(omega)[..., None]
        A = jnp.einsum("znclui,zncluj->znlij", Jw, Jw)
        Y = jnp.einsum("znlxy,znlyb->znlxb", A, Jfk)
        H = jnp.einsum("znlxa,znlxb->znab", Jfk, Y)
        bv = jnp.einsum("znclui,znclu->znli", Jp, er)
        g = jnp.einsum("znlxa,znlx->zna", Jfk, bv)
        return H, g

    def v3(Jp, omega, er, Jfk):
        J = jnp.einsum("znclui,znlip->znclup", Jp, Jfk)  # (B,N,C,L,2,P)
        H = jnp.einsum("znclup,znclu,zncluq->znpq", J, omega, J)
        g = jnp.einsum("znclup,znclu->znp", J, er)
        return H, g

    variants = {"v0_current": v0, "v1_K60": v1, "v2_sqrtw": v2, "v3_fullJ": v3}
    ref = None
    for name, fn in variants.items():
        @jax.jit
        def prog(Jp, omega, er, Jfk, fn=fn):
            def body(c, _):
                H, g = fn(Jp, omega * (1.0 + 1e-6 * c), er, Jfk)
                return c + jnp.mean(H) + jnp.mean(g), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        out = prog(Jp, omega, er, Jfk)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(prog(Jp, omega, er, Jfk))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K * 1e3
        H, g = jax.jit(fn)(Jp, omega, er, Jfk)
        if ref is None:
            ref = (np.asarray(H), np.asarray(g))
            dh = dg = 0.0
        else:
            dh = float(np.max(np.abs(np.asarray(H) - ref[0])) / np.abs(ref[0]).max())
            dg = float(np.max(np.abs(np.asarray(g) - ref[1])) / np.abs(ref[1]).max())
        print(f"{name:12s}: {per:7.3f} ms/assembly  (rel dH={dh:.2e} dg={dg:.2e})")


if __name__ == "__main__":
    main()
