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
  v4 closed-form 3x3 Cholesky of A folded into Jfk (Y = R Jfk), H as
     ONE true symmetric K=60 GEMM  H = Y^T Y  with (l, x) merged
  v5 sqrt-weighted FULL Jacobian Jw @ Jfk flattened to (240, 25),
     H = Jfull^T Jfull as one K=240 GEMM (max MXU utilization, max
     intermediate traffic)
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
    # K=120, not 30: through the axon tunnel, block_until_ready on this
    # scan program's scalar output returned ~immediately at K=30 (times
    # "measured" 0.04 ms while a forced host transfer took the true
    # ~260 ms) — at K>=120 both paths agree. Timing below uses float()
    # (host round-trip) so completion cannot be faked.
    K = int(os.environ.get("BENCH_CHAIN", 120))
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

    def chol3(A):
        """Closed-form lower Cholesky of a batched (..., 3, 3) SPD matrix."""
        eps = jnp.asarray(0.0, A.dtype)
        l11 = jnp.sqrt(A[..., 0, 0] + eps)
        l21 = A[..., 1, 0] / l11
        l31 = A[..., 2, 0] / l11
        l22 = jnp.sqrt(A[..., 1, 1] - l21 * l21)
        l32 = (A[..., 2, 1] - l31 * l21) / l22
        l33 = jnp.sqrt(A[..., 2, 2] - l31 * l31 - l32 * l32)
        z = jnp.zeros_like(l11)
        return jnp.stack(
            [
                jnp.stack([l11, z, z], -1),
                jnp.stack([l21, l22, z], -1),
                jnp.stack([l31, l32, l33], -1),
            ],
            -2,
        )

    def v4(Jp, omega, er, Jfk):
        A = jnp.einsum("znclui,znclu,zncluj->znlij", Jp, omega, Jp)
        R = jnp.swapaxes(chol3(A), -1, -2)  # upper factor, A = R^T R
        Y = jnp.einsum("znlxy,znlyb->znlxb", R, Jfk)
        Bz, Nz = Y.shape[:2]
        Yf = Y.reshape(Bz, Nz, -1, Y.shape[-1])  # (B, N, 60, P)
        H = jnp.einsum("znkp,znkq->znpq", Yf, Yf)  # ONE K=60 GEMM
        bv = jnp.einsum("znclui,znclu->znli", Jp, er)
        g = jnp.einsum("znlxa,znlx->zna", Jfk, bv)
        return H, g

    def v5(Jp, omega, er, Jfk):
        Jw = Jp * jnp.sqrt(omega)[..., None]
        Jfull = jnp.einsum("znclui,znlip->znclup", Jw, Jfk)
        Bz, Nz = Jfull.shape[:2]
        Jf = Jfull.reshape(Bz, Nz, -1, Jfull.shape[-1])  # (B, N, 240, P)
        H = jnp.einsum("znkp,znkq->znpq", Jf, Jf)  # ONE K=240 GEMM
        bv = jnp.einsum("znclui,znclu->znli", Jp, er)
        g = jnp.einsum("znlxa,znlx->zna", Jfk, bv)
        return H, g

    variants = {
        "v0_current": v0, "v1_K60": v1, "v2_sqrtw": v2, "v3_fullJ": v3,
        "v4_chol3": v4, "v5_K240": v5,
    }
    ref = None
    for name, fn in variants.items():
        @jax.jit
        def prog(Jp, omega, er, Jfk, fn=fn):
            def body(c, _):
                # the perturbation must be elementwise NON-SEPARABLE in
                # the carry: anything of the form sum_k f_k(c)*A_k(om)
                # lets XLA distribute the linear einsum chain over the
                # sum and hoist every A_k out of the scan (both
                # omega*(1+eps*c) AND omega+eps*cos(omega+c) collapsed
                # v0 to ~1 us — 850 TFLOP/s). cos(omega*(c+1)) cannot
                # be written that way.
                om = omega * (1.0 + 1e-6 * jnp.cos(omega * (c + 1.0)))
                H, g = fn(Jp, om, er, Jfk)
                # QUADRATIC consumption: mean(H) alone is linear in H
                # and admits a sum-of-einsum refactoring into one cheap
                # precomputed contraction. mean(H*H) forces H to
                # materialize.
                return c + jnp.mean(H * H) + jnp.mean(g * g), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        float(prog(Jp, omega, er, Jfk))  # compile + warmup, host-synced
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(Jp, omega, er, Jfk))  # host transfer = true sync
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
