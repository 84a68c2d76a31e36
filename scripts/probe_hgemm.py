#!/usr/bin/env python
"""Measure formulations of the measurement-Hessian GEMM
H = einsum('nlxa,nlxb->nab', Jfk, G) — after the r4 FK multiply-reduce
rewrite this is the single hottest device op (13.9 ms/solve = 23.8% of
device self time at 117 GB/s, docs/trace_r4b) while the pcg matvec next
to it streams at 608 GB/s. Contraction K = L*3 = 60 < 128, so the MXU
tile is underfilled; the question is whether a different lowering
(merged contraction axis, pre-transposed operands, pinned f32, pure VPU
broadcast-reduce, explicit bf16) beats XLA's default choice.

Timing per the r4 rule (CLAUDE.md): K>=120-deep scan chain,
non-separable carry perturbation, quadratic consumption, host-transfer
sync. Run on the TPU: python scripts/probe_hgemm.py
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
    K = int(os.environ.get("BENCH_CHAIN", 120))
    M = B * N
    L, X, P = 20, 3, 25
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.normal(size=(M, L, X, P)), dtype)
    G = jnp.asarray(rng.normal(size=(M, L, X, P)), dtype)

    def v0_einsum(Jx, Gx):
        return jnp.einsum("nlxa,nlxb->nab", Jx, Gx)

    def v1_reshape_dot(Jx, Gx):
        Jr = Jx.reshape(M, L * X, P)
        Gr = Gx.reshape(M, L * X, P)
        return jax.lax.dot_general(Jr, Gr, (((1,), (1,)), ((0,), (0,))))

    def v2_pretranspose(Jx, Gx):
        JrT = Jx.reshape(M, L * X, P).transpose(0, 2, 1)
        Gr = Gx.reshape(M, L * X, P)
        return jnp.matmul(JrT, Gr)

    def v3_f32_pinned(Jx, Gx):
        return jnp.einsum(
            "nlxa,nlxb->nab", Jx, Gx, precision=jax.lax.Precision.HIGHEST
        )

    def v4_vpu_bcast(Jx, Gx):
        # pure broadcast-multiply-reduce over the (l, x) axes: XLA fuses
        # the (M, L, X, P, P) intermediate into the reduction loop
        return jnp.sum(Jx[..., :, None] * Gx[..., None, :], axis=(1, 2))

    def v5_bf16(Jx, Gx):
        Jr = Jx.reshape(M, L * X, P).astype(jnp.bfloat16)
        Gr = Gx.reshape(M, L * X, P).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            Jr, Gr, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def v6_split_x(Jx, Gx):
        # three K=20 GEMMs summed: contraction per x slice
        return sum(
            jnp.einsum("nla,nlb->nab", Jx[:, :, x], Gx[:, :, x])
            for x in range(X)
        )

    variants = {
        "v0_einsum": v0_einsum,
        "v1_reshape_dot": v1_reshape_dot,
        "v2_pretranspose": v2_pretranspose,
        "v3_f32_pinned": v3_f32_pinned,
        "v4_vpu_bcast": v4_vpu_bcast,
        "v5_bf16": v5_bf16,
        "v6_split_x": v6_split_x,
    }

    ref = None
    for name, fn in variants.items():

        @jax.jit
        def prog(J, G, fn=fn):
            def body(c, _):
                Jp = J * (1.0 + 1e-6 * jnp.cos(J * (c + 1.0)))
                Gp = G * (1.0 + 1e-6 * jnp.sin(G * (c + 1.0)))
                H = fn(Jp, Gp)
                return c + jnp.mean(H * H), ()

            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        float(prog(J, G))  # compile + warmup, host-synced
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(J, G))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K * 1e3
        H = np.asarray(jax.jit(fn)(J, G))
        if ref is None:
            ref = H
            dh = 0.0
        else:
            dh = float(np.max(np.abs(H - ref)) / np.abs(ref).max())
        print(f"{name:16s}: {per:7.3f} ms/call (M={M})  (rel dH={dh:.2e})")


if __name__ == "__main__":
    main()
