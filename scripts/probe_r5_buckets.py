#!/usr/bin/env python
"""Round-5 bucket probe (VERDICT r4 item 2a): the VPU H/g assembly's
A/G broadcast-reduce bucket ran at 360 GB/s in the r4 trace (8.66 ms,
docs/trace_r4b/SUMMARY.md) — half the streaming rate of the pcg matvec.
The suspects are the 6-d expanded-intermediate reduces:

    A = sum(Jw[..., :, None] * Jp[..., None, :], axis=(1, 3))
        # (B*N, C, L, 2, 3, 3) virtual intermediate
    G = sum(A[..., None] * Jfk[:, :, None, :, :], axis=3)
        # (B*N, L, 3, 3, P) virtual intermediate

Each variant below replaces one or both with a STATIC python-loop
unroll over the 3-wide contraction axis — fused multiply-adds over
contiguous arrays, no expanded-dim reduce — keeping the K=60 GEMM
identical. Timing: K-chain inside one jit, non-separable perturbation,
quadratic consumption, host-transfer sync (probe_assembly.py pattern —
per-call tunnel timings under-report ~50x, CLAUDE.md).

Run on TPU: python scripts/probe_r5_buckets.py | tee docs/r05/probe_buckets_a.txt
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
    C, L, P = 6, 20, 25
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    Jp = jnp.asarray(rng.normal(size=(B, N, C, L, 2, 3)), dtype)
    Jfk = jnp.asarray(rng.normal(size=(B, N, L, 3, P)), dtype)
    omega = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, N, C, L, 2)), dtype)
    er = jnp.asarray(rng.normal(size=(B, N, C, L, 2)), dtype)

    def k60(Jfk, G):
        Bz, Nz = Jfk.shape[:2]
        Jr = Jfk.reshape(Bz, Nz, -1, Jfk.shape[-1])
        Gr = G.reshape(Bz, Nz, -1, G.shape[-1])
        return jax.lax.dot_general(Jr, Gr, (((2,), (2,)), ((0, 1), (0, 1))))

    def grads(Jp, er, Jfk):
        bv = jnp.einsum("znclui,znclu->znli", Jp, er,
                        precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("znlxa,znlx->zna", Jfk, bv,
                       precision=jax.lax.Precision.HIGHEST)
        return g

    def w0_current(Jp, omega, er, Jfk):
        """production vpu path (trajopt.meas_normal_pieces)"""
        Jw = Jp * omega[..., None]
        A = jnp.sum(Jw[..., :, None] * Jp[..., None, :], axis=(2, 4))
        G = jnp.sum(A[..., None] * Jfk[:, :, :, None, :, :], axis=4)
        return k60(Jfk, G), grads(Jp, er, Jfk)

    def w1_g(Jp, omega, er, Jfk):
        Jw = Jp * omega[..., None]
        A = jnp.sum(Jw[..., :, None] * Jp[..., None, :], axis=(2, 4))
        # G[z,n,l,x,p] = sum_y A[z,n,l,x,y] Jfk[z,n,l,y,p]
        G = sum(
            A[..., y:y + 1] * Jfk[:, :, :, None, y, :] for y in range(3)
        )
        return k60(Jfk, G), grads(Jp, er, Jfk)

    def w2_a(Jp, omega, er, Jfk):
        # A[z,n,l,i,j] = sum_{c,u} Jw[z,n,c,l,u,i] Jp[z,n,c,l,u,j]
        Jw = Jp * omega[..., None]
        A = jnp.stack(
            [jnp.sum(Jw[..., i:i + 1] * Jp, axis=(2, 4)) for i in range(3)],
            axis=-2,
        )
        G = jnp.sum(A[..., None] * Jfk[:, :, :, None, :, :], axis=4)
        return k60(Jfk, G), grads(Jp, er, Jfk)

    def w3_both(Jp, omega, er, Jfk):
        Jw = Jp * omega[..., None]
        A = jnp.stack(
            [jnp.sum(Jw[..., i:i + 1] * Jp, axis=(2, 4)) for i in range(3)],
            axis=-2,
        )
        G = sum(
            A[..., y:y + 1] * Jfk[:, :, :, None, y, :] for y in range(3)
        )
        return k60(Jfk, G), grads(Jp, er, Jfk)

    def w4_skipA(Jp, omega, er, Jfk):
        """contract A INTO G without materializing A's (3,3):
        G[...,x,p] = sum_{c,u} Jw[...,x] * (sum_y Jp[...,y] Jfk[..y,p])
        — Jp projected through Jfk once (Ypx, (B,N,C,L,2,P)), then one
        12-wide reduce per x. Trades the A+G pair for ONE bigger
        intermediate (the thing r2 rejected as 'full J' — upper bound
        check at current shapes)."""
        Jw = Jp * omega[..., None]
        Y = sum(
            Jp[..., y:y + 1] * Jfk[:, :, None, :, None, y, :] for y in range(3)
        )  # (B,N,C,L,2,P)
        G = jnp.stack(
            [jnp.sum(Jw[..., x:x + 1] * Y, axis=(2, 4)) for x in range(3)],
            axis=-2,
        )  # (B,N,L,3,P)
        return k60(Jfk, G), grads(Jp, er, Jfk)

    def _pack_gemm(Jfk, G, F):
        """Block-diagonal frame packing: the K=60 GEMM is MXU-occupancy
        bound (117 GB/s, 25x25 output tiles underfill the 128x128
        array) — pack F frames' (60, 25) operands into one
        (60F, 25F) block-diagonal pair. The GEMM then computes F^2
        blocks of which only the F diagonal ones are wanted (F x padded
        FLOPs — all zeros off-diagonal), but tiles fill (25F/128)^2 of
        the array instead of (25/128)^2."""
        Bz, Nz = Jfk.shape[:2]
        Jr = Jfk.reshape(Bz, Nz, -1, Jfk.shape[-1])
        Gr = G.reshape(Bz, Nz, -1, G.shape[-1])
        M = Nz // F
        K_, P_ = Jr.shape[2], Jr.shape[3]

        def pack(X):
            Xm = X.reshape(Bz, M, F, K_, P_)
            # (B, M, F*K, F*P) block-diagonal
            blocks = []
            for f in range(F):
                row = [
                    Xm[:, :, f] if g == f else jnp.zeros_like(Xm[:, :, f])
                    for g in range(F)
                ]
                blocks.append(jnp.concatenate(row, axis=-1))
            return jnp.concatenate(blocks, axis=-2)

        Jb, Gb = pack(Jr), pack(Gr)
        Hb = jax.lax.dot_general(Jb, Gb, (((2,), (2,)), ((0, 1), (0, 1))))
        Hs = [
            Hb[:, :, f * P_:(f + 1) * P_, f * P_:(f + 1) * P_]
            for f in range(F)
        ]
        return jnp.stack(Hs, axis=2).reshape(Bz, Nz, P_, P_)

    def w5_pack2(Jp, omega, er, Jfk):
        Jw = Jp * omega[..., None]
        A = jnp.sum(Jw[..., :, None] * Jp[..., None, :], axis=(2, 4))
        G = jnp.sum(A[..., None] * Jfk[:, :, :, None, :, :], axis=4)
        return _pack_gemm(Jfk, G, 2), grads(Jp, er, Jfk)

    def w6_pack5(Jp, omega, er, Jfk):
        Jw = Jp * omega[..., None]
        A = jnp.sum(Jw[..., :, None] * Jp[..., None, :], axis=(2, 4))
        G = jnp.sum(A[..., None] * Jfk[:, :, :, None, :, :], axis=4)
        return _pack_gemm(Jfk, G, 5), grads(Jp, er, Jfk)

    variants = {
        "w0_current": w0_current, "w1_g_unroll": w1_g,
        "w2_a_unroll": w2_a, "w3_both": w3_both, "w4_skipA": w4_skipA,
        "w5_pack2": w5_pack2, "w6_pack5": w6_pack5,
    }
    ref = None
    for name, fn in variants.items():
        @jax.jit
        def prog(Jp, omega, er, Jfk, fn=fn):
            def body(c, _):
                om = omega * (1.0 + 1e-6 * jnp.cos(omega * (c + 1.0)))
                H, g = fn(Jp, om, er, Jfk)
                return c + jnp.mean(H * H) + jnp.mean(g * g), ()
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out

        float(prog(Jp, omega, er, Jfk))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(Jp, omega, er, Jfk))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / K * 1e3
        H, g = jax.jit(fn)(Jp, omega, er, Jfk)
        if ref is None:
            ref = (np.asarray(H), np.asarray(g))
            dh = 0.0
        else:
            dh = float(np.max(np.abs(np.asarray(H) - ref[0])) / np.abs(ref[0]).max())
        print(f"{name:12s}: {per:7.3f} ms/assembly  (rel dH={dh:.2e})")


if __name__ == "__main__":
    main()
