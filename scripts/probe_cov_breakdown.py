#!/usr/bin/env python
"""Where does the ~41 ms uncertainty pass go? (VERDICT r4 item 7 —
the absolute cost did not move when the two RGF scans merged into one
width-2 vmapped scan, so the scans may not dominate at all.)

Times, each as a K-chain inside one jit with host-transfer sync
(CLAUDE.md timing rules), on the flagship shapes B=96 N=100 P=25:

  s1  RGF marginal covariance, single system per run
  s2  RGF pair (width-2 vmap, the production form since r5)
  s3  the H-band re-assembly feeding it (hessian_bands equivalent:
      diagonal scatter + band scaling)
  s4  the marker-space diagnosis einsums (direct-diagonal form)

Run on TPU: python scripts/probe_cov_breakdown.py | tee docs/r05/probe_cov_breakdown.txt
Env: COV_STEP=unrolled|blocked selects the forward-scan factorization.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.solvers.banded import block_banded_marginal_covariance

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    P = 25
    K = int(os.environ.get("BENCH_CHAIN", 30))
    L = 20
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # SPD-ish Jacobi-scaled bands (unit diagonal + small off-diag)
    b0 = np.eye(P)[None, None] + 0.05 * rng.normal(size=(B, N, P, P))
    b0 = 0.5 * (b0 + b0.transpose(0, 1, 3, 2)) + 3.0 * np.eye(P)[None, None]
    bands = [jnp.asarray(b0, dtype)] + [
        jnp.asarray(0.05 * rng.normal(size=(B, N, P, P)), dtype) for _ in range(3)
    ]
    Jfk = jnp.asarray(rng.normal(size=(B, N, L, 3, P)), dtype)
    ridge = 1e-6

    def timed(name, prog, *args):
        f = jax.jit(prog)
        float(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s}: {min(ts) / K * 1e3:8.3f} ms/call")

    def chain(fn):
        def prog(*args):
            def body(c, _):
                out = fn(c, *args)
                return out, ()
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out
        return prog

    def s1(c, *bs):
        bs = [bs[0] * (1.0 + 1e-6 * jnp.cos(c + 1.0))] + list(bs[1:])
        Z = jax.vmap(lambda a, b, d, e: block_banded_marginal_covariance(
            [a, b, d, e]))(*bs)
        return c + jnp.mean(Z * Z)

    def s2(c, *bs):
        b0p = bs[0] * (1.0 + 1e-6 * jnp.cos(c + 1.0))
        eye = jnp.eye(P, dtype=dtype)
        pair0 = jnp.stack([b0p, b0p + ridge * eye], 1)  # (B, 2, N, P, P)
        rest = [jnp.stack([bk, bk], 1) for bk in bs[1:]]
        Z = jax.vmap(jax.vmap(
            lambda a, b, d, e: block_banded_marginal_covariance([a, b, d, e])
        ))(pair0, *rest)
        return c + jnp.mean(Z * Z)

    def s3(c, *bs):
        """band scale + pad-pin + diagonal ridge (the prep work around
        the scan in trajopt's compute_cov)"""
        b0p = bs[0] * (1.0 + 1e-6 * jnp.cos(c + 1.0))
        diag = b0p[..., jnp.arange(P), jnp.arange(P)]
        s = jax.lax.rsqrt(jnp.maximum(diag, 1e-20))
        zpad = jnp.zeros((B, 3, P), dtype)
        sh = [s] + [jnp.concatenate([zpad[:, :k], s[:, :-k]], 1) for k in (1, 2, 3)]
        out = [bk * s[..., :, None] * sh[k][..., None, :]
               for k, bk in enumerate([b0p] + list(bs[1:]))]
        return c + sum(jnp.mean(o * o) for o in out)

    def s4(c, b0, *_rest):
        pose_cov = b0 * (1.0 + 1e-6 * jnp.cos(c + 1.0))
        v1 = jnp.einsum("znlxa,znab,znlxb->znlx", Jfk, pose_cov, Jfk)
        v2 = jnp.einsum("znlxa,znab,znlxb->znlx", Jfk, pose_cov + 1e-6, Jfk)
        rel = (v1 - v2) / jnp.maximum(2.0 * v1 - v2, 1e-30)
        return c + jnp.mean(rel * rel)

    timed("s1_single", chain(s1), *bands)
    timed("s2_pair", chain(s2), *bands)
    timed("s3_prep", chain(s3), *bands)
    timed("s4_marker", chain(s4), *bands)


if __name__ == "__main__":
    main()
