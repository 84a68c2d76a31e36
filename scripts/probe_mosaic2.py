#!/usr/bin/env python
"""Second Mosaic probe round: patterns needed by the batched banded kernel.

1. 4-D VMEM ref with dynamic leading index (read+write)
2. writing into an INPUT ref (used as factor scratch)
3. transposed-contraction batched matvec (F^T x without explicit transpose)
4. timing: chain of batched (TB,32,32) matmuls at HIGHEST precision,
   for TB in {1,2,4,8} — is batched dot vectorized or serialized?
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"OK   {name}: {np.asarray(out).ravel()[:2]}")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


TB, P = 4, 32


# 1. 4-D dynamic leading index read+write on scratch
def k1(a_ref, o_ref, s_ref):
    def body(n, _):
        prev = s_ref[jnp.maximum(n - 1, 0)]  # (TB, P, P)
        s_ref[n] = a_ref[n] + jnp.where(n >= 1, prev, jnp.zeros_like(prev))
        o_ref[n] = s_ref[n]
        return 0

    jax.lax.fori_loop(0, 5, body, 0)


def t1():
    a = jnp.ones((5, TB, P, P), jnp.float32)
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((5, TB, P, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((5, TB, P, P), jnp.float32)],
    )(a)


# 2. write into an input ref, then read back (factor-in-place pattern)
def k2(a_ref, o_ref):
    def body(n, _):
        a_ref[n] = a_ref[n] * 2.0 + jnp.where(
            n >= 1, a_ref[jnp.maximum(n - 1, 0)], jnp.zeros((TB, P, P), jnp.float32)
        )
        return 0

    jax.lax.fori_loop(0, 5, body, 0)
    o_ref[:] = a_ref[:]


def t2():
    a = jnp.ones((5, TB, P, P), jnp.float32)
    return pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((5, TB, P, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)


# 3. transposed-contraction batched matvec: y[b,j] = sum_i A[b,i,j] x[b,i]
def k3(a_ref, v_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], v_ref[:], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def t3():
    a = jnp.arange(TB * P * P, dtype=jnp.float32).reshape(TB, P, P) / 100.0
    v = jnp.ones((TB, P), jnp.float32)
    out = pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((TB, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, v)
    want = jnp.einsum("bij,bi->bj", a, v)
    assert np.allclose(np.asarray(out), np.asarray(want)), "wrong result"
    return out


# 4. timing: K-step chain of batched matmuls inside one kernel
def chain_kernel(a_ref, o_ref, *, K, prec):
    def body(k, x):
        return jax.lax.dot_general(
            a_ref[:], x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        )

    o_ref[:] = jax.lax.fori_loop(0, K, body, a_ref[:])


def time_chain(tb, K=2000, prec=jax.lax.Precision.HIGHEST):
    a = (jnp.eye(P, dtype=jnp.float32)[None] * 0.999).repeat(tb, 0)
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(chain_kernel, K=K, prec=prec),
        out_shape=jax.ShapeDtypeStruct((tb, P, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    f(a).block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f(a).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ns_per_op = min(ts) / K * 1e9
    print(f"TIME batched_matmul_chain TB={tb} prec={prec}: {ns_per_op:.0f} ns/op")


if __name__ == "__main__":
    report("dyn4d_scratch", t1)
    report("write_input_ref", t2)
    report("matvec_transposed_contract", t3)
    for tb in (1, 2, 4, 8):
        try:
            time_chain(tb)
        except Exception as e:
            print(f"FAIL chain TB={tb}: {str(e).splitlines()[0][:160]}")
    try:
        time_chain(8, prec=jax.lax.Precision.DEFAULT)
    except Exception as e:
        print(f"FAIL chain TB=8 default: {str(e).splitlines()[0][:160]}")
