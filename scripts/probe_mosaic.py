#!/usr/bin/env python
"""Probe Mosaic lowering capabilities needed by the batched banded kernel."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, P = 16, 32


def report(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"OK   {name}: {np.asarray(out).ravel()[:2]}")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


# 1. batched dot_general (B,32,32)@(B,32,32)
def k1(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def t1():
    a = jnp.ones((B, P, P), jnp.float32)
    b = jnp.ones((B, P, P), jnp.float32)
    return pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((B, P, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


# 2. broadcast multiply + lane reduction: (B,32,32)*(B,1,32) sum(-1)
def k2(a_ref, v_ref, o_ref):
    o_ref[:] = jnp.sum(a_ref[:] * v_ref[:][:, None, :], axis=-1)


def t2():
    a = jnp.ones((B, P, P), jnp.float32)
    v = jnp.full((B, P), 2.0, jnp.float32)
    return pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((B, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, v)


# 3. value .at[].set with static col index on (B,32,32)
def k3(a_ref, o_ref):
    x = a_ref[:]
    for j in range(4):
        x = x.at[:, :, j].set(x[:, :, j] * 2.0)
    o_ref[:] = x


def t3():
    a = jnp.ones((B, P, P), jnp.float32)
    return pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((B, P, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)


# 4. DMA: ANY-space input, copy row n into VMEM scratch ring via fori_loop
def k4(x_hbm, o_ref, buf, sem):
    N = 4

    def body(n, _):
        dma = pltpu.make_async_copy(x_hbm.at[n], buf.at[n % 2], sem)
        dma.start()
        dma.wait()
        o_ref[n] = buf[n % 2] + 1.0
        return 0

    jax.lax.fori_loop(0, N, body, 0)


def t4():
    x = jnp.arange(4 * B * P, dtype=jnp.float32).reshape(4, B, P)
    return pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((4, B, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, B, P), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)


# 5. dynamic ring indexing of VMEM scratch inside fori_loop (read+write)
def k5(a_ref, o_ref, ring):
    N = 6

    def body(n, _):
        prev = ring[(n + 2) % 3]  # read oldest
        ring[n % 3] = a_ref[n] + prev
        o_ref[n] = ring[n % 3]
        return 0

    ring[0] = jnp.zeros_like(ring[0])
    ring[1] = jnp.zeros_like(ring[1])
    ring[2] = jnp.zeros_like(ring[2])
    jax.lax.fori_loop(0, N, body, 0)


def t5():
    a = jnp.ones((6, B, P), jnp.float32)
    return pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((6, B, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, B, P), jnp.float32)],
    )(a)


# 6. DMA VMEM scratch row -> ANY-space OUTPUT row (dynamic index)
def k6(x_ref, o_hbm, buf, sem):
    N = 4

    def body(n, _):
        buf[0] = x_ref[n] * 3.0
        dma = pltpu.make_async_copy(buf.at[0], o_hbm.at[n], sem)
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(0, N, body, 0)


def t6():
    x = jnp.ones((4, B, P), jnp.float32)
    return pl.pallas_call(
        k6, out_shape=jax.ShapeDtypeStruct((4, B, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((1, B, P), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)


# 7. batched matvec via dot_general (B,32,32)@(B,32)
def k7(a_ref, v_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def t7():
    a = jnp.ones((B, P, P), jnp.float32)
    v = jnp.full((B, P), 2.0, jnp.float32)
    return pl.pallas_call(
        k7, out_shape=jax.ShapeDtypeStruct((B, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, v)


# 8. transpose of batched (B,32,32) on last two axes
def k8(a_ref, o_ref):
    o_ref[:] = jnp.swapaxes(a_ref[:], -1, -2)


def t8():
    a = jnp.arange(B * P * P, dtype=jnp.float32).reshape(B, P, P)
    return pl.pallas_call(
        k8, out_shape=jax.ShapeDtypeStruct((B, P, P), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)


if __name__ == "__main__":
    for name, t in [("batched_dot", t1), ("bcast_mul_lane_reduce", t2),
                    ("value_at_set_static", t3), ("dma_hbm_ring", t4),
                    ("ring_dyn_index", t5), ("dma_out_any", t6),
                    ("batched_matvec", t7), ("batched_transpose", t8)]:
        report(name, t)
