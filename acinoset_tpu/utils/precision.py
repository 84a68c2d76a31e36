"""Matmul-precision control for TPU.

On TPU, float32 matmuls run on the MXU with bfloat16 operand passes by
default — fine for neural nets, not for Gauss-Newton normal equations
and Cholesky solves (the FTE banded system spans ~1e7 dynamic range).
`f32_matmuls` pins full-float32 (3-pass) MXU precision for everything
traced inside the decorated function; the blocks involved are tiny
(25x25), so the 3x pass cost is negligible against the accuracy win
(verified: without it, bench marker error degrades 0.007 m -> 0.08 m).
"""
from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace `fn` under full-float32 matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
