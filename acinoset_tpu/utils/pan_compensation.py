"""Rotating-camera-rig pan compensation (src/pan_compensation.py twin).

The AcinoSet rotating rig logs an encoder count per frame; points
reconstructed in the rotating frame are de-rotated about the z axis.
Encoder scale: 102000 counts per revolution (src/pan_compensation.py:29).
Vectorized over points/angles (the reference rotated one point at a
time with an explicit Euler-Rodrigues formula, :4-23).
"""
from __future__ import annotations

import jax.numpy as jnp

COUNTS_PER_REV = 102000.0


def count_to_rad(encoder_count):
    """Encoder counts -> radians (src/pan_compensation.py:25-29)."""
    return jnp.asarray(encoder_count) * (2.0 * jnp.pi / COUNTS_PER_REV)


def rotate_point(points, theta):
    """Rotate points (..., 3) about the z axis by theta (scalar or
    broadcastable (...,)) — Euler-Rodrigues twin of
    src/pan_compensation.py:4-23."""
    points = jnp.asarray(points)
    theta = jnp.asarray(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    x = c * points[..., 0] - s * points[..., 1]
    y = s * points[..., 0] + c * points[..., 1]
    return jnp.stack([x, y, points[..., 2]], axis=-1)
