"""SO(3) primitives in pure JAX.

Conventions follow the reference kinematic model (AcinoSet
src/all_optimizations.py:66-91 and src/build.py:397-453): ``rot_x/y/z``
are *frame* rotations (direction-cosine matrices mapping inertial-frame
vectors into the rotated frame), i.e. the transpose of the usual active
rotation. The Rodrigues exp/log maps replace cv2.Rodrigues
(src/calib/calib.py:134,349,373).

Everything is dtype-polymorphic and shape-polymorphic over leading batch
dimensions where noted; scalar-angle functions broadcast elementwise, so
they vmap/jit cleanly on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def mm3(A, B):
    """(.., 3, 3) @ (.., 3, 3) as broadcast-multiply-reduce.

    Under vmap a 3x3 ``@`` lowers to a batched dot_general with
    contraction dim 3 ≪ 128 — a layout liability on TPU (a bf16 relayout
    copy per product; measured 3.3x slower at the measurement-stage
    level, scripts/probe_meas.py, docs/trace_r4/SUMMARY.md). The
    multiply-reduce form fuses into plain f32 VPU work.
    """
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def mvT3(R, v):
    """``R^T @ v`` for (.., 3, 3) and (.., 3), as multiply-reduce (mm3)."""
    return jnp.sum(R * v[..., :, None], axis=-2)


def mv3(R, v):
    """``R @ v`` for (.., 3, 3) and (.., 3), as multiply-reduce (mm3)."""
    return jnp.sum(R * v[..., None, :], axis=-1)


def rot_x(a):
    """Frame rotation about x. a: scalar or (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, s], axis=-1),
            jnp.stack([z, -s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(a):
    """Frame rotation about y. a: scalar or (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, -s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(a):
    """Frame rotation about z. a: scalar or (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, s, z], axis=-1),
            jnp.stack([-s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rvec):
    """so(3) exponential map: rotation vector (..., 3) -> matrix (..., 3, 3).

    Matches cv2.Rodrigues for vector->matrix. Safe at theta ~ 0 via a
    Taylor-guarded sinc formulation (no data-dependent branching, so it
    jits on TPU).
    """
    rvec = jnp.asarray(rvec)
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(theta2)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near zero
    small = theta2 < 1e-12
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    kx, ky, kz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    z = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([z, -kz, ky], axis=-1),
            jnp.stack([kz, z, -kx], axis=-1),
            jnp.stack([-ky, kx, z], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + sinc * K + cosc * (K @ K)


def rodrigues_inv(R):
    """so(3) log map: rotation matrix (..., 3, 3) -> vector (..., 3).

    Matches cv2.Rodrigues for matrix->vector on non-degenerate inputs;
    handles theta ~ 0 smoothly and theta ~ pi via the diagonal formula.
    """
    R = jnp.asarray(R)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # antisymmetric part -> axis * sin(theta)
    w = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-6
    scale = jnp.where(small, 1.0 + theta**2 / 6.0, theta / jnp.where(small, 1.0, sin_t))
    generic = w * scale[..., None]
    # near pi: axis from diagonal, signs from off-diagonals
    axis2 = jnp.clip((jnp.diagonal(R, axis1=-2, axis2=-1) - cos_t[..., None]) / (1.0 - cos_t[..., None] + 1e-12), 0.0, None)
    axis = jnp.sqrt(axis2)
    signs = jnp.stack(
        [
            jnp.ones_like(theta),
            jnp.sign(R[..., 0, 1] + R[..., 1, 0] + 1e-30),
            jnp.sign(R[..., 0, 2] + R[..., 2, 0] + 1e-30),
        ],
        axis=-1,
    )
    near_pi_vec = axis * signs * theta[..., None]
    return jnp.where((theta > jnp.pi - 1e-3)[..., None], near_pi_vec, generic)
