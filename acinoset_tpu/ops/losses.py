"""Robust losses and their IRLS weights, pure JAX.

The redescending loss reproduces the reference formula exactly
(AcinoSet src/build.py:380-395, used by FTE at
src/all_optimizations.py:31,497): a sigmoid-blended piecewise cost that
is quadratic for |e|<a, linear to b, descending to c, constant beyond.
We additionally provide the analytic influence function and the
Gauss-Newton IRLS weight w(e)=psi(e)/e that the TPU FTE solver uses in
place of IPOPT's line-searched exact objective.
"""
from __future__ import annotations

import jax.numpy as jnp


def _step(start, x):
    """Logistic step 1/(1+e^{-(x-start)}) (src/build.py:382-383)."""
    return 1.0 / (1.0 + jnp.exp(-(x - start)))


def _piece(start, end, x):
    return _step(start, x) - _step(end, x)


def redescending_loss(err, a, b, c):
    """Exact reference redescending cost (src/build.py:388-395)."""
    e = jnp.abs(err)
    cost = (1.0 - _step(a, e)) / 2.0 * e**2
    cost += _piece(a, b, e) * (a * e - (a**2) / 2.0)
    cost += _piece(b, c, e) * (
        a * b - (a**2) / 2.0 + (a * (c - b) / 2.0) * (1.0 - ((c - e) / (c - b)) ** 2)
    )
    cost += _step(c, e) * (a * b - (a**2) / 2.0 + (a * (c - b) / 2.0))
    return cost


def redescending_weight(err, a, b, c, eps: float = 1e-9):
    """IRLS weight w = psi(|e|)/|e| for the *ideal* (un-blended) piecewise
    redescending psi: psi=e for e<a; a for a<e<b; a(c-e)/(c-b) for b<e<c; 0 beyond.

    Used by the Gauss-Newton FTE solver: minimizing
    sum w(e_k) * e_k^2 / 2 with frozen weights is the standard IRLS
    majorizer of the robust cost.
    """
    e = jnp.abs(err)
    w_quad = jnp.ones_like(e)
    w_lin = a / jnp.maximum(e, eps)
    w_desc = a * jnp.clip((c - e) / (c - b), 0.0, 1.0) / jnp.maximum(e, eps)
    w = jnp.where(e <= a, w_quad, jnp.where(e <= b, w_lin, w_desc))
    return w


def cauchy_loss(err, f_scale):
    """rho(e) = f^2/2 * log(1 + (e/f)^2) — scipy's 'cauchy' with f_scale
    (src/calib/calib.py:335). scipy applies rho to squared residuals with
    an overall 1/2; this form has rho''(0)=1 matching least_squares."""
    z = (err / f_scale) ** 2
    return 0.5 * f_scale**2 * jnp.log1p(z)


def cauchy_weight(err, f_scale):
    """IRLS weight for the Cauchy loss: w = 1 / (1 + (e/f)^2)."""
    return 1.0 / (1.0 + (err / f_scale) ** 2)


def huber_loss(err, delta):
    e = jnp.abs(err)
    quad = 0.5 * e**2
    lin = delta * (e - 0.5 * delta)
    return jnp.where(e <= delta, quad, lin)


def huber_weight(err, delta, eps: float = 1e-9):
    e = jnp.abs(err)
    return jnp.where(e <= delta, jnp.ones_like(e), delta / jnp.maximum(e, eps))
