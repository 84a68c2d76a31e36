"""Cheetah kinematic model: analytic FK Jacobian."""
import numpy as np
import jax.numpy as jnp

from acinoset_tpu.models import cheetah

def test_fk25_analytic_jacobian_matches_jacfwd(rng):
    """The geometric FK Jacobian (cross products about per-joint world
    axes) equals jax.jacfwd of the FK chain at machine precision."""
    import jax

    for _ in range(5):
        x = jnp.asarray(rng.normal(scale=0.7, size=25))
        p_ref = cheetah.fk25(x)
        J_ref = jax.jacfwd(cheetah.fk25)(x)
        p, J = cheetah.fk25_and_jac(x)
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-12)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-12)
