"""Pallas banded kernel vs dense solves (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from acinoset_tpu.kernels.banded_pallas import banded_solve_pallas
from test_banded import make_spd_banded


def test_pallas_banded_matches_dense(rng):
    B, N, P = 3, 11, 5
    bandss, gs, refs = [], [], []
    for _ in range(B):
        A, bands = make_spd_banded(rng, N, P)
        g = rng.normal(size=(N, P))
        bandss.append(bands)
        gs.append(g)
        refs.append(np.linalg.solve(A, g.reshape(-1)).reshape(N, P))
    bands_b = [
        jnp.asarray(np.stack([bandss[b][k] for b in range(B)]), jnp.float32)
        for k in range(4)
    ]
    x = np.asarray(banded_solve_pallas(bands_b, jnp.asarray(np.stack(gs), jnp.float32),
                                       interpret=True))
    ref = np.stack(refs)
    assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_banded_p25(rng):
    """The FTE production shape (P=25 padded to 32)."""
    B, N, P = 2, 8, 25
    A, bands = make_spd_banded(rng, N, P)
    g = rng.normal(size=(N, P))
    ref = np.linalg.solve(A, g.reshape(-1)).reshape(N, P)
    bands_b = [jnp.asarray(np.tile(bk[None], (B, 1, 1, 1)), jnp.float32) for bk in bands]
    x = np.asarray(
        banded_solve_pallas(bands_b, jnp.asarray(np.tile(g[None], (B, 1, 1)), jnp.float32),
                            interpret=True)
    )
    for b in range(B):
        assert np.abs(x[b] - ref).max() / np.abs(ref).max() < 1e-5
