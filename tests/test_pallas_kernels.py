"""Pallas banded kernel vs dense solves (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from acinoset_tpu.kernels.banded_pallas import banded_solve_pallas
from test_banded import make_spd_banded


def _batch_case(rng, B, N, P):
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
    return bands_b, jnp.asarray(np.stack(gs), jnp.float32), np.stack(refs)


def test_pallas_banded_matches_dense(rng):
    B, N, P = 3, 11, 5
    bands_b, g_b, ref = _batch_case(rng, B, N, P)
    x = np.asarray(banded_solve_pallas(bands_b, g_b, batch_tile=3, interpret=True))
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


def test_pallas_banded_batch_padding(rng):
    """B not divisible by the tile: the wrapper pads with identity systems."""
    B, N, P = 5, 7, 4
    bands_b, g_b, ref = _batch_case(rng, B, N, P)
    x = np.asarray(banded_solve_pallas(bands_b, g_b, batch_tile=2, interpret=True))
    assert x.shape == (B, N, P)
    assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_banded_ill_conditioned_fte_like(rng):
    """NS inverses must stay accurate on the system the FTE actually
    solves: Jacobi-scaled third-difference stencil + small LM damping
    (kappa ~ 1/damping). Held to residual parity with the f32 unrolled
    Cholesky path rather than absolute accuracy (both err ~ kappa*eps)."""
    import jax.numpy as jnp

    from acinoset_tpu.solvers.banded import banded_matvec, block_banded_solve_unrolled
    from acinoset_tpu.solvers.trajopt import _d3_gram_bands

    N, P, damp = 64, 25, 1e-5
    gram = _d3_gram_bands(N, Ts=1.0 / 90.0)  # (4, N) — huge dynamic range
    bands = []
    for k in range(4):
        Bk = np.zeros((N, P, P), np.float64)
        Bk[:, np.arange(P), np.arange(P)] = gram[k][:, None]
        bands.append(Bk)
    # frame-local measurement-ish coupling so blocks are dense
    M = rng.normal(size=(N, 8, P))
    bands[0] = bands[0] + np.einsum("nmi,nmj->nij", M, M)
    diag = bands[0][:, np.arange(P), np.arange(P)].copy()
    bands[0][:, np.arange(P), np.arange(P)] += damp * diag
    # Jacobi scale to unit diagonal (as solvers/trajopt.py does)
    s = 1.0 / np.sqrt(bands[0][:, np.arange(P), np.arange(P)])
    shift = [s]
    for k in range(1, 4):
        shift.append(np.concatenate([np.zeros((k, P)), s[:-k]], axis=0))
    bands = [bands[k] * s[:, :, None] * shift[k][:, None, :] for k in range(4)]
    g = rng.normal(size=(N, P))

    jb = [jnp.asarray(b, jnp.float32) for b in bands]
    jg = jnp.asarray(g, jnp.float32)
    x_un = block_banded_solve_unrolled(jb, jg)
    x_pl = banded_solve_pallas([b[None] for b in jb], jg[None], interpret=True)[0]

    r_un = float(jnp.linalg.norm(banded_matvec(jb, x_un) - jg))
    r_pl = float(jnp.linalg.norm(banded_matvec(jb, x_pl) - jg))
    gn = float(jnp.linalg.norm(jg))
    assert r_pl < 2.0 * r_un + 1e-4 * gn, (r_pl, r_un, gn)
