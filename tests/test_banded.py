"""Block-banded Cholesky vs dense NumPy reference."""
import numpy as np
import jax.numpy as jnp

from acinoset_tpu.solvers import banded


def make_spd_banded(rng, N=12, P=5, q=3):
    bands = [rng.normal(size=(N, P, P)) for _ in range(q + 1)]
    for k in range(1, q + 1):
        bands[k][:k] = 0.0
    # dense assembly
    A = np.zeros((N * P, N * P))
    for n in range(N):
        A[n * P : (n + 1) * P, n * P : (n + 1) * P] = bands[0][n]
        for k in range(1, q + 1):
            if n >= k:
                A[n * P : (n + 1) * P, (n - k) * P : (n - k + 1) * P] = bands[k][n]
    A = A + A.T  # symmetrize (diagonal doubled — fine)
    A += np.eye(N * P) * (np.abs(A).sum(axis=1).max() + 1.0)  # diagonally dominant SPD
    # re-extract bands of the SPD matrix
    out = []
    for k in range(q + 1):
        Bk = np.zeros((N, P, P))
        for n in range(k, N):
            Bk[n] = A[n * P : (n + 1) * P, (n - k) * P : (n - k + 1) * P]
        out.append(Bk)
    return A, out


def test_banded_cholesky_solve_matches_dense(rng):
    N, P = 12, 5
    A, bands = make_spd_banded(rng, N, P)
    b = rng.normal(size=(N, P))
    L = banded.block_banded_cholesky([jnp.asarray(B) for B in bands])
    x = np.asarray(banded.block_banded_solve(L, jnp.asarray(b)))
    x_ref = np.linalg.solve(A, b.reshape(-1)).reshape(N, P)
    np.testing.assert_allclose(x, x_ref, atol=1e-9)


def test_banded_matvec(rng):
    N, P = 10, 4
    A, bands = make_spd_banded(rng, N, P)
    x = rng.normal(size=(N, P))
    y = np.asarray(banded.banded_matvec([jnp.asarray(B) for B in bands], jnp.asarray(x)))
    y_ref = (A @ x.reshape(-1)).reshape(N, P)
    np.testing.assert_allclose(y, y_ref, atol=1e-10)


def test_banded_small_n():
    """N smaller than the bandwidth still factors correctly."""
    rng = np.random.default_rng(3)
    A, bands = make_spd_banded(rng, N=3, P=2)
    b = rng.normal(size=(3, 2))
    L = banded.block_banded_cholesky([jnp.asarray(B) for B in bands])
    x = np.asarray(banded.block_banded_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b.reshape(-1)).reshape(3, 2), atol=1e-9)


def test_banded_unrolled_matches_dense(rng):
    import jax.numpy as jnp

    for N, P in [(12, 5), (30, 25), (3, 2)]:
        A, bands = make_spd_banded(rng, N, P)
        b = rng.normal(size=(N, P))
        x = np.asarray(
            banded.block_banded_solve_unrolled([jnp.asarray(B) for B in bands], jnp.asarray(b))
        )
        np.testing.assert_allclose(
            x, np.linalg.solve(A, b.reshape(-1)).reshape(N, P), atol=1e-9
        )


def test_banded_grouped_matches_dense_and_unrolled(rng):
    """3-frame grouped block-tridiagonal solve == dense solve == unrolled
    solve, including N not divisible by 3 (padding path) and N < group."""
    for N, P in [(12, 5), (13, 5), (14, 5), (30, 25), (2, 3)]:
        A, bands = make_spd_banded(rng, N, P)
        b = rng.normal(size=(N, P))
        jb = [jnp.asarray(B) for B in bands]
        x_g = np.asarray(banded.banded_solve_grouped(jb, jnp.asarray(b)))
        x_ref = np.linalg.solve(A, b.reshape(-1)).reshape(N, P)
        np.testing.assert_allclose(x_g, x_ref, atol=1e-9)
        x_u = np.asarray(banded.block_banded_solve_unrolled(jb, jnp.asarray(b)))
        np.testing.assert_allclose(x_g, x_u, atol=1e-9)


def test_banded_cr_matches_dense(rng):
    """Block cyclic reduction == dense solve at f32 round-off, including
    N not divisible by the 3-frame grouping and N < bandwidth."""
    from acinoset_tpu.solvers.cyclic import banded_solve_cr

    for N, P in [(12, 5), (13, 5), (5, 25), (4, 4), (16, 3)]:
        A, bands = make_spd_banded(rng, N, P)
        g = rng.normal(size=(N, P))
        ref = np.linalg.solve(A, g.reshape(-1)).reshape(N, P)
        x = np.asarray(
            banded_solve_cr([jnp.asarray(b, jnp.float32) for b in bands],
                            jnp.asarray(g, jnp.float32))
        )
        rel = np.abs(x - ref).max() / np.abs(ref).max()
        assert rel < 1e-5, (N, P, rel)


def test_banded_pcg_fte_like(rng):
    """Spectral PCG reaches small relative residual in ~16 iterations on
    the system the FTE actually solves (UNscaled: separable smoothness
    term with 1/Ts^4 dynamic range + frame-local measurement blocks +
    small damping)."""
    from acinoset_tpu.solvers.banded import banded_matvec, banded_pcg_solve
    from acinoset_tpu.solvers.trajopt import _d3_gram_bands, _d3_gram_dense

    N, P, Ts = 60, 25, 1.0 / 90.0
    wq = 1.0 / (0.01 + rng.uniform(size=P))  # model weights 1/q
    gram = _d3_gram_bands(N, Ts)
    bands = []
    for k in range(4):
        Bk = np.zeros((N, P, P))
        Bk[:, np.arange(P), np.arange(P)] = 2.0 * gram[k][:, None] * wq[None, :]
        bands.append(Bk)
    M = rng.normal(size=(N, 12, P)) * 50.0  # measurement-scale local blocks
    H = np.einsum("nmi,nmj->nij", M, M)
    bands[0] = bands[0] + H
    diag0 = bands[0][:, np.arange(P), np.arange(P)]
    damp = 1e-4 * diag0
    bands[0][:, np.arange(P), np.arange(P)] += damp
    g = rng.normal(size=(N, P)) * 1e4

    _e, _U = np.linalg.eigh(_d3_gram_dense(N, Ts))
    c = np.maximum((diag0 + damp - 2.0 * gram[0][:, None] * wq[None, :]).mean(0), 1e-12)

    jb = [jnp.asarray(b, jnp.float32) for b in bands]
    x = banded_pcg_solve(
        jb, jnp.asarray(g, jnp.float32),
        jnp.asarray(_U, jnp.float32), jnp.asarray(np.maximum(_e, 0.0), jnp.float32),
        jnp.asarray(wq, jnp.float32), jnp.asarray(c, jnp.float32),
        num_iters=16,
    )
    r = np.asarray(banded_matvec(jb, x)) - g
    rel = np.linalg.norm(r) / np.linalg.norm(g)
    assert rel < 1e-3, rel

    # and the solution itself matches the dense solve to GN-step accuracy
    A = np.zeros((N * P, N * P))
    for n in range(N):
        A[n * P : (n + 1) * P, n * P : (n + 1) * P] = bands[0][n]
        for k in range(1, 4):
            if n >= k:
                blk = bands[k][n]
                A[n * P : (n + 1) * P, (n - k) * P : (n - k + 1) * P] = blk
                A[(n - k) * P : (n - k + 1) * P, n * P : (n + 1) * P] = blk.T
    x_ref = np.linalg.solve(A, g.reshape(-1)).reshape(N, P)
    num = np.linalg.norm(np.asarray(x) - x_ref)
    den = np.linalg.norm(x_ref)
    assert num / den < 5e-3, num / den


def test_banded_marginal_covariance_matches_dense(rng):
    """Two-sided Schur (RGF) marginal covariance vs dense inverse, on a
    well-conditioned matrix and on an FTE-like ~1e5-conditioned one,
    with N both a multiple of 3 and not (pad path)."""
    for N, P in ((12, 5), (13, 4)):
        A, bands = make_spd_banded(rng, N, P)
        Z = np.asarray(
            banded.block_banded_marginal_covariance([jnp.asarray(B) for B in bands])
        )
        Zd = np.linalg.inv(A)
        for n in range(N):
            np.testing.assert_allclose(
                Z[n], Zd[n * P:(n + 1) * P, n * P:(n + 1) * P], atol=1e-10
            )
    # ill-conditioned (smoothness-style strong coupling + small ridge):
    # the regime where the Takahashi in-band recurrence measured
    # negative variances — this form must stay PD and accurate
    N, P = 31, 3
    dense = np.zeros((N * P, N * P))
    for n in range(N):
        for k in range(4):
            if n - k >= 0:
                dense[n * P:(n + 1) * P, (n - k) * P:(n - k + 1) * P] = (
                    rng.normal(size=(P, P)) * 0.45
                )
    A = dense @ dense.T + np.eye(N * P) * 1e-4
    bands = []
    for k in range(4):
        Bk = np.zeros((N, P, P))
        for n in range(k, N):
            Bk[n] = A[n * P:(n + 1) * P, (n - k) * P:(n - k + 1) * P]
        bands.append(jnp.asarray(Bk))
    Z = np.asarray(banded.block_banded_marginal_covariance(bands))
    Zd = np.linalg.inv(A)
    dz = np.diagonal(Z, axis1=-2, axis2=-1)
    assert dz.min() > 0
    for n in range(N):
        ref = Zd[n * P:(n + 1) * P, n * P:(n + 1) * P]
        np.testing.assert_allclose(Z[n], ref, rtol=1e-5, atol=1e-7 * np.abs(Zd).max())


def test_chol_inv_blocked3_matches_unrolled(rng):
    """The blocked 3x3(p) Cholesky+inverse (the RTS smoother's batched
    form — the column-unrolled form's full-matrix scatters were 49% of
    the EKF program's device time, docs/trace_ekf) must equal the
    column-unrolled factorization to float noise."""
    from acinoset_tpu.solvers.banded import (_chol_inv_blocked3,
                                             _chol_inv_unrolled)

    p = 5
    M = rng.standard_normal((4, 3 * p, 3 * p))
    A = jnp.asarray(M @ M.transpose(0, 2, 1) + 3 * p * np.eye(3 * p))
    L1, Li1 = _chol_inv_unrolled(A)
    L2, Li2 = _chol_inv_blocked3(A, p)
    np.testing.assert_allclose(np.asarray(L2), np.asarray(L1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Li2), np.asarray(Li1),
                               rtol=1e-10, atol=1e-12)
