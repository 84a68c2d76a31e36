"""Sharded batched FTE on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from acinoset_tpu.parallel import mesh as mesh_lib


def test_mesh_shapes():
    m2 = mesh_lib.make_mesh(8)
    assert dict(m2.shape) == {"data": 4, "model": 2}
    m1 = mesh_lib.make_mesh(5)
    assert dict(m1.shape) == {"data": 5}


def test_sharded_fte_matches_single_device():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import synthetic
    from acinoset_tpu.pipeline.ekf import make_h_fn
    from acinoset_tpu.pipeline.fte import default_config, initial_trajectory
    from acinoset_tpu.solvers.trajopt import fte_solve

    cams = synthetic.ring_cameras(n_cams=4)
    X = synthetic.cheetah_gallop(N=24, fps=90.0)
    pixels, likelihood, _ = synthetic.render_measurements(X, cams, noise_px=1.0, seed=5)
    k_arr, d_arr, r_arr, t_arr, res = cams

    cfg = default_config(90.0, num_iters=6)
    h = make_h_fn(k_arr, d_arr, r_arr, t_arr)
    X0 = initial_trajectory(pixels, likelihood, k_arr, d_arr, r_arr, t_arr,
                            np.arange(24), 0.5)
    meas = pixels.transpose(1, 0, 2, 3)
    w = (likelihood.transpose(1, 0, 2) > 0.5) / cfg.meas_std_px

    B = 8
    X0b = jnp.asarray(np.stack([X0] * B))
    measb = jnp.asarray(np.stack([meas] * B))
    wb = jnp.asarray(np.stack([w] * B))

    # single-device result
    X_single, _ = fte_solve(h, jnp.asarray(X0), jnp.asarray(meas), jnp.asarray(w), cfg)

    mesh = mesh_lib.make_mesh(8)
    X0s, meass, ws = mesh_lib.shard_batch(mesh, X0b, measb, wb)
    solver = mesh_lib.sharded_fte_solver(mesh, h, cfg)
    with mesh:
        Xb = solver(X0s, meass, ws)
        Xb.block_until_ready()
    assert Xb.shape == (B, 24, 25)
    np.testing.assert_allclose(np.asarray(Xb[0]), np.asarray(X_single), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Xb[5]), np.asarray(X_single), atol=1e-8)


def test_pad_batch():
    a = np.arange(10).reshape(5, 2)
    (ap,), B = mesh_lib.pad_batch([a], 4)
    assert B == 5 and ap.shape == (8, 2)
    np.testing.assert_array_equal(ap[5], a[0])
