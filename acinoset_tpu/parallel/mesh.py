"""Device mesh + sharding for multi-trajectory solves.

The reference processes its 59-run dataset strictly sequentially
(AcinoSet src/all_flick.sh) on one CPU. Here the scale axis is *many
trajectories*: a 1-D or 2-D `jax.sharding.Mesh` with

  * ``data``  — trajectories (pure data parallelism; zero communication
    during the solve, one all-gather at the end if results are pulled
    to host), and
  * ``model`` — cameras within the measurement model (the per-frame
    Gauss-Newton pieces H = sum_c J_c^T W J_c reduce over the camera
    axis, so XLA inserts a psum over ICI when cameras are sharded).

Everything is expressed with `NamedSharding` constraints on a jitted
function; XLA chooses the collectives. No NCCL/MPI analog exists or is
needed — the reference has no distributed layer at all (SURVEY.md §2.5).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_axis: bool = True,
    devices=None,
    model_size: Optional[int] = None,
) -> Mesh:
    """Build a mesh over the first n_devices devices.

    Uses a 2-D (data, model) layout when n_devices is even and
    model_axis is requested, else a 1-D (data,) mesh. ``model_size``
    pins the model-axis extent explicitly (must divide n_devices);
    default 2. If the default platform has fewer than n_devices
    devices, falls back to the CPU backend (virtual host devices for
    dry runs).
    """
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        devs = jax.devices("cpu")
    devs = devs[: n_devices or len(devs)]
    if n_devices is not None and len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    n = len(devs)
    if model_size is not None and model_size > 1:
        if not model_axis:
            raise ValueError("model_size given but model_axis=False")
        if n % model_size:
            raise ValueError(f"model_size {model_size} does not divide {n} devices")
        arr = np.array(devs).reshape(n // model_size, model_size)
        return Mesh(arr, axis_names=("data", "model"))
    if model_axis and model_size != 1 and n % 2 == 0 and n > 1:
        arr = np.array(devs).reshape(n // 2, 2)
        return Mesh(arr, axis_names=("data", "model"))
    return Mesh(np.array(devs), axis_names=("data",))


def batch_spec(mesh: Mesh, shard_cameras: bool = True) -> Tuple[P, P, P]:
    """PartitionSpecs for (X0 (B,N,P), meas (B,N,C,L,2), w (B,N,C,L))."""
    model = "model" if ("model" in mesh.axis_names and shard_cameras) else None
    return (
        P("data", None, None),
        P("data", None, model, None, None),
        P("data", None, model, None),
    )


def shard_batch(mesh: Mesh, X0, meas, w, shard_cameras: bool = True):
    """Place a trajectory batch on the mesh with the canonical shardings."""
    sx, sm, sw = batch_spec(mesh, shard_cameras)
    return (
        jax.device_put(X0, NamedSharding(mesh, sx)),
        jax.device_put(meas, NamedSharding(mesh, sm)),
        jax.device_put(w, NamedSharding(mesh, sw)),
    )


def pad_batch(arrs: Sequence[np.ndarray], multiple: int):
    """Pad the leading (batch) dim of every array to a multiple; returns
    (padded arrays, original batch size). Padding repeats the first
    element so solver behavior stays well-defined on pad rows."""
    B = arrs[0].shape[0]
    Bp = ((B + multiple - 1) // multiple) * multiple
    if Bp == B:
        return list(arrs), B
    out = []
    for a in arrs:
        reps = np.repeat(a[:1], Bp - B, axis=0)
        out.append(np.concatenate([a, reps], axis=0))
    return out, B


def sharded_fte_solver(mesh: Mesh, h_fn, cfg, shard_cameras: bool = True,
                       hj_parts_fn=None, with_status: bool = False,
                       compute_cov: bool = False):
    """Return a jitted batched FTE solver with mesh shardings baked in.

    The returned fn maps (X0 (B,N,P), meas (B,N,C,L,2), w (B,N,C,L)) ->
    X (B,N,P), sharded over 'data' (and cameras over 'model' inside the
    measurement reduction when available). With ``with_status`` it
    returns (X, converged (B,), grad_norm (B,)) — the per-trajectory
    stationarity flags (see trajopt.fte_solve) — and, with
    ``compute_cov`` additionally set, (..., marker_std (B,N,L,3)): the
    Laplace-posterior error bars from the same jitted program."""
    from ..solvers.trajopt import fte_solve

    sx, sm, sw = batch_spec(mesh, shard_cameras)
    in_shardings = (
        NamedSharding(mesh, sx),
        NamedSharding(mesh, sm),
        NamedSharding(mesh, sw),
    )
    out_x = NamedSharding(mesh, P("data", None, None))
    out_b = NamedSharding(mesh, P("data"))

    if with_status:
        def batched(X0, meas, w):
            def one(a, b, c):
                X, info = fte_solve(h_fn, a, b, c, cfg, hj_parts_fn=hj_parts_fn,
                                    compute_cov=compute_cov)
                out = (X, info["converged"], info["grad_norm"])
                if compute_cov:
                    out = out + (info["marker_std"],)
                return out

            return jax.vmap(one)(X0, meas, w)

        out_sh = (out_x, out_b, out_b)
        if compute_cov:
            out_sh = out_sh + (NamedSharding(mesh, P("data", None, None, None)),)
        return jax.jit(batched, in_shardings=in_shardings, out_shardings=out_sh)

    def batched(X0, meas, w):
        return jax.vmap(
            lambda a, b, c: fte_solve(h_fn, a, b, c, cfg, hj_parts_fn=hj_parts_fn)[0]
        )(X0, meas, w)

    return jax.jit(batched, in_shardings=in_shardings, out_shardings=out_x)
