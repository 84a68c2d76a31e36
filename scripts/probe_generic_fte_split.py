#!/usr/bin/env python
"""Where does the generic (human) FTE iteration go? 36.8 traj/s at
B=96/N=100/iters=30 (docs/r05/bench_generic_b96_fixed.txt) is ~90 ms
per GN iteration for the batch — 16x the cheetah's 5.6 ms. Suspects:
the synthesized jacfwd Jacobian (48 tangents through FK + projection;
the human skeleton is non-tree so the analytic path is refused) vs the
48-state banded/pcg solve.

Times, K-chained in one jit with host-transfer sync, B=96 N=100:
  m1_fk        FK only, batched
  m2_fkjac     fk_and_jac_any (jacfwd) batched      <- measurement pass
  m3_hj_parts  full hj_parts_aux (adds projection+Jacobian)

Run on TPU: python scripts/probe_generic_fte_split.py | tee docs/r05/probe_generic_fte_split.txt
"""
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from acinoset_tpu.models.skeleton import build_skeleton_model, fk_and_jac_any
    from acinoset_tpu.pipeline import data as data_io
    from acinoset_tpu.pipeline.sweep import (
        make_h_fn_aux_generic,
        make_hj_parts_aux_generic,
    )

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    K = int(os.environ.get("BENCH_CHAIN", 30))
    REF = "/root/reference"
    skel = data_io.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    k, d, r, t, _ = data_io.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    dtype = jnp.float32
    aux = (jnp.asarray(k, dtype), jnp.asarray(d.reshape(-1, 4), dtype),
           jnp.asarray(r, dtype), jnp.asarray(np.asarray(t).reshape(-1, 3), dtype))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(scale=0.1, size=(B, N, model.n_pose)), dtype)

    fkj = fk_and_jac_any(model)
    h_aux = make_h_fn_aux_generic(model.fk)
    hj_aux = make_hj_parts_aux_generic(fkj)

    def timed(name, fn):
        f = jax.jit(fn)
        float(f(X))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(X))
            ts.append(time.perf_counter() - t0)
        print(f"{name:12s}: {min(ts) / K * 1e3:8.3f} ms/call")

    def chain(eval_one):
        def prog(Xb):
            def body(c, _):
                Xp = Xb * (1.0 + 1e-6 * jnp.cos(c + 1.0))
                out = eval_one(Xp)
                return c + out, ()
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=K)
            return out
        return prog

    fk_b = jax.vmap(jax.vmap(model.fk))
    timed("m1_fk", chain(lambda Xp: jnp.mean(jnp.square(fk_b(Xp)))))

    fkj_b = jax.vmap(jax.vmap(fkj))
    def m2(Xp):
        pts, J = fkj_b(Xp)
        return jnp.mean(jnp.square(pts)) + jnp.mean(J * J)
    timed("m2_fkjac", chain(m2))

    hj_b = jax.vmap(jax.vmap(lambda p: hj_aux(p, aux)))
    def m3(Xp):
        h, Jp, Jfk = hj_b(Xp)
        return (jnp.mean(jnp.square(jnp.where(jnp.isfinite(h), h, 0.0)))
                + jnp.mean(Jp * Jp) + jnp.mean(Jfk * Jfk))
    timed("m3_hj_parts", chain(m3))


if __name__ == "__main__":
    main()
