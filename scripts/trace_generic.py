#!/usr/bin/env python
"""Device-trace the fused generic (human) FTE stage program and dump
the per-op summary — post-fuse the per-iteration cost split is pcg
10.7 ms + measurement 1.7 ms + ~10 ms unaccounted
(docs/r05/probe_generic_iter_cost_fused.txt, *_split_dag.txt); name
that bucket.

Usage (on the TPU): python scripts/trace_generic.py
Writes docs/trace_generic/ + op_stats.json.
"""
import glob
import json
import os
import sys
import time
from glob import glob as g

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from acinoset_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from acinoset_tpu.models.skeleton import build_skeleton_model
    from acinoset_tpu.pipeline import data as data_io
    from acinoset_tpu.pipeline import sweep as sweep_lib

    B = int(os.environ.get("BENCH_BATCH", 96))
    N = int(os.environ.get("BENCH_FRAMES", 100))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    REF = "/root/reference"
    skel = data_io.load_skeleton(f"{REF}/skeletons/new_human.pickle")
    model = build_skeleton_model(skel)
    k, d, r, t, _ = data_io.load_scene(f"{REF}/data/4_cam_scene_static_sba.json")
    p2d = data_io.load_dlc_points(
        sorted(g(f"{REF}/data/*.h5")), markers=model.markers
    )
    win = p2d.window(60, 60 + N)
    rng = np.random.default_rng(11)
    runs = []
    for i in range(B):
        px = win.pixels + rng.normal(scale=0.5, size=win.pixels.shape)
        runs.append(sweep_lib.RunData(
            data_dir=f"h{i}", pixels=px,
            likelihood=np.nan_to_num(win.likelihood, nan=-1.0),
            cams=(k, d.reshape(-1, 4), r, np.asarray(t).reshape(-1, 3)),
            fps=120.0, start_frame=60, scene_fpath="",
        ))

    def run():
        return sweep_lib.solve_batch_generic(
            model, runs, dlc_thresh=0.4, num_iters=iters, max_batch=None,
            rescue=False,
        )

    run()  # compile + warmup
    log_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "docs", os.environ.get("TRACE_DIR", "trace_generic"))
    os.makedirs(log_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(log_dir):
        run()
    wall = time.perf_counter() - t0
    print(f"traced generic solve: {wall*1e3:.1f} ms wall "
          f"(B={B}, N={N}, iters={iters})")

    planes = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("NO xplane.pb produced — backend does not expose a profiler plane")
        return
    xplane = planes[-1]
    print("xplane:", os.path.relpath(xplane))
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xplane], "framework_op_stats^", {}
        )
        out = os.path.join(log_dir, "op_stats.json")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print("wrote", os.path.relpath(out))
    except Exception as e:
        print("op-stats conversion failed:", repr(e)[:300])
        for p in planes:
            print("  ", os.path.relpath(p), os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
