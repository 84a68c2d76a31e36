"""Example: the full-dataset FTE sweep as one sharded TPU program.

Twin of the reference's src/all_flick.sh (59 sequential CLI runs) —
here every run under --root_dir is a batch row solved simultaneously.

    python examples/batched_sweep.py --root_dir /data
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acinoset_tpu.pipeline.sweep import sweep

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_dir", required=True)
    ap.add_argument("--dlc_thresh", type=float, default=0.5)
    ap.add_argument("--num_iters", type=int, default=60)
    ap.add_argument("--warm_start", action="store_true",
                    help="initialize the FTE from the batched EKF stage "
                    "(required for long runs where the linear init diverges)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    results = sweep(args.root_dir, dlc_thresh=args.dlc_thresh,
                    num_iters=args.num_iters,
                    warm_start=(True if args.warm_start else "auto"))
    dt = time.perf_counter() - t0
    n_conv = sum(1 for r in results if r.get("converged", True))
    print(f"\nSolved {len(results)} runs in {dt:.1f} s ({len(results) / dt:.2f} runs/s); "
          f"{n_conv}/{len(results)} converged (per-run grad_norm in results)")
