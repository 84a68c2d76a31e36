"""Example: the four reconstruction baselines on one run.

Script twin of the reference notebooks TRI.ipynb / SBA.ipynb / EKF.ipynb
/ FTE.ipynb (canonical config: 2019_03_09/lily/run, frames 70-170,
dlc_thresh 0.5 — TRI.ipynb cell 3).

    python examples/tri_sba_ekf_fte.py --data_dir /data/2019_03_09/lily/run
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from acinoset_tpu.pipeline.ekf import ekf
from acinoset_tpu.pipeline.fte import fte
from acinoset_tpu.pipeline.plots import (
    plot_cheetah_reconstruction,
    plot_multiple_cheetah_reconstructions,
)
from acinoset_tpu.pipeline.sba import sba
from acinoset_tpu.pipeline.tri import tri

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--start_frame", type=int, default=70)
    ap.add_argument("--end_frame", type=int, default=170)
    ap.add_argument("--dlc_thresh", type=float, default=0.5)
    args = ap.parse_args()

    print("== TRI ==")
    tri(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh)
    print("== SBA ==")
    sba(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh)
    print("== EKF ==")
    ekf(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh)
    print("== FTE ==")
    fte(args.data_dir, args.start_frame, args.end_frame, args.dlc_thresh)

    for stage in ("tri", "sba", "ekf", "fte"):
        fp = os.path.join(args.data_dir, stage, f"{stage}.pickle")
        if os.path.exists(fp):
            plot_cheetah_reconstruction(
                fp, out_fpath=fp.replace(".pickle", "_3d.png")
            )
    plot_multiple_cheetah_reconstructions(
        [
            os.path.join(args.data_dir, s, f"{s}.pickle")
            for s in ("sba", "ekf", "fte")
            if os.path.exists(os.path.join(args.data_dir, s, f"{s}.pickle"))
        ],
        dark_mode=True,
        out_fpath=os.path.join(args.data_dir, "reconstructions.png"),
    )
