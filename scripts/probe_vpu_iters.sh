#!/bin/bash
# Sequential TPU probe, r4: combine the two measured wins —
#   assembly=vpu  (576 vs 431 traj/s at iters=14, docs/r04/probe_vpu.txt)
#   iters=13      (630 traj/s with einsum, 96/96, docs/r04/probe_iters.txt)
# Acceptance: n_converged=96 rescue-inclusive, marker error within noise
# of 7.8 mm. Also probe whether the vpu 95/96 at iters=14 was stochastic
# (repeat) and whether pcg_iters can drop alongside.
cd "$(dirname "$0")/.." || exit 1
out=docs/r04/probe_vpu_iters.txt
: > "$out"
run() {
  echo "=== $1 ===" >> "$out"
  eval "$2 timeout 1800 python bench.py 2>/dev/null | tail -1" >> "$out"
}
run "vpu iters=13 pcg=16" "BENCH_ASSEMBLY=vpu BENCH_ITERS=13"
run "vpu iters=12 pcg=16" "BENCH_ASSEMBLY=vpu BENCH_ITERS=12"
run "vpu iters=13 pcg=12" "BENCH_ASSEMBLY=vpu BENCH_ITERS=13 BENCH_PCG_ITERS=12"
run "vpu iters=14 pcg=16 (repeat of probe_vpu)" "BENCH_ASSEMBLY=vpu"
echo ALL_DONE >> "$out"
