#!/bin/bash
# Sequential TPU probe: can the PCG inner budget (pcg_iters=16) or the
# GN outer budget (num_iters=14) be trimmed at equal convergence?
# Headline acceptance: n_converged stays 96 (rescue-inclusive) and
# mean_marker_err within noise of the 7.8 mm baseline.
cd "$(dirname "$0")/.." || exit 1
out=docs/r04/probe_iters.txt
: > "$out"
for pcg in 12 10 8; do
  echo "=== iters=14 pcg_iters=$pcg ===" >> "$out"
  BENCH_PCG_ITERS=$pcg timeout 1500 python bench.py 2>/dev/null | tail -1 >> "$out"
done
for it in 13 12; do
  echo "=== iters=$it pcg_iters=16 ===" >> "$out"
  BENCH_ITERS=$it timeout 1500 python bench.py 2>/dev/null | tail -1 >> "$out"
done
echo "=== iters=12 pcg_iters=12 ===" >> "$out"
BENCH_ITERS=12 BENCH_PCG_ITERS=12 timeout 1500 python bench.py 2>/dev/null | tail -1 >> "$out"
echo done >> "$out"
