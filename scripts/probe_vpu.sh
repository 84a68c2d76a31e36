#!/bin/bash
# Sequential TPU probe, r4 continuation:
# 1) Does the VPU broadcast-multiply-reduce H/g assembly (FteConfig.
#    assembly="vpu") beat the legacy einsum contraction end-to-end?
#    (The r4 trace showed the tiny-contraction dot_generals at 1.5-27
#    GB/s effective + ~34 ms/solve of layout copies feeding them.)
# 2) Finish the interrupted iteration-budget probe (probe_iters.sh):
#    iters=13/12 rows. Acceptance: n_converged=96 rescue-inclusive,
#    marker error within noise of 7.8 mm.
cd "$(dirname "$0")/.." || exit 1
out=docs/r04/probe_vpu.txt
: > "$out"
for asm in vpu einsum; do
  echo "=== assembly=$asm ===" >> "$out"
  BENCH_ASSEMBLY=$asm timeout 1800 python bench.py 2>/dev/null | tail -1 >> "$out"
done
out2=docs/r04/probe_iters.txt
for it in 13 12; do
  echo "=== iters=$it pcg_iters=16 ===" >> "$out2"
  BENCH_ITERS=$it timeout 1500 python bench.py 2>/dev/null | tail -1 >> "$out2"
done
echo "=== iters=12 pcg_iters=12 ===" >> "$out2"
BENCH_ITERS=12 BENCH_PCG_ITERS=12 timeout 1500 python bench.py 2>/dev/null | tail -1 >> "$out2"
echo done >> "$out2"
echo ALL_DONE >> "$out"
