#!/bin/bash
# webvid-2.5M-shaped protocol (512-d cosine, 625k training queries = the
# paper's webvid ratio) with crash-retry — same recovery policy as
# run_10m_chain.sh: bench.py caches GT / checkpoints the build / caches the
# tile index under build/, so a TPU worker crash is survived by rerunning.
# Train GT uses the block-min selection (eval GT inside bench stays exact).
# Logs append to /tmp/w25.log.
set -u
cd "$(dirname "$0")/.."
export BENCH_N=2500000 BENCH_TRAIN=625000 BENCH_D=512 BENCH_METRIC=cosine
export BENCH_FLAT_DTYPE=bfloat16 BENCH_GT_APPROX=block
ok=""
for i in $(seq 1 8); do
  if python bench.py >> /tmp/w25.log 2>&1; then ok=1; break; fi
  echo "== bench webvid-2.5M attempt $i failed; retry in 90s ==" >> /tmp/w25.log
  sleep 90
done
[ -z "$ok" ] && { echo "W25_GAVE_UP" >> /tmp/w25.log; exit 1; }
echo "W25_DONE ok" >> /tmp/w25.log
