#!/bin/bash
# 1M-point protocol driver with crash-retry (same recovery policy as
# run_10m_chain.sh: every stage caches/checkpoints under build/, so a TPU
# worker crash is survived by rerunning the stage).
#
# Stages:
#   1. bench.py at N=1M  — GT, build (resumable), tile index, tile/flat
#      sweeps, headline JSON (bf16 flat vectors: the round-3 default).
#   2. run_synth_sweep.py at 1M — the reference's full 57-point L_pq sweep
#      -> eval_roargraph_1m.csv (the parity artifact VERDICT r2 item 4).
# Logs append to /tmp/p1m.log.
set -u
cd "$(dirname "$0")/.."
export BENCH_N=1000000 BENCH_TRAIN=500000 BENCH_FLAT_DTYPE=bfloat16
# train-GT block-min selection (eval GT in the sweep stays exact)
export BENCH_GT_APPROX=block
ok=""
for i in $(seq 1 8); do
  if python bench.py >> /tmp/p1m.log 2>&1; then ok=1; break; fi
  echo "== bench 1M attempt $i failed; retry in 90s ==" >> /tmp/p1m.log
  sleep 90
done
[ -z "$ok" ] && { echo "BENCH1M_GAVE_UP" >> /tmp/p1m.log; exit 1; }
ok=""
export SWEEP_N=1000000 SWEEP_TRAIN=500000 SWEEP_CSV=eval_roargraph_1m.csv
for i in $(seq 1 6); do
  if python scripts/run_synth_sweep.py >> /tmp/p1m.log 2>&1; then ok=1; break; fi
  echo "== 1M sweep attempt $i failed; retry in 90s ==" >> /tmp/p1m.log
  sleep 90
done
[ -z "$ok" ] && { echo "SWEEP1M_GAVE_UP" >> /tmp/p1m.log; exit 1; }
echo "P1M_DONE ok" >> /tmp/p1m.log
