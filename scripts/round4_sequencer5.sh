#!/bin/bash
# Round-4 tail sequencer v5 — session-restart reprioritization.
# Ordered by completed-BASELINE-rows per TPU-hour:
#   1. 1M 57-point sweep: resume the 9 missing tail points (L=1200..2000)
#   2. C=512 fine T sweep at 10M (int8 tiles cached -> sweep only)
#   3. C=1024 tile arm at 10M (k-means build + quantize + sweep; each
#      capacity doubling has been worth 2-3x QPS so far)
#   4. webvid-2.5M protocol (full rebuild; fills its TBD BASELINE row)
#   5. laion-10M chain with whatever wall remains (checkpointed; partial
#      shards get committed to artifacts/ for the next round)
#
#   nohup bash scripts/round4_sequencer5.sh > /tmp/seq5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "== sequencer5 start $(date -u +%H:%M:%S) =="

run_retry() {  # run_retry <tries> <stall_s> <log> <cmd...>
  local tries="$1" stall="$2" log="$3"; shift 3
  local i
  for i in $(seq 1 "$tries"); do
    if python scripts/watchdog_run.py --log "$log" --stall "$stall" -- "$@"; then
      echo "== OK: $* =="; return 0
    fi
    echo "== attempt $i failed: $* (see $log); retry in 90s =="
    sleep 90
  done
  echo "== GAVE UP: $* =="; return 1
}

# 1. 1M reference sweep — resume the missing tail points
SWEEP_N=1000000 SWEEP_TRAIN=500000 SWEEP_CSV=eval_roargraph_1m.csv \
SWEEP_RESUME=1 \
  run_retry 4 2700 /tmp/sweep1m.log python -u scripts/run_synth_sweep.py
echo "== stage1 done $(date -u +%H:%M:%S) =="

# 2. C=512 fine T sweep (tiles cached; sharpen QPS@0.95 around best_T=384)
SERVE_TILE_C=512 SERVE_OUT_SUFFIX=_c512fine SERVE_T=288,320,352,416,448 \
SERVE_T_MAX=896 SERVE_NO_ME=1 SERVE_NO_EE=1 SERVE_NO_FUSED=1 \
  run_retry 3 2700 /tmp/s10m_c512f.log python -u scripts/serve_10m.py
echo "== stage2 done $(date -u +%H:%M:%S) =="

# 3. C=1024 arm (same rows/query at T' = T/2 vs C=512; half the hops again)
SERVE_TILE_C=1024 SERVE_OUT_SUFFIX=_c1024 SERVE_T=96,144,192,240 \
SERVE_T_MAX=768 SERVE_NO_ME=1 SERVE_NO_EE=1 SERVE_NO_FUSED=1 \
  run_retry 3 2700 /tmp/s10m_c1024.log python -u scripts/serve_10m.py
echo "== stage3 done $(date -u +%H:%M:%S) =="

# 4. webvid-2.5M protocol
bash scripts/run_webvid25_protocol.sh || echo "== webvid gave up =="
echo "== stage4 done $(date -u +%H:%M:%S) =="

# 5. laion-10M chain — runs until round end; every stage cached/checkpointed
bash scripts/run_laion10m_chain.sh || echo "== laion chain stopped =="
echo "== sequencer5 done $(date -u +%H:%M:%S) =="
