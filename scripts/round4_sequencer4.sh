#!/bin/bash
# Round-4 tail sequencer v4 — re-prioritized after the C=512 win
# (eval_t2i10m_tiles_c512.json: 2,216 QPS @ 0.961, 3.2x the C=256 arm):
# chase the 10M headline first (cheap cached-tile fine sweep + the C=1024
# arm), then the remaining protocol stages.
#   1. resume-retry the 1M 57-point sweep if incomplete (SWEEP_RESUME)
#   2. C=512 fine T sweep at 10M (int8 tiles cached -> sweep only)
#   3. C=1024 tile arm at 10M (k-means build + quantize + sweep)
#   4. webvid-2.5M protocol (full rebuild; round-3 artifacts did not persist)
#   5. fused-hop probe at the 1M operating point
#   6. clean bench-1M rerun (uncontended sweep numbers; everything cached)
#
#   nohup bash scripts/round4_sequencer4.sh <wait_pid> \
#       > /tmp/seq4.log 2>&1 & echo $! > /tmp/seq4.pid
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== sequencer4 start $(date -u +%H:%M:%S) =="

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

# 1. 1M reference sweep — resume any missing L points (no-op if complete)
SWEEP_N=1000000 SWEEP_TRAIN=500000 SWEEP_CSV=eval_roargraph_1m.csv \
SWEEP_RESUME=1 \
  run_retry 4 2700 /tmp/sweep1m.log python -u scripts/run_synth_sweep.py

# 2. C=512 fine T sweep (tiles cached; sharpen QPS@0.95 around best_T=384)
SERVE_TILE_C=512 SERVE_OUT_SUFFIX=_c512fine SERVE_T=288,320,352,416,448 \
SERVE_T_MAX=896 SERVE_NO_ME=1 SERVE_NO_EE=1 SERVE_NO_FUSED=1 \
  run_retry 3 2700 /tmp/s10m_c512f.log python -u scripts/serve_10m.py

# 3. C=1024 arm (same rows/query at T' = T/2 vs C=512; half the hops again)
SERVE_TILE_C=1024 SERVE_OUT_SUFFIX=_c1024 SERVE_T=96,144,192,240 \
SERVE_T_MAX=768 SERVE_NO_ME=1 SERVE_NO_EE=1 SERVE_NO_FUSED=1 \
  run_retry 3 2700 /tmp/s10m_c1024.log python -u scripts/serve_10m.py

# 4. webvid-2.5M protocol
bash scripts/run_webvid25_protocol.sh || echo "== webvid gave up =="

# 5. fused-hop probe at the 1M operating point
PROBE_N=1000000 PROBE_TRAIN=500000 PROBE_T=96 \
  run_retry 2 2700 /tmp/q_fusedhop_1m.log python -u scripts/probe_fused_hop.py

# 6. clean bench-1M rerun
BENCH_N=1000000 BENCH_TRAIN=500000 BENCH_FLAT_DTYPE=bfloat16 \
BENCH_GT_APPROX=block \
  run_retry 3 2700 /tmp/p1m_clean.log python -u bench.py

echo "== sequencer4 done $(date -u +%H:%M:%S) =="
