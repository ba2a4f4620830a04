#!/bin/bash
# Round-4 tail sequencer v2 — inserts the 10M serving-tuning stages the
# first completed serve motivated (Lc-queue cost dominates at T=768; see
# DESIGN.md), then runs the remaining protocol stages in value order.
# Waits on the running serve python (PID $1), then:
#   1. (T, Lc, early-exit) tuning grid over the cached 10M int8 tiles
#   2. C=512 tile arm at 10M (fewer, fatter clusters: hops halve, queue
#      shrinks; scan bytes per hop double — measurable net)
#   3. 1M full 57-point reference sweep -> eval_roargraph_1m.csv
#   4. webvid-2.5M protocol (bench: GT + build + tiles + sweeps)
#   5. fused-hop probe at the 1M operating point
#   6. clean bench-1M rerun (cached; uncontended sweep numbers)
#
#   nohup bash scripts/round4_sequencer2.sh <serve_pid> \
#       > /tmp/seq2.log 2>&1 & echo $! > /tmp/seq2.pid
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== sequencer2 start $(date -u +%H:%M:%S) =="

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

# 1. Lc/early-exit tuning over the cached C=256 int8 tiles
run_retry 3 2700 /tmp/lc10m.log python -u scripts/probe_10m_lc.py

# 2. C=512 arm (own tile cache + artifact suffix; comparison legs off)
SERVE_TILE_C=512 SERVE_OUT_SUFFIX=_c512 SERVE_T=192,384,768 \
SERVE_T_MAX=1536 SERVE_NO_ME=1 SERVE_NO_EE=1 SERVE_NO_FUSED=1 \
  run_retry 3 2700 /tmp/s10m_c512.log python -u scripts/serve_10m.py

# 3. 1M reference 57-point sweep (bench index cached)
BENCH_N=1000000 BENCH_TRAIN=500000 \
SWEEP_N=1000000 SWEEP_TRAIN=500000 SWEEP_CSV=eval_roargraph_1m.csv \
  run_retry 4 2700 /tmp/sweep1m.log python -u scripts/run_synth_sweep.py

# 4. webvid-2.5M protocol
bash scripts/run_webvid25_protocol.sh || echo "== webvid gave up =="

# 5. fused-hop probe at the 1M operating point
PROBE_N=1000000 PROBE_TRAIN=500000 PROBE_T=96 \
  run_retry 2 2700 /tmp/q_fusedhop_1m.log python -u scripts/probe_fused_hop.py

# 6. clean bench-1M rerun (uncontended sweep numbers; everything cached)
BENCH_N=1000000 BENCH_TRAIN=500000 BENCH_FLAT_DTYPE=bfloat16 \
BENCH_GT_APPROX=block \
  run_retry 3 2700 /tmp/p1m_clean.log python -u bench.py

echo "== sequencer2 done $(date -u +%H:%M:%S) =="
