#!/bin/bash
# Round-4 tail sequencer v3 — adds the new-engine 10M probe (bitmap dedup +
# batched expansion, tiles.py) ahead of the remaining protocol stages.
# Waits on the running C=512 serve (PID $1), then:
#   0. re-run the C=512 serve only if its artifact is incomplete
#   1. 10M probe: compare vs flags vs expand_batch {4,8,16,32} at T=Lc=768
#   2. 1M full 57-point reference sweep -> eval_roargraph_1m.csv
#   3. webvid-2.5M protocol
#   4. fused-hop probe at the 1M operating point
#   5. clean bench-1M rerun
#
#   nohup bash scripts/round4_sequencer3.sh <serve_pid> \
#       > /tmp/seq3.log 2>&1 & echo $! > /tmp/seq3.pid
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== sequencer3 start $(date -u +%H:%M:%S) =="

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

# 0. C=512 serve completion check (the running attempt may have finished it)
if ! grep -q best_T eval_t2i10m_tiles_c512.json 2>/dev/null; then
  SERVE_TILE_C=512 SERVE_OUT_SUFFIX=_c512 SERVE_T=192,384,768 \
  SERVE_T_MAX=1536 SERVE_NO_ME=1 SERVE_NO_EE=1 SERVE_NO_FUSED=1 \
    run_retry 2 2700 /tmp/s10m_c512.log python -u scripts/serve_10m.py
fi

# 1. new-engine probe at the 10M C=256 operating point
run_retry 3 2700 /tmp/lc10m_v2.log python -u scripts/probe_10m_lc.py

# 2. 1M reference 57-point sweep (bench index cached)
BENCH_N=1000000 BENCH_TRAIN=500000 \
SWEEP_N=1000000 SWEEP_TRAIN=500000 SWEEP_CSV=eval_roargraph_1m.csv \
  run_retry 4 2700 /tmp/sweep1m.log python -u scripts/run_synth_sweep.py

# 3. webvid-2.5M protocol
bash scripts/run_webvid25_protocol.sh || echo "== webvid gave up =="

# 4. fused-hop probe at the 1M operating point
PROBE_N=1000000 PROBE_TRAIN=500000 PROBE_T=96 \
  run_retry 2 2700 /tmp/q_fusedhop_1m.log python -u scripts/probe_fused_hop.py

# 5. clean bench-1M rerun (uncontended sweep numbers; everything cached)
BENCH_N=1000000 BENCH_TRAIN=500000 BENCH_FLAT_DTYPE=bfloat16 \
BENCH_GT_APPROX=block \
  run_retry 3 2700 /tmp/p1m_clean.log python -u bench.py

echo "== sequencer3 done $(date -u +%H:%M:%S) =="
