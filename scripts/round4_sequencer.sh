#!/bin/bash
# Round-4 tail sequencer — replaces post_chain_queue.sh's remaining stages
# with value-ordered ones (the 10M serve is the flagship artifact and must
# not queue behind the ~3h webvid rebuild). Waits for the currently running
# 1M bench python (PID $1), then runs:
#   1. 10M serve rerun under the fixed spill-pass assignment (stale tile
#      cache removed; SERVE_T_MAX=1536 avoids the worker-killing T=3072
#      program)
#   2. 1M full 57-point reference sweep -> eval_roargraph_1m.csv
#   3. webvid-2.5M protocol (bench: GT + build + tiles + sweeps)
#   4. fused-hop probe at the 1M operating point
#   5. clean bench-1M rerun (all stages cached -> sweeps only; the first
#      run's sweep legs were depressed by host-core contention)
#
#   nohup bash scripts/round4_sequencer.sh <bench_pid> \
#       > /tmp/seq.log 2>&1 & echo $! > /tmp/seq.pid
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== sequencer start $(date -u +%H:%M:%S) =="

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

# 1. 10M serve, fixed assignment
STALE=build/t2i10m_tiles256_int8.npz
if [ -f "$STALE" ]; then
  echo "removing stale (pre-spill-fix) tile cache $STALE"
  rm -f "$STALE"
fi
SERVE_T_MAX=1536 run_retry 6 2700 /tmp/s10m_v2.log \
  python -u scripts/serve_10m.py

# 2. 1M reference 57-point sweep (bench index cached by the finished run)
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

echo "== sequencer done $(date -u +%H:%M:%S) =="
