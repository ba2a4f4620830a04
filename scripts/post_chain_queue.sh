#!/bin/bash
# Round-4 post-chain measurement queue (VERDICT r3 items 4,5,6,7,9).
# Waits for the 10M chain PID, then runs the queued TPU jobs in
# value-order with crash-retry (all stages cache under build/, so the
# recovery policy is rerun-and-resume). Logs under /tmp/q_*.log.
#
#   nohup bash scripts/post_chain_queue.sh "$(cat /tmp/chain10m.pid)" \
#       > /tmp/queue.log 2>&1 & echo $! > /tmp/queue.pid
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== queue start $(date -u +%H:%M:%S) =="

run_retry() {  # run_retry <tries> <log> <cmd...>
  local tries="$1" log="$2"; shift 2
  local i
  for i in $(seq 1 "$tries"); do
    if python scripts/watchdog_run.py --log "$log" --stall 900 -- "$@"; then
      echo "== OK: $* =="; return 0
    fi
    echo "== attempt $i failed: $* (see $log); retry in 60s =="
    sleep 60
  done
  echo "== GAVE UP: $* =="; return 1
}

# 1. fused scan+select measurement at the serving operating point (r3 #9)
run_retry 3 /tmp/q_fusedhop.log python -u scripts/probe_fused_hop.py

# 2. canonical-parameter crossval, our-engine sweeps (r3 #7)
run_retry 3 /tmp/q_crossval.log python -u scripts/crossval_canonical.py tpu
python scripts/crossval_canonical.py report || true

# 3. union-vs-monolithic A/B at the 10M shard size (r3 #4)
run_retry 4 /tmp/q_ab.log python -u scripts/ab_union_vs_monolithic.py

# 4. 1M protocol: bench headline + full 57-point reference sweep (r3 #6)
bash scripts/run_1m_protocol.sh || echo "== 1M protocol gave up =="

# 4b. fused-hop measurement at the 1M operating point (r3 #9 target shape)
PROBE_N=1000000 PROBE_TRAIN=500000 PROBE_T=96 \
  run_retry 2 /tmp/q_fusedhop_1m.log python -u scripts/probe_fused_hop.py

# 5. webvid-2.5M protocol rebuild + serve (r3 #5)
bash scripts/run_webvid25_protocol.sh || echo "== webvid protocol gave up =="

echo "== queue done $(date -u +%H:%M:%S) =="
