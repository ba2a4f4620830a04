#!/bin/bash
# Round-4 final TPU stage: rerun the 10M serve after the measurement queue
# (scripts/post_chain_queue.sh) drains.
#
# Why a rerun: the chain's serve attempts plateaued at recall ~0.40 — the
# balanced assignment stranded 45% of points outside their 8 candidate
# centroids and placed them in arbitrary free slots (see /tmp/s10m.log and
# DESIGN.md round-4 notes), so the cached tile index is geometrically junk.
# The widened-choice + spill-pass assignment (tiles.py) fixes it (validated
# at 1.25M: 117/1.25M spilled, recall 0.9928); the stale cache must go so
# the tiles rebuild under the fixed code. SERVE_T_MAX=1536 keeps the sweep
# away from the T=3072/B=8192/K~56k program that reproducibly kills the
# tunnel worker (8/8 attempts — the long-program fault, DESIGN.md).
#
#   nohup bash scripts/post_queue_serve.sh "$(cat /tmp/queue.pid)" \
#       > /tmp/serve2.log 2>&1 & echo $! > /tmp/serve2.pid
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
echo "== post-queue serve start $(date -u +%H:%M:%S) =="

STALE=build/t2i10m_tiles256_int8.npz
if [ -f "$STALE" ]; then
  echo "removing stale (pre-spill-fix) tile cache $STALE"
  rm -f "$STALE"
fi

export SERVE_T_MAX=1536
ok=""
for i in $(seq 1 6); do
  if python scripts/watchdog_run.py --log /tmp/s10m_v2.log --stall 2700 -- \
      python -u scripts/serve_10m.py; then ok=1; break; fi
  echo "== serve_10m v2 attempt $i failed; retry in 90s =="
  sleep 90
done
if [ -n "$ok" ]; then echo "SERVE2_DONE ok"; else echo "SERVE2_GAVE_UP"; fi
echo "== post-queue serve done $(date -u +%H:%M:%S) =="
