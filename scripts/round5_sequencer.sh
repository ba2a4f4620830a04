#!/bin/bash
# Round-5 TPU queue: once the laion-10M chain (the round's long pole)
# finishes, immediately run the next-priority TPU job — the t2i-10M
# C=1024 tile arm (VERDICT r4 #2: each tile-capacity doubling has been
# worth 2-3x QPS at 10M by halving cluster-queue hops). Polls for the
# chain's completion sentinel; if the round ends first, this simply never
# fires and costs nothing.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "CHAIN_DONE ok" /tmp/b10m.log 2>/dev/null; do
  # bail out if the chain gave up — the TPU may be wedged; don't pile on
  if grep -q "GAVE_UP" /tmp/b10m.log /tmp/s10m.log 2>/dev/null; then
    echo "sequencer: chain gave up; not starting follow-on work" \
      >> /tmp/seq5.log
    exit 1
  fi
  sleep 120
done
echo "sequencer: laion chain done $(date)" >> /tmp/seq5.log
# t2i-10M C=1024 arm: uses the restored shard graphs + eval GT; the t2i
# data cache regenerates from seed inside serve_10m if the re-image
# dropped it (~10 min host RNG, TPU idle at that point).
export B10M_TAG=t2i10m B10M_D=200 B10M_N=10000000 B10M_TRAIN=1250000
export B10M_SHARDS=8
export SERVE_TILE_C=1024 SERVE_T="96,144,192,240" SERVE_T_MAX=768
export SERVE_OUT_SUFFIX=_c1024
# ee left ENABLED (VERDICT r4 #7): the serve script's own K<=20k gate
# admits it at C=1024 (K~14k — 4x below the K~56k that faulted the worker
# in round 4), and the ee leg runs only after the headline JSON is written,
# so a fault costs a retry, not the result.
export SERVE_NO_ME=1 SERVE_NO_FUSED=1
for i in 1 2 3; do
  if python scripts/watchdog_run.py --log /tmp/s10m_c1024.log --stall 3600 \
      -- python -u scripts/serve_10m.py; then
    echo "sequencer: c1024 serve done $(date)" >> /tmp/seq5.log
    exit 0
  fi
  echo "sequencer: c1024 attempt $i failed; retry in 60s" >> /tmp/seq5.log
  sleep 60
done
echo "sequencer: c1024 gave up" >> /tmp/seq5.log
