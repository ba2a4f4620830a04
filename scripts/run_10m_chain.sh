#!/bin/bash
# 10M protocol driver with crash-retry: the TPU tunnel's worker process dies
# intermittently under sustained load (UNAVAILABLE / "worker crashed or
# restarted"). Every stage of build_10m.py / serve_10m.py is cached or
# checkpointed on disk, so the recovery policy is simply: rerun the script,
# it resumes where it left off. Logs append to /tmp/b10m.log / /tmp/s10m.log.
set -u
cd "$(dirname "$0")/.."
WD="python scripts/watchdog_run.py"
ok=""
for i in $(seq 1 12); do
  if $WD --log /tmp/b10m.log --stall "${B10M_STALL:-900}" -- \
      python -u scripts/build_10m.py; then ok=1; break; fi
  echo "== build_10m attempt $i failed (see above); retry in 90s ==" >> /tmp/b10m.log
  sleep 90
done
[ -z "$ok" ] && { echo "BUILD_GAVE_UP" >> /tmp/b10m.log; exit 1; }
ok=""
for i in $(seq 1 8); do
  if $WD --log /tmp/s10m.log --stall "${B10M_STALL:-900}" -- \
      python -u scripts/serve_10m.py; then ok=1; break; fi
  echo "== serve_10m attempt $i failed; retry in 90s ==" >> /tmp/s10m.log
  sleep 90
done
[ -z "$ok" ] && { echo "SERVE_GAVE_UP" >> /tmp/s10m.log; exit 1; }
echo "CHAIN_DONE ok" >> /tmp/b10m.log
