#!/bin/bash
# Sequencer: wait for the 10M chain (run_10m_chain.sh) to finish, then run
# the 1M protocol (run_1m_protocol.sh) on the freed chip. Keeps the single
# TPU busy across the two long protocols without manual hand-off.
set -u
cd "$(dirname "$0")/.."
CHAIN_PID="${1:?usage: after_chain_1m.sh <chain_pid>}"
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
echo "== chain pid $CHAIN_PID exited; starting 1M protocol ==" \
  >> /tmp/p1m.log
bash scripts/run_1m_protocol.sh
