#!/bin/bash
# Generic sequencer: wait for a PID to exit, then exec the given command.
# Keeps the single TPU busy across queued long-running protocols, e.g.:
#   nohup bash scripts/after_pid.sh 5042 bash scripts/run_webvid25_protocol.sh &
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:?usage: after_pid.sh <pid> <cmd...>}"
shift
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "== after_pid: $WAIT_PID exited; running: $* =="
exec "$@"
