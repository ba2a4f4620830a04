#!/bin/bash
# Run the test suite one file per pytest process.
#
# Round-5 observation: a single-process `pytest tests/` run on this VM can
# die with a segfault inside XLA's CPU compiler partway through the suite
# (three occurrences, different suites reached; faulthandler stack always in
# backend_compile_and_load). Every suite passes in isolation — 138/138 in
# per-file processes — so the crash is cumulative-process-state flakiness
# (XLA CPU compile after ~100 prior compiles in one process), not a test or
# library failure. Until the underlying XLA issue is gone, this runner is
# the reliable way to get a green/red signal.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  echo "=== $f ==="
  python -m pytest "$f" -q 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && fail=1
done
[ "$fail" -eq 0 ] && echo "ALL SUITES GREEN" || echo "FAILURES (see above)"
exit $fail
