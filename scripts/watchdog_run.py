#!/usr/bin/env python
"""Run a command with a stall watchdog: forward its combined output to a
log file and kill it if it prints nothing for --stall seconds.

The TPU tunnel's worker occasionally wedges silently mid-run (the host
process blocks forever on a fetch instead of getting UNAVAILABLE); every
long driver here prints progress at a bounded cadence, so output silence
is the reliable death signal. Exit code: the child's, or 124 on stall —
callers' retry loops treat both the same.
"""
import argparse
import os
import selectors
import subprocess
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True)
    p.add_argument("--stall", type=float, default=900.0,
                   help="kill after this many seconds without output")
    p.add_argument("cmd", nargs=argparse.REMAINDER)
    a = p.parse_args()
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    logf = open(a.log, "ab", buffering=0)
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    last = time.time()
    while True:
        ev = sel.select(timeout=30)
        if ev:
            chunk = os.read(proc.stdout.fileno(), 1 << 16)
            if chunk:
                logf.write(chunk)
                last = time.time()
            elif proc.poll() is not None:
                sys.exit(proc.returncode)
        if proc.poll() is not None and not ev:
            sys.exit(proc.returncode)
        if time.time() - last > a.stall:
            logf.write(b"\n== watchdog: output stalled; killing child ==\n")
            proc.kill()
            proc.wait()
            sys.exit(124)


if __name__ == "__main__":
    main()
