"""Lightweight tracing/metrics — the observability layer (SURVEY.md §5.1).

The reference ships a bespoke accumulator (``TimeMetric``,
``include/efanna2e/util.h:240-264``) plus ad-hoc stdout progress prints.
Here: a context-manager timer with named accumulators, a registry that
renders a phase breakdown (the reference prints projection / connectivity /
total times, ``src/index_bipartite.cpp:1156,1276``), and process-wide
counters for cmps/hops style accounting.
"""
from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict


class Timer:
    """Accumulating wall-clock timer (reset/record/print semantics of the
    reference's ``TimeMetric``, as a context manager)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        self._t0 = None
        return False

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0

    def __repr__(self):
        return (f"Timer({self.name!r}, total={self.total:.3f}s, "
                f"n={self.count}, mean={self.mean * 1e3:.2f}ms)")


class TimerRegistry:
    """Named timers with a phase-breakdown report."""

    def __init__(self):
        self._timers: Dict[str, Timer] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t = self._timers.setdefault(name, Timer(name))
        with t:
            yield t

    def __getitem__(self, name: str) -> Timer:
        return self._timers[name]

    def report(self) -> str:
        width = max((len(n) for n in self._timers), default=4)
        lines = [f"{'phase':<{width}}  total_s   calls  mean_ms"]
        for name, t in sorted(self._timers.items(),
                              key=lambda kv: -kv[1].total):
            lines.append(f"{name:<{width}}  {t.total:7.2f}  {t.count:6d}  "
                         f"{t.mean * 1e3:7.2f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return {n: t.total for n, t in self._timers.items()}


counters: collections.Counter = collections.Counter()


def enable_compilation_cache(path: str = "build/jax_cache") -> None:
    """Persist XLA compilations to disk — first-compile on the tunneled TPU
    costs 20-40s per distinct static shape, so cross-process caching is a
    large wall-clock win for sweeps and repeated bench runs."""
    import os

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:  # older jax
        pass
