from .metrics import Timer, TimerRegistry, counters  # noqa: F401
