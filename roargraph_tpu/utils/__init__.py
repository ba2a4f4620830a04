from .metrics import (Timer, TimerRegistry, counters,  # noqa: F401
                      enable_compilation_cache)
