"""Host-memory mitigations for virtualized bench hosts.

The graft bench VMs service *new* guest memory at ~5 MB/s (each 4 KB
first-touch fault is a ~0.8 ms hypervisor exit; 2 MB THP faults cost
~200 ms), and ship with two reclaim mechanisms that keep handing warm
pages back to the hypervisor so the cost is paid over and over:

- a DAMON reclaim kdamond that proactively evicts "cold" pages — under a
  multi-GB numpy workload it evicts the working set in a loop (measured:
  the 10M data prep ran 30x slower with it on, 96% kernel time);
- virtio free-page reporting at order 9, which returns every freed 2 MB
  block to the host, so even guest-recycled pages refault at ~5 MB/s.

``harden()`` best-effort disables both (root-only sysfs writes; silently
skipped where unavailable), forces THP off, and re-execs the process once
with glibc tuned to never munmap large blocks — freed numpy temps stay in
the arena and are reused at memory speed instead of refaulting.

Call it at the very top of every long-running driver, before numpy/jax
allocate anything big.
"""
import os
import sys

_SYSFS_FIXES = (
    # stop the proactive reclaim daemon(s)
    ("/sys/kernel/mm/damon/admin/kdamonds/0/state", "off"),
    ("/sys/kernel/mm/damon/admin/kdamonds/1/state", "off"),
    # only report order-10 (4 MB) free blocks: effectively never once the
    # heap is warm/fragmented, so guest-freed pages stay hypervisor-backed
    ("/sys/module/page_reporting/parameters/page_reporting_order", "10"),
    ("/sys/module/page_reporting/parameters/free_bitmap_enable", "N"),
    # 2 MB THP faults are ~10x more expensive per byte than 4 KB ones here
    ("/sys/kernel/mm/transparent_hugepage/enabled", "never"),
)


def harden() -> None:
    """Apply the sysfs fixes, then re-exec once with malloc retention."""
    for path, value in _SYSFS_FIXES:
        try:
            with open(path, "w") as f:
                f.write(value)
        except OSError:
            pass
    if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
        os.environ["MALLOC_MMAP_THRESHOLD_"] = str(1 << 40)
        os.environ["MALLOC_TRIM_THRESHOLD_"] = str(1 << 40)
        os.execv(sys.executable, [sys.executable] + sys.argv)
