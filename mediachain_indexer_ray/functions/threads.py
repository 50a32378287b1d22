"""Worker-side Arrow thread pinning.

PyArrow compute kernels (sort_indices, replace_substring_regex, utf8_*,
TableGroupBy) run on Arrow's GLOBAL thread pool, sized to the machine's
hardware concurrency — NOT to the Ray task's cpu share. With 16 concurrent
Ray tasks each fanning kernels across 16 Arrow threads, the box runs 256
runnable threads and the measured wall time of the assemble stage was 1.7×
worse (50s → 30s on the 12M-turn corpus at 16 CPUs after pinning).

Call :func:`pin_arrow_threads` at the top of every WORKER-side function that
invokes Arrow kernels (bucket fns via ``grouped_partitions``, hot
``map_batches`` UDFs). Ray parallelizes across tasks; within a task Arrow
must stay single-threaded. Never call this on the driver — driver-side
concat/sort of small tables benefits from the pool.
"""

from __future__ import annotations

import pyarrow as pa

_PINNED = False


def pin_arrow_threads(n: int = 1) -> None:
    """Idempotent per-process Arrow thread-pool cap (workers only)."""
    global _PINNED
    if not _PINNED:
        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
        _PINNED = True
