"""Hash-bucketed wide operations.

Ray Data's ``groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP — a
Python call per conversation/band is too slow when groups are tiny and numerous.
The pattern used throughout this engine instead: add a bucket column
``_part = hash(key) % P``, group by ``_part`` (one shuffle, P groups), and run a
VECTORIZED per-partition function (pyarrow TableGroupBy / sort + reduceat)
inside each bucket. All rows of a key land in one bucket, so group semantics
are preserved; Python-call overhead is O(P), not O(#groups).

P derives from cluster CPUs (config.default_parallelism) — on a 256-node
cluster this scales partitioning with the cluster, not a constant.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data

from mediachain_indexer_ray.config import default_parallelism
from mediachain_indexer_ray.functions.hashing import hash_strings, splitmix64

PART_COL = "__part"


def add_hash_partition(
    ds: ray.data.Dataset, key: str, num_parts: int | None = None, *, salt: int = 0
) -> tuple[ray.data.Dataset, int]:
    """Append ``__part = hash(key) % P`` (uint32) via a zero-copy Arrow map."""
    P = num_parts or default_parallelism()

    def _add(batch: pa.Table) -> pa.Table:
        col = batch.column(key)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_strings(col.combine_chunks(), seed=salt or 0x5EED)
        else:
            h = splitmix64(
                np.asarray(col.to_numpy(zero_copy_only=False)).astype(np.uint64)
                ^ np.uint64(salt or 0x5EED)
            )
        part = (h % np.uint64(P)).astype(np.uint32)
        return batch.append_column(PART_COL, pa.array(part))

    return ds.map_batches(_add, batch_format="pyarrow", zero_copy_batch=True), P


def grouped_partitions(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable[[pa.Table], pa.Table],
    num_parts: int | None = None,
    *,
    salt: int = 0,
    **map_groups_kwargs,
) -> ray.data.Dataset:
    """Shuffle by hash(key) into P buckets and apply vectorized ``fn`` to each
    bucket table (with ``__part`` already dropped). ``fn`` sees every row of any
    given key exactly once, in one table."""
    parted, P = add_hash_partition(ds, key, num_parts, salt=salt)

    def _run(t: pa.Table) -> pa.Table:
        from mediachain_indexer_ray.functions.threads import pin_arrow_threads

        pin_arrow_threads()  # Ray parallelizes across buckets; Arrow kernels
        # inside a bucket must not fan out to hardware concurrency (see
        # functions/threads.py — 1.7× assemble-stage win at 16 CPUs)
        return fn(t.drop_columns([PART_COL]))

    # num_partitions parallelizes the sort-shuffle reduce side (without it the
    # reduce task count follows input blocks, which serializes small shuffles)
    return parted.groupby(PART_COL, num_partitions=P).map_groups(
        _run, batch_format="pyarrow", **map_groups_kwargs
    )
