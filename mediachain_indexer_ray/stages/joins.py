"""As-of join — a custom operator Ray Data lacks (SURVEY.md §2.4 family).

``asof_join(left, right, ...)``: for every left row, find the greatest right
timestamp ``right_ts <= left_ts`` among right rows with a matching key, and
attach it (inner semantics: left rows with no qualifying right row are
dropped). The reference's nearest-candidate lookup family (J1/J2,
[ref: mc_models.py dedupe_lookup_async — unverified, SURVEY.md §0]) is the
capability analog; the concrete shape here is the standard event-to-latest-
fact as-of join a training-data pipeline needs.

Execution (Ray-Data-first, ONE shuffle):
  normalize both sides to a common schema (side-tagged)
    -> union
    -> hash-partition by join key (``stages.partition.grouped_partitions``)
    -> per-partition vectorized sorted-merge (numpy searchsorted on a
       composite (key-rank, ts-rank) encoding; no Python loop over keys).

PARTITIONING ASSUMPTION: all rows of a given key — from BOTH sides — land in
the same partition (guaranteed by hashing the unioned stream on the key).
Skewed keys skew partitions; P scales with cluster CPUs like every other
bucketed stage here. Right side is streamed through the same shuffle, never
broadcast — correct at any right-side size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray.stages.partition import grouped_partitions

_SIDE = "__side"
_KEY = "__key"
_TS = "__ts"


def _ts_i64(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """timestamp[*] | int64 -> int64 (epoch us for timestamps)."""
    if pa.types.is_timestamp(col.type):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    out_col: str = "asof_us",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Inner as-of join. Output: every left column (original types; ``left_ts``
    re-emitted as int64 epoch-us) + ``out_col`` (int64 epoch-us of the matched
    right timestamp). Keys must be integral."""
    lschema = left.schema()
    carry = [n for n in lschema.names if n != left_ts]
    carry_types = {
        n: lschema.types[lschema.names.index(n)] for n in carry
    }

    def _norm_left(t: pa.Table) -> pa.Table:
        cols = {
            _KEY: pc.cast(t.column(left_on), pa.int64()),
            _TS: _ts_i64(t.column(left_ts)),
            _SIDE: pa.array(np.zeros(t.num_rows, np.int8)),
        }
        for c in carry:
            cols[c] = t.column(c)
        return pa.table(cols)

    def _norm_right(t: pa.Table) -> pa.Table:
        cols = {
            _KEY: pc.cast(t.column(right_on), pa.int64()),
            _TS: _ts_i64(t.column(right_ts)),
            _SIDE: pa.array(np.ones(t.num_rows, np.int8)),
        }
        for c in carry:
            cols[c] = pa.nulls(t.num_rows, carry_types[c])
        return pa.table(cols)

    u = left.map_batches(
        _norm_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(_norm_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    def _empty() -> pa.Table:
        cols = {c: pa.nulls(0, carry_types[c]) for c in carry}
        cols[f"{left_ts}_us"] = pa.nulls(0, pa.int64())
        cols[out_col] = pa.nulls(0, pa.int64())
        return pa.table(cols)

    def _merge(t: pa.Table) -> pa.Table:
        side = t.column(_SIDE).to_numpy()
        key = t.column(_KEY).to_numpy()
        ts = t.column(_TS).to_numpy()
        lmask = side == 0
        rmask = ~lmask
        if not lmask.any() or not rmask.any():
            return _empty()
        rk, rt = key[rmask], ts[rmask]
        order = np.lexsort((rt, rk))
        rk, rt = rk[order], rt[order]
        lk, lt = key[lmask], ts[lmask]

        # composite (key-rank, ts-rank) encoding: both ranks are dense indexes
        # into partition-local sorted uniques, so rank_k * L + rank_t fits
        # int64 comfortably and preserves lexicographic order
        uk = np.unique(key)
        ut = np.unique(rt)
        L = np.int64(len(ut) + 2)
        comp_r = np.searchsorted(uk, rk).astype(np.int64) * L + np.searchsorted(
            ut, rt
        )
        # side="right" on the ts rank => right rows with rt == lt are INSIDE
        # the window (as-of is <=, inclusive)
        comp_l = np.searchsorted(uk, lk).astype(np.int64) * L + np.searchsorted(
            ut, lt, side="right"
        )
        pos = np.searchsorted(comp_r, comp_l, side="left") - 1
        safe = np.clip(pos, 0, len(rk) - 1)
        valid = (pos >= 0) & (rk[safe] == lk)
        asof = rt[safe]

        lt_tab = t.filter(pa.array(lmask))
        out_tab = pa.table(
            {
                **{c: lt_tab.column(c) for c in carry},
                f"{left_ts}_us": pa.array(lt, pa.int64()),
                out_col: pa.array(asof, pa.int64()),
            }
        )
        return out_tab.filter(pa.array(valid))

    return grouped_partitions(u, _KEY, _merge, num_parts)
