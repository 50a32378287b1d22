"""Distributed connected components: accepted pairs → cluster ids.

The reference computes transitive closure with a union-find dict in DRIVER
MEMORY (``[ref: mc_models.py dedupe_reindex — unverified]``) — its scalability
wall (SURVEY.md A2, §3.2). Here: the Hash-to-Min algorithm (Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013)
expressed as iterative groupby-aggregate shuffles over Ray Data — O(log d)
rounds, no driver-side state, each round's frontier checkpointable.

Round: for each node u with current candidate set Γ(u) (initially its edge
neighbors + itself), let m = min Γ(u); emit (m, w) for every w ∈ Γ(u) and
(w, m) for every w. Fixpoint: every node paired with its component minimum.
Convergence is detected with an order-insensitive checksum aggregate — no
driver-side materialization of the pair set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.hashing import hash_strings, splitmix64
from mediachain_indexer_ray.stages.partition import grouped_partitions


def _edges_to_initial(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(a,b) → symmetric candidate pairs (u,v) including self-loops."""

    def _sym(b: pa.Table) -> pa.Table:
        a = b.column("a").combine_chunks()
        bb = b.column("b").combine_chunks()
        u = pa.concat_arrays([a, bb])
        v = pa.concat_arrays([bb, a])
        return pa.table({"u": u, "v": v})

    return edges.map_batches(_sym, batch_format="pyarrow", zero_copy_batch=True)


def _hash_to_min_round(t: pa.Table) -> pa.Table:
    """One Hash-to-Min round over a u-bucket WITH LOCAL CONTRACTION: compute
    the connected components of the bucket's local (u,v) subgraph (vectorized
    min-label propagation with pointer jumping), then emit (w, m) and (m, w)
    for every node w of a local component with minimum m. Equivalent to
    Hash-to-Min with in-partition path compression — global rounds collapse to
    ~2 for the clique/star graphs dedupe produces, instead of O(log d)."""
    n = t.num_rows
    if n == 0:
        return pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())})
    un = t.column("u").to_pandas().to_numpy()
    vn = t.column("v").to_pandas().to_numpy()
    # node universe of this bucket, in sorted order (so index order = string
    # order and min-index == min-string)
    nodes, inv = np.unique(np.concatenate([un, vn]), return_inverse=True)
    ui, vi = inv[:n], inv[n:]
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = labels
        labels = labels.copy()
        np.minimum.at(labels, ui, prev[vi])
        np.minimum.at(labels, vi, prev[ui])
        labels = labels[labels]  # pointer jumping
        if np.array_equal(labels, prev):
            break
    roots = nodes[labels]
    # emit (w, m) ∀w plus (m, w) ∀w≠m, dedup'd by construction over unique nodes
    non_root = roots != nodes
    out_u = np.concatenate([nodes, roots[non_root]])
    out_v = np.concatenate([roots, nodes[non_root]])
    return pa.table(
        {"u": pa.array(out_u, pa.string()), "v": pa.array(out_v, pa.string())}
    )


def _checksum(ds: ray.data.Dataset) -> tuple[int, int]:
    """(row_count, order-insensitive uint64 checksum) of the (u,v) pair set."""

    def _sum_batch(b: pa.Table) -> pa.Table:
        h = splitmix64(
            hash_strings(b.column("u").combine_chunks(), seed=3)
            ^ splitmix64(hash_strings(b.column("v").combine_chunks(), seed=7))
        )
        with np.errstate(over="ignore"):
            s = h.sum(dtype=np.uint64)
        # fold to 32 bits so Ray's int64 sum over millions of partials can't overflow
        return pa.table({"part_sum": pa.array([int(s) % (1 << 32)]),
                         "part_cnt": pa.array([b.num_rows])})

    parts = ds.map_batches(_sum_batch, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.sum(["part_sum", "part_cnt"])
    if agg is None:
        return 0, 0
    return int(agg["sum(part_cnt)"]), int(agg["sum(part_sum)"]) % (1 << 32)


def connected_components(
    edges: ray.data.Dataset, cfg: Config, *, checkpoint=None,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """edges (a,b) → clusters (conv_id, cluster_id=component minimum).

    Only nodes that appear in edges are emitted; singletons are added by the
    pipeline (cluster_id = own conv_id). `checkpoint(name, ds) -> ds` optionally
    materializes each round's frontier (resume support).
    """
    cur = _edges_to_initial(edges)
    cur = checkpoint("closure_r0", cur) if checkpoint is not None else cur.materialize()
    prev_sig: tuple[int, int] | None = None
    prev_count = -1
    P = cfg.num_hash_partitions or num_parts
    for rnd in range(1, cfg.closure_max_rounds + 1):
        nxt = grouped_partitions(cur, "u", _hash_to_min_round, P)
        # each round's frontier is consumed twice (checksum + next round) and
        # feeds an iterative chain — materialize to stop lineage re-execution
        nxt = checkpoint(f"closure_r{rnd}", nxt) if checkpoint is not None else nxt.materialize()
        # count() on a materialized dataset is free metadata; the checksum is
        # a (cheap but nonzero) extra job — only run it when the count matches
        # the previous round, a necessary condition for set equality
        count = nxt.count()
        if count == prev_count:
            if prev_sig is None:  # lazily checksum the PREVIOUS round
                prev_sig = _checksum(cur)
            sig = _checksum(nxt)
            if sig == prev_sig:
                cur = nxt
                break
            prev_sig = sig
        else:
            prev_sig = None
        prev_count = count
        cur = nxt

    def _labels(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"), ("v", "ascending")])
        t = t.take(idx)
        un = t.column("u").to_pandas().to_numpy()
        vn = t.column("v").to_pandas().to_numpy()
        if len(un) == 0:
            return pa.table(
                {"conv_id": pa.array([], pa.string()), "cluster_id": pa.array([], pa.string())}
            )
        first = np.ones(len(un), bool)
        first[1:] = un[1:] != un[:-1]
        gstart = np.flatnonzero(first)
        m = np.minimum(vn[gstart], un[gstart])
        return pa.table(
            {
                "conv_id": pa.array(un[gstart], pa.string()),
                "cluster_id": pa.array(m, pa.string()),
            }
        )

    return grouped_partitions(cur, "u", _labels, P)
