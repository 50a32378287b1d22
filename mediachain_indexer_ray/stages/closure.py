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


RELAY_MARKER = "\x01"  # reserved char: real conv ids must not contain it


def _take(arr: pa.Array, idx: np.ndarray) -> pa.Array:
    return arr.take(pa.array(idx, pa.int64()))


def _cc_labels(ui: np.ndarray, vi: np.ndarray, n: int) -> np.ndarray:
    """Min-label propagation with pointer jumping over integer edge endpoint
    arrays — iterations O(log d) on the contracted graph. Returns the label
    (component-minimum node index) per node."""
    labels = np.arange(n, dtype=np.int64)
    while True:
        prev = labels
        labels = labels.copy()
        np.minimum.at(labels, ui, prev[vi])
        np.minimum.at(labels, vi, prev[ui])
        labels = labels[labels]  # pointer jumping
        if np.array_equal(labels, prev):
            break
    return labels


def _arrow_cc(u: pa.Array, v: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Vectorized connected components over string edge arrays, with the node
    universe built by ARROW kernels (hash unique + sort + index_in — C++,
    multithreaded where the pool allows) instead of ``np.unique`` over python
    object arrays (which cost ~3 s per million strings on the driver merge,
    measured). Returns (sorted unique node Array, label index per node);
    sorted order makes min index == min string."""
    uniq = pc.unique(pa.chunked_array([u, v]))
    nodes = uniq.take(pc.array_sort_indices(uniq))
    ui = np.asarray(pc.index_in(u, value_set=nodes).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    vi = np.asarray(pc.index_in(v, value_set=nodes).to_numpy(zero_copy_only=False),
                    dtype=np.int64)
    return nodes, _cc_labels(ui, vi, len(nodes))


DRIVER_CC_MAX_EDGES = 5_000_000  # two-phase fast path bound: the contracted
# star edges (≈ one row per edge-node) must fit comfortably on the driver


def _local_contract(t: pa.Table) -> pa.Table:
    """Phase-1 map of the two-phase path: local CC of the partition's
    subgraph, emitting ONE star row (w, local_min) per local node."""
    if t.num_rows == 0:
        return pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())})
    nodes, labels = _arrow_cc(
        t.column("u").combine_chunks(), t.column("v").combine_chunks()
    )
    return pa.table({"u": nodes, "v": nodes.take(pa.array(labels))})


def _two_phase_cc(
    edges: ray.data.Dataset, cfg: Config, num_parts: int | None
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Two-phase components for driver-mergeable graphs (n_edges ≤
    DRIVER_CC_MAX_EDGES): ONE distributed local-contraction job shrinks each
    partition's subgraph to a star (O(local nodes) rows), then the union of
    stars — ≈ one row per edge-node — is merged with the same vectorized
    kernel on the driver. Replaces 3-4 iterative shuffle rounds plus
    convergence checks with one job + one tiny merge; the iterative
    relay-routed Hash-to-Min remains the beyond-driver (100 TB) path.

    Returns (clusters dataset, SORTED uint64 hash array of the edge nodes) —
    the hashes fall out of the driver merge for free and let the caller skip
    a whole extra Ray job when it needs the edge-node set (singleton
    anti-filtering in the dedupe pipeline)."""
    contracted = grouped_partitions(
        _edges_to_initial(edges), "u", _local_contract, num_parts
    )
    tabs = [t for t in ray.get(contracted.to_arrow_refs()) if t.num_rows > 0]
    if not tabs:
        return ray.data.from_arrow(
            pa.table({"conv_id": pa.array([], pa.string()),
                      "cluster_id": pa.array([], pa.string())})
        ), np.empty(0, np.uint64)
    t = pa.concat_tables(tabs).combine_chunks()
    nodes, labels = _arrow_cc(
        t.column("u").combine_chunks(), t.column("v").combine_chunks()
    )
    node_hashes = np.sort(hash_strings(nodes))
    return ray.data.from_arrow(
        pa.table({"conv_id": nodes, "cluster_id": nodes.take(pa.array(labels))})
    ), node_hashes


def _hash_to_min_round(t: pa.Table, fanin: int = 256) -> pa.Table:
    """One Hash-to-Min round over a hash partition WITH LOCAL CONTRACTION:
    compute connected components of the partition's local (u,v) subgraph
    (vectorized min-label propagation with pointer jumping), then emit

    * down rows ``(w, m)`` for every node (each node keeps learning its
      component minimum), and
    * up rows that let the minimum re-broadcast label improvements — but
      routed through SALTED VIRTUAL RELAY nodes (``m\\x01salt``) when a local
      component exceeds ``fanin``: ``(relay, w)`` + distinct ``(m, relay)``
      instead of ``(m, w)`` for every member. The partition holding a viral
      component's minimum then receives O(P·fanin) relay rows instead of the
      whole component, and each relay's partition O(|C|/fanin) member rows
      (the balanced-tree idea of BTS, ICDE 2024 — PAPERS.md:5). Virtual nodes
      encode their root in their id; each round re-adds the implicit
      (relay → root) edge, and the final labeling drops virtual rows.

    Equivalent to Hash-to-Min with in-partition path compression — global
    rounds stay ~2-4 for the clique/star graphs dedupe produces. All string
    work (unique, index, relay-id construction) runs on Arrow kernels; only
    integer label arrays touch numpy."""
    n = t.num_rows
    if n == 0:
        return pa.table({"u": pa.array([], pa.string()), "v": pa.array([], pa.string())})
    u = t.column("u").combine_chunks()
    v = t.column("v").combine_chunks()
    # node universe of this partition, in sorted order (so index order =
    # string order and min-index == min-string)
    uniq0 = pc.unique(pa.chunked_array([u, v]))
    is_v0 = pc.match_substring(uniq0, RELAY_MARKER)
    has_relays = bool(pc.any(is_v0).as_py() or False)
    if has_relays:
        # implicit relay→root edges (the decoded root may be absent from this
        # partition's rows — fold it into the node universe first). Virtual
        # relay ids are ``root + RELAY_MARKER + salt``.
        sub = uniq0.filter(is_v0)
        vroots = pc.list_element(
            pc.split_pattern(sub, RELAY_MARKER, max_splits=1), 0
        )
        allv = pc.unique(pa.chunked_array([uniq0, vroots]))
        nodes = allv.take(pc.array_sort_indices(allv))
        as_idx = lambda a: np.asarray(  # noqa: E731
            pc.index_in(a, value_set=nodes).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        ui = np.concatenate([as_idx(u), as_idx(sub)])
        vi = np.concatenate([as_idx(v), as_idx(vroots)])
    else:
        nodes = uniq0.take(pc.array_sort_indices(uniq0))
        as_idx = lambda a: np.asarray(  # noqa: E731
            pc.index_in(a, value_set=nodes).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        ui, vi = as_idx(u), as_idx(v)
    labels = _cc_labels(ui, vi, len(nodes))
    is_virtual = np.asarray(
        pc.match_substring(nodes, RELAY_MARKER).to_numpy(zero_copy_only=False)
    )
    non_root = labels != np.arange(len(nodes))

    # component sizes (by root label index) decide direct vs relay up-routing
    comp_size = np.bincount(labels, minlength=len(nodes))
    big = comp_size[labels] > fanin

    out_u = [nodes]                       # down rows: (w, m) ∀ w
    out_v = [_take(nodes, labels)]        # (includes (m, m) self rows)
    direct = np.flatnonzero(non_root & (~big | is_virtual))
    if len(direct):
        # small components, and virtual members of big ones, report straight
        # to the minimum — both are bounded (≤ fanin, ≤ distinct relays)
        out_u.append(_take(nodes, labels[direct]))
        out_v.append(_take(nodes, direct))
    relayed = np.flatnonzero(non_root & big & ~is_virtual)
    if len(relayed):
        from mediachain_indexer_ray.functions.hashing import hash_strings

        salts = hash_strings(_take(nodes, relayed), seed=0xC10) % np.uint64(fanin)
        relay_ids = pc.binary_join_element_wise(
            _take(nodes, labels[relayed]),
            pa.array(salts.astype("U"), pa.string()),
            RELAY_MARKER,
        )
        out_u.append(relay_ids)            # (relay, w): relay learns member
        out_v.append(_take(nodes, relayed))
        # distinct (m, relay) rows: pack (root label idx, salt) to dedup
        packed = labels[relayed].astype(np.uint64) * np.uint64(fanin) + salts
        uniq_idx = np.unique(packed, return_index=True)[1]
        out_u.append(_take(nodes, labels[relayed][uniq_idx]))
        out_v.append(relay_ids.take(pa.array(uniq_idx, pa.int64())))
    return pa.table(
        {
            "u": pa.concat_arrays([a.cast(pa.string()) for a in out_u]),
            "v": pa.concat_arrays([a.cast(pa.string()) for a in out_v]),
        }
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
    num_parts: int | None = None, n_edges: int | None = None,
    want_node_hashes: bool = False,
):
    """edges (a,b) → clusters (conv_id, cluster_id=component minimum).

    Only nodes that appear in edges are emitted; singletons are added by the
    pipeline (cluster_id = own conv_id). `checkpoint(name, ds) -> ds` optionally
    materializes each round's frontier (resume support). When the caller knows
    `n_edges` and it fits DRIVER_CC_MAX_EDGES, the two-phase fast path runs
    instead of the iterative rounds (identical output by construction).

    With ``want_node_hashes=True`` returns ``(ds, hashes)`` where hashes is a
    sorted uint64 array of the edge-node id-hashes when the two-phase path
    computed it for free, else None (caller falls back to its own job).
    """
    if (
        n_edges is not None
        and n_edges <= DRIVER_CC_MAX_EDGES
        and checkpoint is None
    ):
        ds, node_hashes = _two_phase_cc(edges, cfg, num_parts)
        return (ds, node_hashes) if want_node_hashes else ds
    if want_node_hashes:
        return (
            connected_components(
                edges, cfg, checkpoint=checkpoint, num_parts=num_parts,
            ),
            None,
        )
    cur = _edges_to_initial(edges)
    # r0 is consumed exactly once (by round 1's shuffle) and is never
    # checksummed — leave it lazy; materializing it was a full extra pass
    if checkpoint is not None:
        cur = checkpoint("closure_r0", cur)
    prev_sig: tuple[int, int] | None = None
    prev_count = -1
    P = cfg.num_hash_partitions or num_parts
    fanin = cfg.closure_fanin
    for rnd in range(1, cfg.closure_max_rounds + 1):
        nxt = grouped_partitions(
            cur, "u", lambda t: _hash_to_min_round(t, fanin), P
        )
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
        # virtual relay rows are execution plumbing, not entities
        keep = pc.invert(pc.match_substring(t.column("u"), RELAY_MARKER))
        t = t.filter(keep)
        idx = pc.sort_indices(t, sort_keys=[("u", "ascending"), ("v", "ascending")])
        t = t.take(idx)
        if t.num_rows == 0:
            return pa.table(
                {"conv_id": pa.array([], pa.string()), "cluster_id": pa.array([], pa.string())}
            )
        u = t.column("u").combine_chunks()
        v = t.column("v").combine_chunks()
        # group starts via dictionary codes (sorted input → equal neighbors
        # share a code): integer compares, no python string objects
        codes = np.asarray(u.dictionary_encode().indices.to_numpy(zero_copy_only=False))
        first = np.ones(len(codes), bool)
        np.not_equal(codes[1:], codes[:-1], out=first[1:])
        gstart = np.flatnonzero(first)
        ug, vg = _take(u, gstart), _take(v, gstart)
        m = pc.if_else(pc.less(vg, ug), vg, ug)  # elementwise string min
        return pa.table({"conv_id": ug, "cluster_id": m})

    return grouped_partitions(cur, "u", _labels, P)
