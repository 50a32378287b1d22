"""Distributed connected components: accepted pairs → cluster ids.

The reference computes transitive closure with a union-find dict in DRIVER
MEMORY (``[ref: mc_models.py dedupe_reindex — unverified]``) — its scalability
wall (SURVEY.md A2, §3.2). Here: the Hash-to-Min algorithm (Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013)
expressed as iterative groupby-aggregate shuffles over Ray Data — O(log d)
rounds, no driver-side state, each round's frontier checkpointable.

UINT64-NATIVE (VERDICT r3 #3): nodes are 63-bit conversation-id hashes
(``functions.hashing.cid64``), so every closure round shuffles 16-32 bytes per
row instead of two variable-length strings. Virtual relay nodes set BIT 63 —
they sort above every real node, so the component minimum (the cluster label)
is always real — and carry their ROOT id in a side column (``ur``/``vr``,
0 for real nodes) so each round can re-add the implicit relay→root edge
without decoding anything from the id.

Round: for each node u with current candidate set Γ(u) (initially its edge
neighbors + itself), let m = min Γ(u); emit (m, w) for every w ∈ Γ(u) and
(w, m) for every w. Fixpoint: every node paired with its component minimum.
Convergence is detected with an order-insensitive checksum aggregate — no
driver-side materialization of the pair set.

Output is (node: uint64, cluster: uint64) — component membership. Callers
that need string ids (the flagship's cluster write) join conv_id back ONCE
from the signatures table and pick the min string per component there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.hashing import U64, splitmix64
from mediachain_indexer_ray.stages.partition import grouped_partitions

VIRT_BIT = U64(1) << U64(63)  # relay tag: real node ids are 63-bit (cid64)

_EMPTY_FRONTIER = pa.table(
    {
        "u": pa.array([], pa.uint64()),
        "v": pa.array([], pa.uint64()),
        "ur": pa.array([], pa.uint64()),
        "vr": pa.array([], pa.uint64()),
    }
)

_EMPTY_COMP = pa.table(
    {"node": pa.array([], pa.uint64()), "cluster": pa.array([], pa.uint64())}
)


def _col_u64(t: pa.Table, name: str) -> np.ndarray:
    return np.asarray(
        t.column(name).to_numpy(zero_copy_only=False), dtype=np.uint64
    )


def _edges_to_initial(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(a,b) uint64 → symmetric frontier rows (u,v,ur,vr) incl. self-loops
    implicitly (the round function adds (w,m) for every node)."""

    def _sym(b: pa.Table) -> pa.Table:
        a = _col_u64(b, "a")
        bb = _col_u64(b, "b")
        z = np.zeros(2 * len(a), np.uint64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, bb])),
                "v": pa.array(np.concatenate([bb, a])),
                "ur": pa.array(z),
                "vr": pa.array(z),
            }
        )

    return edges.map_batches(_sym, batch_format="pyarrow", zero_copy_batch=True)


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


def _np_cc(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over uint64 edge endpoint arrays.
    Returns (sorted unique node array, label index per node); sorted order
    makes min index == min id (and real < virtual by the BIT-63 invariant)."""
    nodes = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    return nodes, _cc_labels(ui, vi, len(nodes))


DRIVER_CC_MAX_EDGES = 5_000_000  # two-phase fast path bound: the contracted
# star edges (≈ one row per edge-node) must fit comfortably on the driver


def _local_contract(t: pa.Table) -> pa.Table:
    """Phase-1 map of the two-phase path: local CC of the partition's
    subgraph, emitting ONE star row (w, local_min) per local node."""
    if t.num_rows == 0:
        return pa.table(
            {"u": pa.array([], pa.uint64()), "v": pa.array([], pa.uint64())}
        )
    nodes, labels = _np_cc(_col_u64(t, "u"), _col_u64(t, "v"))
    return pa.table({"u": pa.array(nodes), "v": pa.array(nodes[labels])})


def _two_phase_cc(
    edges: ray.data.Dataset, cfg: Config, num_parts: int | None
) -> tuple[ray.data.Dataset, tuple[np.ndarray, np.ndarray]]:
    """Two-phase components for driver-mergeable graphs (n_edges ≤
    DRIVER_CC_MAX_EDGES): ONE distributed local-contraction job shrinks each
    partition's subgraph to a star (O(local nodes) rows), then the union of
    stars — ≈ one row per edge-node, 16 bytes each — is merged with the same
    vectorized kernel on the driver. Replaces 3-4 iterative shuffle rounds
    plus convergence checks with one job + one tiny merge; the iterative
    relay-routed Hash-to-Min remains the beyond-driver (100 TB) path.

    Returns (components dataset, (sorted node array, cluster label array)) —
    the aligned arrays fall out of the driver merge for free and let the
    caller label + singleton-filter the id stream in ONE broadcast map with
    no extra Ray job (dedupe pipeline cluster write)."""

    def _strip(b: pa.Table) -> pa.Table:
        return b.select(["u", "v"])

    contracted = grouped_partitions(
        _edges_to_initial(edges).map_batches(
            _strip, batch_format="pyarrow", zero_copy_batch=True
        ),
        "u",
        _local_contract,
        num_parts,
    )
    tabs = [t for t in ray.get(contracted.to_arrow_refs()) if t.num_rows > 0]
    if not tabs:
        return ray.data.from_arrow(_EMPTY_COMP), (
            np.empty(0, np.uint64),
            np.empty(0, np.uint64),
        )
    t = pa.concat_tables(tabs).combine_chunks()
    nodes, labels = _np_cc(_col_u64(t, "u"), _col_u64(t, "v"))
    clusters = nodes[labels]
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "cluster": pa.array(clusters)})
    ), (nodes, clusters)


_RELAY_GAMMA = U64(0x94D049BB133111EB)


def _hash_to_min_round(t: pa.Table, fanin: int = 256) -> pa.Table:
    """One Hash-to-Min round over a hash partition WITH LOCAL CONTRACTION:
    compute connected components of the partition's local (u,v) subgraph
    (vectorized min-label propagation with pointer jumping), then emit

    * down rows ``(w, m)`` for every node (each node keeps learning its
      component minimum), and
    * up rows that let the minimum re-broadcast label improvements — but
      routed through SALTED VIRTUAL RELAY nodes when a local component
      exceeds ``fanin``: ``(relay, w)`` + distinct ``(m, relay)`` instead of
      ``(m, w)`` for every member. The partition holding a viral component's
      minimum then receives O(P·fanin) relay rows instead of the whole
      component, and each relay's partition O(|C|/fanin) member rows (the
      balanced-tree idea of BTS, ICDE 2024 — PAPERS.md:5).

    Virtual relay ids are ``VIRT_BIT | splitmix64(root ^ γ·(salt+1)) >> 1``:
    bit 63 keeps them above every real node in sort order (so they are never
    a component minimum — minima label clusters), and every row that mentions
    a virtual node carries its ROOT id in the paired ``ur``/``vr`` column
    (0 ⇔ real), so the implicit (relay → root) edge is re-added each round
    from the columns alone — nothing is decoded from the id. All work is
    numpy over fixed-width uint64 arrays; no strings ride any round."""
    n = t.num_rows
    if n == 0:
        return _EMPTY_FRONTIER
    u = _col_u64(t, "u")
    v = _col_u64(t, "v")
    ur = _col_u64(t, "ur")
    vr = _col_u64(t, "vr")

    # node universe: endpoints plus the roots of every virtual id mentioned
    # (a root may be absent from this partition's own rows)
    all_ids = np.concatenate([u, v])
    all_roots = np.concatenate([ur, vr])
    virt_rows = all_roots != 0
    nodes = np.unique(
        np.concatenate([all_ids, all_roots[virt_rows]])
        if virt_rows.any()
        else all_ids
    )
    n_nodes = len(nodes)
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    # root of each virtual node in the universe (every mention carries it)
    node_root = np.zeros(n_nodes, np.uint64)
    if virt_rows.any():
        vid = all_ids[virt_rows]
        vroot = all_roots[virt_rows]
        pos = np.searchsorted(nodes, vid)
        node_root[pos] = vroot  # duplicates agree: id determines (root, salt)
        # implicit relay→root edges
        uniq_pos, first = np.unique(pos, return_index=True)
        ui = np.concatenate([ui, uniq_pos])
        vi = np.concatenate([vi, np.searchsorted(nodes, vroot[first])])
    labels = _cc_labels(ui, vi, n_nodes)
    is_virtual = (nodes & VIRT_BIT) != 0
    non_root = labels != np.arange(n_nodes)

    # OWNERSHIP: this partition holds every row whose u hashes here, so the
    # nodes present on the u side are exactly the ones it owns this round
    # (every node is owned by exactly one partition: any round that mentions
    # w as v also emits w's (w, m) down row). Up/relay rows are emitted ONLY
    # for owned nodes — a node seen merely as v would otherwise be re-relayed
    # by every partition whose universe it grazes (~2-3× duplicate rows on a
    # viral star, measured). Down rows still cover the whole universe: they
    # are the min-broadcast that must cross partitions.
    owned = np.zeros(n_nodes, bool)
    owned[np.searchsorted(nodes, np.unique(u))] = True

    # component sizes (by root label index) decide direct vs relay up-routing
    comp_size = np.bincount(labels, minlength=n_nodes)
    big = comp_size[labels] > fanin

    zeros = np.zeros(n_nodes, np.uint64)
    out_u = [nodes]                    # down rows: (w, m) ∀ w
    out_ur = [node_root]               # w may be virtual
    out_v = [nodes[labels]]            # labels are always real (BIT-63 sort)
    out_vr = [zeros]
    direct = np.flatnonzero(owned & non_root & (~big | is_virtual))
    if len(direct):
        # small components, and virtual members of big ones, report straight
        # to the minimum — both are bounded (≤ fanin, ≤ distinct relays)
        out_u.append(nodes[labels[direct]])
        out_ur.append(np.zeros(len(direct), np.uint64))
        out_v.append(nodes[direct])
        out_vr.append(node_root[direct])
    relayed = np.flatnonzero(owned & non_root & big & ~is_virtual)
    if len(relayed):
        members = nodes[relayed]
        roots = nodes[labels[relayed]]
        salts = splitmix64(members ^ U64(0xC10)) % np.uint64(fanin)
        relay_ids = VIRT_BIT | (
            splitmix64(roots ^ (_RELAY_GAMMA * (salts + U64(1)))) >> U64(1)
        )
        out_u.append(relay_ids)        # (relay, w): relay learns member
        out_ur.append(roots)
        out_v.append(members)
        out_vr.append(np.zeros(len(relayed), np.uint64))
        # distinct (m, relay) rows: pack (root label idx, salt) to dedup
        packed = labels[relayed].astype(np.uint64) * np.uint64(fanin) + salts
        uniq_idx = np.unique(packed, return_index=True)[1]
        out_u.append(roots[uniq_idx])
        out_ur.append(np.zeros(len(uniq_idx), np.uint64))
        out_v.append(relay_ids[uniq_idx])
        out_vr.append(roots[uniq_idx])
    return pa.table(
        {
            "u": pa.array(np.concatenate(out_u)),
            "v": pa.array(np.concatenate(out_v)),
            "ur": pa.array(np.concatenate(out_ur)),
            "vr": pa.array(np.concatenate(out_vr)),
        }
    )


def _checksum(ds: ray.data.Dataset) -> tuple[int, int]:
    """(row_count, order-insensitive uint64 checksum) of the (u,v) pair set."""

    def _sum_batch(b: pa.Table) -> pa.Table:
        h = splitmix64(
            splitmix64(_col_u64(b, "u") ^ U64(3))
            ^ splitmix64(_col_u64(b, "v") ^ U64(7))
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
    want_node_labels: bool = False,
):
    """edges (a,b) uint64 → components (node, cluster=component-minimum id),
    both uint64. Only nodes that appear in edges are emitted; singletons are
    added by the pipeline. `checkpoint(name, ds) -> ds` optionally
    materializes each round's frontier (resume support). When the caller
    knows `n_edges` and it fits DRIVER_CC_MAX_EDGES, the two-phase fast path
    runs instead of the iterative rounds (identical output by construction).

    With ``want_node_labels=True`` returns ``(ds, (nodes, clusters))`` where
    the aligned arrays (nodes SORTED) fell out of the two-phase driver merge
    for free, else ``(ds, None)`` (iterative path — caller streams the
    dataset instead).
    """
    if (
        n_edges is not None
        and n_edges <= DRIVER_CC_MAX_EDGES
        and checkpoint is None
    ):
        ds, node_labels = _two_phase_cc(edges, cfg, num_parts)
        return (ds, node_labels) if want_node_labels else ds
    if want_node_labels:
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
        if t.num_rows == 0:
            return _EMPTY_COMP
        u = _col_u64(t, "u")
        v = _col_u64(t, "v")
        # virtual relay rows are execution plumbing, not entities
        real = (u & VIRT_BIT) == 0
        u, v = u[real], v[real]
        if not len(u):
            return _EMPTY_COMP
        nodes, inv = np.unique(u, return_inverse=True)
        m = nodes.copy()  # min(v in group, u itself): the component minimum
        np.minimum.at(m, inv, v)
        return pa.table({"node": pa.array(nodes), "cluster": pa.array(m)})

    return grouped_partitions(cur, "u", _labels, P)


# ---------------------------------------------------------------------------
# uint64 components → user-facing (conv_id, cluster_id) string clusters
# ---------------------------------------------------------------------------


def _min_string_partition(t: pa.Table) -> pa.Table:
    """Within a label bucket: every row gets cluster_id = the MINIMUM conv_id
    string of its label group — the same user-facing labeling the all-string
    pipeline produced, now applied only to edge-node rows."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t, sort_keys=[("label", "ascending"), ("conv_id", "ascending")]
    )
    t = t.take(idx)
    lab = _col_u64(t, "label")
    n = len(lab)
    first = np.ones(n, bool)
    if n > 1:
        np.not_equal(lab[1:], lab[:-1], out=first[1:])
    g = np.cumsum(first) - 1
    firsts = np.flatnonzero(first)
    conv = t.column("conv_id").combine_chunks()
    m = conv.take(pa.array(firsts[g], pa.int64()))
    return pa.table({"conv_id": conv, "cluster_id": m})


def attach_string_labels(
    ids: ray.data.Dataset,
    comp: ray.data.Dataset,
    node_labels: tuple[np.ndarray, np.ndarray] | None,
    label_parts: int,
    attach_parts: int,
) -> ray.data.Dataset:
    """Join string conv_ids back onto uint64 components ONCE, at cluster
    write (VERDICT r3 #3): ids is the (conv_id) stream (one row per entity),
    comp the closure output (node, cluster). Output (conv_id, cluster_id)
    strings with cluster_id = min conv_id string per component — byte-for-byte
    the labeling the all-string pipeline produced. Non-edge nodes become
    singletons (cluster_id = own conv_id) in the same pass.

    Fast path: ``node_labels`` (sorted nodes + aligned cluster labels, free
    from the two-phase driver merge) is broadcast once; ONE map over the id
    stream splits singletons (final rows, no shuffle) from edge-node rows,
    which take a small shuffle on the uint64 label — O(edge nodes), not
    O(corpus) — to agree on the min string. Beyond-driver path: the same
    split via one hash shuffle of (comp ∪ id-hash rows) on node."""
    import pyarrow.compute as pc

    from mediachain_indexer_ray.functions.hashing import cid64

    if node_labels is not None:
        nodes, clusters = node_labels
        ref = ray.put((nodes, clusters))

        def _label(b: pa.Table) -> pa.Table:
            nds, cls = ray.get(ref)
            conv = b.column("conv_id").combine_chunks()
            h = cid64(conv)
            if len(nds):
                pos = np.clip(np.searchsorted(nds, h), 0, len(nds) - 1)
                hit = nds[pos] == h
                lab = np.where(hit, cls[pos], np.uint64(0))
            else:
                hit = np.zeros(len(h), bool)
                lab = np.zeros(len(h), np.uint64)
            return pa.table(
                {
                    "conv_id": conv,
                    "label": pa.array(lab.astype(np.uint64)),
                    "hit": pa.array(hit),
                }
            )

        tagged = ids.map_batches(_label, batch_format="pyarrow", zero_copy_batch=True)
    else:
        def _comp_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "conv_id": pa.nulls(b.num_rows, pa.string()),
                    "cluster": b.column("cluster"),
                }
            )

        def _id_rows(b: pa.Table) -> pa.Table:
            conv = b.column("conv_id").combine_chunks()
            return pa.table(
                {
                    "node": pa.array(cid64(conv)),
                    "conv_id": conv,
                    "cluster": pa.nulls(b.num_rows, pa.uint64()),
                }
            )

        mixed = comp.map_batches(
            _comp_rows, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            ids.map_batches(_id_rows, batch_format="pyarrow", zero_copy_batch=True)
        )

        def _attach(t: pa.Table) -> pa.Table:
            is_comp = pc.is_null(t.column("conv_id"))
            crows = t.filter(is_comp)
            irows = t.filter(pc.invert(is_comp))
            cn = _col_u64(crows, "node")
            cl = _col_u64(crows, "cluster")
            order = np.argsort(cn)
            cn, cl = cn[order], cl[order]
            h = _col_u64(irows, "node")
            if len(cn):
                pos = np.clip(np.searchsorted(cn, h), 0, len(cn) - 1)
                hit = cn[pos] == h
                lab = np.where(hit, cl[pos], np.uint64(0))
            else:
                hit = np.zeros(len(h), bool)
                lab = np.zeros(len(h), np.uint64)
            return pa.table(
                {
                    "conv_id": irows.column("conv_id"),
                    "label": pa.array(lab.astype(np.uint64)),
                    "hit": pa.array(hit),
                }
            )

        # consumed twice (singleton filter + label shuffle): materialize the
        # narrow (conv_id, label, hit) rows so the node shuffle runs once
        tagged = grouped_partitions(mixed, "node", _attach, attach_parts).materialize()

    def _singles(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(b.column("hit")))
        conv = t.column("conv_id")
        return pa.table({"conv_id": conv, "cluster_id": conv})

    def _hits(b: pa.Table) -> pa.Table:
        return b.filter(b.column("hit")).select(["conv_id", "label"])

    singles = tagged.map_batches(
        _singles, batch_format="pyarrow", zero_copy_batch=True
    )
    labeled = grouped_partitions(
        tagged.map_batches(_hits, batch_format="pyarrow", zero_copy_batch=True),
        "label",
        _min_string_partition,
        label_parts,
    )
    return labeled.union(singles)
