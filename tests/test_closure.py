"""Distributed Hash-to-Min connected components vs networkx oracle
(SURVEY.md §5.2 / A2) — uint64-native: nodes are 63-bit id-hashes
(functions.hashing.cid64), relays carry bit 63 + a root side-column."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.hashing import cid64
from mediachain_indexer_ray.stages.closure import (
    attach_string_labels,
    connected_components,
)


def _h(name: str) -> int:
    return int(cid64(pa.array([name], pa.string()))[0])


def _edges_ds(edges: list[tuple[str, str]]) -> ray.data.Dataset:
    t = pa.table(
        {
            "a": pa.array(cid64(pa.array([e[0] for e in edges], pa.string()))),
            "b": pa.array(cid64(pa.array([e[1] for e in edges], pa.string()))),
        }
    )
    return ray.data.from_arrow(t)


def _run_cc(edges: list[tuple[str, str]], cfg=None, n_edges=None) -> dict[int, int]:
    out = connected_components(
        _edges_ds(edges), cfg or Config(num_hash_partitions=4), n_edges=n_edges
    ).to_pandas()
    return dict(zip(out["node"].astype(np.uint64), out["cluster"].astype(np.uint64)))


def _oracle(edges) -> dict[int, int]:
    """networkx components over the HASHED node ids: label = min cid64."""
    g = nx.Graph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        hs = {n: _h(n) for n in comp}
        m = min(hs.values())
        for n in comp:
            out[hs[n]] = m
    return out


@pytest.mark.parametrize("seed,n,m", [(0, 30, 20), (1, 60, 80), (2, 40, 39)])
def test_random_graphs_match_networkx(seed, n, m):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = [
        (nodes[int(rng.integers(0, n))], nodes[int(rng.integers(0, n))])
        for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_cc(edges) == _oracle(edges)


def test_chain_graph_converges():
    # pathological diameter: a long path — O(log d) rounds must still converge
    nodes = [f"p{i:03d}" for i in range(64)]
    edges = list(zip(nodes[:-1], nodes[1:]))
    got = _run_cc(edges)
    m = min(_h(x) for x in nodes)
    assert set(got.values()) == {m}
    assert len(got) == 64


def test_star_and_singleton_free():
    edges = [("hub", f"s{i}") for i in range(20)] + [("x", "y")]
    got = _run_cc(edges)
    star_min = min(_h("hub"), *(_h(f"s{i}") for i in range(20)))
    assert got[_h("hub")] == star_min
    assert all(got[_h(f"s{i}")] == star_min for i in range(20))
    assert got[_h("x")] == got[_h("y")] == min(_h("x"), _h("y"))


def test_giant_star_matches_networkx():
    """A viral component (star ≫ closure_fanin) still matches networkx via
    the salted-relay routing (VERDICT r1 #7)."""
    n = 30_000
    edges = [("hub000", f"m{i:06d}") for i in range(n)] + [("zz1", "zz2")]
    cfg = Config(num_hash_partitions=8, closure_fanin=64)
    got = _run_cc(edges, cfg)
    assert got == _oracle(edges)


def test_giant_star_bounded_fanin_rounds():
    """Drive the round function per hash-partition IN-PROCESS on a giant star
    and assert no partition's input ever approaches the component size — the
    relay routing caps the minimum's fan-in at ~P·fanin and each relay at
    ~|C|/fanin (VERDICT r1 #7: 'without one bucket holding the whole
    component')."""
    from mediachain_indexer_ray.functions.hashing import splitmix64
    from mediachain_indexer_ray.stages.closure import VIRT_BIT, _hash_to_min_round

    n = 100_000
    P, fanin = 8, 64
    hub = _h("hub000")
    members = cid64(pa.array([f"m{i:06d}" for i in range(n)], pa.string()))
    u = np.concatenate([np.full(n, hub, np.uint64), members])
    v = np.concatenate([members, np.full(n, hub, np.uint64)])
    ur = np.zeros(2 * n, np.uint64)
    vr = np.zeros(2 * n, np.uint64)

    max_part_rows = 0  # max partition input size, rounds ≥ 2 (steady state)
    max_root_fanin = 0
    for rnd in range(6):  # a few rounds to reach the fixpoint shape
        part = (splitmix64(u ^ np.uint64(0x5EED)) % np.uint64(P)).astype(np.int64)
        outs = []
        for p in range(P):
            sel = part == p
            if not sel.any():
                continue
            if rnd >= 2:
                max_part_rows = max(max_part_rows, int(sel.sum()))
            t = pa.table({"u": pa.array(u[sel]), "v": pa.array(v[sel]),
                          "ur": pa.array(ur[sel]), "vr": pa.array(vr[sel])})
            outs.append(_hash_to_min_round(t, fanin))
        out = pa.concat_tables(outs)
        u = np.asarray(out.column("u").to_numpy(), np.uint64)
        v = np.asarray(out.column("v").to_numpy(), np.uint64)
        ur = np.asarray(out.column("ur").to_numpy(), np.uint64)
        vr = np.asarray(out.column("vr").to_numpy(), np.uint64)
        max_root_fanin = max(max_root_fanin, int((u == hub).sum()))

    # the root's rows are relay handles, never the member list: O(P·fanin)
    # (each partition contributes ≤ fanin distinct (root, relay) rows plus
    # ≤ fanin direct rows for virtual members it hosts), NOT O(n)
    assert max_root_fanin <= 4 * P * fanin, max_root_fanin
    assert max_root_fanin < n // 20
    # steady-state partition load = O(n/P + (n/fanin)·relays-per-partition),
    # below the old behavior where the root's partition alone held the whole
    # member list (> n rows) on top of its hash share
    assert max_part_rows < (3 * n) // 4, max_part_rows
    # final labels: every member still points at the hub's component min
    comp_min = min(int(hub), *(int(x) for x in members.tolist()))
    lbl = {}
    for uu, vv in zip(u.tolist(), v.tolist()):
        if uu & int(VIRT_BIT):
            continue
        lbl.setdefault(uu, vv)
        lbl[uu] = min(lbl[uu], vv)
    mem = {k: val for k, val in lbl.items() if k != comp_min}
    assert len(mem) == n
    assert set(mem.values()) == {comp_min}


@pytest.mark.parametrize("seed,n,m", [(3, 50, 70), (4, 80, 40)])
def test_two_phase_fast_path_matches_iterative(seed, n, m):
    """The driver-merge two-phase path (engaged when n_edges is known small)
    must produce exactly the iterative Hash-to-Min result."""
    rng = np.random.default_rng(seed)
    nodes = [f"t{i:03d}" for i in range(n)]
    edges = [
        (nodes[int(rng.integers(0, n))], nodes[int(rng.integers(0, n))])
        for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    fast = _run_cc(edges, n_edges=len(edges))
    slow = _run_cc(edges)
    assert fast == slow == _oracle(edges)


def test_two_phase_giant_star():
    edges = [("hub", f"x{i:05d}") for i in range(20_000)]
    got = _run_cc(edges, Config(num_hash_partitions=8), n_edges=len(edges))
    m = min(_h("hub"), *(_h(f"x{i:05d}") for i in range(20_000)))
    assert len(got) == 20_001
    assert set(got.values()) == {m}


def test_long_chain_with_relays_converges():
    nodes = [f"q{i:05d}" for i in range(2000)]
    edges = list(zip(nodes[:-1], nodes[1:]))
    got = _run_cc(edges, Config(num_hash_partitions=8, closure_fanin=32))
    m = min(_h(x) for x in nodes)
    assert set(got.values()) == {m}
    assert len(got) == 2000


@pytest.mark.parametrize("force_iterative", [False, True])
def test_attach_string_labels_both_paths(force_iterative):
    """attach_string_labels joins conv_id strings back onto u64 components:
    cluster_id = MIN STRING per component, non-edge ids become singletons —
    identical output on the broadcast (two-phase) and shuffle (iterative)
    paths."""
    edges = [("c3", "c1"), ("c1", "c9"), ("b2", "b1")]
    ids = [f"c{i}" for i in range(10)] + ["b1", "b2", "zz"]
    cfg = Config(num_hash_partitions=4)
    ds_ids = ray.data.from_arrow(pa.table({"conv_id": pa.array(ids, pa.string())}))
    comp, node_labels = connected_components(
        _edges_ds(edges), cfg, n_edges=None if force_iterative else len(edges),
        num_parts=4, want_node_labels=True,
    )
    out = attach_string_labels(ds_ids, comp, node_labels, 4, 4).to_pandas()
    got = dict(zip(out["conv_id"], out["cluster_id"]))
    assert len(out) == len(ids)
    assert got["c1"] == got["c3"] == got["c9"] == "c1"
    assert got["b1"] == got["b2"] == "b1"
    for x in ("c0", "c2", "c4", "zz"):
        assert got[x] == x
