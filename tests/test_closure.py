"""Distributed Hash-to-Min connected components vs networkx oracle
(SURVEY.md §5.2 / A2)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.stages.closure import connected_components


def _run_cc(edges: list[tuple[str, str]], cfg=None) -> dict[str, str]:
    t = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.string()),
            "b": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = connected_components(ds, cfg or Config(num_hash_partitions=4)).to_pandas()
    return dict(zip(out["conv_id"], out["cluster_id"]))


def _oracle(edges) -> dict[str, str]:
    g = nx.Graph()
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for n in comp:
            out[n] = m
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
    assert set(got.values()) == {"p000"}
    assert len(got) == 64


def test_star_and_singleton_free():
    edges = [("hub", f"s{i}" ) for i in range(20)] + [("x", "y")]
    got = _run_cc(edges)
    assert got["hub"] == "hub"
    assert all(got[f"s{i}"] == "hub" for i in range(20))
    assert got["x"] == got["y"] == "x"


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
    from mediachain_indexer_ray.functions.hashing import hash_strings
    from mediachain_indexer_ray.stages.closure import _hash_to_min_round

    n = 100_000
    P, fanin = 8, 64
    hub = "hub000"
    u = np.array([hub] * n + [f"m{i:06d}" for i in range(n)], object)
    v = np.array([f"m{i:06d}" for i in range(n)] + [hub] * n, object)

    max_part_rows = 0  # max partition input size, rounds ≥ 2 (steady state)
    max_root_fanin = 0
    for rnd in range(6):  # a few rounds to reach the fixpoint shape
        part = (
            hash_strings(pa.array(u, pa.string()), seed=0x5EED)
            % np.uint64(P)
        ).astype(np.int64)
        outs = []
        for p in range(P):
            sel = part == p
            if not sel.any():
                continue
            if rnd >= 2:
                max_part_rows = max(max_part_rows, int(sel.sum()))
            t = pa.table({"u": pa.array(u[sel], pa.string()),
                          "v": pa.array(v[sel], pa.string())})
            outs.append(_hash_to_min_round(t, fanin))
        out = pa.concat_tables(outs)
        u = out.column("u").to_pandas().to_numpy()
        v = out.column("v").to_pandas().to_numpy()
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
    # final labels: every member still points at the hub
    lbl = {}
    for uu, vv in zip(u, v):
        if "\x01" in uu:
            continue
        lbl.setdefault(uu, vv)
        lbl[uu] = min(lbl[uu], vv)
    members = {k: val for k, val in lbl.items() if k != hub}
    assert len(members) == n
    assert set(members.values()) == {hub}


@pytest.mark.parametrize("seed,n,m", [(3, 50, 70), (4, 80, 40)])
def test_two_phase_fast_path_matches_iterative(seed, n, m):
    """The driver-merge two-phase path (engaged when n_edges is known small)
    must produce exactly the iterative Hash-to-Min result."""
    from mediachain_indexer_ray.stages.closure import connected_components as cc

    rng = np.random.default_rng(seed)
    nodes = [f"t{i:03d}" for i in range(n)]
    edges = [
        (nodes[int(rng.integers(0, n))], nodes[int(rng.integers(0, n))])
        for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    t = pa.table({"a": pa.array([e[0] for e in edges], pa.string()),
                  "b": pa.array([e[1] for e in edges], pa.string())})
    cfg = Config(num_hash_partitions=4)
    fast = cc(ray.data.from_arrow(t), cfg, n_edges=len(edges)).to_pandas()
    slow = cc(ray.data.from_arrow(t), cfg).to_pandas()
    f = dict(zip(fast["conv_id"], fast["cluster_id"]))
    s = dict(zip(slow["conv_id"], slow["cluster_id"]))
    assert f == s == _oracle(edges)


def test_two_phase_giant_star():
    from mediachain_indexer_ray.stages.closure import connected_components as cc

    edges = [("hub", f"x{i:05d}") for i in range(20_000)]
    t = pa.table({"a": pa.array([e[0] for e in edges], pa.string()),
                  "b": pa.array([e[1] for e in edges], pa.string())})
    out = cc(ray.data.from_arrow(t), Config(num_hash_partitions=8),
             n_edges=len(edges)).to_pandas()
    assert len(out) == 20_001
    assert set(out["cluster_id"]) == {"hub"}


def test_long_chain_with_relays_converges():
    nodes = [f"q{i:05d}" for i in range(2000)]
    edges = list(zip(nodes[:-1], nodes[1:]))
    got = _run_cc(edges, Config(num_hash_partitions=8, closure_fanin=32))
    assert set(got.values()) == {"q00000"}
    assert len(got) == 2000
