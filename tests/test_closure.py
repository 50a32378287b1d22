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
