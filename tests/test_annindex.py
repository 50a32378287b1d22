"""Persisted IVF-Flat ANN index (reference mc_neighbors build-once/query-many
semantics; VERDICT r4 next #1): the index checkpoint must answer queries
identically to the per-call-refit IVF path, survive crashes, and serve point
queries without a corpus scan."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mediachain_indexer_ray.pipelines import similarity as sim
from mediachain_indexer_ray.pipelines.annindex import (
    ann_index_search,
    ann_index_topk,
    build_ann_index,
    load_codebook,
)


@pytest.fixture(scope="module")
def emb_corpus(tmp_path_factory):
    """Planted clusters (same recipe as test_ann_ivf_recall)."""
    d = tmp_path_factory.mktemp("annidx")
    rng = np.random.default_rng(11)
    dim, n_clusters, per = 32, 20, 30
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n_clusters * per) % n_clusters
    vecs = centers[labels] + 0.04 * rng.standard_normal((n_clusters * per, dim))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs))),
            "embedding": pa.array(list(vecs.astype(np.float64))),
            "label": pa.array(labels),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d), vecs


def test_index_matches_per_call_ivf_exactly(emb_corpus, ray_session):
    """Build-once + query must return byte-identical rows to the per-call
    refit path (same corpus, seed, centroids, probes) — the float-op-parity
    contract the driver entry relies on."""
    sf_dir, _ = emb_corpus
    idx = ann_index_topk(sf_dir, n_centroids=24, n_probe=4).to_pandas()
    ivf = sim.ann_ivf_topk(sf_dir, n_centroids=24, n_probe=4).to_pandas()
    assert idx.equals(ivf)


def test_index_recall_vs_brute_force(emb_corpus, ray_session):
    sf_dir, _ = emb_corpus
    bf = sim.ann_cosine_topk(sf_dir).to_pandas()
    idx = ann_index_topk(sf_dir, n_centroids=24, n_probe=4).to_pandas()
    bset = set(map(tuple, bf[["q_vec_id", "vec_id"]].values))
    iset = set(map(tuple, idx[["q_vec_id", "vec_id"]].values))
    assert len(bset & iset) / len(bset) >= 0.9


def test_build_is_idempotent_and_point_queries_prune(emb_corpus, ray_session,
                                                     tmp_path):
    """Second build short-circuits on stats.json; a point query touches only
    its probed list partitions (build once, query many)."""
    sf_dir, vecs = emb_corpus
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    index_dir = str(tmp_path / "idx")
    s1 = build_ann_index(ds, index_dir, n_centroids=24, seed=42)
    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(index_dir, "lists", "*", "*.parquet"))
    }
    s2 = build_ann_index(ds, index_dir, n_centroids=24, seed=42)
    assert s1 == s2
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m  # nothing rewritten

    # point query: the query IS an indexed vector -> its own id ranks first
    q = vecs[7] / np.linalg.norm(vecs[7])
    out = ann_index_search(index_dir, np.array([0]), q[None, :], k=3).to_pandas()
    assert out.iloc[0]["vec_id"] == 7 and out.iloc[0]["rank"] == 1


def test_orphan_lists_removed_on_rebuild(emb_corpus, ray_session, tmp_path):
    """A crash between the lists write and stats.json must not leave a rerun
    appending a second full copy (same protocol as the text index)."""
    sf_dir, _ = emb_corpus
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    index_dir = str(tmp_path / "idx")
    build_ann_index(ds, index_dir, n_centroids=8, seed=42)
    os.remove(os.path.join(index_dir, "stats.json"))  # simulate the crash
    build_ann_index(ds, index_dir, n_centroids=8, seed=42)
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    total = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(index_dir, "lists", "*", "*.parquet"))
    )
    assert total == stats["n_rows"]  # exactly one copy of the corpus


def test_codebook_roundtrip(emb_corpus, ray_session, tmp_path):
    sf_dir, _ = emb_corpus
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    index_dir = str(tmp_path / "idx")
    stats = build_ann_index(ds, index_dir, n_centroids=8, seed=42)
    C = load_codebook(index_dir)
    assert C.shape == (stats["n_centroids"], stats["dim"])
    np.testing.assert_allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-9)
