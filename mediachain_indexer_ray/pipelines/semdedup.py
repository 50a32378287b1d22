"""SemDeDup: semantic dedup via k-means clustering + within-cluster pruning.

The third embedding-level dedup shape next to the exact tiled self-join
(``similarity.embedding_near_dup``) and the hyperplane-LSH blocker
(``similarity.embedding_near_dup_lsh``): cluster the corpus with spherical
k-means, then drop every vector whose cosine similarity to an EARLIER
(lower-id) member of its own cluster is ≥ ``eps`` — the published recipe for
web-scale semantic dedup (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", PAPERS.md; the
reference's dedup family covers only lexical signatures, SURVEY §2 D2).

Semantics (deterministic, order-free): within a cluster, sort members by id;
member j is ``kept = false`` iff ∃ i < j in the same cluster with
``cos(i, j) ≥ eps``. Anchoring on ANY earlier member (not only earlier KEPT
members) makes the rule independent of evaluation order and batch layout —
the same convention as the LSH pair canonicalization (a < b) elsewhere in
the engine — and keeps an exact O(n²)-within-cluster oracle testable.

Shape at 100 TB:
  1. codebook fit on a BOUNDED ``random_sample`` (driver cost independent of
     corpus size — same protocol as ``ann_ivf_topk`` / ``build_ann_index``);
  2. one ``map_batches`` label pass (broadcast codebook, one matmul/batch);
  3. one hash shuffle on the cluster id (``grouped_partitions``): all members
     of a cluster land in one task, where the earlier-similar test runs as
     column-chunked matmuls (memory bounded by ``_TILE_COLS`` columns at a
     time, never an m×m similarity matrix in RAM).

Partitioning assumption (documented per the custom-operator contract): the
within-cluster work is inherently O(m²) dot products for a cluster of m
members — SemDeDup's own cost model. Choose ``n_clusters ≈ corpus_rows /
target_cluster_size`` so m stays bounded (the paper uses n/k ≈ 10⁴); a
pathological giant cluster concentrates flops in one task but never
materializes more than m × _TILE_COLS similarities at once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from mediachain_indexer_ray.pipelines.similarity import (
    _emb_matrix,
    _kmeans_fit,
    _normalize,
)
from mediachain_indexer_ray.stages.partition import grouped_partitions

_TILE_COLS = 4096  # bound per-task similarity memory to m × _TILE_COLS


def _drop_earlier_similar(M: np.ndarray, eps: float) -> np.ndarray:
    """kept[j] = not any(M[i] @ M[j] >= eps for i < j), M id-sorted unit rows.
    Column-chunked so peak memory is len(M) × _TILE_COLS floats."""
    m = len(M)
    kept = np.ones(m, bool)
    for lo in range(1, m, _TILE_COLS):
        hi = min(lo + _TILE_COLS, m)
        S = M[:hi] @ M[lo:hi].T  # (hi, hi-lo)
        lt = np.arange(hi)[:, None] < np.arange(lo, hi)[None, :]
        kept[lo:hi] = ~((S >= eps) & lt).any(axis=0)
    return kept


def _semdedup_partition(t: pa.Table, id_col: str, eps: float) -> pa.Table:
    """One hash bucket (≥1 whole clusters): per-cluster earlier-similar drop.
    The Python loop is over CLUSTER SEGMENTS (the unit of work), with all
    math vectorized inside each segment."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t, sort_keys=[("cluster", "ascending"), (id_col, "ascending")]
    )
    t = t.take(idx)
    ids = t.column(id_col).combine_chunks()
    clusters = t.column("cluster").to_numpy()
    M = _normalize(_emb_matrix(t))
    n = len(clusters)
    kept = np.ones(n, bool)
    if n:
        seg = np.flatnonzero(np.r_[True, clusters[1:] != clusters[:-1]])
        for s, e in zip(seg, np.append(seg[1:], n)):
            if e - s > 1:
                kept[s:e] = _drop_earlier_similar(M[s:e], eps)
    return pa.table(
        {
            id_col: ids,
            "cluster": pa.array(clusters.astype(np.int64)),
            "keep": pa.array(kept),
        }
    )


def semdedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    eps: float = 0.95,
    n_clusters: int = 16,
    train_sample: int = 16_384,
    seed: int = 42,
    n_rows: int | None = None,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(id, cluster, keep) over any (id, "embedding") dataset — see module
    docstring for semantics and the sample-fit → label → one-shuffle shape."""
    if n_rows is None:
        n_rows = ds.count()
    frac = min(1.0, train_sample / max(1, n_rows))
    sample_ds = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    sample = _normalize(
        np.concatenate(
            [
                _emb_matrix(b)
                for b in sample_ds.iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
        )
    )
    C = _kmeans_fit(sample, min(n_clusters, len(sample)), seed)
    c_ref = ray.put(C)

    def _label(b: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        M = _normalize(_emb_matrix(b))
        a = np.argmax(M @ Cm.T, axis=1)
        return b.select([id_col, "embedding"]).append_column(
            "cluster", pa.array(a.astype(np.int64))
        )

    labeled = ds.map_batches(_label, batch_format="pyarrow",
                             zero_copy_batch=True)
    return grouped_partitions(
        labeled, "cluster",
        lambda t: _semdedup_partition(t, id_col, eps),
        num_parts,
    )


def semdedup_embeddings(
    sf_dir: str, eps: float = 0.35, n_clusters: int = 16,
    train_sample: int = 16_384, seed: int = 42,
) -> ray.data.Dataset:
    """Driver entry over the ``embeddings`` table: every vector with its
    cluster and keep flag (a streaming Dataset, like ``kmeans_embeddings``).
    Rows-only (the k-means labeling is not SQL-expressible); quality pinned
    by ``tests/test_semdedup.py`` — exact parity vs the O(n²) single-cluster
    ground truth, planted-duplicate recall, and batch-layout invariance."""
    import pyarrow.parquet as pq

    from mediachain_indexer_ray.config import sized_parallelism
    from mediachain_indexer_ray.sources.transcripts import read_parquet_wide

    ds = read_parquet_wide(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    try:
        rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    except Exception:
        rows = None
    return semdedup(
        ds, eps=eps, n_clusters=n_clusters, train_sample=train_sample,
        seed=seed, n_rows=rows,
        num_parts=sized_parallelism(rows, 50_000),
    )
