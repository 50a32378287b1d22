"""SemDeDup (cluster-then-prune semantic dedup) quality gates.

Pins the three properties the rows-only driver entry relies on:
  1. single-cluster parity — with n_clusters=1 the pipeline must reproduce
     the O(n²) earlier-similar ground truth EXACTLY (no clustering recall
     loss possible, so any mismatch is an engine bug);
  2. planted-duplicate recall — tiny perturbations of existing rows co-assign
     with their originals under k-means, so every planted near-copy (higher
     id than its source) must be dropped even with many clusters;
  3. determinism / batch-layout invariance — same output from a differently
     blocked input and across runs (same seeded codebook).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _brute_kept(M: np.ndarray, eps: float) -> np.ndarray:
    """Ground truth: kept[j] iff no earlier i has cos(i, j) >= eps."""
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    n = len(M)
    kept = np.ones(n, bool)
    for j in range(1, n):
        kept[j] = not (S[:j, j] >= eps).any()
    return kept


def _write_embeddings(path, vecs):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                "embedding": pa.array(list(vecs.astype(np.float64))),
            }
        ),
        str(path),
    )


def test_semdedup_single_cluster_matches_brute_force(ray_session, tmp_path):
    from mediachain_indexer_ray.pipelines.semdedup import semdedup_embeddings

    rng = np.random.default_rng(11)
    base = rng.standard_normal((120, 12))
    # inject near-dups: rows 80.. are perturbed copies of rows 0..39
    vecs = np.concatenate([base[:80], base[:40] + 0.01 * base[40:80]])
    _write_embeddings(tmp_path / "embeddings.parquet", vecs)

    eps = 0.92
    out = (
        semdedup_embeddings(str(tmp_path), eps=eps, n_clusters=1)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    truth = _brute_kept(vecs, eps)
    assert len(out) == len(vecs)
    assert (out["vec_id"].to_numpy() == np.arange(len(vecs))).all()
    assert (out["keep"].to_numpy() == truth).all(), (
        np.flatnonzero(out["keep"].to_numpy() != truth)[:10]
    )
    assert (~truth).sum() > 0, "fixture must contain drops"


def test_semdedup_multicluster_drops_planted_copies(ray_session, tmp_path):
    from mediachain_indexer_ray.pipelines.semdedup import semdedup_embeddings

    rng = np.random.default_rng(23)
    d, n_clusters, per = 16, 6, 40
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n_clusters * per) % n_clusters
    # noise sized so SAME-cluster originals are NOT near-dups at eps=0.95
    # (sigma=0.2, d=16 -> within-cluster cos ~ 1/(1+0.64) ~ 0.61) while the
    # planted 1e-4 copies stay at cos ~ 1.0
    base = centers[labels] + 0.2 * rng.standard_normal((len(labels), d))
    # planted near-copies (ids AFTER all originals -> must be the dropped side)
    copies = base[::5] + 1e-4 * rng.standard_normal((len(base[::5]), d))
    vecs = np.concatenate([base, copies])
    _write_embeddings(tmp_path / "embeddings.parquet", vecs)

    out = (
        semdedup_embeddings(str(tmp_path), eps=0.95, n_clusters=n_clusters)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    keep = out["keep"].to_numpy()
    assert len(out) == len(vecs)
    # every planted copy sits ~on top of its original: all must be dropped
    assert (~keep[len(base):]).all(), np.flatnonzero(keep[len(base):])[:10]
    # well-separated originals at eps=0.95 are mostly kept
    assert keep[: len(base)].mean() > 0.6

    # determinism across runs
    out2 = (
        semdedup_embeddings(str(tmp_path), eps=0.95, n_clusters=n_clusters)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (out["keep"].to_numpy() == out2["keep"].to_numpy()).all()
    assert (out["cluster"].to_numpy() == out2["cluster"].to_numpy()).all()


def test_semdedup_batch_layout_invariance(ray_session):
    """Same rows through 1-block and 7-block layouts -> identical output
    (the hash shuffle must make the result independent of input blocking)."""
    import ray.data

    from mediachain_indexer_ray.pipelines.semdedup import semdedup

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((90, 8))
    vecs = np.concatenate([vecs, vecs[:30] + 1e-3])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float64))),
        }
    )

    def run(n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        return (
            semdedup(ds, eps=0.9, n_clusters=4, n_rows=len(vecs))
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    a, b = run(1), run(7)
    assert (a["keep"] == b["keep"]).all()
    assert (a["cluster"] == b["cluster"]).all()
