"""Multimodal plumbing: actor-pool extractor builds ALL state in __init__
(never per batch/row) and its vectorized batch path matches the obvious
per-row reference computation."""

import numpy as np
import pyarrow as pa
import pytest

from mediachain_indexer_ray.pipelines.multimodal import (
    FEATURE_DIM,
    MediaFeatureExtractor,
    extract_media_features,
)


def _batch(payloads):
    n = len(payloads)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "meta": pa.array(["{}"] * n, pa.string()),
        }
    )


def test_call_does_no_state_construction(monkeypatch):
    ex = MediaFeatureExtractor()  # state (projection) built here

    def _no_rng(*a, **kw):
        raise AssertionError("RNG/state construction inside __call__")

    monkeypatch.setattr(np.random, "default_rng", _no_rng)
    out = ex(_batch([b"hello world", b"", b"abc" * 100]))
    assert out.num_rows == 3


def test_features_match_per_row_reference():
    ex = MediaFeatureExtractor()
    payloads = [b"hello", b"", b"\x00\xff" * 37, bytes(range(256)), None]
    out = ex(_batch(payloads))
    feats = np.asarray(
        out.column("feature").combine_chunks().flatten()
    ).reshape(len(payloads), FEATURE_DIM)
    proj = np.random.default_rng(0xFEED).standard_normal((251, FEATURE_DIM))
    for i, p in enumerate(payloads):
        arr = np.frombuffer(p or b"", np.uint8)
        hist = np.bincount(arr % 251, minlength=251).astype(np.float64)
        ref = np.zeros(FEATURE_DIM) if hist.sum() == 0 else (hist / hist.sum()) @ proj
        np.testing.assert_allclose(feats[i], ref, atol=1e-12)
    sizes = out.column("n_bytes").to_numpy()
    assert list(sizes) == [5, 0, 74, 256, 0]


def test_actor_pool_stage_runs(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_batch([bytes([i % 256]) * (i + 1) for i in range(200)]))
    out = extract_media_features(ds, concurrency=2, batch_size=64)
    df = out.to_pandas()
    assert len(df) == 200
    assert set(df.columns) == {"media_id", "media_type", "n_bytes", "feature"}
