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


class _FakeDecoder:
    """Decoder-seam stand-in for a real PIL/ffmpeg decoder (VERDICT r2 #10):
    counts constructions and decode calls, returns a recognizable feature
    (first payload byte broadcast across the feature vector)."""

    init_count = 0

    def __init__(self, feature_dim):
        type(self).init_count += 1
        self.feature_dim = feature_dim

    def decode(self, data, offsets, sizes):
        n = len(sizes)
        assert offsets.shape == (n + 1,)  # batch-shaped contract
        first = np.zeros(n, np.float64)
        nz = sizes > 0
        first[nz] = data[offsets[:-1][nz]]
        return np.repeat(first, self.feature_dim).reshape(n, self.feature_dim)


def test_decoder_seam_injection():
    """Swapping the decoder is a one-line change: inject a fake decoder class
    and prove (a) state construction happens exactly once per extractor even
    across many batches, (b) decode is called per batch with batch-shaped
    buffers, (c) its output flows through to the feature column."""
    _FakeDecoder.init_count = 0
    ex = MediaFeatureExtractor(decoder_cls=_FakeDecoder)
    assert _FakeDecoder.init_count == 1
    for lo in (0, 3, 6):  # three batches through ONE extractor instance
        out = ex(_batch([bytes([10 + i]) for i in range(lo, lo + 3)]))
        feats = np.asarray(
            out.column("feature").combine_chunks().flatten()
        ).reshape(3, FEATURE_DIM)
        np.testing.assert_array_equal(
            feats[:, 0], np.array([10 + lo, 11 + lo, 12 + lo], np.float64)
        )
    assert _FakeDecoder.init_count == 1  # no per-batch reconstruction


def test_decoder_seam_through_actor_pool(ray_session):
    """The injected class must reach the remote actors through
    extract_media_features (fn_constructor_kwargs), proving the Ray-side
    plumbing of the seam — output values are the fake's, not the stub's."""
    import sys

    import ray.data
    from ray import cloudpickle

    # the fake class lives in this test module, which workers cannot import —
    # ship it by value (a real decoder lives in an importable package)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        payloads = [bytes([i % 200 + 1]) * (i + 1) for i in range(100)]
        ds = ray.data.from_arrow(_batch(payloads))
        df = (
            extract_media_features(ds, concurrency=2, batch_size=32,
                                   decoder_cls=_FakeDecoder)
            .to_pandas()
            .sort_values("media_id")
        )
    finally:
        cloudpickle.unregister_pickle_by_value(sys.modules[__name__])
    got = np.array([f[0] for f in df["feature"]])
    expect = np.array([p[0] for p in payloads], np.float64)
    np.testing.assert_array_equal(got, expect)
