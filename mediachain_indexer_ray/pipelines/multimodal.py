"""Multimodal column plumbing (task brief: image/audio/video as opaque binary
columns with typed metadata; reference analog: thumbnail compaction + media
fetch, ``[ref: mc_ingest.py shrink_and_encode_image, mc_crawlers.py —
unverified]``, SURVEY.md M1/S7).

The image/audio codec libraries are NOT in this container, so the decode step
is STUBBED (deterministic fake features derived from the bytes); everything
Ray-side — schema, actor-pool signature, batch sizing, output layout — is real
and tested. Swap ``_decode_stub`` for a real decoder (PIL/ffmpeg) on a cluster
that has one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),     # opaque encoded bytes
        pa.field("media_type", pa.string()),  # "image" | "audio" | "video"
        pa.field("meta", pa.string()),        # JSON metadata sidecar
    ]
)

FEATURE_DIM = 16


def _decode_stub(payload: np.ndarray) -> np.ndarray:
    """STUB decoder: real image/audio decode is unavailable in this container
    (no PIL/ffmpeg). Produces a deterministic FEATURE_DIM-dim feature from the
    raw bytes (byte histogram moments) so the downstream plumbing is exercised
    end-to-end. Raises nothing — a real implementation would decode and embed.
    """
    hist = np.bincount(payload % 251, minlength=251).astype(np.float64)
    if hist.sum() == 0:
        return np.zeros(FEATURE_DIM)
    hist /= hist.sum()
    # fixed projection: deterministic pseudo-random matrix from a constant seed
    proj = np.random.default_rng(0xFEED).standard_normal((251, FEATURE_DIM))
    return hist @ proj


class MediaFeatureExtractor:
    """Actor-pool stage: decoder/model state loads ONCE per actor in
    __init__; __call__ handles a batch of binary payloads. Use with
    ``map_batches(MediaFeatureExtractor, concurrency=N, batch_size=B)`` and a
    SMALL batch_size — payloads are large binaries (SURVEY.md §4 memory)."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        # a real impl would load the decoder + embedding model here, once
        self.proj_seed = 0xFEED

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").combine_chunks()
        n = batch.num_rows
        feats = np.zeros((n, self.feature_dim))
        sizes = np.zeros(n, np.int64)
        for i in range(n):  # per-payload decode is inherently per-item work
            buf = payloads[i].as_py() or b""
            arr = np.frombuffer(buf, dtype=np.uint8)
            sizes[i] = len(arr)
            feats[i] = _decode_stub(arr)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": pa.array(sizes),
                "feature": pa.ListArray.from_arrays(
                    np.arange(0, (n + 1) * self.feature_dim, self.feature_dim,
                              dtype=np.int32),
                    pa.array(feats.reshape(-1)),
                ),
            }
        )


def extract_media_features(
    media: ray.data.Dataset, *, concurrency: int = 2, batch_size: int = 64
) -> ray.data.Dataset:
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,       # small: payloads are big binaries
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def documents_as_media(sf_dir: str) -> ray.data.Dataset:
    """Adapter for the driver corpus: treat document text bytes as opaque
    payloads so the multimodal plumbing can run against real testdata."""

    def _f(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_id": b.column("doc_id"),
                "payload": pc.cast(b.column("text"), pa.binary()),
                "media_type": pa.array(["image"] * b.num_rows, pa.string()),
                "meta": pa.array(["{}"] * b.num_rows, pa.string()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
