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


class ByteHistogramDecoder:
    """The STUB decoder (no PIL/ffmpeg in this container): deterministic
    byte-histogram projection features. This class defines the DECODER SEAM —
    a real implementation (PIL thumbnailer, ffmpeg frame sampler + embedding
    model) replaces it by passing ``decoder_cls=RealDecoder`` to
    :class:`MediaFeatureExtractor` / :func:`extract_media_features`:

    * ``__init__(feature_dim)`` — load ALL reusable state (decoder handles,
      model weights) ONCE per actor; here the projection matrix.
    * ``decode(data, offsets, sizes) -> (n, feature_dim) float64`` — one call
      per BATCH over the concatenated payload bytes (``data``), per-row
      ``offsets`` (len n+1 int64 into ``data``) and ``sizes`` (len n int64;
      0 = null/empty payload, its feature row must be zeroed)."""

    HIST_BINS = 251

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        # deterministic pseudo-random projection, built ONCE per actor — the
        # slot where a real implementation loads its decoder/model weights
        self.proj = np.random.default_rng(0xFEED).standard_normal(
            (self.HIST_BINS, feature_dim)
        )

    def decode(self, data: np.ndarray, offsets: np.ndarray,
               sizes: np.ndarray) -> np.ndarray:
        n = len(sizes)
        # batch byte histogram in ONE bincount: key = row*BINS + byte%BINS
        row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        keys = row_of * self.HIST_BINS + (
            data[offsets[0]:offsets[-1]] % self.HIST_BINS
        )
        hist = np.bincount(keys, minlength=n * self.HIST_BINS).astype(
            np.float64).reshape(n, self.HIST_BINS)
        tot = hist.sum(axis=1, keepdims=True)
        tot[tot == 0] = 1.0
        feats = (hist / tot) @ self.proj
        feats[sizes == 0] = 0.0
        return feats


class MediaFeatureExtractor:
    """Actor-pool stage: decoder/model state loads ONCE per actor in
    __init__; __call__ handles a batch of binary payloads. Use with
    ``map_batches(MediaFeatureExtractor, concurrency=N, batch_size=B)`` and a
    SMALL batch_size — payloads are large binaries (SURVEY.md §4 memory).

    The decoder is INJECTED (``decoder_cls``, default the byte-histogram
    stub): swapping in PIL/ffmpeg on a real cluster is a one-line change
    (VERDICT r2 #10). The template matters more than the stub: ALL reusable
    state is built in __init__, and __call__ is fully batch-vectorized —
    buffer extraction here, one ``decoder.decode`` call per batch."""

    def __init__(self, feature_dim: int = FEATURE_DIM,
                 decoder_cls: type = ByteHistogramDecoder):
        self.feature_dim = feature_dim
        self.decoder = decoder_cls(feature_dim)  # ONCE per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        payloads = batch.column("payload").combine_chunks()
        n = batch.num_rows
        if pa.types.is_binary(payloads.type):
            payloads = payloads.cast(pa.large_binary())
        bufs = payloads.buffers()
        offsets = np.frombuffer(bufs[1], np.int64)[
            payloads.offset : payloads.offset + n + 1
        ]
        data = (
            np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        null_mask = np.asarray(
            pc.is_null(payloads).to_numpy(zero_copy_only=False)
        )
        sizes = np.diff(offsets)
        sizes[null_mask] = 0
        feats = self.decoder.decode(data, offsets, sizes)
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
    media: ray.data.Dataset, *, concurrency: int = 2, batch_size: int = 64,
    decoder_cls: type = ByteHistogramDecoder,
) -> ray.data.Dataset:
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder_cls": decoder_cls},
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

    from mediachain_indexer_ray.sources.transcripts import read_parquet_wide

    ds = read_parquet_wide(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
