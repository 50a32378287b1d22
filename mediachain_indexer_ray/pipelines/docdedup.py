"""Generic near-duplicate detection over any (id, text) table — the engine's
dedupe machinery (MinHash-LSH blocking, SimHash, n-gram Jaccard verification)
applied to single-text documents rather than assembled conversations. These are
the task brief's first-class training-data dedup operators, each exposed as a
``queries()`` entry over the driver's ``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.minhash import minhash_signatures, sample_shingles
from mediachain_indexer_ray.functions.shingle import shingle_hashes
from mediachain_indexer_ray.functions.simhash import simhash_signatures
from mediachain_indexer_ray.functions.strsim import ngram_jaccard_batch
from mediachain_indexer_ray.stages.blocking import dedup_pairs, emit_bands, emit_pairs
from mediachain_indexer_ray.stages.partition import grouped_partitions


def _doc_signatures(ds: ray.data.Dataset, cfg: Config, id_col: str, text_col: str):
    """(id, text) → signature table shaped like stages.signatures output."""

    def _fn(b: pa.Table) -> pa.Table:
        text = b.column(text_col).combine_chunks()
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " ")
        )
        if isinstance(norm, pa.ChunkedArray):  # pragma: no cover
            norm = norm.combine_chunks()
        sh, bnd = shingle_hashes(norm, cfg.shingle_k)
        sh, bnd = sample_shingles(sh, bnd, cfg.shingle_sample_mod)
        minh = minhash_signatures(sh, bnd, cfg.num_perm, cfg.seed, "oph")
        simh = simhash_signatures(sh, bnd)
        ids = pc.cast(b.column(id_col), pa.string())
        return pa.table(
            {
                "conv_id": ids,
                "minhash": pa.ListArray.from_arrays(
                    np.arange(0, (b.num_rows + 1) * cfg.num_perm, cfg.num_perm,
                              dtype=np.int32),
                    pa.array(minh.reshape(-1)),
                ),
                "simhash": pa.array(simh),
                "feature_text": pc.utf8_slice_codeunits(
                    norm, 0, cfg.feature_text_max_chars
                ).cast(pa.string()),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=cfg.sig_batch_size)


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    cfg: Config | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
) -> ray.data.Dataset:
    """MinHash-LSH candidate generation + exact n-gram-Jaccard verification.
    Returns (a, b, jaccard_milli) with a < b (string ids), jaccard as integer
    thousandths (no float columns)."""
    cfg = cfg or Config()
    sigs = _doc_signatures(ds, cfg, id_col, text_col)
    cand = dedup_pairs(emit_pairs(emit_bands(sigs, cfg), cfg), cfg)

    side = sigs.select_columns(["conv_id", "feature_text"])
    a_side = side.rename_columns({"conv_id": "a", "feature_text": "text_a"})
    b_side = side.rename_columns({"conv_id": "b", "feature_text": "text_b"})
    P = 8
    j = cand.join(a_side, join_type="inner", num_partitions=P, on=("a",))
    j = j.join(b_side, join_type="inner", num_partitions=P, on=("b",))

    def _verify(b: pa.Table) -> pa.Table:
        jac = ngram_jaccard_batch(
            b.column("text_a").combine_chunks(),
            b.column("text_b").combine_chunks(),
            cfg.shingle_k,
        )
        milli = np.floor(jac * 1000 + 0.5).astype(np.int64)
        keep = milli >= int(jaccard_threshold * 1000)
        t = pa.table(
            {
                "a": b.column("a"),
                "b": b.column("b"),
                "jaccard_milli": pa.array(milli),
            }
        ).filter(pa.array(keep))
        return t

    return j.map_batches(_verify, batch_format="pyarrow",
                         batch_size=cfg.pair_batch_size)


def simhash_table(
    ds: ray.data.Dataset, cfg: Config | None = None,
    id_col: str = "doc_id", text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc 64-bit SimHash (as int64 for hash-comparability)."""
    cfg = cfg or Config()

    def _fn(b: pa.Table) -> pa.Table:
        text = b.column(text_col).combine_chunks()
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " ")
        )
        if isinstance(norm, pa.ChunkedArray):  # pragma: no cover
            norm = norm.combine_chunks()
        sh, bnd = shingle_hashes(norm, cfg.shingle_k)
        simh = simhash_signatures(sh, bnd)
        return pa.table(
            {
                id_col: b.column(id_col),
                "simhash": pa.array(simh.view(np.int64)),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_dedup(
    ds: ray.data.Dataset, cfg: Config | None = None,
    id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8,
) -> ray.data.Dataset:
    """Strict n-gram-Jaccard near-dup pairs (higher threshold than LSH verify)."""
    return minhash_lsh_pairs(ds, cfg, id_col, text_col, jaccard_threshold=threshold)
