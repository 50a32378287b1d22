"""Signature computation: conversations → (digest, MinHash, SimHash, feature text).

The transcript-native replacement for the reference's perceptual-hash step
(``[ref: mc_models.py img_to_hsh / VectorsBaseline.img_to_terms — unverified]``,
SURVEY.md M4/M5): a stateless, CPU-bound ``map_batches`` over zero-copy Arrow
batches — the turns/sec workhorse of the whole pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.hashing import as_array, content_digest
from mediachain_indexer_ray.functions.minhash import minhash_signatures, sample_shingles
from mediachain_indexer_ray.functions.shingle import shingle_hashes
from mediachain_indexer_ray.functions.simhash import simhash_signatures



def compute_signatures_batch(batch: pa.Table, cfg: Config) -> pa.Table:
    from mediachain_indexer_ray.functions.threads import pin_arrow_threads

    pin_arrow_threads()  # worker-side: Ray parallelizes across batches
    from mediachain_indexer_ray.stages.assemble import normalize_text

    conv_id = batch.column("conv_id")
    doc_text = batch.column("doc_text")
    # normalization is DERIVED here (one vectorized pass over text this stage
    # already holds) instead of carried as a second full-length column from
    # assembly — halves the bytes through the conversations→signatures
    # boundary and both checkpoints (VERDICT r3 #3)
    norm = as_array(normalize_text(as_array(doc_text)))

    # exact-content digest over the RAW assembled text (M5): per-turn equality
    digest = content_digest(as_array(doc_text))

    sig_text = as_array(pc.utf8_slice_codeunits(norm, 0, cfg.sig_text_max_chars))
    sh0, bnd0 = shingle_hashes(sig_text, cfg.shingle_k)
    sh, bnd = sample_shingles(sh0, bnd0, cfg.shingle_sample_mod)
    minh = minhash_signatures(sh, bnd, cfg.num_perm, cfg.seed, mode="oph")
    simh = simhash_signatures(sh, bnd)
    n_shingles = np.diff(bnd).astype(np.int32)

    feature_text = pc.utf8_slice_codeunits(norm, 0, cfg.feature_text_max_chars)

    # precompute the SCORER's sampled shingle sets here, once per conversation
    # (sorted-unique 32-bit hashes over feature_text): the pairwise reranker
    # then computes Jaccard by set merge without ever re-shingling text —
    # O(conversations) shingling instead of O(candidate pairs). feature_text is
    # a byte-prefix of sig_text, so its shingles are sliced out of the raw
    # stream already computed above instead of shingled a second time.
    from mediachain_indexer_ray.functions.strsim import (
        shingle_set_table,
        shingle_set_table_prefix,
    )

    if cfg.shingle_k <= cfg.feature_text_max_chars <= cfg.sig_text_max_chars:
        s_off64, s_flat = shingle_set_table_prefix(
            sh0, bnd0, as_array(feature_text), cfg.shingle_k,
            cfg.scorer_sample_mod,
        )
    else:  # feature text extends past the signature cap: shingle it directly
        s_off64, s_flat = shingle_set_table(
            as_array(feature_text), cfg.shingle_k, cfg.scorer_sample_mod
        )
    s_offsets = s_off64.astype(np.int32)

    return pa.table(
        {
            "conv_id": conv_id,
            "digest": pa.array(digest),
            # list<uint64> (not fixed_size_list): parquet cannot round-trip
            # null fixed-size lists, and exact-dedup edge rows carry empties
            "minhash": pa.ListArray.from_arrays(
                pa.array(
                    np.arange(0, (batch.num_rows + 1) * cfg.num_perm, cfg.num_perm,
                              dtype=np.int32)
                ),
                pa.array(minh.reshape(-1)),
            ),
            "simhash": pa.array(simh),
            "n_shingles": pa.array(n_shingles),
            "feature_text": feature_text.cast(pa.string()),
            "scorer_shingles": pa.ListArray.from_arrays(
                pa.array(s_offsets, pa.int32()), pa.array(s_flat)
            ),
        }
    )


def signatures(ds: ray.data.Dataset, cfg: Config) -> ray.data.Dataset:
    # prune at the stage boundary: roles/timestamps never enter the signature
    # compute, so they don't ride its blocks either
    if {"conv_id", "doc_text"} < set(ds.schema().names):
        ds = ds.select_columns(["conv_id", "doc_text"])
    return ds.map_batches(
        compute_signatures_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.sig_batch_size,
    )
