"""Pairwise reranking: the transcript-native ``dedupe_batch``.

The reference reranks candidate pairs with perceptual-hash hamming distance and
term overlap, thresholded (``[ref: mc_models.py dedupe_batch — unverified]``,
SURVEY.md T2/F1/F2). Here: a STATEFUL ACTOR POOL (`map_batches(PairScorer,
concurrency=N)`) computing batched n-gram Jaccard, SimHash-cosine, Jaro-Winkler
and banded Levenshtein, combined into a weighted score against threshold τ
(BASELINE.json:6 "actor pool running batched Jaro-Winkler/Levenshtein/
SimHash-cosine scoring").

Cost control: the expensive Levenshtein DP only runs on pairs whose cheap
features leave the decision ambiguous; clear accepts/rejects short-circuit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.simhash import simhash_cosine
from mediachain_indexer_ray.functions.strsim import (
    jaro_winkler_batch,
    levenshtein_ratio_batch,
    ngram_jaccard_batch,
)


class PairScorer:
    """Callable class for map_batches actor pools: per-actor setup in
    __init__ (once), batched scoring in __call__ (per batch)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # Precompute anything reusable across batches. The numpy kernels are
        # parameterized by these; keeping them here mirrors the reference's
        # one-model-instance-per-run registry (SURVEY.md T2).
        self.w = np.array(
            [cfg.w_jaccard, cfg.w_cosine, cfg.w_jw, cfg.w_lev], np.float64
        )
        self.tau = cfg.tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return _empty_scored()
        ta = batch.column("text_a").combine_chunks()
        tb = batch.column("text_b").combine_chunks()
        jac = ngram_jaccard_batch(ta, tb, cfg.shingle_k)
        cos = simhash_cosine(
            batch.column("simhash_a").to_numpy(), batch.column("simhash_b").to_numpy()
        )
        jw = jaro_winkler_batch(ta, tb, cfg.jw_max_chars)

        # Levenshtein gate: only pairs whose partial score could cross τ either
        # way need the DP. With w = (wj, wc, wjw, wl):
        #   partial = wj*jac + wc*cos + wjw*jw;  score ∈ [partial, partial+wl]
        partial = self.w[0] * jac + self.w[1] * cos + self.w[2] * jw
        need_lev = (partial < self.tau) & (partial + self.w[3] >= self.tau)
        lev = np.zeros(n, np.float64)
        if need_lev.any():
            mask = pa.array(need_lev)
            lev_sub = levenshtein_ratio_batch(
                ta.filter(mask), tb.filter(mask), cfg.lev_max_chars, cfg.lev_band_radius
            )
            lev[need_lev] = lev_sub
        # pairs already above τ without lev: credit lev at its jaccard proxy so
        # the reported score is monotone (accepted flag is what matters).
        lev[~need_lev & (partial >= self.tau)] = jac[~need_lev & (partial >= self.tau)]

        score = partial + self.w[3] * lev
        accepted = score >= self.tau
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "n_bands": batch.column("n_bands"),
                "score_jaccard": pa.array(jac.astype(np.float32)),
                "score_cosine": pa.array(cos.astype(np.float32)),
                "score_jw": pa.array(jw.astype(np.float32)),
                "score_lev": pa.array(lev.astype(np.float32)),
                "score": pa.array(score.astype(np.float32)),
                "accepted": pa.array(accepted),
            }
        )


def _empty_scored() -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "n_bands": pa.array([], pa.int32()),
            "score_jaccard": pa.array([], pa.float32()),
            "score_cosine": pa.array([], pa.float32()),
            "score_jw": pa.array([], pa.float32()),
            "score_lev": pa.array([], pa.float32()),
            "score": pa.array([], pa.float32()),
            "accepted": pa.array([], pa.bool_()),
        }
    )


def attach_pair_texts(
    pairs: ray.data.Dataset, reps: ray.data.Dataset, cfg: Config, num_partitions: int
) -> ray.data.Dataset:
    """Hash-join the pair table back to the representatives' feature text for
    both endpoints (SURVEY.md J2 — the reference's mget by id). The pair table
    carries only ids + 8-byte simhashes through the shuffles; text payloads are
    joined in once, here."""
    side = reps.select_columns(["conv_id", "feature_text"])
    a_side = side.rename_columns({"conv_id": "a", "feature_text": "text_a"})
    b_side = side.rename_columns({"conv_id": "b", "feature_text": "text_b"})
    out = pairs.join(
        a_side, join_type="inner", num_partitions=num_partitions, on=("a",)
    )
    return out.join(
        b_side, join_type="inner", num_partitions=num_partitions, on=("b",)
    )


def score_pairs(pairs_with_text: ray.data.Dataset, cfg: Config) -> ray.data.Dataset:
    from mediachain_indexer_ray.config import default_parallelism

    # actor pool sized to the cluster: up to ~1 scorer per core (the pool
    # autoscales down when the pair stream is thin)
    hi = max(cfg.scorer_concurrency, default_parallelism() // 2)
    return pairs_with_text.map_batches(
        PairScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
        concurrency=(1, hi),
        num_cpus=1,
    )
