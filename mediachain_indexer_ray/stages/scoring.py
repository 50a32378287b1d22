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
    jaccard_from_sets,
    jaro_winkler_batch,
    levenshtein_ratio_batch,
    shingle_sets,
)


class PairScorer:
    """Callable class for map_batches actor pools: per-actor setup in
    __init__ (once), batched scoring in __call__ (per batch)."""

    # per-actor shingle-set cache bound (entries ≈ 4 KB each → ~512 MB cap);
    # hot-block endpoints recur across many pair batches, so caching their
    # shingle sets is the difference between shingling O(pairs) texts and
    # O(unique conversations) texts per actor
    CACHE_MAX_ENTRIES = 131_072

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # Precompute anything reusable across batches. The numpy kernels are
        # parameterized by these; keeping them here mirrors the reference's
        # one-model-instance-per-run registry (SURVEY.md T2).
        self.w = np.array(
            [cfg.w_jaccard, cfg.w_cosine, cfg.w_jw, cfg.w_lev], np.float64
        )
        self.tau = cfg.tau
        self._shingle_cache: dict[str, np.ndarray] = {}

    def _sets_for(self, ids: list, texts: pa.Array) -> list[np.ndarray]:
        """conv_id → sorted-unique sampled shingle-hash set, cached per actor;
        misses are shingled in ONE vectorized pass over their texts."""
        cache = self._shingle_cache
        miss_idx: list[int] = []
        miss_ids: list = []
        seen: set = set()
        for i, cid in enumerate(ids):
            if cid not in cache and cid not in seen:
                seen.add(cid)
                miss_idx.append(i)
                miss_ids.append(cid)
        if miss_idx:
            if len(cache) + len(miss_ids) > self.CACHE_MAX_ENTRIES:
                cache.clear()
            sub = texts.take(pa.array(miss_idx, pa.int64()))
            for cid, s in zip(
                miss_ids,
                shingle_sets(sub, self.cfg.shingle_k, self.cfg.scorer_sample_mod),
            ):
                cache[cid] = s
        return [cache[c] for c in ids]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return _empty_scored()
        ta = batch.column("text_a").combine_chunks()
        tb = batch.column("text_b").combine_chunks()
        # Decision cascade (the throughput heart of the reranker):
        #   1. sampled-shingle Jaccard + SimHash-cosine — cheap, vectorized;
        #   2. fast-accept (jac ≥ fast_accept_jaccard: unreachable by
        #      different-content conversations) / fast-reject (jac < lo AND
        #      cos < lo: unreachable by ≤10%-edit near-dups);
        #   3. ONLY the borderline band pays for the Jaro-Winkler +
        #      banded-Levenshtein DP kernels and the full weighted score.
        # Hot viral blocks are dominated by clear accepts/rejects, so the DP
        # work is O(borderline), not O(pairs).
        jac = jaccard_from_sets(
            self._sets_for(batch.column("a").to_pylist(), ta),
            self._sets_for(batch.column("b").to_pylist(), tb),
        )
        cos = simhash_cosine(
            batch.column("simhash_a").to_numpy(), batch.column("simhash_b").to_numpy()
        )
        w_jac, w_cos, w_jw, w_lev = self.w
        fast_acc = jac >= cfg.fast_accept_jaccard
        fast_rej = (jac < cfg.fast_reject_jaccard) & (cos < cfg.fast_reject_cosine)
        mid = ~(fast_acc | fast_rej)

        jw = np.zeros(n, np.float64)
        lev = np.zeros(n, np.float64)
        if mid.any():
            m = pa.array(mid)
            tam, tbm = ta.filter(m), tb.filter(m)
            jw[mid] = jaro_winkler_batch(tam, tbm, cfg.jw_max_chars)
            lev[mid] = levenshtein_ratio_batch(
                tam, tbm, cfg.lev_max_chars, cfg.lev_band_radius
            )
        # monotone reported score on the fast paths (decision = accepted flag):
        # accepts land in [τ, 1], rejects keep their (low) cheap-feature score.
        jw[fast_acc] = 1.0
        lev[fast_acc] = jac[fast_acc]

        score = w_jac * jac + w_cos * cos + w_jw * jw + w_lev * lev
        score[fast_acc] = np.maximum(score[fast_acc], self.tau)
        accepted = fast_acc | (mid & (score >= self.tau))
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


BROADCAST_MAX_ROWS = 200_000  # feature-text side ≲ 400MB → broadcast


def attach_pair_texts(
    pairs: ray.data.Dataset,
    reps: ray.data.Dataset,
    cfg: Config,
    num_partitions: int,
    reps_rows: int | None = None,
) -> ray.data.Dataset:
    """Attach the representatives' feature text to both pair endpoints
    (SURVEY.md J2 — the reference's mget by id). Hybrid strategy:

    * small side (≤ BROADCAST_MAX_ROWS, known from the upstream manifest):
      ``ray.put`` the id→text map ONCE and look it up inside ``map_batches`` —
      no shuffle at all (the task brief's broadcast-small-sides rule).
    * large side: two hash-shuffle ``Dataset.join``s, partitioned to the
      cluster — the 100-TB path.

    The pair table carries only ids + 8-byte simhashes through the earlier
    shuffles either way; text payloads attach exactly once, here."""
    side = reps.select_columns(["conv_id", "feature_text"])
    if reps_rows is not None and reps_rows <= BROADCAST_MAX_ROWS:
        tabs = [t for t in ray.get(side.to_arrow_refs()) if t.num_rows > 0]
        lut: dict = {}
        for t in tabs:  # small by precondition
            lut.update(
                zip(t.column("conv_id").to_pylist(), t.column("feature_text").to_pylist())
            )
        lut_ref = ray.put(lut)

        def _attach(b: pa.Table) -> pa.Table:
            m = ray.get(lut_ref)
            ta = pa.array([m.get(x, "") for x in b.column("a").to_pylist()], pa.string())
            tb = pa.array([m.get(x, "") for x in b.column("b").to_pylist()], pa.string())
            return b.append_column("text_a", ta).append_column("text_b", tb)

        return pairs.map_batches(_attach, batch_format="pyarrow", zero_copy_batch=True)

    a_side = side.rename_columns({"conv_id": "a", "feature_text": "text_a"})
    b_side = side.rename_columns({"conv_id": "b", "feature_text": "text_b"})
    out = pairs.join(
        a_side, join_type="inner", num_partitions=num_partitions, on=("a",)
    )
    return out.join(
        b_side, join_type="inner", num_partitions=num_partitions, on=("b",)
    )


def score_pairs(
    pairs_with_text: ray.data.Dataset, cfg: Config, scorer_cls: type | None = None
) -> ray.data.Dataset:
    from mediachain_indexer_ray.config import default_parallelism

    # fixed-size actor pool ~1 scorer per 2 cores: an autoscaling (1, hi) pool
    # ramps up too slowly and serializes the stage behind actor startup. Cap
    # below the cluster CPU count — a pool that pins EVERY core starves the
    # upstream stages feeding it (deadlock on small clusters).
    try:
        cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover
        cluster_cpus = 8
    hi = max(cfg.scorer_concurrency, default_parallelism() // 4)
    hi = max(1, min(hi, cluster_cpus - 2))
    return pairs_with_text.map_batches(
        scorer_cls or PairScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
        concurrency=hi,
        num_cpus=1,
    )
