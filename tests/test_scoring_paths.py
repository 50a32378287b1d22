"""PairScorer path equivalence: the broadcast-LUT path and the shuffle-join
path (texts attached in the batch, sets resolved from the segmented per-actor
cache) must produce IDENTICAL scores and decisions."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.hashing import cid64
from mediachain_indexer_ray.functions.simhash import simhash_signatures
from mediachain_indexer_ray.functions.shingle import shingle_hashes
from mediachain_indexer_ray.functions.strsim import shingle_set_table
from mediachain_indexer_ray.stages.scoring import PairScorer


def _mk_corpus(n=60, seed=5):
    rng = np.random.default_rng(seed)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, 6))
             for _ in range(400)]
    ids, texts = [], []
    for i in range(n):
        base = list(rng.choice(words, 40))
        ids.append(f"c{i:04d}")
        texts.append(" ".join(base))
        # near-dup (few edits), plus exact dup of some
        v = list(base)
        for j in rng.choice(40, 3, replace=False):
            v[j] = words[int(rng.integers(0, 400))]
        ids.append(f"d{i:04d}")
        texts.append(" ".join(v))
    return ids, texts


def _pairs_batch(ids, texts, cfg, with_texts):
    arr = pa.array(texts, pa.string())
    sh, bnd = shingle_hashes(arr, cfg.shingle_k)
    simh = simhash_signatures(sh, bnd)
    n = len(ids) // 2
    rows = {"a": [], "b": [], "sa": [], "sb": [], "ta": [], "tb": []}
    rng = np.random.default_rng(11)
    for i in range(n):
        # dup pair + a random non-dup pair → exercises accept/reject/mid
        for j, k in [(2 * i, 2 * i + 1),
                     (2 * i, int(rng.integers(0, 2 * n)))]:
            if j == k:
                continue
            a, b = (j, k) if ids[j] < ids[k] else (k, j)
            rows["a"].append(ids[a]); rows["b"].append(ids[b])
            rows["sa"].append(simh[a]); rows["sb"].append(simh[b])
            rows["ta"].append(texts[a]); rows["tb"].append(texts[b])
    t = {
        "a": pa.array(rows["a"], pa.string()),
        "b": pa.array(rows["b"], pa.string()),
        "n_bands": pa.array(np.full(len(rows["a"]), 3, np.int32)),
        "simhash_a": pa.array(np.array(rows["sa"], np.uint64)),
        "simhash_b": pa.array(np.array(rows["sb"], np.uint64)),
    }
    if with_texts:
        t["text_a"] = pa.array(rows["ta"], pa.string())
        t["text_b"] = pa.array(rows["tb"], pa.string())
    return pa.table(t)


def test_broadcast_and_join_scoring_identical(ray_session):
    cfg = Config()
    ids, texts = _mk_corpus()
    arr = pa.array(texts, pa.string())
    off, val = shingle_set_table(arr, cfg.shingle_k, cfg.scorer_sample_mod)
    key = cid64(pa.array(ids, pa.string()))
    order = np.argsort(key)
    counts = np.diff(off)[order]
    starts = off[:-1][order]
    within = (
        np.arange(int(counts.sum()), dtype=np.int64)
        - np.repeat(np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64),
                    counts)
    )
    lut = pa.table(
        {
            "key": pa.array(np.sort(key)),
            "feature_text": pa.array(texts, pa.string()).take(pa.array(order)),
            "scorer_shingles": pa.ListArray.from_arrays(
                pa.array(np.concatenate([[0], np.cumsum(counts)]), pa.int32()),
                pa.array(val[np.repeat(starts, counts) + within]),
            ),
        }
    )
    batch_lut = _pairs_batch(ids, texts, cfg, with_texts=False)
    batch_join = _pairs_batch(ids, texts, cfg, with_texts=True)

    out_b = PairScorer(cfg, lut_ref=ray.put(lut))(batch_lut).to_pandas()
    scorer_j = PairScorer(cfg, lut_ref=None)
    # split across two calls → exercises the cross-batch segmented cache
    half = len(batch_join) // 2
    out_j = pa.concat_tables(
        [scorer_j(batch_join.slice(0, half)), scorer_j(batch_join.slice(half))]
    ).to_pandas()

    # broadcast path prefilters inside __call__; join path is prefiltered
    # upstream — compare on the join batch's surviving pairs
    key_cols = ["a", "b"]
    out_b = out_b.set_index(key_cols).sort_index()
    out_j = out_j.set_index(key_cols).sort_index()
    common = out_b.index.intersection(out_j.index)
    assert len(common) >= len(out_b)  # broadcast survivors ⊆ join output
    for col in ["score_jaccard", "score_cosine", "score_jw", "score_lev", "score"]:
        np.testing.assert_allclose(
            out_b.loc[common][col].to_numpy(),
            out_j.loc[common][col].to_numpy(), atol=1e-6,
        )
    assert (out_b.loc[common]["accepted"] == out_j.loc[common]["accepted"]).all()
    # real signal in the fixture: some accepts and some rejects
    assert out_j["accepted"].any() and (~out_j["accepted"]).any()


def test_score_pairs_widens_single_block_input(ray_session):
    """A pair set that upstream emitted as ONE block must not score on one
    core: score_pairs repartitions to pool width before mapping (the 436k-
    pairs-in-one-block regression ran the whole stage serially)."""
    import ray.data

    from mediachain_indexer_ray.stages.scoring import score_pairs

    cfg = Config()
    ids, texts = _mk_corpus(n=40)
    batch = _pairs_batch(ids, texts, cfg, with_texts=False)
    # LUT over the corpus (sorted-table layout, as build_text_lut_ref makes)
    key = cid64(pa.array(ids))
    order = np.argsort(key)
    off, val = shingle_set_table(
        pa.array(texts), cfg.shingle_k, cfg.scorer_sample_mod
    )
    counts = np.diff(off)[order]
    starts = off[:-1][order]
    bank_off = np.zeros(len(order) + 1, np.int64)
    np.cumsum(counts, out=bank_off[1:])
    within = np.arange(int(bank_off[-1]), dtype=np.int64) - np.repeat(
        bank_off[:-1], counts
    )
    lut = pa.table(
        {
            "key": pa.array(key[order]),
            "feature_text": pa.array([texts[i] for i in order]),
            "scorer_shingles": pa.ListArray.from_arrays(
                pa.array(bank_off, pa.int64()),
                pa.array(val[np.repeat(starts, counts) + within]),
            ),
        }
    )
    one_block = ray.data.from_arrow(batch)  # a single input block
    assert one_block.num_blocks() == 1
    scored = score_pairs(
        one_block, cfg, lut_ref=ray.put(lut), pairs_rows=batch.num_rows
    ).materialize()
    # width guard: target blocks = min(ceil(rows/pair_batch_size), 2*cpus);
    # with a tiny pair_batch_size the single block must have been split
    small = Config(pair_batch_size=16)
    scored_small = score_pairs(
        ray.data.from_arrow(batch), small,
        lut_ref=ray.put(lut), pairs_rows=batch.num_rows,
    ).materialize()
    assert scored_small.num_blocks() > 1
    # identical results regardless of the split
    a = scored.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    b = scored_small.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert (a["accepted"] == b["accepted"]).all()
    np.testing.assert_allclose(a["score"], b["score"], atol=1e-6)
