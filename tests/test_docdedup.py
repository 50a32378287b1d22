"""Document near-dup pipelines: the broadcast-LUT and shuffle-join
verification paths must produce IDENTICAL pairs (VERDICT r1 #5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from mediachain_indexer_ray.pipelines import docdedup


def _docs_ds(n=400, seed=3):
    rng = np.random.default_rng(seed)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, 7))
             for _ in range(600)]
    ids, texts = [], []
    for i in range(n):
        base = list(rng.choice(words, 60))
        ids.append(i)
        texts.append(" ".join(base))
        if i % 4 == 0:  # near-dup variant: ~8% token edits
            v = list(base)
            for j in rng.choice(60, 5, replace=False):
                v[j] = words[int(rng.integers(0, 600))]
            ids.append(10_000 + i)
            texts.append(" ".join(v))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return ray.data.from_arrow(t)


def _pairs_df(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def test_broadcast_and_shuffle_join_verify_identical(ray_session):
    ds = _docs_ds()
    broad = _pairs_df(docdedup.minhash_lsh_pairs(ds))
    # force the beyond-broadcast path on the same corpus
    joined = _pairs_df(
        docdedup.minhash_lsh_pairs(_docs_ds(), broadcast_max_rows=0)
    )
    assert len(broad) > 50  # the fixture produces real near-dup pairs
    pd.testing.assert_frame_equal(broad, joined)


def test_pairs_are_canonical_and_thresholded(ray_session):
    df = _pairs_df(docdedup.minhash_lsh_pairs(_docs_ds()))
    assert (df["a"] < df["b"]).all()
    assert (df["jaccard_milli"] >= 500).all()


def test_minhash_lsh_recall_vs_exact_jaccard(ray_session):
    """Recall gate vs ground truth (VERDICT r4 next #3): on ~1k docs, the
    LSH pipeline must recover >= 95% of the EXACT-Jaccard >= 0.5 pair set.
    The truth set is exact: every pair sharing at least one char-5-gram gets
    its true |A∩B|/|A∪B| via posting-list expansion (pairs sharing nothing
    have J=0); the planted variants span ~0.55-0.85 so the gate exercises
    the banding's soft region, not just trivial near-identical pairs."""
    from collections import Counter

    rng = np.random.default_rng(5)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, 7))
             for _ in range(1500)]
    ids, texts = [], []
    n_base = 640
    for i in range(n_base):
        base = list(rng.choice(words, 60))
        ids.append(i)
        texts.append(" ".join(base))
        if i % 2 == 0:  # variant: 4, 8 or 12 token edits (J ~0.85/0.7/0.55)
            n_edit = int(rng.choice([4, 8, 12]))
            v = list(base)
            for j in rng.choice(60, n_edit, replace=False):
                v[j] = words[int(rng.integers(0, len(words)))]
            ids.append(100_000 + i)
            texts.append(" ".join(v))
    assert len(ids) >= 950

    # --- exact ground truth over the pipeline's shingle definition ----------
    shingles = []
    for t in texts:
        t = t[:2048]  # feature_text truncation (no-op here, kept for parity)
        shingles.append({t[k:k + 5] for k in range(len(t) - 4)})
    postings = {}
    for d, ss in enumerate(shingles):
        for s in ss:
            postings.setdefault(s, []).append(d)
    inter = Counter()
    for docs in postings.values():
        if len(docs) > 1:
            for x in range(len(docs)):
                for y in range(x + 1, len(docs)):
                    inter[(docs[x], docs[y])] += 1
    truth = set()
    for (x, y), m in inter.items():
        if m / (len(shingles[x]) + len(shingles[y]) - m) >= 0.5:
            truth.add((str(ids[x]), str(ids[y])) if str(ids[x]) < str(ids[y])
                      else (str(ids[y]), str(ids[x])))
    assert len(truth) >= 250, "fixture must plant a real >=0.5 pair set"

    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got_df = docdedup.minhash_lsh_pairs(ray.data.from_arrow(t)).to_pandas()
    got = set(zip(got_df["a"], got_df["b"]))

    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"LSH recall {recall:.3f} < 0.95 ({len(truth)} truth pairs)"
    # precision is exact by construction (every emitted pair passed the exact
    # Jaccard >= 0.5 verify); allow only boundary slack from the uint32
    # shingle-hash space vs the string-set truth
    by_pair = dict(zip(zip(got_df["a"], got_df["b"]),
                       got_df["jaccard_milli"]))
    extra = got - truth
    assert all(by_pair[p] <= 520 for p in extra), (
        "non-truth pair emitted far above the threshold boundary"
    )
