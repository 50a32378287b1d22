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
