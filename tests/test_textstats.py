"""Unit tests for text statistics, shingle sampling, and multimodal plumbing."""

import numpy as np
import pyarrow as pa

from mediachain_indexer_ray.functions.minhash import sample_shingles
from mediachain_indexer_ray.functions.shingle import shingle_hashes
from mediachain_indexer_ray.functions.textstats import (
    char_class_counts,
    language_id,
    token_counts,
)


def test_token_counts_matches_regex():
    import re

    texts = ["hello world", "  a  b c ", "", "one", "\tx\ny z\r", "  ", "a" * 50]
    got = token_counts(pa.array(texts))
    exp = [len(re.findall(r"\S+", t)) for t in texts]
    assert got.tolist() == exp


def test_char_class_counts():
    texts = ["a.b,c!", "no punct", "", "!!!"]
    got = char_class_counts(pa.array(texts), b".,!?;:")
    assert got.tolist() == [3, 0, 0, 3]
    letters = char_class_counts(pa.array(texts), bytes(range(97, 123)))
    assert letters.tolist() == [3, 7, 0, 0]


def test_language_id_stopwords():
    texts = [
        "the cat and the dog is in the house",
        "der hund ist nicht mit der katze",
        "le chat est dans la maison pour les amis",
        "zzz qqq xxx",
    ]
    got = language_id(pa.array(texts))
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr" and got[3] == "und"


def test_sample_shingles_content_defined():
    rng = np.random.default_rng(0)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, 500)) for _ in range(20)]
    sh, bnd = shingle_hashes(pa.array(texts), 5)
    s2, b2 = sample_shingles(sh, bnd, 2)
    # sampled sets are subsets, rows stay aligned, ratio ≈ 1/2
    assert len(s2) < len(sh)
    assert 0.35 < len(s2) / len(sh) < 0.65
    assert len(b2) == len(bnd)
    # content-defined: the same shingle value is kept or dropped everywhere
    kept = set(s2.tolist())
    dropped = set(sh.tolist()) - kept
    assert kept.isdisjoint(dropped) or not (kept & dropped)
    # non-empty rows never become empty
    assert ((np.diff(b2) > 0) == (np.diff(bnd) > 0)).all()
    # per-row: sampling a row alone gives the same result (batch-independence)
    for i in (0, 7, 19):
        solo, sb = shingle_hashes(pa.array([texts[i]]), 5)
        ss, _ = sample_shingles(solo, sb, 2)
        assert np.array_equal(np.sort(ss), np.sort(s2[b2[i] : b2[i + 1]]))


def test_sample_shingles_rescues_tiny_rows():
    # a row whose every shingle would be dropped keeps its min shingle
    sh = np.array([3, 5], dtype=np.uint64)
    bnd = np.array([0, 1, 2], dtype=np.int64)
    s2, b2 = sample_shingles(sh, bnd, 10**9)  # mod so large everything drops
    assert np.diff(b2).tolist() == [1, 1]


def test_multimodal_stub_pipeline(ray_session):
    import ray

    from mediachain_indexer_ray.pipelines.multimodal import (
        FEATURE_DIM,
        extract_media_features,
    )

    tab = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([b"abc" * 100, b"", b"\x00\xff" * 50], pa.binary()),
            "media_type": pa.array(["image", "audio", "video"]),
            "meta": pa.array(["{}", "{}", "{}"]),
        }
    )
    out = extract_media_features(ray.data.from_arrow(tab)).to_pandas()
    assert len(out) == 3
    assert set(out.columns) == {"media_id", "media_type", "n_bytes", "feature"}
    assert out.n_bytes.tolist() == [300, 0, 100]
    assert all(len(f) == FEATURE_DIM for f in out.feature)
    # deterministic
    out2 = extract_media_features(ray.data.from_arrow(tab)).to_pandas()
    a = np.array([np.asarray(f) for f in out.sort_values("media_id").feature])
    b = np.array([np.asarray(f) for f in out2.sort_values("media_id").feature])
    np.testing.assert_array_equal(a, b)


def test_doc_repetition_kernel_edges():
    """Short docs (<3 tokens) emit no row; repeated trigrams are counted;
    results are independent of batch boundaries."""
    import pyarrow as pa

    from mediachain_indexer_ray.pipelines.queries import _doc_repetition_batch

    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a b",                  # <3 tokens: dropped
                    "a b c a b c a b c",    # 7 trigrams, 3 distinct -> flagged
                    "w x y z",              # 2 trigrams, 2 distinct
                    "",                     # empty: dropped
                ]
            ),
        }
    )
    out = _doc_repetition_batch(b).to_pydict()
    assert out["doc_id"] == [2, 3]
    assert out["n_trigrams"] == [7, 2]
    assert out["n_distinct"] == [3, 2]
    assert out["flagged"] == [True, False]

    # batch-split equivalence
    parts = pa.concat_tables(
        [_doc_repetition_batch(b.slice(0, 2)), _doc_repetition_batch(b.slice(2))]
    ).to_pydict()
    assert parts == out


def test_redact_rules_kernel():
    import pyarrow as pa
    import pyarrow.compute as pc

    from mediachain_indexer_ray.pipelines.queries import _REDACT_RULES

    txt = pa.array(
        ["mail me at a.b+c@exa-mple.org or 555-123-4567 ref 42", "no pii here"]
    )
    counts = {}
    for name, pat, repl in _REDACT_RULES:
        counts[name] = pc.count_substring_regex(txt, pat).to_pylist()
        txt = pc.replace_substring_regex(txt, pat, repl)
    assert counts["email"] == [1, 0]
    assert counts["phone"] == [1, 0]
    assert counts["num"] == [1, 0]  # the trailing 42; placeholders unharmed
    assert txt.to_pylist()[0] == "mail me at <EMAIL> or <PHONE> ref <NUM>"
