"""Substring-level exact dedup (VERDICT r4 next #2): maximal repeated token
spans must match a brute-force ground truth computed with plain Python dicts
over the window definition, on a corpus with planted duplication."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from mediachain_indexer_ray.pipelines.substring import substring_dedup

L = 8


def _brute_spans(texts: dict, L: int) -> set[tuple]:
    """Ground truth: (id, start, end, n_tokens) spans of positions covered by
    an L-token window whose joined content occurs >= 2 times in the corpus."""
    toks = {d: re.findall(r"[a-z]+", t.lower()) for d, t in texts.items()}
    cnt = Counter(
        " ".join(ts[p:p + L])
        for ts in toks.values()
        for p in range(len(ts) - L + 1)
    )
    spans = set()
    for d, ts in toks.items():
        covered = [
            p for p in range(len(ts) - L + 1)
            if cnt[" ".join(ts[p:p + L])] >= 2
        ]
        i = 0
        while i < len(covered):
            j = i
            while j + 1 < len(covered) and covered[j + 1] <= covered[j] + L:
                j += 1
            spans.add((d, covered[i], covered[j] + L - 1,
                       covered[j] - covered[i] + L))
            i = j + 1
    return spans


@pytest.fixture(scope="module")
def planted_corpus():
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(300)]

    def words(n):
        return [vocab[i] for i in rng.integers(0, len(vocab), n)]

    docs = {f"d{i:02d}": words(60) for i in range(40)}
    passage = words(25)  # shared passage planted across 3 documents
    for d in ("d03", "d11", "d27"):
        ts = docs[d]
        at = int(rng.integers(0, len(ts) - 1))
        docs[d] = ts[:at] + passage + ts[at:]
    docs["d40"] = list(docs["d05"])          # exact duplicate document
    docs["d41"] = words(L - 1)               # shorter than one window
    rep = words(12)
    docs["d42"] = rep + words(20) + rep      # within-doc repetition
    return {d: " ".join(ts) for d, ts in docs.items()}


def test_matches_brute_force(planted_corpus, ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(list(planted_corpus), pa.string()),
            "text": pa.array(list(planted_corpus.values()), pa.string()),
        }
    )
    out = substring_dedup(
        ray.data.from_arrow(t), min_tokens=L
    ).to_pandas()
    got = set(
        map(tuple, out[["doc_id", "start_tok", "end_tok", "n_tokens"]].values)
    )
    want = _brute_spans(planted_corpus, L)
    assert want, "fixture must plant duplication"
    assert got == want
    # the planted 25-token passage must surface as a >=25-token span in all
    # three carriers, and the exact-dup pair as full-document spans
    by_doc = out.groupby("doc_id")["n_tokens"].max()
    for d in ("d03", "d11", "d27"):
        assert by_doc[d] >= 25
    n05 = len(re.findall(r"[a-z]+", planted_corpus["d05"]))
    assert by_doc["d05"] == n05 and by_doc["d40"] == n05
    assert "d41" not in by_doc.index  # too short for any window


def test_deterministic_and_batch_invariant(planted_corpus, ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(list(planted_corpus), pa.string()),
            "text": pa.array(list(planted_corpus.values()), pa.string()),
        }
    )
    runs = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        df = substring_dedup(ds, min_tokens=L).to_pandas()
        runs.append(
            df.sort_values(["doc_id", "start_tok"]).reset_index(drop=True)
        )
    assert runs[0].equals(runs[1])
