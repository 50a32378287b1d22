"""Property-based tests (SURVEY.md §5.2)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from mediachain_indexer_ray.functions.minhash import minhash_signatures
from mediachain_indexer_ray.functions.shingle import shingle_hashes
from mediachain_indexer_ray.functions.strsim import (
    jaro_winkler_batch,
    levenshtein_batch,
    ngram_jaccard_batch,
)

text = st.text(alphabet="abcdef ", max_size=60)


@settings(max_examples=40, deadline=None)
@given(text, text)
def test_similarity_symmetry(a, b):
    ab = jaro_winkler_batch(pa.array([a]), pa.array([b]))[0]
    ba = jaro_winkler_batch(pa.array([b]), pa.array([a]))[0]
    assert abs(ab - ba) < 1e-12
    assert levenshtein_batch(pa.array([a]), pa.array([b]))[0] == levenshtein_batch(
        pa.array([b]), pa.array([a])
    )[0]
    jab = ngram_jaccard_batch(pa.array([a]), pa.array([b]), 3)[0]
    jba = ngram_jaccard_batch(pa.array([b]), pa.array([a]), 3)[0]
    assert abs(jab - jba) < 1e-12


@settings(max_examples=30, deadline=None)
@given(text)
def test_similarity_identity(a):
    assert jaro_winkler_batch(pa.array([a]), pa.array([a]))[0] == 1.0
    assert levenshtein_batch(pa.array([a]), pa.array([a]))[0] == 0
    assert ngram_jaccard_batch(pa.array([a]), pa.array([a]), 3)[0] == 1.0


@settings(max_examples=25, deadline=None)
@given(text, text, text)
def test_levenshtein_triangle(a, b, c):
    dab = levenshtein_batch(pa.array([a]), pa.array([b]), band_radius=64)[0]
    dbc = levenshtein_batch(pa.array([b]), pa.array([c]), band_radius=64)[0]
    dac = levenshtein_batch(pa.array([a]), pa.array([c]), band_radius=64)[0]
    assert dac <= dab + dbc + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**60), min_size=1, max_size=50))
def test_minhash_order_invariance(hashes):
    h = np.array(hashes, dtype=np.uint64)
    b = np.array([0, len(h)], dtype=np.int64)
    s1 = minhash_signatures(h, b, 32, 5, "oph")
    perm = np.random.default_rng(0).permutation(len(h))
    s2 = minhash_signatures(h[perm], b, 32, 5, "oph")
    assert np.array_equal(s1, s2)


@settings(max_examples=20, deadline=None)
@given(st.lists(text, min_size=1, max_size=8))
def test_shingle_row_independence(texts):
    """Shingles of a batch == shingles of each row alone (batching must not
    change per-row results)."""
    arr = pa.array(texts, pa.string())
    sh, bnd = shingle_hashes(arr, 3)
    for i, t in enumerate(texts):
        solo, sb = shingle_hashes(pa.array([t], pa.string()), 3)
        assert np.array_equal(sh[bnd[i] : bnd[i + 1]], solo)
