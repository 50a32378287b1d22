"""Kernel unit tests (SURVEY.md §5.1): hashing, MinHash accuracy, SimHash
monotonicity, Jaro-Winkler / Levenshtein vs reference implementations."""

import numpy as np
import pyarrow as pa
import pytest

from mediachain_indexer_ray.functions.hashing import (
    hash_strings,
    popcount64,
    splitmix64,
)
from mediachain_indexer_ray.functions.minhash import (
    estimate_jaccard,
    minhash_signatures,
)
from mediachain_indexer_ray.functions.shingle import shingle_hashes
from mediachain_indexer_ray.functions.simhash import (
    hamming64,
    simhash_cosine,
    simhash_signatures,
)
from mediachain_indexer_ray.functions.strsim import (
    jaro_winkler_batch,
    levenshtein_batch,
    ngram_jaccard_batch,
)


def test_popcount():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 64, 1]


def test_hash_strings_stable_and_distinct():
    a = hash_strings(["foo", "bar", "foo", ""])
    assert a[0] == a[2]
    assert a[0] != a[1]
    b = hash_strings(["foo", "bar", "foo", ""])
    assert np.array_equal(a, b)
    assert len({int(x) for x in a[:2]}) == 2


def test_splitmix_avalanche():
    x = np.arange(1000, dtype=np.uint64)
    h = splitmix64(x)
    # consecutive inputs should produce ~32-bit hamming distance outputs
    d = popcount64(np.bitwise_xor(h[1:], h[:-1]))
    assert 24 < d.mean() < 40


def _true_jaccard(s1: str, s2: str, k: int = 5) -> float:
    a = {s1[i : i + k] for i in range(max(0, len(s1) - k + 1))}
    b = {s2[i : i + k] for i in range(max(0, len(s2) - k + 1))}
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


@pytest.mark.parametrize("mode", ["oph", "kperm"])
def test_minhash_estimates_jaccard(mode):
    rng = np.random.default_rng(1)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, 6)) for _ in range(400)]
    base = " ".join(words[:200])
    texts = [base]
    for frac in (0.02, 0.1, 0.3, 0.7):
        n_swap = int(200 * frac)
        w = list(words[:200])
        for i in rng.choice(200, n_swap, replace=False):
            w[i] = words[200 + int(rng.integers(0, 200))]
        texts.append(" ".join(w))
    arr = pa.array(texts)
    sh, bnd = shingle_hashes(arr, 5)
    sig = minhash_signatures(sh, bnd, 128, 42, mode)
    for i in range(1, len(texts)):
        est = estimate_jaccard(sig[0], sig[i])
        true = _true_jaccard(texts[0], texts[i])
        assert abs(est - true) < 0.15, (i, est, true)
    assert estimate_jaccard(sig[0], sig[0]) == 1.0


def test_minhash_oph_fast_and_fallback_paths_identical():
    # the packed-sort fast path (n*K < 2^24) and the argsort fallback must emit
    # bit-identical signatures: rows of the same doc can land in batches of
    # different sizes, and band keys compare raw signature values across rows
    rng = np.random.default_rng(9)
    K = 128
    n_small = 16
    counts = rng.integers(1, 40, n_small)
    sh = rng.integers(0, 2**63, int(counts.sum()), dtype=np.uint64)
    bnd = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    sig_fast = minhash_signatures(sh, bnd, K, 42, "oph")  # 16*128 < 2^24
    # same rows inside a batch big enough to trip the fallback: pad with
    # empty-shingle rows (row count drives n*K, not shingle count)
    n_pad = (1 << 24) // K + 8 - n_small
    bnd_big = np.concatenate([bnd, np.full(n_pad, bnd[-1], np.int64)])
    sig_big = minhash_signatures(sh, bnd_big, K, 42, "oph")
    assert np.array_equal(sig_fast, sig_big[:n_small])


def test_minhash_invariant_under_shingle_order():
    # same multiset of shingles, different order → identical signature
    sh = np.array([5, 9, 1, 7, 3], dtype=np.uint64)
    b = np.array([0, 5], dtype=np.int64)
    s1 = minhash_signatures(sh, b, 64, 7, "oph")
    s2 = minhash_signatures(sh[::-1].copy(), b, 64, 7, "oph")
    assert np.array_equal(s1, s2)


def test_simhash_monotone_in_similarity():
    rng = np.random.default_rng(2)
    base = "".join(chr(97 + c) for c in rng.integers(0, 26, 2000))
    def mutate(s, n):
        l = list(s)
        for i in rng.choice(len(l), n, replace=False):
            l[i] = chr(97 + int(rng.integers(0, 26)))
        return "".join(l)
    texts = [base, mutate(base, 20), mutate(base, 200), mutate(base, 1200)]
    sh, bnd = shingle_hashes(pa.array(texts), 5)
    sig = simhash_signatures(sh, bnd)
    h = [int(hamming64(sig[:1], sig[i : i + 1])[0]) for i in range(4)]
    assert h[0] == 0
    assert h[1] <= h[2] <= h[3]
    cos = simhash_cosine(np.repeat(sig[:1], 4), sig)
    assert cos[0] == 1.0 and cos[1] >= cos[2] >= cos[3]


def _jaro_ref(s1, s2):
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    w = max(max(len(s1), len(s2)) // 2 - 1, 0)
    m2 = [False] * len(s2)
    sa, sb = [], []
    for i, c in enumerate(s1):
        for j in range(max(0, i - w), min(len(s2), i + w + 1)):
            if not m2[j] and s2[j] == c:
                m2[j] = True
                sa.append(c)
                break
    sb = [c for j, c in enumerate(s2) if m2[j]]
    m = len(sa)
    if m == 0:
        return 0.0
    # floored half-transpositions (rapidfuzz/jellyfish/DuckDB convention)
    t = sum(x != y for x, y in zip(sa, sb)) // 2
    return (m / len(s1) + m / len(s2) + (m - t) / m) / 3


def _jw_ref(s1, s2, p=0.1):
    j = _jaro_ref(s1, s2)
    if j <= 0.7:  # Winkler boost gate (DuckDB/rapidfuzz)
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            l += 1
        else:
            break
    return j + l * p * (1 - j)


def test_jaro_winkler_known_values():
    a = pa.array(["MARTHA", "DIXON", "DWAYNE"])
    b = pa.array(["MARHTA", "DICKSONX", "DUANE"])
    got = jaro_winkler_batch(a, b)
    assert got == pytest.approx([0.9611, 0.8133, 0.8400], abs=1e-3)


def test_jaro_winkler_random_vs_reference():
    rng = np.random.default_rng(3)
    A, B = [], []
    for _ in range(300):
        la, lb = int(rng.integers(0, 20)), int(rng.integers(0, 20))
        A.append("".join(chr(97 + c) for c in rng.integers(0, 5, la)))
        B.append("".join(chr(97 + c) for c in rng.integers(0, 5, lb)))
    got = jaro_winkler_batch(pa.array(A), pa.array(B))
    exp = [_jw_ref(a, b) for a, b in zip(A, B)]
    np.testing.assert_allclose(got, exp, atol=1e-9)


def _lev_ref(s, t):
    dp = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        prev, dp[0] = dp[0], i
        for j, ct in enumerate(t, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (cs != ct))
            prev = cur
    return dp[-1]


def test_levenshtein_random_vs_reference():
    rng = np.random.default_rng(4)
    A, B = [], []
    for _ in range(300):
        s = "".join(chr(97 + c) for c in rng.integers(0, 4, int(rng.integers(0, 40))))
        t = list(s)
        for _ in range(int(rng.integers(0, 8))):
            if not t:
                t = ["a"]
                continue
            p = int(rng.integers(0, len(t)))
            op = rng.random()
            if op < 0.33:
                t.insert(p, "b")
            elif op < 0.66:
                t.pop(p)
            else:
                t[p] = "c"
        A.append(s)
        B.append("".join(t))
    got = levenshtein_batch(pa.array(A), pa.array(B))
    exp = [_lev_ref(a, b) for a, b in zip(A, B)]
    assert got.tolist() == exp


def test_levenshtein_band_is_lower_bounded_outside():
    # distance beyond the band: result must be ≥ |len diff| and > band radius
    a = pa.array(["a" * 100])
    b = pa.array(["b" * 100])
    d = levenshtein_batch(a, b, max_chars=128, band_radius=8)
    assert d[0] >= 9


def test_ngram_jaccard_matches_set_formula():
    A = ["hello world foo", "abcde", "", "xyz"]
    B = ["hello world bar", "abcde", "", "abc"]
    got = ngram_jaccard_batch(pa.array(A), pa.array(B), k=3)
    for g, a, b in zip(got, A, B):
        assert g == pytest.approx(_true_jaccard(a, b, 3), abs=1e-9)


def test_shingle_set_table_matches_per_row_unique():
    """Batch-sort set building == naive per-row np.unique (the pre-optimization
    reference semantics), including empty/short/duplicate-heavy rows."""
    import numpy as np
    import pyarrow as pa

    from mediachain_indexer_ray.functions.minhash import sample_shingles
    from mediachain_indexer_ray.functions.shingle import shingle_hashes
    from mediachain_indexer_ray.functions.strsim import shingle_set_table

    rng = np.random.default_rng(5)
    rows = ["", "ab", "aaaaaaaaaa", "abcdefghij" * 5]
    rows += ["".join(rng.choice(list("abcd ")) for _ in range(rng.integers(0, 60)))
             for _ in range(300)]
    arr = pa.array(rows, pa.string())
    for mod in (1, 4):
        off, vals = shingle_set_table(arr, 5, mod)
        h, bnd = shingle_hashes(arr, 5)
        if mod > 1:
            h, bnd = sample_shingles(h, bnd, mod)
        h32 = (h >> np.uint64(32)).astype(np.uint32)
        for i in range(len(rows)):
            want = np.unique(h32[bnd[i]:bnd[i + 1]])
            got = vals[off[i]:off[i + 1]]
            assert np.array_equal(got, want), (i, mod)


def test_shingle_set_table_prefix_equivalence():
    """Prefix-derived scorer sets == direct shingling of the truncated text
    (the invariant stages/signatures.py relies on)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from mediachain_indexer_ray.functions.shingle import shingle_hashes
    from mediachain_indexer_ray.functions.strsim import (
        shingle_set_table,
        shingle_set_table_prefix,
    )

    rng = np.random.default_rng(9)
    rows = ["".join(rng.choice(list("abcdé 漢x")) for _ in range(rng.integers(0, 200)))
            for _ in range(200)] + ["", "ab", "abcd"]
    arr = pa.array(rows, pa.string())
    for cap in (5, 17, 64, 1000):  # precondition: cap >= k
        full = pc.utf8_slice_codeunits(arr, 0, 4096)
        pref = pc.utf8_slice_codeunits(arr, 0, cap)
        sh0, bnd0 = shingle_hashes(full, 5)
        for mod in (1, 8):
            off_a, val_a = shingle_set_table(pref, 5, mod)
            off_b, val_b = shingle_set_table_prefix(sh0, bnd0, pref, 5, mod)
            assert np.array_equal(off_a, off_b), (cap, mod)
            assert np.array_equal(val_a, val_b), (cap, mod)


def test_eval_subset_hash_prefilter_matches_python_membership(ray_session):
    """The vectorized pair-hash / id-hash prefilters in pipelines.evaluate
    select every labeled row (no false negatives) under the ORIENTATION-
    INSENSITIVE pair key (candidate pairs are canonical in cid64 order,
    labels in string order — the prefilter normalizes, so a reversed pair is
    admitted too; callers exact-re-check, which makes over-admission
    harmless). On collision-free inputs the admitted set is exactly the
    orientation-normalized membership."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from mediachain_indexer_ray.pipelines.evaluate import _id_subset, _labeled_subset

    rows = pa.table(
        {
            "a": [f"c{i}" for i in range(200)],
            "b": [f"c{(i * 7) % 200}" for i in range(200)],
            "x": list(range(200)),
        }
    )
    ds = ray.data.from_arrow(rows)
    keys = {(f"c{i}", f"c{(i * 7) % 200}") for i in range(0, 200, 3)}
    got = _labeled_subset(ds, keys)
    exp = rows.to_pandas()
    norm_keys = {frozenset(k) for k in keys}
    exp = exp[[frozenset(t) in norm_keys for t in zip(exp["a"], exp["b"])]]
    assert sorted(zip(got["a"], got["b"])) == sorted(zip(exp["a"], exp["b"]))
    # every exact-orientation labeled row is present (no false negatives)
    got_set = set(zip(got["a"], got["b"]))
    for t in zip(rows.column("a").to_pylist(), rows.column("b").to_pylist()):
        if t in keys:
            assert t in got_set
    assert _labeled_subset(ds, set()).empty

    ids = {f"c{i}" for i in range(0, 200, 5)}
    got_ids = _id_subset(ds, "a", ids, ["a", "x"])
    assert sorted(got_ids["a"]) == sorted(i for i in (f"c{n}" for n in range(200)) if i in ids)
    assert list(got_ids.columns) == ["a", "x"]
    assert _id_subset(ds, "a", set(), ["a"]).empty
