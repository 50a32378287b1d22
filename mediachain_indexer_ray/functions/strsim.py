"""Batched string-similarity kernels for the pairwise reranker (SURVEY.md F1).

The reference's ``dedupe_batch`` reranks candidate pairs with perceptual-hash
hamming distance + term overlap (``[ref: mc_models.py — unverified]``); the
transcript-native reranker uses Jaro-Winkler, banded Levenshtein, n-gram Jaccard
and SimHash-cosine (BASELINE.json:6). No rapidfuzz/jellyfish in this
environment, so the kernels are hand-written and vectorized ACROSS THE PAIR
BATCH: python-level loops run over character positions / DP anti-diagonals
(bounded by the feature-text cap), never over pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mediachain_indexer_ray.functions.hashing import arrow_string_buffers
from mediachain_indexer_ray.functions.shingle import shingle_hashes


def _pad_batch(arr, max_chars: int) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array → (n, max_chars) uint8 matrix (0-padded) + lengths."""
    data, starts, ends = arrow_string_buffers(arr)
    n = len(starts)
    lengths = np.minimum(ends - starts, max_chars).astype(np.int64)
    out = np.zeros((n, max_chars), np.uint8)
    if n and lengths.max() > 0:
        total = int(lengths.sum())
        cum = np.zeros(n, np.int64)
        np.cumsum(lengths[:-1], out=cum[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(cum, lengths)
        src = np.repeat(starts, lengths) + pos
        dst = np.repeat(np.arange(n, dtype=np.int64) * max_chars, lengths) + pos
        out.reshape(-1)[dst] = data[src]
    return out, lengths


def jaro_winkler_batch(a_arr, b_arr, max_chars: int = 128, prefix_weight: float = 0.1) -> np.ndarray:
    """Exact Jaro-Winkler similarity for every aligned pair of two Arrow string
    arrays. Vectorized across pairs; loops run over ≤ max_chars positions.

    Follows the de-facto public convention (rapidfuzz / jellyfish / DuckDB,
    verified bit-for-bit against DuckDB's ``jaro_winkler_similarity``):
    transpositions are the FLOORED half of out-of-order matches, and the
    Winkler prefix boost applies only when jaro > 0.7. One deliberate
    deviation: two empty strings score 1.0 (identity, s(a,a)=1) where DuckDB
    returns 0.0 — near-dup scoring needs the identity property; callers with
    empty-vs-empty pairs must filter them if DuckDB parity is required."""
    A, la = _pad_batch(a_arr, max_chars)
    B, lb = _pad_batch(b_arr, max_chars)
    n, L = A.shape
    if n == 0:
        return np.empty(0, np.float64)

    maxlen = np.maximum(la, lb)
    window = np.maximum(maxlen // 2 - 1, 0)

    # eq[p, i, j] — equality within the Jaro match window
    i_idx = np.arange(L)
    valid_a = i_idx[None, :] < la[:, None]
    valid_b = i_idx[None, :] < lb[:, None]
    eq = (A[:, :, None] == B[:, None, :])
    eq &= valid_a[:, :, None] & valid_b[:, None, :]
    dist_ok = np.abs(i_idx[:, None] - i_idx[None, :])[None, :, :] <= window[:, None, None]
    eq &= dist_ok

    # Greedy matching: for each i in order, take the first unused j.
    used_b = np.zeros((n, L), bool)
    match_j = np.full((n, L), -1, np.int64)
    for i in range(L):
        cand = eq[:, i, :] & ~used_b
        has = cand.any(axis=1)
        j = cand.argmax(axis=1)
        match_j[has, i] = j[has]
        used_b[has, j[has]] = True

    m = (match_j >= 0).sum(axis=1).astype(np.float64)

    # Transpositions: matched chars of A in i-order vs matched chars of B in
    # j-order. Gather both sequences into left-compacted matrices.
    order = np.argsort(np.where(match_j >= 0, np.arange(L)[None, :], L), axis=1, kind="stable")
    a_seq = np.take_along_axis(A, order, axis=1)  # chars of a at matched i, in i-order
    mj_sorted_by_i = np.take_along_axis(match_j, order, axis=1)
    j_order = np.sort(np.where(match_j >= 0, match_j, L), axis=1)
    # chars of b at matched j, in j-order (pad slots gather B[:, 0], masked below)
    b_seq = np.take_along_axis(B, np.where(j_order < L, j_order, 0), axis=1)
    k_idx = np.arange(L)[None, :]
    mm = k_idx < m[:, None].astype(np.int64)
    # floored half (rapidfuzz/jellyfish/DuckDB), not the exact-half variant
    trans = (((a_seq != b_seq) & mm).sum(axis=1) // 2).astype(np.float64)
    del mj_sorted_by_i

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - trans) / np.maximum(m, 1)) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    both_empty = (la == 0) & (lb == 0)
    jaro = np.where(both_empty, 1.0, jaro)

    # Winkler prefix boost (common prefix up to 4), gated at jaro > 0.7
    pref = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    for i in range(4):
        ok = alive & (i < la) & (i < lb) & (A[:, i] == B[:, i]) if i < L else np.zeros(n, bool)
        pref += ok
        alive = ok
    boost = np.where(jaro > 0.7, pref * prefix_weight * (1.0 - jaro), 0.0)
    return jaro + boost


def levenshtein_batch(
    a_arr, b_arr, max_chars: int = 192, band_radius: int = 48
) -> np.ndarray:
    """Banded Levenshtein distance for aligned pairs, vectorized across the
    batch; the DP loops over rows of the banded matrix (≤ max_chars iterations),
    each iteration full-batch numpy. Cells outside |i-j| <= band_radius are
    treated as infinite, so the result is exact whenever the true distance is
    ≤ band_radius and a (tight) lower bound otherwise — callers convert to a
    similarity ratio and clamp, which is what near-dup scoring needs.
    """
    A, la = _pad_batch(a_arr, max_chars)
    B, lb = _pad_batch(b_arr, max_chars)
    n, L = A.shape
    if n == 0:
        return np.empty(0, np.float64)
    W = 2 * band_radius + 1
    INF = np.int32(1 << 20)

    # dp[p, c] = cost at (i, j) with c = j - i + band_radius, rolled per row i.
    dp = np.full((n, W + 2), INF, np.int32)  # +2 sentinel columns
    jcol = np.arange(-band_radius, band_radius + 1)
    # row i = 0: dp(0, j) = j
    init = jcol[None, :].repeat(n, axis=0).astype(np.int32)
    init[init < 0] = INF
    init = np.minimum(init, np.where(jcol[None, :] <= lb[:, None], init, INF))
    dp[:, 1:-1] = init

    la_max = int(la.max())
    for i in range(1, min(la_max, L) + 1):
        prev = dp
        # j = i + (c - band_radius) for c in [0, W)
        j_at = i + jcol  # (W,)
        # char equality: A[:, i-1] vs B[:, j-1]
        bj = np.clip(j_at - 1, 0, L - 1)
        eqc = A[:, i - 1][:, None] == B[:, bj]
        sub = prev[:, 1:-1] + np.where(eqc, 0, 1)      # diagonal (same c)
        dele = prev[:, 2:] + 1                          # from (i-1, j) → c+1
        dp_new = np.full_like(dp, INF)
        cell = np.minimum(sub, dele)
        # insertion: from (i, j-1) → left neighbor in same row: prefix-scan
        # min(cell[c], cell[c-1]+1, cell[c-2]+2, ...) via doubling
        run = cell
        shift = 1
        while shift < W:
            shifted = np.full_like(run, INF)
            shifted[:, shift:] = run[:, :-shift] + shift
            np.minimum(run, shifted, out=run)
            shift *= 2
        cell = run
        # mask invalid j (j<0 or j>lb)
        invalid = (j_at[None, :] < 0) | (j_at[None, :] > lb[:, None])
        cell = np.where(invalid, INF, cell)
        rows_done = i > la
        dp_new[:, 1:-1] = np.where(rows_done[:, None], prev[:, 1:-1], cell)
        dp = dp_new

    # answer at (la, lb): c = lb - la + band_radius
    c_final = lb - la + band_radius
    out = np.full(n, INF, np.int32)
    ok = (c_final >= 0) & (c_final < W)
    out[ok] = dp[np.arange(n)[ok], 1 + c_final[ok]]
    # out-of-band / overflow → lower bound: |la - lb| + band excess
    fallback = np.maximum(np.abs(la - lb), band_radius + 1)
    return np.where(out >= INF, fallback, out).astype(np.float64)


def levenshtein_ratio_batch(a_arr, b_arr, max_chars: int = 192, band_radius: int = 48) -> np.ndarray:
    """1 - dist / max_len, clamped to [0, 1]; 1.0 for two empty strings."""
    dist = levenshtein_batch(a_arr, b_arr, max_chars, band_radius)
    A_len = np.minimum(_lengths(a_arr), max_chars)
    B_len = np.minimum(_lengths(b_arr), max_chars)
    denom = np.maximum(np.maximum(A_len, B_len), 1)
    return np.clip(1.0 - dist / denom, 0.0, 1.0)


def _lengths(arr) -> np.ndarray:
    _, starts, ends = arrow_string_buffers(arr)
    return (ends - starts).astype(np.float64)


def jaccard_from_sets(sets_a: list[np.ndarray], sets_b: list[np.ndarray]) -> np.ndarray:
    """Jaccard for aligned pairs of pre-uniqued 32-bit shingle-hash sets
    (uint32 arrays). One packed sort over the batch: key = row << 32 | hash.
    Rows per batch must stay < 2^16 (packed key stays well inside uint64)."""
    n = len(sets_a)
    if n == 0:
        return np.empty(0, np.float64)
    if n >= (1 << 16):
        raise ValueError("jaccard_from_sets: batch too large for packing")
    ca = np.fromiter((len(s) for s in sets_a), np.int64, n)
    cb = np.fromiter((len(s) for s in sets_b), np.int64, n)
    rows_a = np.repeat(np.arange(n, dtype=np.uint64), ca)
    rows_b = np.repeat(np.arange(n, dtype=np.uint64), cb)
    flat_a = np.concatenate(sets_a) if ca.sum() else np.empty(0, np.uint32)
    flat_b = np.concatenate(sets_b) if cb.sum() else np.empty(0, np.uint32)
    both = np.sort(
        np.concatenate(
            [
                (rows_a << np.uint64(32)) | flat_a.astype(np.uint64),
                (rows_b << np.uint64(32)) | flat_b.astype(np.uint64),
            ]
        )
    )
    dup = both[1:] == both[:-1]
    inter = np.bincount((both[1:][dup] >> np.uint64(32)).astype(np.int64), minlength=n)
    union = ca + cb - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = inter / union
    return np.where(union == 0, 1.0, out)  # both empty → identical


def jaccard_from_lut(
    off: np.ndarray,
    val: np.ndarray,
    pos_a: np.ndarray,
    hit_a: np.ndarray,
    pos_b: np.ndarray,
    hit_b: np.ndarray,
) -> np.ndarray:
    """Jaccard for pairs whose shingle sets live in a shared (offsets, values)
    LUT, addressed by per-side row indices — fully vectorized gather (no
    python per-pair loop). Misses (hit=False) behave as empty sets."""
    n = len(pos_a)
    if n == 0:
        return np.empty(0, np.float64)
    if n >= (1 << 16):
        raise ValueError("jaccard_from_lut: batch too large for packing")

    def flat(pos, hit):
        counts = np.where(hit, off[pos + 1] - off[pos], 0).astype(np.int64)
        total = int(counts.sum())
        cum = np.zeros(n, np.int64)
        np.cumsum(counts[:-1], out=cum[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        f = val[np.repeat(off[pos].astype(np.int64), counts) + within]
        rows = np.repeat(np.arange(n, dtype=np.uint64), counts)
        return (rows << np.uint64(32)) | f.astype(np.uint64), counts

    ka, ca = flat(pos_a, hit_a)
    kb, cb = flat(pos_b, hit_b)
    both = np.sort(np.concatenate([ka, kb]))
    dup = both[1:] == both[:-1]
    inter = np.bincount((both[1:][dup] >> np.uint64(32)).astype(np.int64), minlength=n)
    union = ca + cb - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = inter / union
    return np.where(union == 0, 1.0, out)


def _row_sets(h32: np.ndarray, bnd: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row sorted-unique via ONE batch sort of (row<<32 | hash32) packed
    keys — replaces a per-row ``np.unique`` Python loop (the difference between
    ~2s and ~15s per million rows of shingle stream)."""
    n = len(bnd) - 1
    rows = np.repeat(
        np.arange(n, dtype=np.uint64), np.diff(bnd).astype(np.int64)
    )
    packed = np.sort((rows << np.uint64(32)) | h32.astype(np.uint64))
    if len(packed):
        first = np.ones(len(packed), bool)
        np.not_equal(packed[1:], packed[:-1], out=first[1:])
        packed = packed[first]
    vals = (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    counts = np.bincount((packed >> np.uint64(32)).astype(np.int64), minlength=n)
    off = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    return off, vals


def shingle_set_table(
    arr, k: int, sample_mod: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row sorted-unique 32-bit shingle-hash sets for an Arrow string array
    as a flat ``(offsets[n+1], values)`` pair (the precomputable half of
    :func:`ngram_jaccard_batch`). 32-bit truncation halves
    storage/gather/sort traffic; within-pair collision odds at ~500-set size
    are ~3e-5 — noise for a [0,1] similarity."""
    from mediachain_indexer_ray.functions.minhash import sample_shingles

    h, bnd = shingle_hashes(arr, k)
    if sample_mod > 1:
        h, bnd = sample_shingles(h, bnd, sample_mod)
    return _row_sets((h >> np.uint64(32)).astype(np.uint32), bnd)


def shingle_sets(arr, k: int, sample_mod: int = 1) -> list[np.ndarray]:
    """List-of-arrays view of :func:`shingle_set_table`."""
    off, vals = shingle_set_table(arr, k, sample_mod)
    return [vals[off[i] : off[i + 1]] for i in range(len(off) - 1)]


def shingle_set_table_prefix(
    sh0: np.ndarray, bnd0: np.ndarray, prefix_arr, k: int, sample_mod: int
) -> tuple[np.ndarray, np.ndarray]:
    """Scorer shingle sets WITHOUT re-shingling: ``prefix_arr`` must be a
    per-row byte-prefix of the text that produced ``(sh0, bnd0)`` (raw,
    unsampled shingle stream). Each row's prefix shingles are exactly its
    first ``len(prefix) - k + 1`` windows, so they are sliced out of the
    existing stream, content-sampled, truncated to 32 bits and set-ified —
    value-identical to ``shingle_set_table(prefix_arr, k, sample_mod)`` at
    ~1/10 the cost. PRECONDITION: the prefix cap must be ≥ k codepoints —
    below that a row can be "short" (whole-string hashed) in the prefix while
    having full k-gram windows in the stream, and the values diverge."""
    from mediachain_indexer_ray.functions.minhash import sample_shingles

    _, fst, fen = arrow_string_buffers(prefix_arr)
    flen = fen - fst
    n = len(flen)
    counts0 = np.diff(bnd0)
    wf = np.maximum(flen - k + 1, 0).astype(np.int64)
    short = (flen > 0) & (flen < k)
    wf[short] = 1  # whole-string shingle of a short row (same in both streams)
    np.minimum(wf, counts0, out=wf)
    fbnd = np.zeros(n + 1, np.int64)
    np.cumsum(wf, out=fbnd[1:])
    total = int(fbnd[-1])
    if total:
        gather = (
            np.repeat(bnd0[:-1], wf)
            + np.arange(total, dtype=np.int64)
            - np.repeat(fbnd[:-1], wf)
        )
        fsh = sh0[gather]
    else:
        fsh = np.empty(0, sh0.dtype)
    fsh, fbnd = sample_shingles(fsh, fbnd, sample_mod)
    return _row_sets((fsh >> np.uint64(32)).astype(np.uint32), fbnd)


def ngram_jaccard_batch(a_arr, b_arr, k: int = 5, sample_mod: int = 1) -> np.ndarray:
    """Exact k-gram Jaccard for aligned pairs via sorted shingle-hash set
    intersection (SURVEY.md F2). Vectorized: one sort over the concatenated
    shingle streams of both sides. ``sample_mod > 1`` applies content-defined
    shingle sampling (functions.minhash.sample_shingles) to BOTH sides — an
    unbiased, ~mod× cheaper estimate."""
    if not isinstance(a_arr, (pa.Array, pa.ChunkedArray)):
        a_arr = pa.array(list(a_arr), type=pa.string())
    if not isinstance(b_arr, (pa.Array, pa.ChunkedArray)):
        b_arr = pa.array(list(b_arr), type=pa.string())
    ha, ba = shingle_hashes(a_arr, k)
    hb, bb = shingle_hashes(b_arr, k)
    if sample_mod > 1:
        from mediachain_indexer_ray.functions.minhash import sample_shingles

        ha, ba = sample_shingles(ha, ba, sample_mod)
        hb, bb = sample_shingles(hb, bb, sample_mod)
    n = len(ba) - 1
    if n >= (1 << 16):
        raise ValueError("ngram_jaccard_batch: batch too large for 48-bit packing")

    def row_unique(h: np.ndarray, bnd: np.ndarray):
        # pack (row, 48-bit shingle hash) into one uint64; one sort per side.
        # 48-bit truncation: within-pair collision odds ~ |set|^2 / 2^48 — noise.
        row_of = np.repeat(
            np.arange(n, dtype=np.uint64), np.diff(bnd).astype(np.int64)
        )
        keys = np.sort((row_of << np.uint64(48)) | (h >> np.uint64(16)))
        first = np.ones(len(keys), bool)
        np.not_equal(keys[1:], keys[:-1], out=first[1:])
        uk = keys[first]
        counts = np.bincount((uk >> np.uint64(48)).astype(np.int64), minlength=n)
        return uk, counts

    ua, ca = row_unique(ha, ba)
    ub, cb = row_unique(hb, bb)
    both = np.sort(np.concatenate([ua, ub]))
    dup = both[1:] == both[:-1]
    ci = np.bincount(
        (both[1:][dup] >> np.uint64(48)).astype(np.int64), minlength=n
    )
    union = ca + cb - ci
    with np.errstate(divide="ignore", invalid="ignore"):
        out = ci / union
    return np.where(union == 0, 1.0, out)  # both empty → identical
