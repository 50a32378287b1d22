"""MinHash signatures, vectorized across a whole batch of rows.

The Ray-Data-native replacement for the reference's perceptual hash
(``[ref: mc_models.py img_to_hsh — unverified]``, SURVEY.md M4). Two modes:

* ``"oph"`` (default, the 100-TB path): one-permutation hashing with rotation
  densification (Shrivastava & Li, ICML 2014) — ONE pass over the shingle
  stream regardless of K, then a K-bin scatter-min. ~K× cheaper than classic
  K-permutation MinHash at equal signature length.
* ``"kperm"``: classic K independent permutations (splitmix64 xor-mix family),
  K segmented-min passes. Used by accuracy tests as the textbook baseline.

Signatures are uint64; estimated Jaccard = mean(sig_a == sig_b).
"""

from __future__ import annotations

import numpy as np

from mediachain_indexer_ray.functions.hashing import U64, perm_constants, splitmix64

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)  # empty-doc signature slot

_SAMPLE_SALT = np.uint64(0x5A3C17)


def sample_shingles(
    shingles: np.ndarray, boundaries: np.ndarray, mod: int
) -> tuple[np.ndarray, np.ndarray]:
    """Content-defined shingle subsampling: keep shingles whose salted hash is
    ≡ 0 (mod `mod`). Because the rule depends only on shingle CONTENT, the same
    shingle is kept or dropped in every document — Jaccard over the sampled
    space is an unbiased estimate of full Jaccard (modulo sampling variance),
    and signatures stay comparable across documents. A non-empty row that loses
    every shingle keeps its minimum shingle so it never becomes sig-empty.
    Cuts MinHash+SimHash work by ~mod× on long documents (the 100-TB lever)."""
    if mod <= 1 or len(shingles) == 0:
        return shingles, boundaries
    keep = (splitmix64(shingles ^ _SAMPLE_SALT) % U64(mod)) == 0
    counts = np.diff(boundaries)
    n = len(counts)
    bnd0 = np.minimum(boundaries[:-1], max(len(shingles) - 1, 0))
    kept_per_row = np.add.reduceat(keep.astype(np.int64), bnd0)
    kept_per_row[counts == 0] = 0
    # rescue rows that lost everything: keep their min shingle (deterministic)
    lost = (kept_per_row == 0) & (counts > 0)
    if lost.any():
        mins = np.minimum.reduceat(shingles, bnd0)
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        is_min = shingles == mins[row_of]
        rescue = is_min & lost[row_of]
        # only the FIRST min occurrence per row (dups possible)
        first_occ = np.zeros(len(shingles), bool)
        idx = np.flatnonzero(rescue)
        if len(idx):
            rr = row_of[idx]
            fo = np.ones(len(idx), bool)
            fo[1:] = rr[1:] != rr[:-1]
            first_occ[idx[fo]] = True
        keep |= first_occ
        kept_per_row = np.add.reduceat(keep.astype(np.int64), bnd0)
        kept_per_row[counts == 0] = 0
    new_bnd = np.zeros(n + 1, np.int64)
    np.cumsum(kept_per_row, out=new_bnd[1:])
    return shingles[keep], new_bnd


def minhash_kperm(
    shingles: np.ndarray, boundaries: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """Classic K-permutation MinHash. Returns (n_rows, K) uint64."""
    n = len(boundaries) - 1
    out = np.full((n, num_perm), SENTINEL)
    counts = np.diff(boundaries)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    # reduceat boundaries must be < len(shingles); clamp & mask empty rows after.
    bnd = np.minimum(boundaries[:-1], max(len(shingles) - 1, 0))
    gammas = perm_constants(num_perm, seed)
    for j in range(num_perm):
        vals = splitmix64(shingles ^ gammas[j])
        mins = np.minimum.reduceat(vals, bnd) if len(vals) else np.empty(0, U64)
        out[nonempty, j] = mins[nonempty]
    return out


def minhash_oph(
    shingles: np.ndarray, boundaries: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """One-permutation MinHash with circular rotation densification.

    bin(s) = rehash(s) mod K; value = rehash(s); empty bins borrow the nearest
    filled bin to the right (circularly) — log2(K) vectorized fill passes.
    Rows with zero shingles stay all-SENTINEL (they are exact-dup-grouped by
    digest upstream, SURVEY.md M5, and never reach LSH).
    """
    n = len(boundaries) - 1
    K = num_perm
    out = np.full(n * K, SENTINEL)
    if len(shingles):
        vals = splitmix64(shingles ^ perm_constants(1, seed)[0])
        bins = vals % U64(K)
        row_of = np.repeat(np.arange(n, dtype=np.uint64), np.diff(boundaries))
        keys = row_of * U64(K) + bins
        if n * K < (1 << 24):
            # pack (key:24 | value-high-40) and np.sort ONCE — ~2× cheaper than
            # argsort + gathers. Signature values become the TOP 40 bits of the
            # hash (a fixed truncation, so values stay comparable across
            # batches); min is preserved under order-preserving truncation and
            # 2^-40 within-signature collisions are noise for Jaccard.
            packed = np.sort((keys << U64(40)) | (vals >> U64(24)))
            kpart = packed >> U64(40)
            first = np.empty(len(packed), bool)
            first[0] = True
            np.not_equal(kpart[1:], kpart[:-1], out=first[1:])
            out[kpart[first].astype(np.int64)] = packed[first] & U64((1 << 40) - 1)
        else:  # huge batch fallback: argsort path, SAME 40-bit truncation as
            # the packed fast path (truncation is monotone, so
            # min(vals) >> 24 == min(vals >> 24)) — signatures from the two
            # paths must be bit-identical or band keys silently diverge for
            # rows that landed in differently-sized batches
            keys = keys.astype(np.int64)
            order = np.argsort(keys, kind="stable")
            sk, sv = keys[order], vals[order]
            group_start = np.empty(len(sk), bool)
            group_start[0] = True
            np.not_equal(sk[1:], sk[:-1], out=group_start[1:])
            starts_idx = np.flatnonzero(group_start)
            out[sk[starts_idx]] = np.minimum.reduceat(sv, starts_idx) >> U64(24)
    sig = out.reshape(n, K)

    # circular forward-fill of empty bins (doubling passes)
    empty = sig == SENTINEL
    if empty.any():
        any_filled = ~empty.all(axis=1)
        shift = 1
        while shift < K and empty.any():
            rolled = np.roll(sig, -shift, axis=1)
            take = (sig == SENTINEL) & (rolled != SENTINEL)
            sig[take] = rolled[take]
            empty = sig == SENTINEL
            shift *= 2
        sig[~any_filled] = SENTINEL  # all-empty rows stay sentinel
    return sig


def minhash_signatures(
    shingles: np.ndarray,
    boundaries: np.ndarray,
    num_perm: int,
    seed: int,
    mode: str = "oph",
) -> np.ndarray:
    if mode == "oph":
        return minhash_oph(shingles, boundaries, num_perm, seed)
    if mode == "kperm":
        return minhash_kperm(shingles, boundaries, num_perm, seed)
    raise ValueError(f"unknown minhash mode {mode!r}")


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Batched Jaccard estimate from signature matrices (n, K) (SURVEY.md F2)."""
    return (sig_a == sig_b).mean(axis=-1)
