"""64-bit SimHash over shingle hashes + hamming/cosine kernels (SURVEY.md M4, F1).

Plays the role of the reference's perceptual-hash hamming rerank feature
(``[ref: mc_models.py dedupe_batch hamming distance — unverified]``): hamming
distance between SimHashes is a proxy for cosine distance between the docs'
shingle-frequency vectors (Charikar, STOC 2002).
"""

from __future__ import annotations

import numpy as np

from mediachain_indexer_ray.functions.hashing import U64, popcount64


def simhash_signatures(shingles: np.ndarray, boundaries: np.ndarray) -> np.ndarray:
    """Per-row 64-bit SimHash: per row, unpack the row's shingle hashes into a
    (row_shingles, 64) bit matrix and column-sum it (one C call each) — ~5×
    faster than 64 segmented passes over the whole stream (signatures are
    memory-bandwidth bound at cluster concurrency). The python loop runs per
    ROW, not per shingle; rows carry hundreds-to-thousands of shingles.
    Empty rows get simhash 0."""
    n = len(boundaries) - 1
    counts = np.diff(boundaries).astype(np.int64)
    if len(shingles) == 0 or n == 0:
        return np.zeros(n, U64)

    bytes_all = shingles.view(np.uint8).reshape(-1, 8)
    ones = np.zeros((n, 64), np.int64)
    for r in range(n):
        s, e = boundaries[r], boundaries[r + 1]
        if e > s:
            ones[r] = np.unpackbits(
                bytes_all[s:e], axis=1, bitorder="little"
            ).sum(axis=0)

    setbits = (2 * ones > counts[:, None]) & (counts > 0)[:, None]
    packed = np.packbits(setbits, axis=1, bitorder="little")
    return np.ascontiguousarray(packed).view(U64).reshape(n)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return popcount64(np.bitwise_xor(a, b))


def simhash_cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched cosine estimate from SimHash pairs: cos(pi * hamming / 64).

    Monotone decreasing in hamming distance; clipped at 0 (anti-similar docs
    are simply 'not duplicates' for scoring purposes)."""
    ham = hamming64(a, b).astype(np.float64)
    return np.clip(np.cos(np.pi * ham / 64.0), 0.0, 1.0)
