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
    """Per-row 64-bit SimHash. 64 segmented-sum passes over the shingle stream,
    each fully vectorized. Empty rows get simhash 0."""
    n = len(boundaries) - 1
    counts = np.diff(boundaries)
    out = np.zeros(n, U64)
    if len(shingles) == 0 or n == 0:
        return out
    bnd = np.minimum(boundaries[:-1], len(shingles) - 1)
    nonempty = counts > 0
    half = counts.astype(np.int64)  # threshold: bit set iff ones > count/2 (*2 below)
    for b in range(64):
        bits = ((shingles >> U64(b)) & U64(1)).astype(np.int64)
        ones = np.add.reduceat(bits, bnd)
        setbit = (2 * ones > half) & nonempty
        out |= setbit.astype(U64) << U64(b)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return popcount64(np.bitwise_xor(a, b))


def simhash_cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched cosine estimate from SimHash pairs: cos(pi * hamming / 64).

    Monotone decreasing in hamming distance; clipped at 0 (anti-similar docs
    are simply 'not duplicates' for scoring purposes)."""
    ham = hamming64(a, b).astype(np.float64)
    return np.clip(np.cos(np.pi * ham / 64.0), 0.0, 1.0)
