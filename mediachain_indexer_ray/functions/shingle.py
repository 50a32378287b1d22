"""Char k-gram shingling, vectorized over an entire Arrow string column at once
(SURVEY.md F7 — the implicit shingling inside the reference's positional n-gram
blocker, ``[ref: mc_models.py VectorsBaselineNG.img_to_terms — unverified]``).

The whole column's UTF-8 bytes are viewed as one numpy buffer; a rolling
polynomial window hash is computed with k full-buffer passes (k ≈ 5), then each
row's valid window positions are sliced out. No per-row Python work.
"""

from __future__ import annotations

import numpy as np

from mediachain_indexer_ray.functions.hashing import (
    U64,
    arrow_string_buffers,
    hash_bytes_array,
    splitmix64,
)

_C = U64(0x100000001B3)


def shingle_hashes(arr, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Compute k-gram shingle hashes for every string in an Arrow array.

    Returns ``(hashes, boundaries)`` where ``hashes`` is a row-contiguous uint64
    array of all shingle hashes and ``boundaries[i] : boundaries[i+1]`` indexes
    row *i*'s shingles. Rows shorter than ``k`` (but non-empty) contribute one
    whole-string shingle; empty rows contribute none.
    """
    data, starts, ends = arrow_string_buffers(arr)
    n = len(starts)
    lengths = ends - starts
    if n == 0:
        return np.empty(0, U64), np.zeros(1, np.int64)

    # Rolling window hash over the full buffer: H[p] covers data[p : p+k].
    m = len(data)
    nwin = max(0, m - k + 1)
    H = np.zeros(nwin, U64)
    if nwin:
        # accumulate straight from the uint8 buffer (casting="unsafe" upcasts
        # inside the ufunc inner loop): no 8× u64 expansion of the text, ~2×
        # faster at identical output
        np.add(H, data[0:nwin], out=H, casting="unsafe")
        for j in range(1, k):  # in-place: no per-iteration temporaries
            H *= _C
            np.add(H, data[j : j + nwin], out=H, casting="unsafe")
        H = splitmix64(H)

    counts = np.maximum(lengths - k + 1, 0).astype(np.int64)
    short = (lengths > 0) & (lengths < k)
    counts[short] = 1

    boundaries = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=boundaries[1:])
    total = int(boundaries[-1])
    out = np.empty(total, U64)

    contiguous = bool((starts[1:] == ends[:-1]).all()) and (starts[0] == 0 if n else True)
    full_counts_total = int(counts[~short].sum())
    if contiguous and nwin:
        # Fast path: rows are back-to-back in the buffer, so each row's valid
        # windows are H[start : end-k+1] in order. Mark boundary-crossing
        # windows invalid with a range-diff mask — no per-element gather.
        inv = np.zeros(nwin + 1, np.int32)
        lo = np.clip(ends - k + 1, 0, nwin)
        hi = np.clip(ends, 0, nwin)
        np.add.at(inv, lo, 1)
        np.add.at(inv, hi, -1)
        tail = min(int(ends[-1]), nwin)  # windows past the last row (buffer padding)
        inv[tail] += 1 if tail < nwin else 0
        valid = np.cumsum(inv[:-1]) == 0
        valid_H = H[valid]
        if len(valid_H) != full_counts_total:  # pragma: no cover — safety net
            raise AssertionError(
                f"shingle mask mismatch: {len(valid_H)} != {full_counts_total}"
            )
        slot_ok = np.ones(total, bool)
        slot_ok[boundaries[:-1][short]] = False
        out[slot_ok] = valid_H
    else:  # sliced / non-contiguous array: per-row gather fallback
        full = lengths >= k
        if full.any():
            fstarts = starts[full]
            fcounts = counts[full]
            cum = boundaries[:-1][full]
            tot_f = int(fcounts.sum())
            pos = np.arange(tot_f, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(fcounts[:-1])]), fcounts
            )
            src = np.repeat(fstarts, fcounts) + pos
            dst = np.repeat(cum, fcounts) + pos
            out[dst] = H[src]

    if short.any():
        out[boundaries[:-1][short]] = hash_bytes_array(data, starts[short], ends[short])

    return out, boundaries


def rolling_window_hashes(
    vals: np.ndarray, boundaries: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial hash of every k-length window of ``vals`` WITHIN each row
    segment (``boundaries[i]:boundaries[i+1]`` is row *i*'s values) — the
    token-level analog of :func:`shingle_hashes`. Rows with fewer than ``k``
    values emit nothing. One k-pass rolling accumulate over the flat array,
    then a vectorized gather of each row's valid window positions."""
    n = len(boundaries) - 1
    m = len(vals)
    nwin = max(0, m - k + 1)
    H = np.zeros(nwin, U64)
    if nwin:
        v = vals.astype(U64)
        np.add(H, v[0:nwin], out=H)
        for j in range(1, k):
            H *= _C
            np.add(H, v[j : j + nwin], out=H)
        H = splitmix64(H)
    counts = np.maximum(np.diff(boundaries) - k + 1, 0).astype(np.int64)
    outb = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=outb[1:])
    total = int(outb[-1])
    gather = (
        np.repeat(boundaries[:-1].astype(np.int64), counts)
        + np.arange(total, dtype=np.int64)
        - np.repeat(outb[:-1], counts)
    ) if total else np.empty(0, np.int64)
    return H[gather], outb
