"""Mergeable streaming sketches — the bounded-memory aggregates a 100-TB
pipeline substitutes for exact wide shuffles when approximation is acceptable
(SURVEY.md §2's "novel sketch" custom-operator family; no reference analog —
the reference computes these exactly in ES, ``[ref: mc_models.py — unverified]``).

Both sketches are (a) computed per batch with numpy kernels, (b) merged
associatively — so they compose with ``map_batches`` partials + one tiny
reduce, moving O(sketch) bytes per block instead of O(rows).
"""

from __future__ import annotations

import numpy as np

from mediachain_indexer_ray.functions.hashing import splitmix64


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, public algorithm) — dense registers
# ---------------------------------------------------------------------------

def hll_registers(hashes: np.ndarray, p: int = 14) -> np.ndarray:
    """Dense HLL register array (2^p uint8) from pre-hashed uint64 values.
    Register index = top p bits; rho = 1 + leading zeros of the remaining
    (64-p) bits, computed vectorized via bit-length."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits with 1s
    # leading zeros of rest = 64 - bit_length(rest); bit_length via log2 is
    # unsafe for uint64 — use a float64 trick only on the top 53 bits
    top = (rest >> np.uint64(11)).astype(np.float64)  # 53-bit mantissa-safe
    bl = np.where(top > 0, np.floor(np.log2(np.maximum(top, 1))) + 1 + 11, 11)
    low = (rest & np.uint64((1 << 11) - 1)).astype(np.float64)
    bl_low = np.where(low > 0, np.floor(np.log2(np.maximum(low, 1))) + 1, 0)
    bl = np.where(top > 0, bl, bl_low)
    rho = (64 - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_from_ints(vals: np.ndarray, p: int = 14, seed: int = 0x51) -> np.ndarray:
    return hll_registers(splitmix64(vals.astype(np.uint64) ^ np.uint64(seed)), p)


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitters summary (Misra & Gries 1982, public algorithm)
# ---------------------------------------------------------------------------

def mg_summary(keys: np.ndarray, counts: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted (key, count) pairs to ≤ m counters. Keys must be a
    numeric array; counts int64. Guarantee: every key with true total count
    > N/m survives with count underestimated by ≤ N/m (N = sum of counts).

    Vectorized form: aggregate exactly, keep the top m by count, and subtract
    the (m+1)-th count from the survivors — equivalent to batched decrement.
    """
    if len(keys) == 0:
        return keys[:0], counts[:0].astype(np.int64)
    order = np.argsort(keys, kind="stable")
    sk, sc = keys[order], counts[order].astype(np.int64)
    first = np.ones(len(sk), bool)
    np.not_equal(sk[1:], sk[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    uk = sk[starts]
    uc = np.add.reduceat(sc, starts)
    if len(uk) <= m:
        return uk, uc
    # keep top-m by count; subtract the threshold count (batched decrement)
    kth = np.partition(uc, len(uc) - m)[len(uc) - m]
    # take strictly-above first, then fill with ==kth (deterministic by key)
    above = uc > kth
    need = m - int(above.sum())
    eq_idx = np.flatnonzero(uc == kth)[:max(0, need)]
    keep = np.zeros(len(uk), bool)
    keep[above] = True
    keep[eq_idx] = True
    dec = np.partition(uc, len(uc) - m - 1)[len(uc) - m - 1]
    out_c = uc[keep] - dec
    pos = out_c > 0
    return uk[keep][pos], out_c[pos]


def mg_merge(
    k1: np.ndarray, c1: np.ndarray, k2: np.ndarray, c2: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    return mg_summary(np.concatenate([k1, k2]), np.concatenate([c1, c2]), m)


# ---------------------------------------------------------------------------
# KLL rank/quantile sketch (Karnin, Lang, Liberty 2016, arXiv:1603.05346 —
# public algorithm). Mergeable with O(k log(n/k)) space and O(1/k)-ish rank
# error, closing the cardinality caveat on the exact value-histogram
# quantile operators (pipelines/queries.py order_price_quantiles_cont):
# driver/accumulator state never depends on |distinct values|.
# ---------------------------------------------------------------------------


class KLLSketch:
    """Levelled compactor sketch: items at level ``h`` carry weight ``2**h``.

    A level exceeding its capacity (``k`` at the top, shrinking by ``C**depth``
    below, floor 2) is sorted and every other item — random offset — is
    promoted one level up, halving the item count while preserving TOTAL
    weight exactly (an odd leftover stays at its level), so ``total_weight()``
    always equals the true item count. Batched numpy updates; merge is
    level-wise concat + the same compaction, hence associative in
    distribution and safe under Ray's AggregateFn tree reduce.
    """

    __slots__ = ("k", "levels", "_rng")
    C = 2.0 / 3.0

    def __init__(self, k: int = 512, seed: int = 0xA5C3):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._rng = np.random.RandomState(seed)

    def _cap(self, h: int, n_levels: int) -> int:
        return max(2, int(np.ceil(self.k * self.C ** (n_levels - 1 - h))))

    def update_many(self, vals: np.ndarray) -> "KLLSketch":
        vals = np.asarray(vals, np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals):
            self.levels[0] = np.concatenate([self.levels[0], vals])
            self._compress()
        return self

    def _compress(self) -> None:
        changed = True
        while changed:
            changed = False
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h, len(self.levels)):
                    self._compact(h)
                    changed = True
                    break

    def _compact(self, h: int) -> None:
        lv = np.sort(self.levels[h], kind="stable")
        if len(lv) & 1:  # odd leftover keeps its level + weight (unbiased end)
            if self._rng.randint(2):
                keep, lv = lv[-1:], lv[:-1]
            else:
                keep, lv = lv[:1], lv[1:]
        else:
            keep = lv[:0]
        promoted = lv[int(self._rng.randint(2))::2]
        self.levels[h] = keep
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        for h, lv in enumerate(other.levels):
            if h >= len(self.levels):
                self.levels.append(lv.copy())
            elif len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self._compress()
        return self

    def total_weight(self) -> int:
        return int(sum(len(lv) << h for h, lv in enumerate(self.levels)))

    def quantiles(self, qs) -> list[float]:
        """quantile_disc-convention values (1-based rank ceil(q*W))."""
        vals = np.concatenate(self.levels)
        if not len(vals):
            return [float("nan") for _ in qs]
        wts = np.concatenate(
            [np.full(len(lv), 1 << h, np.int64)
             for h, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        w = int(cum[-1])
        out = []
        for q in qs:
            rank = max(1, int(np.ceil(float(q) * w)))
            out.append(float(vals[min(np.searchsorted(cum, rank), len(vals) - 1)]))
        return out
