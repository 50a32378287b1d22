"""Vectorized 64-bit hashing primitives (numpy, no external hash libs).

The reference's signature is a perceptual image hash
(``[ref: mc_models.py img_to_hsh — unverified]``, SURVEY.md M4); ours is built from
char-shingle hashes. No mmh3/xxhash in this environment, so everything is
hand-written: splitmix64 mixing, polynomial rolling shingle hashes, popcount —
all operating on whole numpy arrays (uint64 wraparound is well-defined and silent
in numpy unsigned arithmetic).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless splitmix64 finalizer — high-avalanche 64-bit mix.

    Used (a) to finalize rolling shingle hashes, (b) xor-mixed with per-permutation
    constants as the MinHash "permutation" family, (c) for stable string digests.
    """
    z = np.add(x, _SM_GAMMA, dtype=U64)
    t = np.right_shift(z, U64(30))
    z ^= t
    z *= _SM_M1
    np.right_shift(z, U64(27), out=t)
    z ^= t
    z *= _SM_M2
    np.right_shift(z, U64(31), out=t)
    z ^= t
    return z


def perm_constants(num_perm: int, seed: int) -> np.ndarray:
    """K distinct 64-bit xor constants derived deterministically from `seed`."""
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | U64(1)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (SWAR; SURVEY.md F1)."""
    x = x.astype(U64, copy=True)
    x -= (x >> U64(1)) & U64(0x5555555555555555)
    x = (x & U64(0x3333333333333333)) + ((x >> U64(2)) & U64(0x3333333333333333))
    x = (x + (x >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    return ((x * U64(0x0101010101010101)) >> U64(56)).astype(np.int64)


def hash_bytes_array(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Order-sensitive uint64 digest of each [start, end) slice of a uint8 buffer,
    fully vectorized (polynomial hash mod 2**64 with an odd multiplier, finalized
    with splitmix64). One pass over the total byte count — no per-row Python loop.

    Used for exact-content digests (SURVEY.md M5/F6): equal bytes ⇒ equal digest;
    different bytes ⇒ different digest except for ~2^-64 collisions, acceptable
    because exact-dup groups are verified cheaply downstream by the scorer.
    """
    n = len(starts)
    if n == 0:
        return np.empty(0, U64)
    starts = starts.astype(np.int64, copy=False)
    ends = ends.astype(np.int64, copy=False)
    lengths = ends - starts
    total = int(lengths.sum())
    if total == 0:
        return splitmix64(np.zeros(n, U64))
    cum = np.zeros(n, np.int64)
    np.cumsum(lengths[:-1], out=cum[1:])
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(cum, lengths)
    gather = np.repeat(starts, lengths) + pos_in_row
    vals = data[gather].astype(U64)
    max_len = int(lengths.max())
    powers = np.empty(max_len, U64)
    powers[0] = U64(1)
    if max_len > 1:
        np.cumprod(np.full(max_len - 1, U64(0x100000001B3)), out=powers[1:])
    # mix each byte with its in-row position before weighting: cheap avalanche
    contrib = (vals + U64(0x9E3779B97F4A7C15)) * powers[pos_in_row]
    padded = np.concatenate([contrib, np.zeros(1, U64)])  # sentinel for empty rows
    sums = np.add.reduceat(padded, np.minimum(cum, total))
    sums[lengths == 0] = U64(0)
    return splitmix64(sums ^ lengths.astype(U64))


def content_digest(arr) -> np.ndarray:
    """Exact-content uint64 digest per string, built for LONG payloads
    (assembled conversation text, documents): one blake2b C call per row over
    a zero-copy slice of the Arrow buffer. The vectorized polynomial path
    (:func:`hash_bytes_array`) materializes O(total_bytes) int64 temporaries —
    ~50× more memory traffic, which dominates the signature stage on fat rows.
    Keyed use (SURVEY.md M5): equal bytes ⇒ equal digest."""
    import hashlib

    data, starts, ends = arrow_string_buffers(arr)
    n = len(starts)
    out = np.empty(n, U64)
    mv = memoryview(data)
    blake2b = hashlib.blake2b
    fb = int.from_bytes
    for i in range(n):
        out[i] = fb(
            blake2b(mv[starts[i] : ends[i]], digest_size=8).digest(), "little"
        )
    return out


def as_array(arr):
    """ChunkedArray → contiguous Array; Array passes through."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def arrow_string_buffers(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy view of an Arrow string/large_string array as
    ``(byte_buffer, starts, ends)`` numpy arrays (int64 offsets).

    Nulls are treated as empty strings. This is the entry point for every
    vectorized text kernel (shingling, digests) — no per-row Python objects.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type):
        arr = arr.cast(pa.large_string())
    off_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    return data, offsets[:-1].copy(), offsets[1:].copy()


def hash_strings(strings, seed: int = 0) -> np.ndarray:
    """Stable uint64 digest per string of an Arrow array / python list."""
    import pyarrow as pa

    arr = strings if isinstance(strings, (pa.Array, pa.ChunkedArray)) else pa.array(
        strings, type=pa.string()
    )
    data, starts, ends = arrow_string_buffers(arr)
    h = hash_bytes_array(data, starts, ends)
    if seed:
        h = splitmix64(h ^ U64(seed))
    return h


CID_SEED = 0x1D  # the one seed of the conversation-id hash family: scorer
# LUT keys, candidate-pair endpoints, closure node ids and the singleton
# anti-filter all share it, so id-hashes computed in one stage probe another
# stage's tables directly.


def cid64(ids) -> np.ndarray:
    """Canonical 63-BIT conversation-id hash — the fixed-width node identity
    carried through the band→pair→closure shuffle chain instead of the
    conv_id string (VERDICT r3 #3: those stages are DRAM-bandwidth-bound and
    strings are 3-6× the bytes). Bit 63 is RESERVED: closure's virtual relay
    nodes set it, so every relay id sorts above every real id and the
    component minimum (= cluster label) is always a real node.

    Accepts a string Arrow array (hashes it) or an unsigned-integer array /
    numpy array (already-hashed ids pass through). Collision math: two of n
    conv ids collide with probability ≈ n²/2^64 (~1e-5 at 12M conversations,
    ~1e-3 at 100M) — a collision can only MERGE two clusters, an error rate
    far below the scorer's own FP rate at τ; string ids are re-attached from
    the signatures table at cluster write, so output ids are never hashes."""
    import pyarrow as pa

    if isinstance(ids, np.ndarray) and ids.dtype == np.uint64:
        return ids
    if isinstance(ids, (pa.Array, pa.ChunkedArray)) and (
        pa.types.is_unsigned_integer(ids.type) or pa.types.is_integer(ids.type)
    ):
        return np.asarray(as_array(ids).to_numpy(zero_copy_only=False),
                          dtype=np.uint64)
    return hash_strings(ids, seed=CID_SEED) >> U64(1)
