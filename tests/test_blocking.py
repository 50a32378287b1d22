"""Kernel-equivalence tests for salted/capped pair emission (SURVEY.md J1/A5/O1).

Pins the uint64-native canonical-pair path (pairs are 63-bit id-hashes —
VERDICT r3 #3 removed strings from the band→pair→closure shuffles) against a
plain-Python reference on the same partition, including the hot-block salted
path and the incremental ``is_new`` path whose new×old cross products are the
only pairs that can arrive non-canonical.
"""

import itertools

import numpy as np
import pyarrow as pa

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.hashing import cid64
from mediachain_indexer_ray.stages.blocking import _emit_pairs_partition


def _cid(name: str) -> int:
    return int(cid64(pa.array([name], pa.string()))[0])


def _mk_partition(blocks, is_new=None):
    """blocks: list of (band_key, [conv_id, ...]); is_new: dict conv_id->bool."""
    band, conv = [], []
    for k, members in blocks:
        for m in members:
            band.append(k)
            conv.append(m)
    cols = {
        "band_key": pa.array(np.array(band, np.uint64)),
        "cid": pa.array(cid64(pa.array(conv, pa.string()))),
        # simhash = deterministic function of conv id so we can verify the
        # simhash columns were swapped consistently with (a, b)
        "simhash": pa.array(
            np.array([abs(hash(c)) % (2**32) for c in conv], np.uint64)
        ),
    }
    if is_new is not None:
        cols["is_new"] = pa.array([bool(is_new.get(c, False)) for c in conv])
    return pa.table(cols)


def _reference_pairs(blocks, is_new=None):
    """All unordered in-block pairs (touching ≥1 new member if is_new given),
    canonicalized by plain Python comparison of the id-hashes."""
    out = set()
    for _, members in blocks:
        for x, y in itertools.combinations(members, 2):
            if is_new is not None and not (is_new.get(x) or is_new.get(y)):
                continue
            hx, hy = _cid(x), _cid(y)
            out.add((min(hx, hy), max(hx, hy)))
    return out


def _emitted(table, cfg):
    res = _emit_pairs_partition(table, cfg)
    sim_of = dict(
        zip(table.column("cid").to_pylist(), table.column("simhash").to_pylist())
    )
    rows = list(
        zip(
            res.column("a").to_pylist(),
            res.column("b").to_pylist(),
            res.column("simhash_a").to_pylist(),
            res.column("simhash_b").to_pylist(),
        )
    )
    for a, b, sa, sb in rows:
        assert a < b, (a, b)
        assert sa == sim_of[a] and sb == sim_of[b], "simhash not swapped with ids"
    return {(a, b) for a, b, _, _ in rows}, res


def test_pair_emission_matches_reference_plain_blocks():
    cfg = Config(hot_block_threshold=100, max_pairs_per_block=10_000)
    blocks = [
        (1, ["c3", "c1", "c2"]),
        (2, ["c9", "c1"]),
        (3, ["solo"]),
        (4, ["z", "a", "m", "b"]),
    ]
    got, _ = _emitted(_mk_partition(blocks), cfg)
    assert got == _reference_pairs(blocks)


def test_pair_emission_matches_reference_incremental_cross_pairs():
    # new member with LARGER conv_id than the old ones → the new×old cross
    # product arrives (new, old) and must be swapped to canonical order
    cfg = Config(hot_block_threshold=100, max_pairs_per_block=10_000)
    blocks = [(7, ["a1", "b2", "zz_new"]), (8, ["zz_new", "aa_old"])]
    is_new = {"zz_new": True}
    got, _ = _emitted(_mk_partition(blocks, is_new), cfg)
    assert got == _reference_pairs(blocks, is_new)
    ho, hn = _cid("aa_old"), _cid("zz_new")
    assert (min(ho, hn), max(ho, hn)) in got


def test_pair_emission_salted_hot_block_stays_canonical_and_covered():
    # hot block of 40 members with threshold 8 → ~5 salted sub-blocks; every
    # emitted pair must be canonical and a subset of the full triu; multi-band
    # redundancy (not this single band) is what restores recall at scale
    cfg = Config(hot_block_threshold=8, max_pairs_per_block=10_000)
    members = [f"m{i:03d}" for i in range(40)]
    blocks = [(5, members)]
    got, res = _emitted(_mk_partition(blocks), cfg)
    full = _reference_pairs(blocks)
    assert got <= full
    assert len(got) > 0
    # salting splits the block, so strictly fewer pairs than the full triu
    assert len(got) < len(full)


def test_pair_emission_cap_counts_truncation():
    cfg = Config(hot_block_threshold=100, max_pairs_per_block=3)
    blocks = [(6, ["p1", "p2", "p3", "p4"])]  # 6 pairs, cap 3
    got, res = _emitted(_mk_partition(blocks), cfg)
    assert len(got) == 3
    assert sum(res.column("truncated").to_pylist()) == 3


def test_pair_emission_no_pandas_in_hot_loop():
    import inspect

    from mediachain_indexer_ray.stages import blocking

    src = inspect.getsource(blocking._emit_pairs_partition)
    assert ".to_pandas()" not in src
