"""Blocking: exact-digest dedup, MinHash-LSH band emission, salted pair generation.

Re-expresses the reference's candidate generation (SURVEY.md M5/M6/J1/A5/O1):

* ``VectorsBaseline`` exact-hash blocking → digest groupby (exact_dedup)
* ``VectorsBaselineNG`` positional n-gram terms → MinHash-LSH band keys
* ES terms-query candidate lookup → self-join within band groups
* ES max-clause silent truncation → EXPLICIT hot-block salting + capped pair
  emission with truncation counters

Skew note (BASELINE.json:6): the hot-block pre-count needs no extra global
shuffle here — the pair-emission bucket shuffle already co-locates every row of
a band, so band sizes are exact in-bucket and salting happens there. A true
duplicate pair survives salting with high probability because it co-occurs in
many of the B bands and salts differ per band.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.hashing import U64, cid64, splitmix64
from mediachain_indexer_ray.functions.simhash import hamming64
from mediachain_indexer_ray.stages.partition import grouped_partitions


# ---------------------------------------------------------------------------
# exact dedup (M5)
# ---------------------------------------------------------------------------

def _exact_dedup_partition(t: pa.Table) -> pa.Table:
    """Within a digest-bucket: first conv per digest is the representative;
    other members become identity edges (rep, member). Output is a union table
    tagged by `kind` ('rep' rows keep full signature payload; 'edge' rows carry
    a/b)."""
    idx = pc.sort_indices(
        t, sort_keys=[("digest", "ascending"), ("conv_id", "ascending")]
    )
    t = t.take(idx)
    d = t.column("digest").to_numpy()
    first = np.ones(len(d), bool)
    if len(d) > 1:
        np.not_equal(d[1:], d[:-1], out=first[1:])
    group_of = np.cumsum(first) - 1
    rep_row = np.flatnonzero(first)[group_of]
    conv = t.column("conv_id")
    rep_ids = conv.take(pa.array(rep_row))
    is_member = ~first
    edges = pa.table(
        {
            "a": rep_ids.filter(pa.array(is_member)),
            "b": conv.filter(pa.array(is_member)),
        }
    )
    reps = t.filter(pa.array(first))
    # encode both outputs in one table (Ray map_groups returns one table):
    # rep rows: kind=0, edge rows: kind=1 with a/b in conv_id/edge_to.
    n_r, n_e = reps.num_rows, edges.num_rows
    out = pa.table(
        {
            "kind": pa.array(
                np.concatenate([np.zeros(n_r, np.int8), np.ones(n_e, np.int8)])
            ),
            "conv_id": pa.concat_arrays(
                [reps.column("conv_id").combine_chunks(), edges.column("b").combine_chunks()]
            ),
            "edge_to": pa.concat_arrays(
                [
                    pa.nulls(n_r, pa.string()),
                    edges.column("a").combine_chunks(),
                ]
            ),
            "digest": pa.concat_arrays(
                [reps.column("digest").combine_chunks(), pa.nulls(n_e, pa.uint64())]
            ),
            "minhash": pa.concat_arrays(
                [
                    reps.column("minhash").combine_chunks().cast(pa.list_(pa.uint64())),
                    pa.ListArray.from_arrays(
                        np.zeros(n_e + 1, np.int32), pa.array([], pa.uint64())
                    ),
                ]
            ),
            "scorer_shingles": pa.concat_arrays(
                [
                    reps.column("scorer_shingles")
                    .combine_chunks()
                    .cast(pa.list_(pa.uint32())),
                    pa.ListArray.from_arrays(
                        np.zeros(n_e + 1, np.int32), pa.array([], pa.uint32())
                    ),
                ]
            ),
            "simhash": pa.concat_arrays(
                [reps.column("simhash").combine_chunks(), pa.nulls(n_e, pa.uint64())]
            ),
            "feature_text": pa.concat_arrays(
                [reps.column("feature_text").combine_chunks(), pa.nulls(n_e, pa.string())]
            ),
        }
    )
    return out


def exact_dedup_mixed(
    sigs: ray.data.Dataset, cfg: Config, num_parts: int | None = None
) -> ray.data.Dataset:
    """signatures → mixed (kind=0 representative rows, kind=1 exact-dup edges).
    Shuffle key = digest. The pipeline CHECKPOINTS this dataset before calling
    :func:`split_exact_dedup` — deriving both sides from an unmaterialized
    dataset would re-execute the shuffle twice."""
    return grouped_partitions(
        sigs, "digest", _exact_dedup_partition, cfg.num_hash_partitions or num_parts
    )


def split_exact_dedup(
    mixed: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """reps keep their string conv_id (they feed the scorer LUT and the final
    cluster write); edges are emitted as 63-bit id-hashes — the closure chain
    is uint64-native end to end (VERDICT r3 #3)."""
    reps = mixed.filter(expr="kind == 0").drop_columns(["kind", "edge_to"])

    def _to_u64(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(cid64(b.column("edge_to").combine_chunks())),
                "b": pa.array(cid64(b.column("conv_id").combine_chunks())),
            }
        )

    edges = (
        mixed.filter(expr="kind == 1")
        .select_columns(["edge_to", "conv_id"])
        .map_batches(_to_u64, batch_format="pyarrow", zero_copy_batch=True)
    )
    return reps, edges


# ---------------------------------------------------------------------------
# band emission (M6)
# ---------------------------------------------------------------------------

def _emit_bands_batch(batch: pa.Table, cfg: Config) -> pa.Table:
    n = batch.num_rows
    K, B, R = cfg.num_perm, cfg.num_bands, cfg.band_rows
    mh = np.asarray(batch.column("minhash").combine_chunks().flatten()).reshape(n, K)
    bands = mh.reshape(n, B, R)
    h = np.zeros((n, B), U64)
    for r in range(R):
        h = splitmix64(h ^ bands[:, :, r])
    # mix the band index in so band 0 of one conv never collides with band 1
    h ^= splitmix64(np.arange(B, dtype=U64) + U64(0xBAD5EED))
    idx = np.repeat(np.arange(n, dtype=np.int64), B)
    # band rows carry the 63-bit id-hash, not the conv_id string: B rows per
    # conversation ride the band→pair shuffle, so id bytes here are the
    # dominant exchange cost after the texts are gone (VERDICT r3 #3)
    cid = cid64(batch.column("conv_id").combine_chunks())
    return pa.table(
        {
            "band_key": pa.array(h.reshape(-1)),
            "cid": pa.array(cid[idx]),
            "simhash": batch.column("simhash").take(pa.array(idx)),
        }
    )


def emit_bands(
    reps: ray.data.Dataset, cfg: Config, batch_size: int | None = None
) -> ray.data.Dataset:
    """``batch_size`` controls task FAN-OUT as well as batch shape: Ray bundles
    input blocks until a bundle reaches batch_size rows, and downstream
    sort-shuffles emit exactly as many output blocks as they get input blocks
    — a small corpus with the default 4096 collapses the whole pair/verify
    pipeline to ~2 tasks. Callers that know the corpus is small pass
    ``ceil(n_rows / default_parallelism())`` to keep the pipeline wide."""
    return reps.map_batches(
        _emit_bands_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size or cfg.batch_size_rows,
    )


# ---------------------------------------------------------------------------
# salted pair emission (J1 + A5 + O1)
# ---------------------------------------------------------------------------

def _member_pairs(size: int, new_sub: np.ndarray | None):
    """Local (ii, jj) index pairs within a block of `size` members.

    new_sub=None → all unordered pairs (triu). Otherwise only pairs touching
    ≥1 new member, emitted as new×old cross product + new×new triu —
    O(n_new·size) allocation, never O(size²) (the round-1 delta path built the
    full triu then filtered, which a viral block turns into tens of GB)."""
    if new_sub is None:
        return np.triu_indices(size, 1)
    ni = np.flatnonzero(new_sub)
    oi = np.flatnonzero(~new_sub)
    ii = [np.repeat(ni, len(oi))]
    jj = [np.tile(oi, len(ni))]
    if len(ni) > 1:
        ti, tj = np.triu_indices(len(ni), 1)
        ii.append(ni[ti])
        jj.append(ni[tj])
    return np.concatenate(ii), np.concatenate(jj)


def _emit_pairs_partition(t: pa.Table, cfg: Config) -> pa.Table:
    """Salted, capped pair emission within a band bucket, uint64-native: rows
    arrive as (band_key, cid, simhash) where cid is the 63-bit id-hash, and
    pairs leave as (a, b) uint64 — the string conv_id never rides this
    shuffle chain (VERDICT r3 #3). If the table carries an ``is_new`` column
    (incremental delta path), only pairs touching ≥1 new row are emitted —
    same salting and truncation accounting either way."""
    idx = pc.sort_indices(
        t, sort_keys=[("band_key", "ascending"), ("cid", "ascending")]
    )
    t = t.take(idx)
    keys = t.column("band_key").to_numpy()
    conv = np.asarray(t.column("cid").to_numpy(zero_copy_only=False),
                      dtype=np.uint64)
    simh = t.column("simhash").to_numpy()
    is_new = (
        t.column("is_new").to_numpy(zero_copy_only=False)
        if "is_new" in t.column_names else None
    )
    n = len(keys)
    first = np.ones(n, bool)
    if n > 1:
        np.not_equal(keys[1:], keys[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n)

    a_idx: list[np.ndarray] = []
    b_idx: list[np.ndarray] = []
    truncated = 0
    hot = cfg.hot_block_threshold
    cap = cfg.max_pairs_per_block
    conv_hash = None
    for s, e in zip(starts, ends):
        size = e - s
        if size < 2 or (is_new is not None and not is_new[s:e].any()):
            continue
        if size > hot:
            # salted split: deterministic sub-blocks by id-hash (A5)
            if conv_hash is None:
                conv_hash = splitmix64(conv ^ U64(0xA17))
            n_sub = int(np.ceil(size / hot))
            salts = (conv_hash[s:e] % np.uint64(n_sub)).astype(np.int64)
            order = np.argsort(salts, kind="stable")
            sub_sizes = np.bincount(salts, minlength=n_sub)
            off = s + np.concatenate([[0], np.cumsum(sub_sizes[:-1])])
            local = order + s
            for g in range(n_sub):
                lo = off[g] - s
                hi = lo + sub_sizes[g]
                members = local[lo:hi]
                if len(members) < 2:
                    continue
                new_sub = is_new[members] if is_new is not None else None
                if new_sub is not None and not new_sub.any():
                    continue
                ii, jj = _member_pairs(len(members), new_sub)
                if len(ii) > cap:
                    truncated += len(ii) - cap
                    ii, jj = ii[:cap], jj[:cap]
                a_idx.append(members[ii])
                b_idx.append(members[jj])
        else:
            new_sub = is_new[s:e] if is_new is not None else None
            ii, jj = _member_pairs(size, new_sub)
            if len(ii) > cap:
                truncated += len(ii) - cap
                ii, jj = ii[:cap], jj[:cap]
            a_idx.append(s + ii)
            b_idx.append(s + jj)

    if not a_idx:
        return pa.table(
            {
                "a": pa.array([], pa.uint64()),
                "b": pa.array([], pa.uint64()),
                "simhash_a": pa.array([], pa.uint64()),
                "simhash_b": pa.array([], pa.uint64()),
                "truncated": pa.array([], pa.int64()),
            }
        )
    ai = np.concatenate(a_idx)
    bi = np.concatenate(b_idx)
    # canonical a < b on the uint64 ids — pure numpy min/max, no string
    # compares anywhere in the hottest emission loop. Members are cid-sorted
    # within each (sub-)block so the full-corpus triu path is already
    # ordered; only incremental new×old cross pairs can need the swap.
    a_arr, b_arr = conv[ai], conv[bi]
    swap_np = a_arr > b_arr
    a_fin = np.where(swap_np, b_arr, a_arr)
    b_fin = np.where(swap_np, a_arr, b_arr)
    sim_a = np.where(swap_np, simh[bi], simh[ai])
    sim_b = np.where(swap_np, simh[ai], simh[bi])
    trunc_col = np.zeros(len(ai), np.int64)
    trunc_col[0] = truncated  # carried as a counter column, summed in manifests
    return pa.table(
        {
            "a": pa.array(a_fin),
            "b": pa.array(b_fin),
            "simhash_a": pa.array(sim_a),
            "simhash_b": pa.array(sim_b),
            "truncated": pa.array(trunc_col),
        }
    )


def emit_pairs(
    blocks: ray.data.Dataset, cfg: Config, num_parts: int | None = None
) -> ray.data.Dataset:
    """Shuffle #2 (key=band_key): co-locate bands, salt hot ones, emit
    canonical candidate pairs."""
    return grouped_partitions(
        blocks,
        "band_key",
        lambda t: _emit_pairs_partition(t, cfg),
        cfg.num_hash_partitions or num_parts,
    )


# ---------------------------------------------------------------------------
# cross-band pair dedup (A1) + simhash prefilter
# ---------------------------------------------------------------------------

def _dedup_pairs_partition(t: pa.Table) -> pa.Table:
    gb = pa.TableGroupBy(t.drop_columns(["pair_key"]), ["a", "b"], use_threads=False)
    agg = gb.aggregate(
        [("simhash_a", "min"), ("simhash_b", "min"), ("a", "count"), ("truncated", "sum")]
    )
    return pa.table(
        {
            "a": agg.column("a"),
            "b": agg.column("b"),
            "simhash_a": agg.column("simhash_a_min"),
            "simhash_b": agg.column("simhash_b_min"),
            "n_bands": agg.column("a_count").cast(pa.int32()),
            "truncated": agg.column("truncated_sum"),
        }
    )


def dedup_pairs(
    pairs: ray.data.Dataset, cfg: Config, num_parts: int | None = None
) -> ray.data.Dataset:
    """Shuffle #3 (key=(a,b)): score each candidate pair once, however many
    bands it co-occurred in; n_bands kept as a feature. The result IS the
    blocker's candidate set (the eval's 'labeled pairs sharing a blocking key'
    universe) — the simhash prefilter is applied downstream, not here."""

    def _add_pair_key(b: pa.Table) -> pa.Table:
        a = np.asarray(b.column("a").to_numpy(zero_copy_only=False), np.uint64)
        bb = np.asarray(b.column("b").to_numpy(zero_copy_only=False), np.uint64)
        h = splitmix64(splitmix64(a ^ U64(0xA)) ^ np.left_shift(bb, U64(1)))
        return b.append_column("pair_key", pa.array(h))

    keyed = pairs.map_batches(_add_pair_key, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_partitions(
        keyed, "pair_key", _dedup_pairs_partition, cfg.num_hash_partitions or num_parts
    )


def simhash_prefilter(pairs: ray.data.Dataset, cfg: Config) -> ray.data.Dataset:
    """Cheap SimHash hamming prefilter (loose, recall-safe) before the payload
    join + actor-pool scoring — drops obvious non-dups from hard-negative hot
    blocks for a fraction of the scoring cost."""

    def _prefilter(b: pa.Table) -> pa.Table:
        ham = hamming64(
            b.column("simhash_a").to_numpy(), b.column("simhash_b").to_numpy()
        )
        return b.filter(pa.array(ham <= cfg.simhash_prefilter_bits))

    return pairs.map_batches(_prefilter, batch_format="pyarrow", zero_copy_batch=True)
