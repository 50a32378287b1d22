"""Conversation assembly: turns → one row per conversation (SURVEY.md O4, §3.1).

The reference ingests one media object per row (``[ref: mc_ingest.py — unverified]``);
transcripts arrive as MANY rows per entity and must be assembled with STABLE turn
ordering — the per-row invariant of BASELINE.json:15: per-turn text equality under
stable turn ordering, regardless of on-disk row order.

Implementation: one hash shuffle on conv_id (grouped_partitions), then a fully
vectorized per-bucket path: stable Arrow sort on (conv_id, turn_idx, ts) +
TableGroupBy list-aggregation (order-of-appearance within groups) + binary_join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray.config import Config

TURN_SEP = "\x1e"  # record separator between turn texts in doc_text


def normalize_text(doc_text):
    """Canonical feature-text normalization (lowercase, collapse whitespace
    and turn separators, trim). Derivable from ``doc_text``, so it is computed
    where consumed (signatures, serving index) rather than stored: carrying a
    second full-length text column through the conversations checkpoint
    doubled the bytes the two DRAM-bandwidth-bound stages move (VERDICT r3
    #3)."""
    norm = pc.utf8_lower(doc_text)
    norm = pc.replace_substring_regex(norm, r"[\s\x1e]+", " ")
    return pc.utf8_trim_whitespace(norm)


def assemble_partition(t: pa.Table) -> pa.Table:
    # Stable sort: Arrow sort_indices is a stable sort, so rows with equal
    # (conv_id, turn_idx, ts) keep their input order — deterministic assembly
    # requires the fixture/corpus to make (turn_idx, ts) unique per conv, and
    # equal-key rows are at least never reordered run-to-run for a fixed input.
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("ts", "ascending"),
        ],
    )
    t = t.take(idx)
    # idempotent re-ingest (SURVEY.md D1): the reference's deterministic _id
    # makes re-indexing a seen doc a no-op; here a re-ingested corpus delivers
    # duplicate (conv_id, turn_idx) rows — keep the first (they are sorted, so
    # "first" is deterministic: lowest ts).
    n = t.num_rows
    if n > 1:
        # adjacent-duplicate test in Arrow C++ (zero-copy slices) — a pandas
        # object-array round trip here is a Python richcompare per row.
        # pc.equal propagates nulls (null == null -> null), which would (a)
        # make the boolean invert below blow up on an object array and (b)
        # silently KEEP adjacent null-key duplicates; coalesce the key columns
        # to sentinels first so null keys compare equal to each other and
        # unequal to every real key (ADVICE r3).
        conv = pc.fill_null(
            t.column("conv_id").combine_chunks().cast(pa.large_string()),
            "\x00<null-conv>",
        )
        tix = pc.fill_null(
            t.column("turn_idx").combine_chunks().cast(pa.int64()),
            np.iinfo(np.int64).min,
        )
        dup = pc.and_(
            pc.equal(conv.slice(1), conv.slice(0, n - 1)),
            pc.equal(tix.slice(1), tix.slice(0, n - 1)),
        )
        dup_np = dup.to_numpy(zero_copy_only=False)
        if dup_np.any():
            keep = np.ones(n, bool)
            keep[1:] = ~dup_np
            t = t.filter(pa.array(keep))
    role = t.column("role")
    if pa.types.is_dictionary(role.type):
        # role rode the shuffle as dictionary codes (sources.transcripts);
        # the groupby "list" aggregate has no dictionary kernel — decode here,
        # post-shuffle, where the bytes were already saved
        t = t.set_column(
            t.schema.get_field_index("role"), "role", role.cast(pa.string())
        )
    gb = pa.TableGroupBy(t, "conv_id", use_threads=False)
    agg = gb.aggregate(
        [
            ("text", "list"),
            ("role", "list"),
            ("ts", "min"),
            ("ts", "max"),
            ("turn_idx", "count"),
        ]
    )
    doc_text = pc.binary_join(
        agg.column("text_list").cast(pa.list_(pa.large_string())),
        pa.scalar(TURN_SEP, pa.large_string()),
    )
    return pa.table(
        {
            "conv_id": agg.column("conv_id"),
            "n_turns": agg.column("turn_idx_count").cast(pa.int32()),
            "doc_text": doc_text,
            "roles": agg.column("role_list"),
            "first_ts": agg.column("ts_min"),
            "last_ts": agg.column("ts_max"),
        }
    )


def assemble(
    ds: ray.data.Dataset, cfg: Config, num_parts: int | None = None
) -> ray.data.Dataset:
    """transcripts Dataset → conversations Dataset (shuffle #1, key=conv_id)."""
    from mediachain_indexer_ray.stages.partition import grouped_partitions

    return grouped_partitions(
        ds, "conv_id", assemble_partition, cfg.num_hash_partitions or num_parts
    )
