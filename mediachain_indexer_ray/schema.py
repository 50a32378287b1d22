"""Arrow schemas for every logical table (SURVEY.md §1.2).

The reference is schemaless JSON + an Elasticsearch mapping
(``[ref: mc_ingest.py create_index — unverified]``); here every table is a fixed
``pyarrow.Schema``, validated at read time (fail fast on drift — BASELINE.json:15
pins the input shape).
"""

from __future__ import annotations

import pyarrow as pa

# One row = one turn; one entity = one conversation (BASELINE.json:15 input_hint).
TRANSCRIPTS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Assembled conversations (the reference's "ingested document").
CONVERSATIONS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int32()),
        pa.field("doc_text", pa.large_string()),  # turns joined with \x1e, raw text
        # (normalized text is DERIVED where consumed — stages.assemble
        #  normalize_text — not stored: it doubled checkpoint/shuffle bytes)
        pa.field("roles", pa.list_(pa.string())),
        pa.field("first_ts", pa.timestamp("us")),
        pa.field("last_ts", pa.timestamp("us")),
    ]
)

SIGNATURES = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("digest", pa.uint64()),       # exact-content digest (M5)
        pa.field("minhash", pa.list_(pa.uint64())),  # length K (list<>, not
        # fixed_size_list: parquet can't round-trip null fixed-size lists)
        pa.field("simhash", pa.uint64()),
        pa.field("n_shingles", pa.int32()),
        pa.field("feature_text", pa.string()),  # truncated norm_text for scoring
    ]
)

BLOCKS = pa.schema(
    [
        pa.field("band_key", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("simhash", pa.uint64()),
    ]
)

PAIRS = pa.schema(
    [
        pa.field("a", pa.string()),
        pa.field("b", pa.string()),
        pa.field("n_bands", pa.int32()),
        pa.field("score_jaccard", pa.float32()),
        pa.field("score_cosine", pa.float32()),
        pa.field("score_jw", pa.float32()),
        pa.field("score_lev", pa.float32()),
        pa.field("score", pa.float32()),
        pa.field("accepted", pa.bool_()),
    ]
)

CLUSTERS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("cluster_id", pa.string()),
    ]
)

LABELS = pa.schema(
    [
        pa.field("a", pa.string()),
        pa.field("b", pa.string()),
        pa.field("is_dup", pa.bool_()),
        pa.field("block_key", pa.string()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, *, where: str = "") -> pa.Table:
    """Assert `table` matches `schema` (names + types, order-insensitive),
    casting where lossless. Raises ValueError on drift."""
    missing = set(schema.names) - set(table.schema.names)
    if missing:
        raise ValueError(f"{where}: missing columns {sorted(missing)}")
    cols = []
    for f in schema:
        col = table.column(f.name)
        if col.type != f.type:
            try:
                col = col.cast(f.type)
            except pa.ArrowInvalid as e:
                raise ValueError(
                    f"{where}: column {f.name} has type {col.type}, "
                    f"expected {f.type}"
                ) from e
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)
