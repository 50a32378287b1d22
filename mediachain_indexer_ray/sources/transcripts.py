"""Transcript corpus source (SURVEY.md S1/S5/M2/M8).

The reference walks JSON dump directories and normalizes per-source dicts
(``[ref: mc_datasets.py iter_json_getty, mc_normalize.py — unverified]``);
here the input is the fixed-schema Parquet table of BASELINE.json:15, read with
``ray.data.read_parquet`` (column-pruned) and validated/normalized in one
zero-copy Arrow ``map_batches``: schema drift fails fast, ``tool`` nulls become
"", null/empty-text rows are dropped and counted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray import schema as S


def normalize_batch(batch: pa.Table) -> pa.Table:
    from mediachain_indexer_ray.functions.threads import pin_arrow_threads

    pin_arrow_threads()  # worker-side: Ray parallelizes across batches
    # Validate against the REQUESTED subset of the canonical schema: a pruned
    # read (e.g. the flagship never uses `tool`) still gets type checking and
    # the hygiene filters below, it just doesn't pay to move unused columns
    # through shuffle #1 (prune at the read — SURVEY.md §4).
    sub = pa.schema([f for f in S.TRANSCRIPTS if f.name in batch.schema.names])
    batch = S.validate(batch, sub, where="transcripts")
    if "tool" in batch.schema.names:
        tool = batch.column("tool")
        if tool.null_count:
            batch = batch.set_column(
                batch.schema.get_field_index("tool"),
                "tool",
                pc.fill_null(tool, ""),
            )
    # (older engine versions reserved "\x01" in conv_id for closure's string
    # relay ids; closure is uint64-native now — no reserved characters)
    text = batch.column("text")
    bad = pc.or_kleene(pc.is_null(text), pc.equal(text, ""))
    keep = pc.fill_null(pc.invert(bad), False)
    bad_ids = pc.or_kleene(pc.is_null(batch.column("conv_id")),
                           pc.is_null(batch.column("turn_idx")))
    keep = pc.and_(keep, pc.invert(pc.fill_null(bad_ids, True)))
    batch = batch.filter(keep)
    # Dictionary-encode the low-cardinality enum columns so the conv_id
    # assembly shuffle moves int32 codes + a tiny per-chunk dictionary instead
    # of one string per turn (VERDICT r3 #3). Arrow sort/take/concat and Ray's
    # hash shuffle all carry dictionary arrays; consumers that need plain
    # strings (the groupby list-aggregate in assembly) decode post-shuffle.
    for enum_col in ("role", "tool"):
        if enum_col in batch.schema.names:
            i = batch.schema.get_field_index(enum_col)
            batch = batch.set_column(
                i, enum_col, pc.dictionary_encode(batch.column(enum_col))
            )
    return batch


def read_transcripts(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned, validated transcript read. `columns` defaults to the full
    schema; pass a subset when a downstream pipeline needs less (prune at the
    read — SURVEY.md §4).

    Block count is DATA-AWARE in both directions: ``ceil(bytes/128MB)`` keeps
    huge reads streaming-sized, while the rows term (``rows/32k``, capped at
    cluster width) stops a small corpus from splintering into 64+ two-
    thousand-row blocks whose per-task overhead dominates every downstream
    sort-shuffle (measured 2.4× on the assemble stage at 254k turns)."""
    import os

    import pyarrow.parquet as pq

    from mediachain_indexer_ray.config import default_parallelism

    rows, total_bytes = 0, 0
    files = [path] if os.path.isfile(path) else [
        os.path.join(r, f)
        for r, _, fs in sorted(os.walk(path))
        for f in sorted(fs) if f.endswith(".parquet")
    ]
    for f in files:
        rows += pq.read_metadata(f).num_rows
        total_bytes += os.stat(f).st_size
    P = default_parallelism()
    blocks = max(
        -(-total_bytes // (128 << 20)),
        min(max(4, -(-rows // 32_768)), P),
    )
    ds = ray.data.read_parquet(
        path,
        columns=columns or list(S.TRANSCRIPTS.names),
        override_num_blocks=blocks,
    )
    if columns is None or {"conv_id", "turn_idx", "text"} <= set(columns):
        # hygiene + validation apply to any read that carries the core
        # columns; pruned reads validate against their subset schema
        ds = ds.map_batches(normalize_batch, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def read_transcripts_json(path: str) -> ray.data.Dataset:
    """JSONL transcript ingest — the reference's native input shape
    (``[ref: mc_datasets.py iter_json_getty — unverified]``): one JSON object
    per line with the transcripts fields, ``ts`` as ISO-8601 or epoch-us int.
    Parsed in parallel by ``ray.data.read_json``, then cast to the engine
    schema and pushed through the same validate/normalize path as Parquet —
    heterogeneous-source normalization (SURVEY.md M2) happens here."""
    from mediachain_indexer_ray.config import default_parallelism

    ds = ray.data.read_json(path, override_num_blocks=default_parallelism())

    def _cast(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in zip(S.TRANSCRIPTS.names, S.TRANSCRIPTS.types):
            if name not in batch.schema.names:
                cols[name] = pa.nulls(batch.num_rows, typ)
                continue
            col = batch.column(name)
            if name == "ts" and pa.types.is_string(col.type):
                col = pc.strptime(col, format="%Y-%m-%dT%H:%M:%S", unit="us")
            elif name == "ts" and pa.types.is_integer(col.type):
                col = col.cast(pa.int64()).cast(pa.timestamp("us"))
            cols[name] = pc.cast(col, typ)
        return normalize_batch(pa.table(cols))

    return ds.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True)


def read_parquet_wide(
    path: str, *, columns: list[str] | None = None,
    target_block_bytes: int = 128 << 20,
) -> ray.data.Dataset:
    """Parquet read whose block count is floored at cluster width: small files
    still fan out to ``default_parallelism()`` blocks (Ray's sort-based
    ``groupby.map_groups`` emits as many output blocks as INPUT blocks — a
    1-file corpus read would otherwise serialize every downstream shuffle to
    1-2 tasks), while large inputs keep ~``target_block_bytes`` blocks so the
    override never COALESCES a 100-TB read down to cluster width."""
    import os

    from mediachain_indexer_ray.config import default_parallelism

    total = 0
    if os.path.isfile(path):
        total = os.stat(path).st_size
    else:
        for root, _, files in os.walk(path):
            total += sum(
                os.stat(os.path.join(root, f)).st_size
                for f in files if f.endswith(".parquet")
            )
    blocks = max(default_parallelism(), -(-total // target_block_bytes))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)
