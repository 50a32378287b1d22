"""Transcript corpus source (SURVEY.md S1/S5/M2/M8).

The reference walks JSON dump directories and normalizes per-source dicts
(``[ref: mc_datasets.py iter_json_getty, mc_normalize.py — unverified]``);
here the input is the fixed-schema Parquet table of BASELINE.json:15, read with
``ray.data.read_parquet`` (column-pruned) and validated/normalized in one
zero-copy Arrow ``map_batches``: schema drift fails fast, ``tool`` nulls become
"", null/empty-text rows are dropped and counted.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray import schema as S


def normalize_batch(batch: pa.Table) -> pa.Table:
    batch = S.validate(batch, S.TRANSCRIPTS, where="transcripts")
    tool = batch.column("tool")
    if tool.null_count:
        batch = batch.set_column(
            batch.schema.get_field_index("tool"),
            "tool",
            pc.fill_null(tool, ""),
        )
    text = batch.column("text")
    bad = pc.or_kleene(pc.is_null(text), pc.equal(text, ""))
    keep = pc.fill_null(pc.invert(bad), False)
    bad_ids = pc.or_kleene(pc.is_null(batch.column("conv_id")),
                           pc.is_null(batch.column("turn_idx")))
    keep = pc.and_(keep, pc.invert(pc.fill_null(bad_ids, True)))
    return batch.filter(keep)


def read_transcripts(path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned, validated transcript read. `columns` defaults to the full
    schema; pass a subset when a downstream pipeline needs less (prune at the
    read — SURVEY.md §4)."""
    from mediachain_indexer_ray.config import default_parallelism

    ds = ray.data.read_parquet(
        path,
        columns=columns or list(S.TRANSCRIPTS.names),
        override_num_blocks=default_parallelism(),
    )
    if columns is None or set(columns) == set(S.TRANSCRIPTS.names):
        ds = ds.map_batches(normalize_batch, batch_format="pyarrow", zero_copy_batch=True)
    return ds
