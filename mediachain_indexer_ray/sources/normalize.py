"""Per-source normalizer registry — the engine analog of the reference's
largest module, ``mc_normalize.py`` (``[ref: mc_normalize.py normalizer dict:
getty/pexels/dpla/eyeem/500px dispatch — unverified]``, SURVEY.md M2/X1):
heterogeneous per-source record shapes are normalized into the single
TRANSCRIPTS schema by source-keyed normalizer functions, so every downstream
stage sees exactly one shape.

Each normalizer is a VECTORIZED Arrow batch transform (table-in → table-out in
TRANSCRIPTS shape); ``read_source`` wires it behind the matching
``ray.data.read_*`` reader and the shared validate/hygiene pass. Registered
sources:

* ``"turns"``     — native turn-table parquet (identity; the BASELINE.json:15
                    input shape)
* ``"chat_json"`` — JSONL of whole conversations: one object per conversation
                    with a ``messages: [{role, content, [tool], [ts]}]`` list
                    (the common chat-export / ChatML-ish dump shape)
* ``"event_log"`` — flat event-log shape (``event_id, ts, actor, kind,
                    payload``): one event per row, conversation = actor
* ``"media_meta"``— media-object metadata dumps (the reference's own domain):
                    ``native_id, source_dataset, title, artist_names,
                    keywords, description, date_created`` — title/keywords/
                    description become the conversation's "turns"
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray import schema as S
from mediachain_indexer_ray.sources.transcripts import normalize_batch

NORMALIZERS: dict[str, dict] = {}


def register_source(name: str, *, reader: str,
                    fn: Callable[[pa.Table], pa.Table]) -> None:
    """reader: 'parquet' | 'json' — which ray.data reader feeds `fn`."""
    NORMALIZERS[name] = {"reader": reader, "fn": fn}


def _norm_turns(t: pa.Table) -> pa.Table:
    return S.validate(t, S.TRANSCRIPTS, where="turns")


def _norm_chat_json(t: pa.Table) -> pa.Table:
    """One row per conversation with a messages list → one row per turn.
    Missing ts falls back to epoch + turn index (stable ordering)."""
    msgs = t.column("messages").combine_chunks()
    if isinstance(msgs, pa.ChunkedArray):  # pragma: no cover
        msgs = msgs.combine_chunks()
    counts = np.asarray(pc.list_value_length(msgs).to_numpy(zero_copy_only=False))
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    row_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
    flat = msgs.flatten()  # struct array of the message fields
    conv = t.column("conv_id").combine_chunks().take(pa.array(row_of))
    turn_idx = (
        np.arange(int(counts.sum()), dtype=np.int64)
        - np.repeat(np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64),
                    counts)
    )
    names = {f.name for f in flat.type}
    role = flat.field("role") if "role" in names else pa.nulls(len(flat), pa.string())
    text = flat.field("content") if "content" in names else pa.nulls(len(flat), pa.string())
    tool = flat.field("tool") if "tool" in names else pa.nulls(len(flat), pa.string())
    if "ts" in names:
        ts = flat.field("ts")
        if pa.types.is_string(ts.type):
            ts = pc.strptime(ts, format="%Y-%m-%dT%H:%M:%S", unit="us")
        elif pa.types.is_integer(ts.type):
            ts = ts.cast(pa.int64()).cast(pa.timestamp("us"))
    else:
        ts = pa.array(turn_idx, pa.int64()).cast(pa.timestamp("us"))
    out = pa.table(
        {
            "conv_id": conv.cast(pa.string()),
            "turn_idx": pa.array(turn_idx.astype(np.int32)),
            "role": pc.fill_null(role.cast(pa.string()), "unknown"),
            "text": text.cast(pa.string()),
            "tool": tool.cast(pa.string()),
            "ts": pc.fill_null(ts, pa.scalar(0, pa.timestamp("us"))),
        }
    )
    return S.validate(out, S.TRANSCRIPTS, where="chat_json")


def _norm_event_log(t: pa.Table) -> pa.Table:
    """Flat event log: conversation = actor, turn ordering = (event_id follows
    delivery order within actor is NOT assumed — ts is authoritative; event_id
    disambiguates equal timestamps)."""
    n = t.num_rows
    out = pa.table(
        {
            "conv_id": pc.binary_join_element_wise(
                pa.array(["actor:"] * n, pa.string()),
                t.column("actor").cast(pa.string()), "",
            ),
            "turn_idx": t.column("event_id").cast(pa.int32()),
            "role": t.column("kind").cast(pa.string()),
            "text": t.column("payload").cast(pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": t.column("ts").cast(pa.timestamp("us")),
        }
    )
    return S.validate(out, S.TRANSCRIPTS, where="event_log")


def _norm_media_meta(t: pa.Table) -> pa.Table:
    """Media metadata dump (the reference's getty-like shape): the textual
    fields become pseudo-turns (title, keywords, description) so the SAME
    dedupe engine blocks/scores media metadata — exactly how the reference
    used text terms for its baseline blocker."""
    n = t.num_rows
    conv = pc.binary_join_element_wise(
        t.column("source_dataset").cast(pa.string()),
        t.column("native_id").cast(pa.string()), ":",
    )
    names = set(t.schema.names)
    kw = t.column("keywords")
    if pa.types.is_list(kw.type) or pa.types.is_large_list(kw.type):
        kw = pc.binary_join(kw.cast(pa.list_(pa.string())), " ")
    fields = [
        ("title", t.column("title").cast(pa.string())),
        ("keywords", kw.cast(pa.string())),
        ("description", t.column("description").cast(pa.string())),
    ]
    if "artist_names" in names:
        an = t.column("artist_names")
        if pa.types.is_list(an.type) or pa.types.is_large_list(an.type):
            an = pc.binary_join(an.cast(pa.list_(pa.string())), " ")
        fields.append(("artist", an.cast(pa.string())))
    ts = (
        t.column("date_created").cast(pa.timestamp("us"))
        if "date_created" in names
        else pa.nulls(n, pa.timestamp("us"))
    )
    parts = []
    for i, (role, text) in enumerate(fields):
        parts.append(
            pa.table(
                {
                    "conv_id": conv,
                    "turn_idx": pa.array(np.full(n, i, np.int32)),
                    "role": pa.array([role] * n, pa.string()),
                    "text": text,
                    "tool": pa.array([""] * n, pa.string()),
                    "ts": pc.fill_null(ts, pa.scalar(0, pa.timestamp("us"))),
                }
            )
        )
    return S.validate(pa.concat_tables(parts), S.TRANSCRIPTS, where="media_meta")


register_source("turns", reader="parquet", fn=_norm_turns)
register_source("chat_json", reader="json", fn=_norm_chat_json)
register_source("event_log", reader="parquet", fn=_norm_event_log)
register_source("media_meta", reader="parquet", fn=_norm_media_meta)


def read_source(source: str, path: str) -> ray.data.Dataset:
    """Dispatch: read `path` with the source's reader, normalize every batch
    to TRANSCRIPTS shape, then run the shared hygiene pass (null/empty drops,
    tool fill — sources/transcripts.normalize_batch)."""
    try:
        spec = NORMALIZERS[source]
    except KeyError:
        raise ValueError(
            f"unknown source {source!r}; registered: {sorted(NORMALIZERS)}"
        ) from None
    from mediachain_indexer_ray.config import default_parallelism

    if spec["reader"] == "json":
        ds = ray.data.read_json(path, override_num_blocks=default_parallelism())
    else:
        ds = ray.data.read_parquet(path, override_num_blocks=default_parallelism())
    fn = spec["fn"]

    def _norm(b: pa.Table) -> pa.Table:
        return normalize_batch(fn(b))

    return ds.map_batches(_norm, batch_format="pyarrow", zero_copy_batch=True)
