"""Per-source normalizer registry (reference mc_normalize dispatch): every
registered source shape lands in TRANSCRIPTS schema and assembles correctly."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mediachain_indexer_ray import schema as S
from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.sources.normalize import NORMALIZERS, read_source
from mediachain_indexer_ray.stages.assemble import assemble


def _assert_transcripts(ds):
    sch = ds.schema()
    assert set(sch.names) == set(S.TRANSCRIPTS.names)
    return ds


def test_registry_contents():
    assert {"turns", "chat_json", "event_log", "media_meta"} <= set(NORMALIZERS)
    with pytest.raises(ValueError, match="unknown source"):
        read_source("nope", "/tmp/x")


def test_chat_json_source(tmp_path, ray_session):
    p = str(tmp_path / "convs.jsonl")
    with open(p, "w") as f:
        for i in range(8):
            f.write(json.dumps({
                "conv_id": f"chat{i}",
                "messages": [
                    {"role": "user", "content": f"hello number {i}",
                     "ts": "2025-03-01T10:00:00"},
                    {"role": "assistant", "content": f"hi back {i} indeed",
                     "ts": "2025-03-01T10:00:05"},
                    {"role": "user", "content": "thanks bye"},
                ],
            }) + "\n")
    ds = _assert_transcripts(read_source("chat_json", p))
    df = ds.to_pandas()
    assert len(df) == 24
    assert set(df["conv_id"]) == {f"chat{i}" for i in range(8)}
    convs = assemble(ds, Config()).to_pandas()
    assert (convs["n_turns"] == 3).all()
    row = convs.set_index("conv_id").loc["chat3"]
    assert row["doc_text"].startswith("hello number 3")
    assert row["doc_text"].endswith("thanks bye")


def test_event_log_source(tmp_path, ray_session):
    p = str(tmp_path / "events.parquet")
    n = 40
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 1000).cast(pa.timestamp("us")),
        "actor": pa.array((np.arange(n) % 4).astype(np.int64)),
        "kind": pa.array(["msg"] * n),
        "payload": pa.array([f"payload {i}" for i in range(n)]),
    }), p)
    ds = _assert_transcripts(read_source("event_log", p))
    convs = assemble(ds, Config()).to_pandas()
    assert len(convs) == 4
    assert (convs["n_turns"] == 10).all()
    # ts-ordered within actor
    first = convs.set_index("conv_id").loc["actor:0", "doc_text"]
    assert first.startswith("payload 0")


def test_media_meta_source(tmp_path, ray_session):
    p = str(tmp_path / "media.parquet")
    pq.write_table(pa.table({
        "native_id": pa.array(["a1", "a2"]),
        "source_dataset": pa.array(["getty", "getty"]),
        "title": pa.array(["Sunset over hills", "City at night"]),
        "keywords": pa.array([["sunset", "hills"], ["city", "night"]]),
        "description": pa.array(["A warm sunset.", "Neon skyline."]),
        "artist_names": pa.array([["Jo Doe"], ["Al Ray"]]),
    }), p)
    ds = _assert_transcripts(read_source("media_meta", p))
    convs = assemble(ds, Config()).to_pandas()
    assert set(convs["conv_id"]) == {"getty:a1", "getty:a2"}
    assert (convs["n_turns"] == 4).all()
    doc = convs.set_index("conv_id").loc["getty:a1", "doc_text"]
    assert "Sunset over hills" in doc and "sunset hills" in doc


def test_turns_source_roundtrip(tmp_path, ray_session):
    from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus

    d = str(tmp_path / "c")
    write_corpus(FixtureSpec(n_base=10, viral_fanout=3), d)
    ds = _assert_transcripts(read_source("turns", f"{d}/transcripts.parquet"))
    assert ds.count() > 0


def test_no_reserved_characters_in_ids():
    """The uint64-native closure has NO reserved id characters (older engine
    versions rejected '\\x01', the string relay marker) — control characters
    in conv_id pass ingest untouched."""
    import numpy as np

    from mediachain_indexer_ray.sources.transcripts import normalize_batch

    t = pa.table({
        "conv_id": pa.array(["ok", "weird\x01id"]),
        "turn_idx": pa.array(np.array([0, 0], np.int32)),
        "role": pa.array(["user", "user"]),
        "text": pa.array(["hello", "world"]),
        "tool": pa.array(["", ""]),
        "ts": pa.array([0, 0], pa.timestamp("us")),
    })
    out = normalize_batch(t)
    assert out.num_rows == 2
    assert out.column("conv_id").to_pylist() == ["ok", "weird\x01id"]
