"""Assembly invariant tests (SURVEY.md O4, BASELINE.json:15): per-turn text
equality under stable turn ordering, independent of on-disk row order."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.fixtures import FixtureSpec, make_corpus
from mediachain_indexer_ray.stages.assemble import TURN_SEP, assemble


def _expected_docs(tr: pa.Table) -> pd.Series:
    df = tr.to_pandas().sort_values(["conv_id", "turn_idx", "ts"], kind="stable")
    return df.groupby("conv_id")["text"].apply(lambda s: TURN_SEP.join(s))


def test_per_turn_text_equality_under_shuffle():
    tr, _ = make_corpus(FixtureSpec(n_base=40))
    rng = np.random.default_rng(11)
    shuffled = tr.take(rng.permutation(tr.num_rows))
    ds = ray.data.from_arrow(shuffled)
    got = assemble(ds, Config(num_hash_partitions=4)).to_pandas()
    exp = _expected_docs(tr)
    gg = got.set_index("conv_id")["doc_text"].sort_index()
    assert (exp.sort_index() == gg).all()
    # every turn text is preserved verbatim, in turn order
    n_turns = got.set_index("conv_id")["n_turns"].sort_index()
    exp_counts = tr.to_pandas().groupby("conv_id").size().sort_index()
    assert (n_turns == exp_counts).all()


def test_assembly_idempotent_across_row_orders():
    tr, _ = make_corpus(FixtureSpec(n_base=25, seed=5))
    rng = np.random.default_rng(0)
    a = assemble(ray.data.from_arrow(tr), Config(num_hash_partitions=3)).to_pandas()
    b = assemble(
        ray.data.from_arrow(tr.take(rng.permutation(tr.num_rows))),
        Config(num_hash_partitions=7),
    ).to_pandas()
    a = a.sort_values("conv_id").reset_index(drop=True)
    b = b.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["conv_id", "n_turns", "doc_text"]],
        b[["conv_id", "n_turns", "doc_text"]],
    )


def test_jsonl_ingest_matches_parquet(ray_session, tmp_path):
    """S1/M2 parity: a JSONL dump of the same turns assembles identically to
    the Parquet read path (ISO timestamps re-parsed, tool nulls filled)."""
    import json as _json

    import pyarrow.parquet as pq

    from mediachain_indexer_ray.config import Config
    from mediachain_indexer_ray.sources.transcripts import (
        read_transcripts,
        read_transcripts_json,
    )
    from mediachain_indexer_ray.stages.assemble import assemble
    from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus

    d = tmp_path / "c"
    write_corpus(FixtureSpec(n_base=20, seed=3), str(d), shuffle_rows=True)
    pq_path = str(d / "transcripts.parquet")
    t = pq.read_table(pq_path)
    jl = tmp_path / "t.jsonl"
    with open(jl, "w") as f:
        for row in t.to_pylist():
            row["ts"] = row["ts"].strftime("%Y-%m-%dT%H:%M:%S")
            f.write(_json.dumps(row) + "\n")

    cfg = Config()
    a = assemble(read_transcripts(pq_path), cfg, num_parts=4).to_pandas()
    b = assemble(read_transcripts_json(str(jl)), cfg, num_parts=4).to_pandas()
    a = a.sort_values("conv_id").reset_index(drop=True)
    b = b.sort_values("conv_id").reset_index(drop=True)
    # second-resolution ISO timestamps: compare text/ids/counts (ts columns
    # are truncated by the round-trip)
    for col in ("conv_id", "n_turns", "doc_text"):
        assert (a[col] == b[col]).all(), col


def test_null_key_adjacent_duplicates_deduped():
    """Null conv_id/turn_idx keys: adjacent duplicate rows with null keys must
    be deduped (null == null for the re-ingest check) and the Arrow path must
    not crash on the nullable boolean invert (ADVICE r3)."""
    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", None, None, "c2"], pa.string()),
            "turn_idx": pa.array([0, 0, None, None, 1], pa.int32()),
            "role": pa.array(["u"] * 5, pa.string()),
            "text": pa.array(["a", "a", "x", "x", "b"], pa.string()),
            "tool": pa.array([""] * 5, pa.string()),
            "ts": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    from mediachain_indexer_ray.stages.assemble import assemble_partition

    out = assemble_partition(t)
    convs = out.column("conv_id").to_pylist()
    texts = dict(zip(convs, out.column("doc_text").to_pylist()))
    # c1's duplicate (conv_id, turn_idx) pair collapses to one turn; the two
    # null-keyed rows likewise collapse (they compare equal post-coalesce)
    assert out.num_rows == 3
    assert texts["c1"] == "a"
    assert texts["c2"] == "b"
    assert texts[None] == "x"
