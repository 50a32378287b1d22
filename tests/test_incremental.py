"""Incremental re-dedupe (SURVEY.md §2.9): a delta deduped against a base run
must produce the same clusters as a full re-run over the union corpus."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus
from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
from mediachain_indexer_ray.pipelines.incremental import incremental_dedupe


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    """One corpus split into base (first 70% of conversations) + delta (rest),
    so delta conversations include near-dups of base conversations."""
    d = tmp_path_factory.mktemp("inc")
    full_dir = str(d / "full")
    write_corpus(FixtureSpec(n_base=60, viral_fanout=10), full_dir,
                 shuffle_rows=True)
    t = pq.read_table(f"{full_dir}/transcripts.parquet")
    convs = sorted(set(t.column("conv_id").to_pylist()))
    cut = int(len(convs) * 0.7)
    base_ids = set(convs[:cut])
    import pyarrow.compute as pc

    mask = pc.is_in(t.column("conv_id"), pa.array(list(base_ids)))
    base_t, delta_t = t.filter(mask), t.filter(pc.invert(mask))
    base_p = str(d / "base.parquet")
    delta_p = str(d / "delta.parquet")
    pq.write_table(base_t, base_p)
    pq.write_table(delta_t, delta_p)
    return full_dir, base_p, delta_p, str(d)


def _partition(df: pd.DataFrame) -> set[frozenset]:
    groups = df.groupby("cluster_id")["conv_id"].apply(frozenset)
    return set(groups[groups.apply(len) > 1])


def test_incremental_matches_full_rerun(split_corpus, ray_session):
    full_dir, base_p, delta_p, work = split_corpus
    cfg = Config(work_dir=os.path.join(work, "w_base"))

    dedupe_pipeline(base_p, cfg)

    out = incremental_dedupe(
        delta_p, cfg.work_dir, cfg, os.path.join(work, "w_inc")
    )
    inc = out["clusters"].to_pandas()

    cfg_full = Config(work_dir=os.path.join(work, "w_full"))
    full = dedupe_pipeline(
        f"{full_dir}/transcripts.parquet", cfg_full
    )["clusters"].to_pandas()

    assert _partition(inc) == _partition(full)
    # every conversation appears exactly once
    assert inc["conv_id"].is_unique
    assert set(inc["conv_id"]) == set(full["conv_id"])


def test_incremental_viral_delta_matches_full_rerun(tmp_path, ray_session):
    """Viral-fanout hot blocks in the DELTA path: the shared salted emission
    must keep matching a full re-run (round-1's delta emitter built a full
    O(size²) triu per band and had no salting — VERDICT r1 #2)."""
    import pyarrow.compute as pc

    d = tmp_path
    full_dir = str(d / "full")
    # viral_fanout high enough that several bands exceed hot_block_threshold
    write_corpus(FixtureSpec(n_base=30, viral_fanout=90), full_dir,
                 shuffle_rows=True)
    t = pq.read_table(f"{full_dir}/transcripts.parquet")
    convs = sorted(set(t.column("conv_id").to_pylist()))
    cut = int(len(convs) * 0.6)  # viral members split across base AND delta
    mask = pc.is_in(t.column("conv_id"), pa.array(convs[:cut]))
    base_p, delta_p = str(d / "base.parquet"), str(d / "delta.parquet")
    pq.write_table(t.filter(mask), base_p)
    pq.write_table(t.filter(pc.invert(mask)), delta_p)

    cfg = Config(work_dir=str(d / "w_base"))
    dedupe_pipeline(base_p, cfg)
    out = incremental_dedupe(delta_p, cfg.work_dir, cfg, str(d / "w_inc"))
    inc = out["clusters"].to_pandas()

    cfg_full = Config(work_dir=str(d / "w_full"))
    full = dedupe_pipeline(
        f"{full_dir}/transcripts.parquet", cfg_full
    )["clusters"].to_pandas()

    assert _partition(inc) == _partition(full)
    assert inc["conv_id"].is_unique
    assert set(inc["conv_id"]) == set(full["conv_id"])


def test_incremental_join_path_matches_broadcast(split_corpus, ray_session,
                                                 tmp_path, monkeypatch):
    """VERDICT r2 #2: with BROADCAST_MAX_ROWS forced to 0 the delta scorer
    must take the shuffle-join text-attach path (no driver read of the base
    exact_dedup checkpoint) and still produce the same clusters."""
    from mediachain_indexer_ray.stages import scoring

    full_dir, base_p, delta_p, work = split_corpus
    cfg = Config(work_dir=os.path.join(work, "w_base"))
    dedupe_pipeline(base_p, cfg)  # cached from the earlier test

    monkeypatch.setattr(scoring, "BROADCAST_MAX_ROWS", 0)
    out = incremental_dedupe(
        delta_p, cfg.work_dir, cfg, str(tmp_path / "w_inc_join")
    )
    inc = out["clusters"].to_pandas()

    cfg_full = Config(work_dir=os.path.join(work, "w_full"))
    full = dedupe_pipeline(
        f"{full_dir}/transcripts.parquet", cfg_full
    )["clusters"].to_pandas()

    assert _partition(inc) == _partition(full)
    assert inc["conv_id"].is_unique
    assert set(inc["conv_id"]) == set(full["conv_id"])


def test_incremental_eval_f1(split_corpus, ray_session):
    """VERDICT r3 #10: the dedupe-eval F1 gate must hold on the INCREMENTAL
    output, not only on a full re-run — base+delta clusters evaluated against
    the full corpus's labels, with the candidate/signature universe being the
    union of the base run's checkpoints and the delta stages."""
    from mediachain_indexer_ray.pipelines.evaluate import evaluate_clusters
    from mediachain_indexer_ray.state.checkpoint import (
        CheckpointManager,
        read_checkpoint,
    )

    full_dir, base_p, delta_p, work = split_corpus
    cfg = Config(work_dir=os.path.join(work, "w_base"))
    dedupe_pipeline(base_p, cfg)  # cached from the earlier test

    out = incremental_dedupe(
        delta_p, cfg.work_dir, cfg, os.path.join(work, "w_inc")
    )

    base = CheckpointManager(cfg.work_dir, cfg.content_hash())
    base_sigs = read_checkpoint(base.stage_dir("signatures"))
    base_pairs = read_checkpoint(base.stage_dir("pairs_scored"))

    sig_cols = ["conv_id", "digest"]
    sigs = base_sigs.select_columns(sig_cols).union(
        out["delta_signatures"].select_columns(sig_cols)
    )
    cands = base_pairs.select_columns(["a", "b"]).union(
        out["pairs"].select_columns(["a", "b"])
    )

    labels = pd.read_parquet(f"{full_dir}/labels.parquet")
    m = evaluate_clusters(labels, out["clusters"], cands, sigs)
    assert m["n_eligible"] > 0
    assert m["f1"] >= 0.99, m


def test_incremental_invalidated_by_base_rebuild(split_corpus, ray_session, tmp_path):
    """Rebuilding the BASE work dir (same config, different data) must
    invalidate the delta checkpoints — the delta fingerprints fold in the base
    exact_dedup/edges artifacts (ADVICE r1)."""
    full_dir, base_p, delta_p, work = split_corpus
    cfg = Config(work_dir=str(tmp_path / "wb"))
    dedupe_pipeline(base_p, cfg)
    out_dir = str(tmp_path / "w_inc2")
    out1 = incremental_dedupe(delta_p, cfg.work_dir, cfg, out_dir)
    out1["_checkpoints"].flush()

    # rebuild the base from different data (the delta file), same config hash
    import shutil

    shutil.rmtree(cfg.work_dir)
    dedupe_pipeline(delta_p, cfg)
    out2 = incremental_dedupe(delta_p, cfg.work_dir, cfg, out_dir)
    actions = {e["stage"]: e["action"] for e in out2["_checkpoints"].events}
    assert actions["delta_pairs"] == "run"  # not a stale "skip"


def test_incremental_rejects_mismatched_config(split_corpus, ray_session):
    _, base_p, delta_p, work = split_corpus
    cfg = Config(work_dir=os.path.join(work, "w_base"))
    bad = cfg.with_(shingle_k=7, work_dir=cfg.work_dir)
    with pytest.raises((ValueError, FileNotFoundError)):
        incremental_dedupe(delta_p, cfg.work_dir, bad, os.path.join(work, "w_bad"))


def test_incremental_redelivered_delta_no_duplicate_rows(split_corpus,
                                                         ray_session):
    """At-least-once redelivery: a delta that re-ingests conv_ids already in
    the base run must not inflate the merged clusters with duplicate rows —
    the unioned id universe is deduplicated before label attach (ADVICE r4)."""
    import pyarrow.compute as pc

    full_dir, base_p, delta_p, work = split_corpus
    cfg = Config(work_dir=os.path.join(work, "w_base"))
    dedupe_pipeline(base_p, cfg)  # checkpoint-resumed if already built

    t_base = pq.read_table(base_p)
    t_delta = pq.read_table(delta_p)
    redelivered = sorted(set(t_base.column("conv_id").to_pylist()))[:5]
    mixed = pa.concat_tables([
        t_delta,
        t_base.filter(pc.is_in(t_base.column("conv_id"),
                               pa.array(redelivered))),
    ])
    mixed_p = os.path.join(work, "delta_redelivered.parquet")
    pq.write_table(mixed, mixed_p)

    out = incremental_dedupe(
        mixed_p, cfg.work_dir, cfg, os.path.join(work, "w_inc_redeliver")
    )
    inc = out["clusters"].to_pandas()
    assert inc["conv_id"].is_unique
    assert set(inc["conv_id"]) == (
        set(t_base.column("conv_id").to_pylist())
        | set(t_delta.column("conv_id").to_pylist())
    )
