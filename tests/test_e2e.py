"""End-to-end conformance (SURVEY.md §5.3-5.5): F1 ≥ 0.99 on labeled pairs at
shared blocking keys (BASELINE.json:2), closure vs networkx oracle, resume from
checkpoint, and determinism across runs."""

import json
import os

import networkx as nx
import pandas as pd
import pytest

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
from mediachain_indexer_ray.pipelines.evaluate import evaluate_clusters, fill_block_keys


def test_f1_at_shared_blocking_keys(pipeline_outputs):
    out, cfg, corpus = pipeline_outputs
    labels = pd.read_parquet(f"{corpus}/labels.parquet")
    m = evaluate_clusters(labels, out["clusters"], out["pairs"], out["signatures"])
    assert m["n_eligible"] > 100
    assert m["f1"] >= 0.99, m
    assert m["precision"] >= 0.99, m
    assert m["recall"] >= 0.99, m


def test_clusters_match_networkx_on_accepted_edges(pipeline_outputs):
    """Edges are uint64 id-hashes (VERDICT r3 #3); clusters are user-facing
    strings with cluster_id = min conv_id string per component. Verify the
    partition AND the min-string labeling against networkx over the hashed
    edge graph."""
    import pyarrow as pa

    from mediachain_indexer_ray.functions.hashing import cid64

    out, cfg, corpus = pipeline_outputs
    edges = out["edges"].to_pandas()
    clusters = out["clusters"].to_pandas()
    g = nx.Graph()
    g.add_edges_from(zip(edges["a"].astype("uint64"), edges["b"].astype("uint64")))
    comp_of = {}  # node hash -> component index
    for i, comp in enumerate(nx.connected_components(g)):
        for n in comp:
            comp_of[n] = i
    h = cid64(pa.array(clusters["conv_id"].tolist(), pa.string()))
    got = dict(zip(clusters["conv_id"], clusters["cluster_id"]))
    # group conv ids by predicted cluster and by oracle component
    by_comp: dict[int, set] = {}
    for conv, hh in zip(clusters["conv_id"], h):
        ci = comp_of.get(int(hh))
        if ci is not None:
            by_comp.setdefault(ci, set()).add(conv)
        else:  # non-edge nodes are singletons
            assert got[conv] == conv
    for members in by_comp.values():
        labels = {got[m] for m in members}
        # one label per component, and it is the min conv_id string
        assert labels == {min(members)}, (members, labels)


def test_fill_block_keys_schema(pipeline_outputs):
    out, cfg, corpus = pipeline_outputs
    labels = pd.read_parquet(f"{corpus}/labels.parquet")
    filled = fill_block_keys(labels, out["pairs"], out["signatures"])
    assert set(filled.columns) == {"a", "b", "is_dup", "block_key"}
    assert (filled["block_key"] != "").sum() > 100


def test_resume_skips_completed_stages(pipeline_outputs, corpus_dir):
    out, cfg, corpus = pipeline_outputs
    # second run over the same work dir: every stage must be a manifest hit
    out2 = dedupe_pipeline(f"{corpus}/transcripts.parquet", cfg)
    cp = out2["_checkpoints"]
    actions = {e["stage"]: e["action"] for e in cp.events}
    assert actions and all(a == "skip" for a in actions.values()), actions
    # and the clusters are byte-identical
    c1 = out["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    c2 = out2["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c2)


def test_partial_resume_runs_only_downstream(pipeline_outputs, corpus_dir, tmp_path):
    """Simulated mid-job crash: stage k's checkpoint exists, later stages don't
    → rerun skips ≤k and re-executes >k with identical results."""
    import shutil

    out, cfg, corpus = pipeline_outputs
    work2 = str(tmp_path / "resume_work")
    shutil.copytree(cfg.work_dir, work2)
    # wipe everything after 'signatures'
    for stage in ("exact_dedup", "pairs", "pairs_scored", "edges", "clusters"):
        shutil.rmtree(os.path.join(work2, stage), ignore_errors=True)
    cfg2 = Config(work_dir=work2)
    out2 = dedupe_pipeline(f"{corpus}/transcripts.parquet", cfg2)
    actions = {e["stage"]: e["action"] for e in out2["_checkpoints"].events}
    assert actions["conversations"] == "skip"
    assert actions["signatures"] == "skip"
    assert actions["clusters"] == "run"
    c1 = out["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    c2 = out2["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c2)


def test_manifests_record_lineage(pipeline_outputs):
    out, cfg, corpus = pipeline_outputs
    cp = out["_checkpoints"]
    for stage in ("conversations", "signatures", "pairs", "clusters"):
        man = cp.manifest(stage)
        assert man["config_hash"] == cfg.content_hash()
        assert man["rows"] > 0
        assert "wall_sec" in man and "fingerprint" in man


def test_determinism_fresh_workdir(pipeline_outputs, tmp_path):
    out, cfg, corpus = pipeline_outputs
    cfg2 = Config(work_dir=str(tmp_path / "det_work"))
    out2 = dedupe_pipeline(f"{corpus}/transcripts.parquet", cfg2)
    c1 = out["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    c2 = out2["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c2)
    s1 = out["pairs"].to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    s2 = out2["pairs"].to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2)


def test_pipeline_degenerate_corpus(ray_session, tmp_path):
    """Flagship survives a pathological corpus: empty-text turns (dropped by
    hygiene filters), single-turn conversations, whitespace-only and sub-k
    texts — every conversation still gets a cluster id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mediachain_indexer_ray.config import Config
    from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline

    rows = {
        "conv_id": ["c1", "c1", "c2", "c3", "c4", "c5"],
        "turn_idx": [0, 1, 0, 0, 0, 0],
        "role": ["user", "assistant", "user", "user", "user", "user"],
        "text": ["hello world", "", "   ", "ab", "hello world", "hello world"],
        "tool": ["", None, "", "", "", ""],
        "ts": [pa.scalar(i * 1000, pa.timestamp("us")) for i in range(6)],
    }
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table(rows), p)
    out = dedupe_pipeline(p, Config(work_dir=str(tmp_path / "w")))
    cl = out["clusters"].to_pandas().sort_values("conv_id")
    # c1 keeps one non-empty turn; c4/c5 are exact dups -> same cluster
    assert set(cl.conv_id) == {"c1", "c2", "c3", "c4", "c5"}
    m = dict(zip(cl.conv_id, cl.cluster_id))
    assert m["c4"] == m["c5"]


def test_iterative_relay_closure_e2e_matches_two_phase(ray_session, tmp_path,
                                                       monkeypatch):
    """VERDICT r3 #6: the beyond-driver closure path (iterative Hash-to-Min
    with salted virtual relays) exercised END-TO-END through dedupe_pipeline —
    DRIVER_CC_MAX_EDGES forced to 0 so the two-phase driver fast path is
    unreachable, closure_fanin shrunk so the viral component actually routes
    through relays — must produce clusters identical to the default path."""
    from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus
    from mediachain_indexer_ray.stages import closure

    corpus = str(tmp_path / "viral")
    # viral_fanout 60 ≫ closure_fanin 4: the giant component must relay
    write_corpus(FixtureSpec(n_base=30, viral_fanout=60), corpus,
                 shuffle_rows=True)
    path = f"{corpus}/transcripts.parquet"

    cfg_two = Config(work_dir=str(tmp_path / "w_two"))
    two = dedupe_pipeline(path, cfg_two)["clusters"].to_pandas()

    monkeypatch.setattr(closure, "DRIVER_CC_MAX_EDGES", 0)
    cfg_it = Config(work_dir=str(tmp_path / "w_iter"), closure_fanin=4)
    out_it = dedupe_pipeline(path, cfg_it)
    it = out_it["clusters"].to_pandas()

    key = ["conv_id", "cluster_id"]
    pd.testing.assert_frame_equal(
        two.sort_values(key).reset_index(drop=True)[key],
        it.sort_values(key).reset_index(drop=True)[key],
    )

    # relay assertion: re-run closure over the SAME edges with a checkpoint
    # spy — at least one round frontier must contain virtual (bit-63) rows,
    # proving the relay routing engaged rather than degenerating to plain
    # Hash-to-Min
    import numpy as np

    virt_rounds = []

    def spy(name, ds):
        m = ds.materialize()
        if name != "closure_r0":
            u = m.to_pandas()["u"].to_numpy().astype(np.uint64)
            if (u & closure.VIRT_BIT).any():
                virt_rounds.append(name)
        return m

    closure.connected_components(
        out_it["edges"], cfg_it, checkpoint=spy, num_parts=4
    ).materialize()
    assert virt_rounds, "no round frontier carried virtual relay rows"
