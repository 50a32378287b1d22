"""Model registry (SURVEY.md X1): duplicate_mode selection, baseline vs
baseline_ng semantics, custom model plug-in, and re-ingest idempotence (D1)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.fixtures import FixtureSpec, make_corpus, write_corpus
from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
from mediachain_indexer_ray.registry import DedupeModel, get_model, register
from mediachain_indexer_ray.stages.assemble import assemble


def test_registry_contents():
    assert get_model("baseline").use_lsh is False
    assert get_model("baseline_ng").use_lsh is True
    with pytest.raises(ValueError, match="unknown duplicate_mode"):
        get_model("nope")


def test_custom_model_plugs_in():
    class MyScorer:
        def __init__(self, cfg):
            pass

        def __call__(self, b):
            return b

    register(DedupeModel(name="custom", use_lsh=True, scorer_cls=MyScorer))
    assert get_model("custom").scorer_cls is MyScorer


def test_baseline_mode_clusters_only_exact_dups(tmp_path):
    spec = FixtureSpec(n_base=40, seed=9)
    d = str(tmp_path / "corpus")
    write_corpus(spec, d)
    cfg = Config(work_dir=str(tmp_path / "work"), duplicate_mode="baseline")
    out = dedupe_pipeline(f"{d}/transcripts.parquet", cfg)
    cl = out["clusters"].to_pandas()
    assert out["pairs"] is None
    # exact variants share their base's cluster; near variants do not
    tr, _ = make_corpus(spec)
    df = tr.to_pandas()
    docs = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["text"].apply(
        "\x1e".join
    )
    cmap = dict(zip(cl.conv_id, cl.cluster_id))
    same_text = docs.groupby(docs).apply(lambda s: list(s.index))
    for group in same_text:
        labels = {cmap[c] for c in group}
        assert len(labels) == 1  # exact dups always co-clustered
    # distinct texts with distinct clusters unless exact dup
    n_unique_docs = docs.nunique()
    assert cl.cluster_id.nunique() == n_unique_docs


def test_reingest_idempotence(tmp_path):
    """SURVEY.md D1: re-ingesting the same corpus (duplicate rows) must not
    change assembled conversations — the reference's deterministic-_id
    overwrite semantics."""
    tr, _ = make_corpus(FixtureSpec(n_base=20, seed=3))
    doubled = pa.concat_tables([tr, tr])
    rng = np.random.default_rng(1)
    doubled = doubled.take(rng.permutation(doubled.num_rows))
    a = assemble(ray.data.from_arrow(tr), Config(num_hash_partitions=4)).to_pandas()
    b = assemble(ray.data.from_arrow(doubled), Config(num_hash_partitions=4)).to_pandas()
    a = a.sort_values("conv_id").reset_index(drop=True)
    b = b.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["conv_id", "n_turns", "doc_text"]], b[["conv_id", "n_turns", "doc_text"]]
    )
