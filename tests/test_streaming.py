"""Continuous micro-batch ingest (SURVEY.md S3): waves of shards through
base → delta → compaction must converge to the same clusters as one full run,
and at-least-once redelivery must be a no-op."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus
from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
from mediachain_indexer_ray.pipelines.streaming import IngestWatcher


def _partition(df: pd.DataFrame) -> set[frozenset]:
    groups = df.groupby("cluster_id")["conv_id"].apply(frozenset)
    return set(groups[groups.apply(len) > 1])


@pytest.fixture(scope="module")
def waves(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    full_dir = str(d / "full")
    write_corpus(FixtureSpec(n_base=60, viral_fanout=10), full_dir,
                 shuffle_rows=True)
    t = pq.read_table(f"{full_dir}/transcripts.parquet")
    convs = sorted(set(t.column("conv_id").to_pylist()))
    cuts = [0, int(len(convs) * 0.6), int(len(convs) * 0.75), len(convs)]
    watch = str(d / "watch")
    os.makedirs(watch)
    shards = []
    for i in range(3):
        ids = convs[cuts[i]:cuts[i + 1]]
        mask = pc.is_in(t.column("conv_id"), pa.array(ids))
        p = os.path.join(watch, f"wave{i}.parquet")
        pq.write_table(t.filter(mask), p)
        shards.append(p)
    return full_dir, watch, str(d)


def test_waves_converge_to_full_run(waves, ray_session, tmp_path):
    full_dir, watch, root = waves
    # hold back wave2 so the watcher sees three distinct arrivals
    held = os.path.join(root, "held.parquet")
    os.rename(os.path.join(watch, "wave2.parquet"), held)

    cfg = Config(work_dir=os.path.join(root, "unused"))
    w = IngestWatcher(watch, os.path.join(root, "work"), cfg,
                      compact_ratio=0.35)
    st1 = w.run_once()
    assert st1["action"] == "base"
    st2 = w.run_once()
    assert st2["action"] == "idle"

    os.rename(held, os.path.join(watch, "wave2.parquet"))
    st3 = w.run_once()
    # wave2 is 25% of convs vs 60% base → delta; with compact_ratio=0.35 the
    # row ratio decides — accept either path, both must be correct
    assert st3["action"] in ("delta", "compact")

    got = w.clusters().to_pandas()
    cfg_full = Config(work_dir=str(tmp_path / "wf"))
    full = dedupe_pipeline(
        f"{full_dir}/transcripts.parquet", cfg_full
    )["clusters"].to_pandas()
    # watcher has only seen waves 0+2 (wave1 renamed out before staging? no —
    # wave0 and wave1 were both present at the first cycle) → all three waves
    assert set(got["conv_id"]) == set(full["conv_id"])
    assert _partition(got) == _partition(full)

    # at-least-once redelivery: the same content under a new shard name
    import shutil

    shutil.copy(os.path.join(watch, "wave2.parquet"),
                os.path.join(watch, "wave2_redelivered.parquet"))
    st4 = w.run_once()
    assert st4["action"] in ("delta", "compact")
    again = w.clusters().to_pandas()
    assert _partition(again) == _partition(full)
    assert set(again["conv_id"]) == set(full["conv_id"])


def test_ledger_survives_restart(waves, ray_session):
    full_dir, watch, root = waves
    cfg = Config(work_dir=os.path.join(root, "unused2"))
    w2 = IngestWatcher(watch, os.path.join(root, "work"), cfg,
                       compact_ratio=0.35)
    # fresh instance over the same work root: ledger says everything is done
    st = w2.run_once()
    assert st["action"] == "idle"
