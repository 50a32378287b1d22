"""Point dupe-lookup (reference /dupe_lookup) over a completed run."""

from __future__ import annotations


def test_dupe_lookup_returns_cluster_members(pipeline_outputs):
    from mediachain_indexer_ray.pipelines.lookup import dupe_lookup

    out, cfg, _ = pipeline_outputs
    df = out["clusters"].to_pandas()
    sizes = df.groupby("cluster_id")["conv_id"].transform("size")
    dup_ids = sorted(df[sizes > 1]["conv_id"])
    assert dup_ids, "fixture must contain duplicate clusters"
    queries = dup_ids[:5]

    res = dupe_lookup(cfg.work_dir, queries).to_pandas()
    assert set(res["query_id"]) == set(queries)
    # no self rows by default; every returned dup shares the query's cluster
    assert not (res["query_id"] == res["dup_id"]).any()
    cid = dict(zip(df["conv_id"], df["cluster_id"]))
    for q, d in zip(res["query_id"], res["dup_id"]):
        assert cid[q] == cid[d]

    # include_self returns the query row too
    res_self = dupe_lookup(cfg.work_dir, queries[:1], include_self=True).to_pandas()
    assert (res_self["dup_id"] == queries[0]).any()


def test_dupe_lookup_singleton_query(pipeline_outputs):
    from mediachain_indexer_ray.pipelines.lookup import dupe_lookup

    out, cfg, _ = pipeline_outputs
    df = out["clusters"].to_pandas()
    sizes = df.groupby("cluster_id")["conv_id"].transform("size")
    singleton = sorted(df[sizes == 1]["conv_id"])[0]
    res = dupe_lookup(cfg.work_dir, [singleton]).to_pandas()
    assert len(res) == 0
