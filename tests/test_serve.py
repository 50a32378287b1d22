"""HTTP serving surface over a completed run (reference mc_web analog):
real sockets, stdlib client, all four endpoints."""

import json
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(pipeline_outputs):
    from mediachain_indexer_ray.serve import serve

    out, cfg, corpus = pipeline_outputs
    out["_checkpoints"].flush()  # serving reads from disk checkpoints
    httpd = serve(cfg.work_dir, cfg, port=0)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, out, cfg
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_status(server):
    base, out, cfg = server
    st = _get(f"{base}/status")
    assert "clusters" in st["stages"]
    assert st["stages"]["clusters"]["rows"] == out["clusters"].count()


def test_search(server):
    base, out, cfg = server
    import re

    def _norm(s: str) -> str:  # same canon as stages.assemble.normalize_text
        return re.sub(r"[\s\x1e]+", " ", s.lower()).strip()

    convs = out["conversations"].to_pandas()
    # a word that actually occurs in the corpus (normalized text is derived
    # from doc_text now — lowercase + whitespace/turn-separator collapse)
    word = _norm(convs["doc_text"].iloc[0]).split()[2]
    res = _get(f"{base}/search?q={word}&k=5")
    assert 1 <= len(res["hits"]) <= 5
    assert all(h["relevance"] >= 1 for h in res["hits"])
    hit_text = _norm(convs.set_index("conv_id").loc[res["hits"][0]["conv_id"], "doc_text"])
    assert word in hit_text


def test_dupe_lookup(server):
    base, out, cfg = server
    df = out["clusters"].to_pandas()
    sizes = df.groupby("cluster_id")["conv_id"].transform("size")
    q = sorted(df[sizes > 1]["conv_id"])[0]
    res = _get(f"{base}/dupe_lookup?id={q}")
    assert res["results"], "duplicate query must return members"
    cid = dict(zip(df["conv_id"], df["cluster_id"]))
    for row in res["results"]:
        assert row["query_id"] == q
        assert cid[row["dup_id"]] == cid[q]


def test_score_endpoint(server):
    base, out, cfg = server
    t = ("the quick brown fox jumps over the lazy dog and keeps running "
         "through the quiet forest for a very long time today")
    dup = t.replace("quiet", "quaint")
    other = ("completely unrelated text about databases and distributed "
             "systems with nothing in common whatsoever here at all")
    res = _post(f"{base}/score", {"pairs": [[t, dup], [t, other]]})
    s = res["scores"]
    assert len(s) == 2
    assert s[0]["accepted"] is True and s[0]["score"] > s[1]["score"]
    assert s[1]["accepted"] is False


def test_feedback(server, tmp_path):
    base, out, cfg = server
    r1 = _post(f"{base}/feedback", {"kind": "dupe_vote", "a": "x", "b": "y",
                                    "is_dup": True})
    r2 = _post(f"{base}/feedback", {"kind": "dupe_vote", "a": "x", "b": "z",
                                    "is_dup": False})
    assert r1["recorded"] and r2["total"] >= 2
    lines = open(f"{cfg.work_dir}/feedback.jsonl").read().strip().splitlines()
    assert json.loads(lines[-1])["a"] == "x"


def test_search_punctuation_recall(server):
    """A word that occurs only glued to punctuation ('hello,') must be found
    by the bare query 'hello' — the serving index tokenizes with the same
    [^a-z]+ pattern as the head search_index pipeline (ADVICE r4: the old
    \\s+ tokenizer kept punctuation in tokens and lost these matches)."""
    import re
    import urllib.parse

    base, out, cfg = server
    convs = out["conversations"].to_pandas()
    allt = "\x1e".join(t.lower() for t in convs["doc_text"])
    glued = set(re.findall(r"([a-z]{4,})[,.!?;:]", allt))
    bare = set(re.findall(r"([a-z]{4,})(?=[\s\x1e]|$)", allt))
    pick = sorted(glued - bare) or sorted(glued)
    if not pick:
        pytest.skip("fixture corpus has no punctuation-glued words")
    word = pick[0]
    res = _get(f"{base}/search?q={word}&k=10")
    assert len(res["hits"]) >= 1
    # punctuated QUERY terms are tokenized with the same pattern
    res2 = _get(f"{base}/search?q={urllib.parse.quote(word + ',')}&k=10")
    assert len(res2["hits"]) >= 1


def test_ann_endpoint(pipeline_outputs, tmp_path, ray_session):
    """/ann serves embedding top-k from the persisted IVF index (reference
    mc_neighbors point queries; VERDICT r4 next #1): an indexed vector must
    rank itself first."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from mediachain_indexer_ray.pipelines.annindex import build_ann_index
    from mediachain_indexer_ray.serve import serve

    out, cfg, corpus = pipeline_outputs
    out["_checkpoints"].flush()

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(200, dtype=np.int64)),
                "embedding": pa.array(list(vecs)),
            }
        ),
        str(tmp_path / "emb.parquet"),
    )
    ds = ray.data.read_parquet(str(tmp_path / "emb.parquet"))
    idx = str(tmp_path / "annidx")
    build_ann_index(ds, idx, n_centroids=8, seed=1)

    httpd = serve(cfg.work_dir, cfg, port=0, ann_index_dir=idx)
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        res = _post(f"{base}/ann", {"vectors": [vecs[13].tolist()], "k": 3})
        hits = res["results"][0]
        assert hits[0]["vec_id"] == 13 and hits[0]["rank"] == 1
        assert len(hits) == 3
    finally:
        httpd.shutdown()
