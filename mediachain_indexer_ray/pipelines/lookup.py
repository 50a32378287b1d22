"""Point dupe-lookup over a completed run — the batch analog of the
reference's ``/dupe_lookup`` HTTP endpoint (``[ref: mc_web.py /dupe_lookup,
mc_models.py dedupe_lookup_async — unverified]``, SURVEY.md X4/T3): given
query conversation ids, return every member of each query's duplicate cluster.

Serving-shaped reads over batch outputs: the clusters table is the index; the
query set is small and broadcast; the big side streams. No per-query ES round
trip — one scan answers the whole query batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from mediachain_indexer_ray.functions.hashing import hash_strings
from mediachain_indexer_ray.state.checkpoint import read_checkpoint


def dupe_lookup(
    work_dir: str, query_ids: list[str], *, include_self: bool = False
) -> ray.data.Dataset:
    """(query conv_id, duplicate conv_id, cluster_id) for every query whose
    cluster has other members. ``include_self`` mirrors the reference's
    ``include_self`` flag (SURVEY.md M9)."""
    clusters = read_checkpoint(f"{work_dir}/clusters")

    q = sorted(set(query_ids))
    q_hash = np.sort(hash_strings(pa.array(q, pa.string())))
    q_ref = ray.put((q_hash, q))

    # pass 1: cluster ids of the queried conversations (tiny result)
    def _find(b: pa.Table) -> pa.Table:
        qh, _ = ray.get(q_ref)
        h = hash_strings(b.column("conv_id").combine_chunks())
        pos = np.clip(np.searchsorted(qh, h), 0, max(len(qh) - 1, 0))
        keep = (qh[pos] == h) if len(qh) else np.zeros(len(h), bool)
        return b.filter(pa.array(keep))

    q_clusters = clusters.map_batches(
        _find, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cid_of_query = dict(zip(q_clusters["conv_id"], q_clusters["cluster_id"]))

    # pass 2: all members of those clusters (broadcast the cluster-id set)
    want = sorted(set(cid_of_query.values()))
    want_hash = np.sort(hash_strings(pa.array(want, pa.string())))
    want_ref = ray.put(want_hash)

    def _members(b: pa.Table) -> pa.Table:
        wh = ray.get(want_ref)
        h = hash_strings(b.column("cluster_id").combine_chunks())
        pos = np.clip(np.searchsorted(wh, h), 0, max(len(wh) - 1, 0))
        keep = (wh[pos] == h) if len(wh) else np.zeros(len(h), bool)
        return b.filter(pa.array(keep))

    members = clusters.map_batches(
        _members, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    by_cluster: dict[str, list[str]] = {}
    for cid, conv in zip(members["cluster_id"], members["conv_id"]):
        by_cluster.setdefault(cid, []).append(conv)

    rows_q, rows_m, rows_c = [], [], []
    for qid in q:
        cid = cid_of_query.get(qid)
        if cid is None:
            continue
        for m in sorted(by_cluster.get(cid, [])):
            if m == qid and not include_self:
                continue
            rows_q.append(qid)
            rows_m.append(m)
            rows_c.append(cid)
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(rows_q, pa.string()),
                "dup_id": pa.array(rows_m, pa.string()),
                "cluster_id": pa.array(rows_c, pa.string()),
            }
        )
    )
