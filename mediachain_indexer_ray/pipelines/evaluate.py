"""Evaluation harness: precision / recall / F1 on labeled duplicate pairs
(SURVEY.md §3.3) — the reference's ``mc_eval`` semantics
(``[ref: mc_eval.py — unverified]``, BASELINE.json:6 "its eval of precision/
recall on labeled duplicate pairs"), with the BASELINE.json:2 restriction:
F1 is computed ONLY over labeled pairs sharing a blocking key.

"Shares a blocking key" is defined by the blocker itself: a labeled pair is
eligible iff it appears in the candidate-pair table (same LSH band) or shares
an exact-content digest (the digest blocker M5). Labels are small; candidate
membership is resolved with a broadcast label-set filter over the candidate
Dataset — the big side streams, the small side rides in the task closures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _labeled_subset(ds: ray.data.Dataset, keys: set[tuple[str, str]]) -> pd.DataFrame:
    """Stream `ds` (columns a,b,...) and keep only rows whose (a,b) is labeled."""
    keys_ref = ray.put(keys)

    def _f(b: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        a = b.column("a").to_pylist()
        bb = b.column("b").to_pylist()
        mask = pa.array([(x, y) in ks for x, y in zip(a, bb)])
        return b.filter(mask)

    return ds.map_batches(_f, batch_format="pyarrow").to_pandas()


def _id_subset(ds: ray.data.Dataset, col: str, ids: set[str], cols: list[str]) -> pd.DataFrame:
    ids_ref = ray.put(ids)

    def _f(b: pa.Table) -> pa.Table:
        s = ray.get(ids_ref)
        mask = pa.array([x in s for x in b.column(col).to_pylist()])
        return b.filter(mask)

    return ds.select_columns(cols).map_batches(_f, batch_format="pyarrow").to_pandas()


def eligible_label_pairs(
    labels: pd.DataFrame,
    candidates: ray.data.Dataset,
    signatures: ray.data.Dataset,
) -> pd.Series:
    """Boolean mask over `labels`: pair shares ≥1 blocking key (band or digest)."""
    keys = set(zip(labels["a"], labels["b"]))
    cand = _labeled_subset(candidates.select_columns(["a", "b"]), keys)
    cand_keys = set(zip(cand["a"], cand["b"]))

    ids = set(labels["a"]) | set(labels["b"])
    digs = _id_subset(signatures, "conv_id", ids, ["conv_id", "digest"])
    dmap = dict(zip(digs["conv_id"], digs["digest"]))
    same_digest = labels.apply(
        lambda r: dmap.get(r["a"]) is not None and dmap.get(r["a"]) == dmap.get(r["b"]),
        axis=1,
    )
    in_cand = labels.apply(lambda r: (r["a"], r["b"]) in cand_keys, axis=1)
    return in_cand | same_digest


def evaluate_clusters(
    labels: pd.DataFrame,
    clusters: ray.data.Dataset,
    candidates: ray.data.Dataset,
    signatures: ray.data.Dataset,
) -> dict:
    """P / R / F1 of 'same predicted cluster' vs labeled is_dup, restricted to
    labeled pairs sharing a blocking key."""
    eligible = eligible_label_pairs(labels, candidates, signatures)
    sub = labels[eligible].copy()

    ids = set(sub["a"]) | set(sub["b"])
    cmap_df = _id_subset(clusters, "conv_id", ids, ["conv_id", "cluster_id"])
    cmap = dict(zip(cmap_df["conv_id"], cmap_df["cluster_id"]))

    pred = np.array(
        [
            cmap.get(a) is not None and cmap.get(a) == cmap.get(b)
            for a, b in zip(sub["a"], sub["b"])
        ]
    )
    truth = sub["is_dup"].to_numpy()
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_labeled": int(len(labels)),
        "n_eligible": int(len(sub)),
    }


def fill_block_keys(
    labels: pd.DataFrame,
    candidates: ray.data.Dataset,
    signatures: ray.data.Dataset,
) -> pd.DataFrame:
    """Materialize the LABELS schema of FIXTURES.md §A3: block_key = 'band' if
    the blocker put the pair in a shared band, 'digest:<hex>' if it shares an
    exact digest, '' otherwise."""
    keys = set(zip(labels["a"], labels["b"]))
    cand = _labeled_subset(candidates.select_columns(["a", "b"]), keys)
    cand_keys = set(zip(cand["a"], cand["b"]))
    ids = set(labels["a"]) | set(labels["b"])
    digs = _id_subset(signatures, "conv_id", ids, ["conv_id", "digest"])
    dmap = dict(zip(digs["conv_id"], digs["digest"]))

    def bk(r):
        da, db = dmap.get(r["a"]), dmap.get(r["b"])
        if da is not None and da == db:
            return f"digest:{da:016x}"
        if (r["a"], r["b"]) in cand_keys:
            return "band"
        return ""

    out = labels.copy()
    out["block_key"] = labels.apply(bk, axis=1)
    return out
