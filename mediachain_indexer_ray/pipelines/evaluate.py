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


_PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)


def _pair_hash(a, b) -> np.ndarray:
    """Orientation-INSENSITIVE uint64 hash of an id pair (vectorized).
    Ids may be strings (labels) or already-hashed uint64 (candidate rows —
    the pair table is uint64-native, VERDICT r3 #3); both land in the same
    cid64 space. Candidates are canonical in uint64 order while labels are
    canonical in string order, so the pair key min/max-normalizes the two
    hashes before mixing."""
    from mediachain_indexer_ray.functions.hashing import cid64, splitmix64

    ha, hb = cid64(a), cid64(b)
    lo, hi = np.minimum(ha, hb), np.maximum(ha, hb)
    return splitmix64(lo * _PAIR_MIX ^ hi)


def _cid_pair_lohi(labels: pd.DataFrame) -> list[tuple[int, int]]:
    """Per-label-row (lo, hi) cid64 pair keys — the orientation-normalized
    form candidate pairs are stored in."""
    from mediachain_indexer_ray.functions.hashing import cid64

    if not len(labels):
        return []
    ha = cid64(pa.array(labels["a"].tolist(), pa.string()))
    hb = cid64(pa.array(labels["b"].tolist(), pa.string()))
    lo, hi = np.minimum(ha, hb), np.maximum(ha, hb)
    return list(zip(lo.tolist(), hi.tolist()))


def _isin_sorted(h: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
    if not len(sorted_keys) or not len(h):
        return np.zeros(len(h), bool)
    pos = np.clip(np.searchsorted(sorted_keys, h), 0, len(sorted_keys) - 1)
    return sorted_keys[pos] == h


def _typed_pandas(ds: ray.data.Dataset, cols: list[str]) -> pd.DataFrame:
    """``ds.to_pandas()`` that survives the Ray 2.49 zero-row case, where an
    all-empty filtered Dataset can come back without its column schema (the
    bug documented at fuzzy_match_customers): reindex onto the expected
    columns so downstream ``df[col]`` never KeyErrors (ADVICE r3)."""
    df = ds.to_pandas()
    if df.empty and list(df.columns) != cols:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    return df[cols]


def _labeled_subset(ds: ray.data.Dataset, keys: set[tuple[str, str]]) -> pd.DataFrame:
    """Stream `ds` (columns a,b,... — uint64 id-hashes) and keep only rows
    whose (a,b) is labeled.

    The membership test is a vectorized 64-bit pair-hash + searchsorted against
    the broadcast sorted label hashes — no per-row Python loop over the (at
    scale, 10^9-pair) candidate stream. A hash collision can only ADMIT an
    extra row, and every caller re-checks membership against the exact
    cid64-normalized pair keys downstream, so false positives cannot affect
    the P/R/F1 result.
    """
    import pyarrow as _pa

    kh = np.sort(_pair_hash(
        _pa.array([k[0] for k in keys], _pa.string()),
        _pa.array([k[1] for k in keys], _pa.string()),
    )) if keys else np.array([], np.uint64)
    keys_ref = ray.put(kh)

    def _f(b: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        h = _pair_hash(b.column("a").combine_chunks(),
                       b.column("b").combine_chunks())
        return b.filter(pa.array(_isin_sorted(h, ks)))

    return _typed_pandas(
        ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
    )


def _id_subset(ds: ray.data.Dataset, col: str, ids: set[str], cols: list[str]) -> pd.DataFrame:
    """Same hash-prefilter shape as ``_labeled_subset`` for a single id column
    — the column may be strings (signatures, flagship clusters) or uint64
    id-hashes (core closure output); both compare in cid64 space (extra
    collision rows only add unused entries to the caller's lookup)."""
    from mediachain_indexer_ray.functions.hashing import cid64

    ih = np.sort(cid64(sorted(ids))) if ids else np.array([], np.uint64)
    ids_ref = ray.put(ih)

    def _f(b: pa.Table) -> pa.Table:
        s = ray.get(ids_ref)
        h = cid64(b.column(col).combine_chunks())
        return b.filter(pa.array(_isin_sorted(h, s)))

    return _typed_pandas(
        ds.select_columns(cols).map_batches(
            _f, batch_format="pyarrow", zero_copy_batch=True
        ),
        cols,
    )


def eligible_label_pairs(
    labels: pd.DataFrame,
    candidates: ray.data.Dataset,
    signatures: ray.data.Dataset,
) -> pd.Series:
    """Boolean mask over `labels`: pair shares ≥1 blocking key (band or digest)."""
    keys = set(zip(labels["a"], labels["b"]))
    cand = _labeled_subset(candidates.select_columns(["a", "b"]), keys)
    # candidate rows are uint64 id-hash pairs, already canonical in u64 order;
    # labels are canonical in STRING order — normalize both to (lo, hi) cid64
    cand_keys = set(
        zip(cand["a"].astype(np.uint64).tolist(), cand["b"].astype(np.uint64).tolist())
    )

    ids = set(labels["a"]) | set(labels["b"])
    digs = _id_subset(signatures, "conv_id", ids, ["conv_id", "digest"])
    dmap = dict(zip(digs["conv_id"], digs["digest"]))
    same_digest = labels.apply(
        lambda r: dmap.get(r["a"]) is not None and dmap.get(r["a"]) == dmap.get(r["b"]),
        axis=1,
    )
    label_keys = _cid_pair_lohi(labels)
    in_cand = pd.Series(
        [k in cand_keys for k in label_keys], index=labels.index
    )
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
    # clusters come in two shapes: the user-facing (conv_id, cluster_id)
    # string table (flagship output) or the uint64-native closure core's
    # (node, cluster) — cluster equality is all the metric needs, so the
    # u64 shape is evaluated directly in cid64 space (sweep_eval path)
    cols = set(clusters.schema().names)
    if "conv_id" in cols:
        cmap_df = _id_subset(clusters, "conv_id", ids, ["conv_id", "cluster_id"])
        cmap = dict(zip(cmap_df["conv_id"], cmap_df["cluster_id"]))
        key_a, key_b = sub["a"], sub["b"]
    else:
        from mediachain_indexer_ray.functions.hashing import cid64

        cmap_df = _id_subset(clusters, "node", ids, ["node", "cluster"])
        cmap = dict(
            zip(cmap_df["node"].astype(np.uint64).tolist(),
                cmap_df["cluster"].astype(np.uint64).tolist())
        )
        if len(sub):
            key_a = cid64(pa.array(sub["a"].tolist(), pa.string())).tolist()
            key_b = cid64(pa.array(sub["b"].tolist(), pa.string())).tolist()
        else:
            key_a = key_b = []

    pred = np.array(
        [
            cmap.get(a) is not None and cmap.get(a) == cmap.get(b)
            for a, b in zip(key_a, key_b)
        ],
        dtype=bool,
    ).reshape(len(sub))
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


def sweep_eval(
    transcripts_path: str,
    labels: pd.DataFrame,
    cfg,
    work_root: str,
    taus: list[float] | None = None,
    bands_list: list[int] | None = None,
) -> pd.DataFrame:
    """Hyperparameter grid sweep — the reference ``mc_eval`` grid semantics:
    P/R/F1 over (num_bands, τ). One full pipeline run per bands config (the
    expensive part: signatures + blocking + scoring); each τ is then a cheap
    re-threshold of the SCORED pairs plus a closure re-run, because τ only
    gates edge acceptance. Returns a tidy DataFrame
    (num_bands, band_rows, tau_milli, precision_milli, recall_milli, f1_milli,
    n_eligible)."""
    import os

    from mediachain_indexer_ray.config import Config  # noqa: F401 (typing)
    from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
    from mediachain_indexer_ray.stages.blocking import split_exact_dedup
    from mediachain_indexer_ray.stages.closure import connected_components
    from mediachain_indexer_ray.state.checkpoint import read_checkpoint

    taus = taus or [0.45, 0.55, 0.62, 0.7, 0.8]
    bands_list = bands_list or [16, 32, 64]
    rows = []
    for b in bands_list:
        if cfg.num_perm % b:
            raise ValueError(f"num_bands {b} does not divide num_perm {cfg.num_perm}")
        cfg_b = cfg.with_(
            num_bands=b, band_rows=cfg.num_perm // b,
            work_dir=os.path.join(work_root, f"bands{b}"),
        )
        out = dedupe_pipeline(transcripts_path, cfg_b)
        _, exact_edges = split_exact_dedup(
            read_checkpoint(out["_checkpoints"].stage_dir("exact_dedup"))
        )
        scored = out["pairs"]
        for tau in taus:
            edges = scored.filter(
                expr=f"score >= {tau}"
            ).select_columns(["a", "b"]).union(exact_edges)
            clusters = connected_components(edges, cfg_b, num_parts=8)
            m = evaluate_clusters(labels, clusters, scored, out["signatures"])
            rows.append(
                {
                    "num_bands": b,
                    "band_rows": cfg.num_perm // b,
                    "tau_milli": int(round(tau * 1000)),
                    "precision_milli": int(round(m["precision"] * 1000)),
                    "recall_milli": int(round(m["recall"] * 1000)),
                    "f1_milli": int(round(m["f1"] * 1000)),
                    "n_eligible": m["n_eligible"],
                }
            )
    return pd.DataFrame(rows)


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
    cand_keys = set(
        zip(cand["a"].astype(np.uint64).tolist(), cand["b"].astype(np.uint64).tolist())
    )
    label_keys = _cid_pair_lohi(labels)
    ids = set(labels["a"]) | set(labels["b"])
    digs = _id_subset(signatures, "conv_id", ids, ["conv_id", "digest"])
    dmap = dict(zip(digs["conv_id"], digs["digest"]))

    out = labels.copy()
    bks = []
    for (_, r), lk in zip(labels.iterrows(), label_keys):
        da, db = dmap.get(r["a"]), dmap.get(r["b"])
        if da is not None and da == db:
            bks.append(f"digest:{da:016x}")
        elif lk in cand_keys:
            bks.append("band")
        else:
            bks.append("")
    out["block_key"] = bks
    return out
