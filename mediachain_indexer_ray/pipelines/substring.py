"""Substring-level exact dedup: maximal repeated token spans across a corpus.

Document-granular dedup (``pipelines/docdedup.py``) misses the other thing a
training-data pipeline must drop: long VERBATIM passages repeated inside
otherwise-distinct documents (boilerplate, licenses, quoted chain letters) —
the Lee et al. 2022 "Deduplicating Training Data Makes Language Models
Better" substring modality (PAPERS.md; VERDICT r4 missing #1).

Semantics (exact, oracle-checkable): tokenize with the text-family
``[a-z]+`` tokenizer; an ``L``-token window is *repeated* iff its content
occurs at ≥ 2 (doc, position) places in the corpus (across documents or
within one); a token position is *covered* iff some repeated window contains
it; the output is each document's maximal covered spans
``(doc_id, start_tok, end_tok, n_tokens)``.

Shape (the distributed-friendly alternative to a monolithic suffix array):

1. one ``map_batches`` pass emits ``(window_hash, id, pos)`` — token hashes
   Horner-combined over each L-window, windows never crossing document
   boundaries; O(tokens) rows, the inherent cost of substring-level dedup;
2. one hash shuffle on ``window_hash``: every occurrence of a window content
   lands in one partition, where a vectorized segment count keeps the
   occurrences of windows seen ≥ 2 times;
3. one hash shuffle on the document id: per-doc position sort + a vectorized
   gaps-and-islands merge emits the maximal spans.

Never all-pairs, never a driver gather; both shuffles are the engine's
standard ``grouped_partitions``. Window hashing is 64-bit (splitmix-mixed
Horner) — collisions would FALSELY mark a window repeated at ~n²/2⁶⁵
probability, negligible against the sf0.01 oracle and any test corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mediachain_indexer_ray.functions.hashing import hash_strings, splitmix64
from mediachain_indexer_ray.stages.partition import grouped_partitions

_HORNER_M = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def _window_rows(b: pa.Table, id_col: str, text_col: str, L: int) -> pa.Table:
    """(window_hash, id, pos) rows for one batch — one row per L-token window
    of every document, positions over the non-empty lowercase tokens (same
    token stream as the bm25/text family)."""
    text = b.column(text_col).combine_chunks().cast(pa.string())
    toks = pc.split_pattern_regex(pc.utf8_lower(text), "[^a-z]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    off = np.asarray(toks.offsets.to_numpy()).astype(np.int64)
    ok = pc.fill_null(pc.not_equal(flat, ""), False).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    n_docs = b.num_rows
    empty = pa.table(
        {
            "wh": pa.array([], pa.uint64()),
            id_col: b.column(id_col).combine_chunks().slice(0, 0),
            "pos": pa.array([], pa.int64()),
        }
    )
    if not len(ok) or not ok.any():
        return empty
    # per-doc non-empty token counts (reduceat with the empty-segment fix,
    # shared idiom with textindex._doc_lengths)
    cnt = np.add.reduceat(np.append(ok, False), off[:-1])[:n_docs].astype(
        np.int64
    )
    cnt[np.diff(off) == 0] = 0
    flat_ok = flat.filter(pa.array(ok)) if not ok.all() else flat
    h = hash_strings(flat_ok.combine_chunks()
                     if isinstance(flat_ok, pa.ChunkedArray) else flat_ok)
    N = len(h)
    if N < L:
        return empty
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), cnt)
    doc_starts = np.zeros(n_docs, np.int64)
    np.cumsum(cnt[:-1], out=doc_starts[1:])
    pos = np.arange(N, dtype=np.int64) - doc_starts[doc_of]

    # Horner combine over each window: wh_p = ((h_p·M + h_{p+1})·M + …) —
    # L vectorized passes, uint64 wraparound is the modulus
    W = N - L + 1
    wh = np.zeros(W, np.uint64)
    for i in range(L):
        wh = wh * _HORNER_M + h[i:i + W]
    wh = splitmix64(wh)
    valid = doc_of[:W] == doc_of[L - 1:]  # window inside one document
    if not valid.any():
        return empty
    starts = np.flatnonzero(valid)
    return pa.table(
        {
            "wh": pa.array(wh[starts]),
            id_col: b.column(id_col).combine_chunks().take(
                pa.array(doc_of[starts])
            ),
            "pos": pa.array(pos[starts]),
        }
    )


def _repeated_occurrences(t: pa.Table, id_col: str) -> pa.Table:
    """One window-hash partition: keep occurrences of hashes seen ≥ 2 times."""
    idx = pc.sort_indices(t, sort_keys=[("wh", "ascending")])
    t = t.take(idx)
    wh = t.column("wh").to_numpy()
    n = len(wh)
    if not n:
        return t.select([id_col, "pos"])
    first = np.ones(n, bool)
    first[1:] = wh[1:] != wh[:-1]
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, n))
    keep = np.repeat(sizes >= 2, sizes)
    return t.filter(pa.array(keep)).select([id_col, "pos"])


def _merge_spans(t: pa.Table, id_col: str, L: int) -> pa.Table:
    """One document partition: gaps-and-islands merge of covered windows
    [p, p+L-1] into maximal spans (union merges when p ≤ prev_p + L)."""
    idx = pc.sort_indices(
        t, sort_keys=[(id_col, "ascending"), ("pos", "ascending")]
    )
    t = t.take(idx)
    ids = t.column(id_col).combine_chunks()
    pos = t.column("pos").to_numpy()
    n = len(pos)
    if not n:
        return pa.table(
            {
                id_col: ids.slice(0, 0),
                "start_tok": pa.array([], pa.int64()),
                "end_tok": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    new = np.ones(n, bool)
    if n > 1:
        neq = pc.invert(pc.equal(ids.slice(1), ids.slice(0, n - 1)))
        new[1:] = (
            neq.to_numpy(zero_copy_only=False).astype(bool)
            | (pos[1:] > pos[:-1] + L)
        )
    starts = np.flatnonzero(new)
    lasts = np.append(starts[1:], n) - 1
    return pa.table(
        {
            id_col: ids.take(pa.array(starts)),
            "start_tok": pa.array(pos[starts]),
            "end_tok": pa.array(pos[lasts] + L - 1),
            "n_tokens": pa.array(pos[lasts] - pos[starts] + L),
        }
    )


def substring_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 12,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Maximal repeated-span table over any (id, text) dataset — see module
    docstring for the exact semantics and the two-shuffle shape."""
    L = int(min_tokens)
    wins = ds.map_batches(
        lambda b: _window_rows(b, id_col, text_col, L),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rep = grouped_partitions(
        wins, "wh", lambda t: _repeated_occurrences(t, id_col), num_parts
    )
    return grouped_partitions(
        rep, id_col, lambda t: _merge_spans(t, id_col, L), num_parts
    )


def substring_dedup_documents(sf_dir: str, min_tokens: int = 12):
    """Driver entry over the ``documents`` table; value-exact vs
    SUBSTRING_DEDUP_DOCUMENTS_SQL (the window semantics are fully
    SQL-expressible, so this ships with a DuckDB oracle, not rows-only)."""
    import pyarrow.parquet as pq

    from mediachain_indexer_ray.config import sized_parallelism
    from mediachain_indexer_ray.sources.transcripts import read_parquet_wide

    ds = read_parquet_wide(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    try:
        rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    except Exception:
        rows = None
    # window rows ≈ tokens ≈ docs × ~100 at fixture scale; partition for that
    return substring_dedup(
        ds, min_tokens=min_tokens,
        num_parts=sized_parallelism((rows or 0) * 100 or None, 50_000),
    )


def _substring_sql(L: int) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ts FROM documents
), win AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p,
         array_to_string(ts[p+1 : p+{L}], ' ') AS w
  FROM tok, UNNEST(range(0, GREATEST(len(ts) - {L} + 1, 0))) AS g(p)
), rep AS (
  SELECT w FROM win GROUP BY w HAVING count(*) >= 2
), cov AS (
  SELECT doc_id, p FROM win WHERE w IN (SELECT w FROM rep)
), flagged AS (
  SELECT doc_id, p,
         CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                   OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {L}
              THEN 1 ELSE 0 END AS new
  FROM cov
), grp AS (
  SELECT doc_id, p, SUM(new) OVER (PARTITION BY doc_id ORDER BY p) AS g
  FROM flagged
)
SELECT doc_id, MIN(p) AS start_tok, MAX(p) + {L} - 1 AS end_tok,
       CAST(MAX(p) - MIN(p) + {L} AS BIGINT) AS n_tokens
FROM grp GROUP BY doc_id, g
"""


SUBSTRING_DEDUP_DOCUMENTS_SQL = _substring_sql(12)
