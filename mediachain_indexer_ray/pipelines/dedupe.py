"""The flagship batch-dedupe pipeline (SURVEY.md §3.2) — the Ray-Data-native
re-expression of ``mediachain-indexer-models dedupe_reindex``
(``[ref: mc_models.py — unverified]``):

    read transcripts ─ map_batches(normalize)
      → [shuffle conv_id]     assembly (stable turn order)
      → map_batches           signatures (digest + MinHash + SimHash)
      → [shuffle digest]      exact dedup → representatives + identity edges
      → map_batches           LSH band emission
      → [shuffle band_key]    salted pair emission (hot-block split, caps)
      → [shuffle (a,b)]       cross-band pair dedup + simhash prefilter
      → hash join ×2          attach feature text
      → actor pool            pairwise scoring (JW/Lev/SimHash-cos/Jaccard)
      → filter τ              accepted edges (∪ exact edges)
      → iterated shuffles     Hash-to-Min connected components
      → clusters (conv_id, cluster_id) + per-stage lineage manifests

Unlike the reference, nothing lives only in driver memory; every stage is a
Parquet checkpoint and the job resumes from the last completed one.
"""

from __future__ import annotations

import ray.data

from mediachain_indexer_ray.config import Config, default_parallelism, sized_parallelism
from mediachain_indexer_ray.sources.transcripts import read_transcripts
from mediachain_indexer_ray.stages.assemble import assemble
from mediachain_indexer_ray.stages.blocking import (
    dedup_pairs,
    emit_bands,
    emit_pairs,
    exact_dedup_mixed,
    simhash_prefilter,
    split_exact_dedup,
)
from mediachain_indexer_ray.stages.closure import connected_components
from mediachain_indexer_ray.stages.scoring import attach_pair_texts, score_pairs
from mediachain_indexer_ray.stages.signatures import signatures
from mediachain_indexer_ray.state.checkpoint import CheckpointManager
import pyarrow as pa


def _parquet_rows(path: str) -> int | None:
    """Row count from parquet footers only (no data read)."""
    import os

    import pyarrow.parquet as pq

    try:
        if os.path.isfile(path):
            return pq.read_metadata(path).num_rows
        total = 0
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(root, f)).num_rows
        return total or None
    except Exception:  # pragma: no cover — fall back to CPU-derived P
        return None


def dedupe_pipeline(
    transcripts_path: str,
    cfg: Config,
    work_dir: str | None = None,
) -> dict[str, ray.data.Dataset]:
    """Run (or resume) the full dedupe. Returns datasets for the key outputs:
    conversations, signatures, pairs (scored), clusters."""
    work = work_dir or cfg.work_dir
    # async checkpoint writes: the parquet lands on disk in the background
    # while the next stage computes from the plasma-backed output; the
    # manifest is written last, so resume never sees a partial checkpoint
    cp = CheckpointManager(work, cfg.content_hash(), async_writes=True)

    # Partition counts are data-aware (rows from parquet metadata / upstream
    # manifests), capped at 2×cluster CPUs: at 100 TB every stage saturates the
    # CPU cap; at test scale tiny shuffles stop paying 64 tasks of overhead
    # for kilobytes of data (SURVEY.md §4 partitioning).
    n_turns = _parquet_rows(transcripts_path)

    fp_in = cp.input_fingerprint(transcripts_path)
    # 25k turns/part (not 100k): assembly's per-row cost (sort + per-turn
    # string concat) is ~4× a plain map stage's, so 100k-row parts left a
    # 32-CPU box 5-wide on a 470k-turn corpus (back-to-back sweep: 12.2 s at
    # 5 parts, 4.0 s at 19, 3.3 s at 38 — diminishing past cluster width).
    # At 12M+ turns the 2×CPU cap binds either way, so the scaling-protocol
    # legs are unchanged; this also widens the downstream signatures stage,
    # which inherits the conversations block layout.
    convs = cp.run(
        "conversations",
        fp_in,
        lambda: assemble(
            # `tool` never reaches assembly's output — prune it at the read so
            # it doesn't ride shuffle #1 (the full-corpus conv_id exchange)
            read_transcripts(
                transcripts_path,
                columns=["conv_id", "turn_idx", "role", "text", "ts"],
            ),
            cfg,
            num_parts=sized_parallelism(n_turns, 25_000),
        ),
    )

    fp_convs = cp.input_fingerprint("conversations")
    sigs = cp.run(
        "signatures",
        fp_convs,
        lambda: signatures(convs, cfg),
    )

    n_convs = cp.manifest("conversations")["rows"]
    fp_sigs = cp.input_fingerprint("signatures")
    mixed = cp.run(
        "exact_dedup",
        fp_sigs,
        lambda: exact_dedup_mixed(
            sigs, cfg, num_parts=sized_parallelism(n_convs, 20_000)
        ),
    )
    reps, exact_edges = split_exact_dedup(mixed)

    from mediachain_indexer_ray.registry import get_model

    model = get_model(cfg.duplicate_mode)

    if model.use_lsh:
        from mediachain_indexer_ray.stages.scoring import (
            BROADCAST_MAX_ROWS,
            build_text_lut_ref_from_reps,
        )

        fp_exact = cp.input_fingerprint("exact_dedup")
        n_mixed = cp.manifest("exact_dedup")["rows"]
        # Prefetch the scorer's broadcast LUT CONCURRENTLY with the band→pair
        # shuffle below: the LUT depends only on reps (already plasma-backed)
        # and its build — a parallel prep job plus driver-serial key argsort /
        # value concat / plasma put — is a FIXED cost at any CPU count that
        # otherwise sits serially at the head of the pairs_scored wall
        # (measured ~30 s fixed in that stage on the 12M-turn corpus).
        # Started only when the pairs stage is about to RUN: an invalid pairs
        # checkpoint implies pairs_scored reruns too (downstream fingerprints
        # fold the fresh manifest hash), while on resume nothing is wasted.
        lut_box: dict = {}
        scored_counters: dict = {}
        lut_thread = None
        if n_mixed <= BROADCAST_MAX_ROWS and not cp.valid("pairs", fp_exact):
            import threading
            import time as _time

            def _prefetch_lut() -> None:
                t0 = _time.time()
                try:
                    lut_box["ref"] = build_text_lut_ref_from_reps(reps, cfg)
                    scored_counters["lut_prefetch_sec"] = round(
                        _time.time() - t0, 3
                    )
                except BaseException as e:  # re-raised at the use site
                    lut_box["err"] = e

            lut_thread = threading.Thread(
                target=_prefetch_lut, name="lut-prefetch", daemon=True
            )
            lut_thread.start()
        # 25k band-rows/part (not 250k): pair emission + cross-band dedup do
        # real per-row work (salting, canonicalization, truncation counters),
        # and 250k-row parts ran the whole chain 4-wide on a 32-CPU box —
        # measured 16.6 s → 4.2 s on a 717k-band-row corpus by widening to
        # cluster width. At scale the 2×CPU cap binds either way.
        P_bands = sized_parallelism(n_mixed * cfg.num_bands, 25_000)
        # adaptive band batch: sort-shuffle width follows INPUT block count,
        # so a small rep table must fan out to cluster width here or the
        # pair/dedup chain serializes to ~ceil(n_mixed/4096) tasks
        band_bs = max(64, min(cfg.batch_size_rows,
                              -(-n_mixed // default_parallelism())))
        n_reps = n_mixed  # broadcast-vs-shuffle choice (exact_dedup manifest)

        def _run_pairs() -> ray.data.Dataset:
            return cp.run(
                "pairs",
                fp_exact,
                lambda: dedup_pairs(
                    emit_pairs(emit_bands(reps, cfg, band_bs), cfg,
                               num_parts=P_bands),
                    cfg,
                    num_parts=P_bands,
                ),
            )

        def _build_scored() -> ray.data.Dataset:
            if n_reps <= BROADCAST_MAX_ROWS:
                # broadcast path: prefilter + text attach FUSED into the scorer
                # actors; the LUT was prefetched concurrently with the pairs
                # stage when possible (see above), else built here from the
                # plasma-backed reps (one parallel select job), plasma-shared
                if lut_thread is not None:
                    lut_thread.join()
                    if "err" in lut_box:
                        raise lut_box["err"]
                    lut_ref = lut_box["ref"]
                else:
                    lut_ref = build_text_lut_ref_from_reps(reps, cfg)
                return score_pairs(
                    pairs, cfg, scorer_cls=model.scorer_cls, lut_ref=lut_ref,
                    pairs_rows=cp.manifest("pairs")["rows"],
                )
            # large-side path: shuffle join attaches texts, then score.
            # materialize() between join and scorer is REQUIRED, not a
            # convenience: the join's hash-shuffle aggregator actors and the
            # scorer's fixed actor pool are both reserved eagerly, and on a
            # small cluster their combined CPU demand deadlocks a single
            # streaming execution (observed: 4-CPU test cluster hung 20+ min
            # with idle aggregators). Splitting executions lets the join
            # release its actors first; the joined pairs land in plasma and
            # spill if large — this path checkpoints pairs_scored right after
            # anyway.
            P_join = sized_parallelism(cp.manifest("pairs")["rows"], 100_000)
            with_texts = attach_pair_texts(
                simhash_prefilter(pairs, cfg), reps, cfg, P_join,
                reps_rows=n_reps,
            ).materialize()
            return score_pairs(
                with_texts,
                cfg,
                scorer_cls=model.scorer_cls,
                pairs_rows=cp.manifest("pairs")["rows"],
            )

        # lut_prefetch_sec lands in the manifest counters (populated by the
        # prefetch thread before _build_scored joins it). The finally joins
        # the prefetch thread and drops the driver-side LUT handle even when
        # the pairs stage raises or _build_scored is skipped — otherwise the
        # prefetched ray.put ObjectRef stays pinned in plasma for the rest of
        # the run (ADVICE r3).
        try:
            pairs = _run_pairs()
            fp_pairs = cp.input_fingerprint("exact_dedup", "pairs")
            scored = cp.run("pairs_scored", fp_pairs, _build_scored,
                            counters=scored_counters)
        finally:
            if lut_thread is not None:
                lut_thread.join()
            lut_box.pop("ref", None)
        fp_scored = cp.input_fingerprint("exact_dedup", "pairs_scored")

        def _build_edges() -> ray.data.Dataset:
            accepted = scored.filter(expr="accepted == True").select_columns(["a", "b"])
            return accepted.union(exact_edges)

    else:  # "baseline": exact-digest blocking only (ref VectorsBaseline)
        pairs = scored = None
        fp_scored = cp.input_fingerprint("exact_dedup")

        def _build_edges() -> ray.data.Dataset:
            return exact_edges

    edges = cp.run("edges", fp_scored, _build_edges)

    fp_edges = cp.input_fingerprint("edges", "signatures")

    def _build_clusters() -> ray.data.Dataset:
        from mediachain_indexer_ray.stages.closure import attach_string_labels

        n_edges = cp.manifest("edges")["rows"]
        # 25k rows/part (not 100k): closure frontiers are narrow fixed-width
        # uint64 tables, and a row-count-derived 8 partitions left half a
        # 16-CPU box idle through every round (measured: clusters stage scaled
        # 1.7× from 4→16 CPUs until this; the 2×CPU cap still bounds it above)
        comp, node_labels = connected_components(
            edges, cfg, num_parts=sized_parallelism(2 * n_edges, 25_000),
            n_edges=n_edges, want_node_labels=True,
        )
        # string conv_ids re-attach ONCE here (VERDICT r3 #3): singletons are
        # final in one broadcast map; edge-node rows take a small uint64-label
        # shuffle (O(edge nodes)) to agree on the min-string cluster id
        return attach_string_labels(
            sigs.select_columns(["conv_id"]),
            comp,
            node_labels,
            label_parts=sized_parallelism(2 * n_edges, 25_000),
            attach_parts=sized_parallelism(
                cp.manifest("signatures")["rows"], 100_000
            ),
        )

    clusters = cp.run("clusters", fp_edges, _build_clusters)
    cp.flush()  # join background checkpoint writes — durable before return

    return {
        "conversations": convs,
        "signatures": sigs,
        "pairs": scored,  # None under duplicate_mode="baseline"
        "edges": edges,
        "clusters": clusters,
        "_checkpoints": cp,  # type: ignore[dict-item]
    }
