"""Pairwise reranking: the transcript-native ``dedupe_batch``.

The reference reranks candidate pairs with perceptual-hash hamming distance and
term overlap, thresholded (``[ref: mc_models.py dedupe_batch — unverified]``,
SURVEY.md T2/F1/F2). Here: a STATEFUL ACTOR POOL (`map_batches(PairScorer,
concurrency=N)`) computing batched n-gram Jaccard, SimHash-cosine, Jaro-Winkler
and banded Levenshtein, combined into a weighted score against threshold τ
(BASELINE.json:6 "actor pool running batched Jaro-Winkler/Levenshtein/
SimHash-cosine scoring").

Cost control: the expensive Levenshtein DP only runs on pairs whose cheap
features leave the decision ambiguous; clear accepts/rejects short-circuit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from mediachain_indexer_ray.config import Config
from mediachain_indexer_ray.functions.simhash import hamming64, simhash_cosine
from mediachain_indexer_ray.functions.strsim import (
    jaccard_from_lut,
    jaro_winkler_batch,
    levenshtein_ratio_batch,
    shingle_set_table,
)


class PairScorer:
    """Callable class for map_batches actor pools: per-actor setup in
    __init__ (once), batched scoring in __call__ (per batch)."""

    # per-actor shingle-set cache bound (entries ≈ 4 KB each → ~512 MB cap);
    # hot-block endpoints recur across many pair batches, so caching their
    # shingle sets is the difference between shingling O(pairs) texts and
    # O(unique conversations) texts per actor
    CACHE_MAX_ENTRIES = 131_072

    def __init__(self, cfg: Config, lut_ref=None):
        from mediachain_indexer_ray.functions.threads import pin_arrow_threads

        pin_arrow_threads()  # actor-side: the pool provides the parallelism
        self.cfg = cfg
        # Precompute anything reusable across batches. The numpy kernels are
        # parameterized by these; keeping them here mirrors the reference's
        # one-model-instance-per-run registry (SURVEY.md T2).
        self.w = np.array(
            [cfg.w_jaccard, cfg.w_cosine, cfg.w_jw, cfg.w_lev], np.float64
        )
        self.tau = cfg.tau
        # join-path shingle-set cache: append-only SEGMENTS of
        # (sorted uint64 id-hash keys, offsets, uint32 set values), probed with
        # vectorized searchsorted and compacted when the segment count grows —
        # no python dict probing, no .to_pylist() in the hot loop (VERDICT r1
        # #6). Entries are bounded by CACHE_MAX_ENTRIES (clear-all on overflow,
        # same policy as the round-1 dict).
        self._seg: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._seg_rows = 0
        # broadcast feature-text lookup (ONE zero-copy plasma get per actor):
        # when set, __call__ accepts bare candidate pairs and does the simhash
        # prefilter + text attach itself — three pipeline stages folded into
        # the actor pool, no intermediate block materialization
        self._lut_keys = self._lut_texts = None
        self._lut_sh_off = self._lut_sh_val = None
        self._lut_perm = None  # sorted-pos → storage-row (None = identity)
        if lut_ref is not None:
            lut = ray.get(lut_ref)
            if isinstance(lut, pa.Table):  # sorted-table layout
                self._lut_keys = np.asarray(lut.column("key").to_numpy())
                self._lut_texts = lut.column("feature_text")
                sh = lut.column("scorer_shingles").combine_chunks()
                self._lut_sh_off = np.asarray(sh.offsets.to_numpy())
                self._lut_sh_val = np.asarray(sh.values.to_numpy())
            else:  # (sorted_keys, perm, off, val, text_chunked): unsorted
                # storage addressed through the key permutation — built
                # without any driver-side payload gather
                (self._lut_keys, self._lut_perm, self._lut_sh_off,
                 self._lut_sh_val, self._lut_texts) = lut

    def _locate(self, b: pa.Table):
        """LUT row positions for both endpoints — NO text gather (texts are
        fetched later, only for the borderline band that needs the DP
        kernels). Returns ((pos_a, hit_a), (pos_b, hit_b))."""
        from mediachain_indexer_ray.functions.hashing import cid64

        locs = []
        for col in ("a", "b"):
            h = cid64(b.column(col).combine_chunks())
            if len(self._lut_keys) == 0:
                locs.append((np.zeros(b.num_rows, np.int64),
                             np.zeros(b.num_rows, bool)))
                continue
            pos = np.clip(np.searchsorted(self._lut_keys, h), 0, len(self._lut_keys) - 1)
            hit = self._lut_keys[pos] == h
            if self._lut_perm is not None:
                pos = self._lut_perm[pos]  # sorted position → storage row
            locs.append((pos, hit))
        return locs[0], locs[1]

    def _texts_at(self, pos: np.ndarray, hit: np.ndarray) -> pa.Array:
        import pyarrow.compute as pc

        if self._lut_keys is None or len(self._lut_keys) == 0:
            return pa.array([""] * len(pos), pa.string())
        idx = pa.array(pos, pa.int64(), mask=~hit)
        return pc.fill_null(self._lut_texts.take(idx), "")

    def _probe(self, uniq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Locate sorted-unique id-hashes across cache segments:
        (segment id or -1, position within segment)."""
        seg_id = np.full(len(uniq), -1, np.int32)
        pos = np.zeros(len(uniq), np.int64)
        for si, (keys, _off, _val) in enumerate(self._seg):
            if not len(keys):
                continue
            p = np.clip(np.searchsorted(keys, uniq), 0, len(keys) - 1)
            hit = (keys[p] == uniq) & (seg_id < 0)
            seg_id[hit] = si
            pos[hit] = p[hit]
        return seg_id, pos

    def _add_segment(self, keys: np.ndarray, off: np.ndarray, val: np.ndarray) -> int:
        """Append a pre-sorted miss segment; compact when fragmented."""
        if self._seg_rows + len(keys) > self.CACHE_MAX_ENTRIES:
            self._seg.clear()
            self._seg_rows = 0
        self._seg.append((keys, off.astype(np.int64), val))
        self._seg_rows += len(keys)
        if len(self._seg) > 32:
            self._compact()
        return len(self._seg) - 1

    def _compact(self) -> None:
        """Merge all segments into one sorted segment (amortized: runs every
        ~32 miss batches; O(rows log rows) keys sort + one values gather)."""
        keys = np.concatenate([s[0] for s in self._seg])
        counts = np.concatenate([np.diff(s[1]) for s in self._seg])
        shifts = np.cumsum([0] + [len(s[2]) for s in self._seg[:-1]])
        starts = np.concatenate(
            [s[1][:-1] + sh for s, sh in zip(self._seg, shifts)]
        )
        vals = np.concatenate([s[2] for s in self._seg])
        order = np.argsort(keys, kind="stable")
        c, st = counts[order], starts[order]
        off = np.zeros(len(keys) + 1, np.int64)
        np.cumsum(c, out=off[1:])
        total = int(off[-1])
        within = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], c)
        self._seg = [(keys[order], off, vals[np.repeat(st, c) + within])]

    def _bank(self, seg_id: np.ndarray, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Gather the addressed sets into one batch-local (offsets, values)
        bank, in input order — feeds jaccard_from_lut directly."""
        m = len(seg_id)
        counts = np.zeros(m, np.int64)
        for si, (_k, off, _v) in enumerate(self._seg):
            sel = seg_id == si
            if sel.any():
                p = pos[sel]
                counts[sel] = off[p + 1] - off[p]
        bank_off = np.zeros(m + 1, np.int64)
        np.cumsum(counts, out=bank_off[1:])
        bank_val = np.empty(int(bank_off[-1]), np.uint32)
        for si, (_k, off, val) in enumerate(self._seg):
            sel = np.flatnonzero(seg_id == si)
            if not len(sel):
                continue
            c = counts[sel]
            tot = int(c.sum())
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(c[:-1])]).astype(np.int64), c
            )
            src = np.repeat(off[pos[sel]], c) + within
            dest = np.repeat(bank_off[sel], c) + within
            bank_val[dest] = val[src]
        return bank_off, bank_val

    def _join_path_jaccard(self, batch: pa.Table, ta: pa.Array, tb: pa.Array) -> np.ndarray:
        """Jaccard for the shuffle-join path: endpoints are id-hashed
        (vectorized), sets resolved from the segmented cache with searchsorted;
        misses are shingled once per unique id per actor."""
        from mediachain_indexer_ray.functions.hashing import cid64

        n = batch.num_rows
        h = np.concatenate([
            cid64(batch.column("a").combine_chunks()),
            cid64(batch.column("b").combine_chunks()),
        ])
        uniq, first_occ, inv = np.unique(h, return_index=True, return_inverse=True)
        texts_all = None
        # resolve loop (≤2 real iterations): a clear-on-overflow inside
        # _add_segment can evict entries that were hits on the first probe, so
        # re-probe and re-shingle until every unique endpoint resolves
        for _ in range(4):
            seg_id, pos = self._probe(uniq)
            miss = np.flatnonzero(seg_id < 0)
            if not len(miss):
                break
            if texts_all is None:
                texts_all = pa.concat_arrays([ta, tb])
            m_off, m_val = shingle_set_table(
                texts_all.take(pa.array(first_occ[miss], pa.int64())),
                self.cfg.shingle_k, self.cfg.scorer_sample_mod,
            )
            self._add_segment(uniq[miss], m_off, m_val)
        else:  # pragma: no cover — cache smaller than one batch's endpoints
            raise RuntimeError("scorer shingle cache cannot hold one batch")
        bank_off, bank_val = self._bank(seg_id, pos)
        hit = np.ones(len(h), bool)
        return jaccard_from_lut(
            bank_off, bank_val, inv[:n].astype(np.int64), hit[:n],
            inv[n:].astype(np.int64), hit[n:],
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        loc_a = loc_b = None
        if self._lut_keys is not None and "text_a" not in batch.column_names:
            # fused prefilter + attach (cheap, vectorized; SURVEY.md F1/J2)
            ham = hamming64(
                batch.column("simhash_a").to_numpy(),
                batch.column("simhash_b").to_numpy(),
            )
            batch = batch.filter(pa.array(ham <= cfg.simhash_prefilter_bits))
            if batch.num_rows:
                loc_a, loc_b = self._locate(batch)
        n = batch.num_rows
        if n == 0:
            return _empty_scored()
        ta = tb = None
        if loc_a is None:  # join path carries texts in the batch
            ta = batch.column("text_a").combine_chunks()
            tb = batch.column("text_b").combine_chunks()
        # Decision cascade (the throughput heart of the reranker):
        #   1. sampled-shingle Jaccard + SimHash-cosine — cheap, vectorized;
        #   2. fast-accept (jac ≥ fast_accept_jaccard: unreachable by
        #      different-content conversations) / fast-reject (jac < lo AND
        #      cos < lo: unreachable by ≤10%-edit near-dups);
        #   3. ONLY the borderline band pays for the Jaro-Winkler +
        #      banded-Levenshtein DP kernels and the full weighted score.
        # Hot viral blocks are dominated by clear accepts/rejects, so the DP
        # work is O(borderline), not O(pairs).
        if loc_a is not None:
            jac = jaccard_from_lut(
                self._lut_sh_off, self._lut_sh_val,
                loc_a[0], loc_a[1], loc_b[0], loc_b[1],
            )
        else:  # join path: shingle on demand, cached per actor
            jac = self._join_path_jaccard(batch, ta, tb)
        cos = simhash_cosine(
            batch.column("simhash_a").to_numpy(), batch.column("simhash_b").to_numpy()
        )
        w_jac, w_cos, w_jw, w_lev = self.w
        fast_acc = jac >= cfg.fast_accept_jaccard
        fast_rej = (jac < cfg.fast_reject_jaccard) & (cos < cfg.fast_reject_cosine)
        mid = ~(fast_acc | fast_rej)

        jw = np.zeros(n, np.float64)
        lev = np.zeros(n, np.float64)
        if mid.any():
            if loc_a is not None:
                # texts are gathered ONLY here, only for the borderline band
                tam = self._texts_at(loc_a[0][mid], loc_a[1][mid])
                tbm = self._texts_at(loc_b[0][mid], loc_b[1][mid])
            else:
                m = pa.array(mid)
                tam, tbm = ta.filter(m), tb.filter(m)
            jw[mid] = jaro_winkler_batch(tam, tbm, cfg.jw_max_chars)
            lev[mid] = levenshtein_ratio_batch(
                tam, tbm, cfg.lev_max_chars, cfg.lev_band_radius
            )
        # monotone reported score on the fast paths (decision = accepted flag):
        # accepts land in [τ, 1], rejects keep their (low) cheap-feature score.
        jw[fast_acc] = 1.0
        lev[fast_acc] = jac[fast_acc]

        score = w_jac * jac + w_cos * cos + w_jw * jw + w_lev * lev
        score[fast_acc] = np.maximum(score[fast_acc], self.tau)
        accepted = fast_acc | (mid & (score >= self.tau))
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "n_bands": batch.column("n_bands"),
                "score_jaccard": pa.array(jac.astype(np.float32)),
                "score_cosine": pa.array(cos.astype(np.float32)),
                "score_jw": pa.array(jw.astype(np.float32)),
                "score_lev": pa.array(lev.astype(np.float32)),
                "score": pa.array(score.astype(np.float32)),
                "accepted": pa.array(accepted),
            }
        )


def _empty_scored() -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], pa.uint64()),
            "b": pa.array([], pa.uint64()),
            "n_bands": pa.array([], pa.int32()),
            "score_jaccard": pa.array([], pa.float32()),
            "score_cosine": pa.array([], pa.float32()),
            "score_jw": pa.array([], pa.float32()),
            "score_lev": pa.array([], pa.float32()),
            "score": pa.array([], pa.float32()),
            "accepted": pa.array([], pa.bool_()),
        }
    )


TASK_SCORE_MAX_PAIRS = 200_000  # below this, broadcast-path scoring runs as
                                # plain tasks on warm workers; above, the
                                # fixed actor pool amortizes its spawns

BROADCAST_MAX_ROWS = 2_000_000  # LUT ≲ ~10 GB plasma (one zero-copy object
                                # per node); beyond this the shuffle join path
                                # attaches texts instead


def attach_pair_texts(
    pairs: ray.data.Dataset,
    reps: ray.data.Dataset,
    cfg: Config,
    num_partitions: int,
    reps_rows: int | None = None,
) -> ray.data.Dataset:
    """Attach the representatives' feature text to both pair endpoints
    (SURVEY.md J2 — the reference's mget by id). Hybrid strategy:

    * small side (≤ BROADCAST_MAX_ROWS, known from the upstream manifest):
      ``ray.put`` the id→text map ONCE and look it up inside ``map_batches`` —
      no shuffle at all (the task brief's broadcast-small-sides rule).
    * large side: two hash-shuffle ``Dataset.join``s, partitioned to the
      cluster — the 100-TB path.

    The pair table carries only ids + 8-byte simhashes through the earlier
    shuffles either way; text payloads attach exactly once, here."""
    side = reps.select_columns(["conv_id", "feature_text"])
    if reps_rows is not None and reps_rows <= BROADCAST_MAX_ROWS:
        from mediachain_indexer_ray.functions.hashing import cid64

        tabs = [t for t in ray.get(side.to_arrow_refs()) if t.num_rows > 0]
        # broadcast an ARROW table keyed by sorted uint64 id-hash: plasma gets
        # are zero-copy for Arrow buffers, so every task maps it for free — a
        # pickled python dict would be re-deserialized per task (O(rows) each)
        lut_tab = pa.concat_tables(tabs).combine_chunks() if tabs else pa.table(
            {"conv_id": pa.array([], pa.string()),
             "feature_text": pa.array([], pa.string())}
        )
        key = cid64(lut_tab.column("conv_id").combine_chunks())
        order = np.argsort(key)
        lut_tab = pa.table(
            {
                "key": pa.array(key[order]),
                "feature_text": lut_tab.column("feature_text").take(pa.array(order)),
            }
        )
        lut_ref = ray.put(lut_tab)

        def _attach(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lut = ray.get(lut_ref)  # zero-copy Arrow
            keys = np.asarray(lut.column("key").to_numpy())
            texts = lut.column("feature_text")
            out_cols = []
            for col in ("a", "b"):
                h = cid64(b.column(col).combine_chunks())
                if len(keys) == 0:
                    out_cols.append(pa.array([""] * b.num_rows, pa.string()))
                    continue
                pos = np.searchsorted(keys, h)
                pos_c = np.clip(pos, 0, len(keys) - 1)
                hit = keys[pos_c] == h
                take_idx = pa.array(pos_c, pa.int64(), mask=~hit)  # null → miss
                out_cols.append(pc.fill_null(texts.take(take_idx), ""))
            return b.append_column("text_a", out_cols[0]).append_column(
                "text_b", out_cols[1]
            )

        return pairs.map_batches(_attach, batch_format="pyarrow", zero_copy_batch=True)

    from mediachain_indexer_ray.functions.hashing import cid64

    def _keyed(name: str, text_name: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    name: pa.array(cid64(b.column("conv_id").combine_chunks())),
                    text_name: b.column("feature_text"),
                }
            )

        return _f

    a_side = side.map_batches(
        _keyed("a", "text_a"), batch_format="pyarrow", zero_copy_batch=True
    )
    b_side = side.map_batches(
        _keyed("b", "text_b"), batch_format="pyarrow", zero_copy_batch=True
    )
    out = pairs.join(
        a_side, join_type="inner", num_partitions=num_partitions, on=("a",)
    )
    return out.join(
        b_side, join_type="inner", num_partitions=num_partitions, on=("b",)
    )


def build_text_lut_ref_from_reps(reps: ray.data.Dataset, cfg: Config):
    """Broadcast LUT built from the PLASMA-BACKED reps dataset with the CPU
    work (id hashing, text truncation, set flattening) in a PARALLEL
    map_batches; the driver only argsorts the 8-byte keys and keeps the
    PERMUTATION — the big text/set payloads are never gathered into sorted
    order (round 1 concat+combined+took ~1.5 GB on the driver: a fixed ~6 s
    serial cost at every CPU count, measured on the 12M-turn corpus).

    Layout: (sorted_keys, perm, set_offsets, set_values, text ChunkedArray) —
    lookups go pos_sorted → perm → row in unsorted storage."""
    import pyarrow.compute as pc

    from mediachain_indexer_ray.functions.hashing import cid64

    text_cap = max(cfg.jw_max_chars, cfg.lev_max_chars)

    def _prep(b: pa.Table) -> pa.Table:
        from mediachain_indexer_ray.functions.threads import pin_arrow_threads

        pin_arrow_threads()
        key = cid64(b.column("conv_id").combine_chunks())
        text = pc.utf8_slice_codeunits(
            b.column("feature_text").combine_chunks(), 0, text_cap
        )
        if isinstance(text, pa.ChunkedArray):  # pragma: no cover
            text = text.combine_chunks()
        sh = b.column("scorer_shingles").combine_chunks()
        return pa.table(
            {"key": pa.array(key), "feature_text": text,
             "scorer_shingles": sh}
        )

    side = reps.select_columns(["conv_id", "feature_text", "scorer_shingles"])
    prepped = side.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    tabs = [t for t in ray.get(prepped.to_arrow_refs()) if t.num_rows > 0]
    if not tabs:
        return ray.put((
            np.empty(0, np.uint64), np.empty(0, np.int64),
            np.zeros(1, np.int64), np.empty(0, np.uint32),
            pa.chunked_array([pa.array([], pa.string())]),
        ))
    from mediachain_indexer_ray.functions.threads import threaded_concat

    keys = np.concatenate(
        [np.asarray(t.column("key").to_numpy(zero_copy_only=False)) for t in tabs]
    )
    # per-block set storage concatenated ONCE (memcpy of uint32 values only,
    # THREADED — this VM's single-core memcpy is ~170 MB/s and the values run
    # to hundreds of MB, see functions.threads.threaded_concat); row offsets
    # rebuilt from per-row lengths — no per-row gather. flatten() yields each
    # block's row values contiguously in row order, so the concatenated
    # values line up with cumsum(lengths).
    lens_parts, val_parts = [], []
    for t in tabs:
        sh = t.column("scorer_shingles").combine_chunks()
        o = np.asarray(sh.offsets.to_numpy()).astype(np.int64)
        lens_parts.append(np.diff(o))
        val_parts.append(np.asarray(sh.flatten().to_numpy()))
    lens = np.concatenate(lens_parts)
    off = np.zeros(len(keys) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    val = (
        threaded_concat(val_parts)
        if any(len(v) for v in val_parts)
        else np.empty(0, np.uint32)
    )
    perm = np.argsort(keys, kind="stable").astype(np.int64)
    # ONE flattening copy of the (truncated) texts: per-batch borderline-band
    # gathers need a contiguous Array — ChunkedArray.take per scoring batch
    # costs more than this single build-time combine
    text = pa.chunked_array(
        [t.column("feature_text").combine_chunks() for t in tabs]
    ).combine_chunks()
    return ray.put((keys[perm], perm, off, val, text))


def build_text_lut_ref(checkpoint_dir: str, cfg: Config | None = None):
    """Broadcast LUT (sorted id-hash → text prefix + shingle set) built
    DIRECTLY from the exact_dedup checkpoint's parquet — a driver-side
    pq.read_table, no Ray job. The text is truncated to what the JW /
    Levenshtein kernels actually read (Jaccard uses the precomputed sets), so
    the plasma object stays small. Returns a plasma ref (zero-copy for every
    scorer actor)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from mediachain_indexer_ray.functions.hashing import cid64

    text_cap = max(cfg.jw_max_chars, cfg.lev_max_chars) if cfg else 192
    t = pq.read_table(
        checkpoint_dir, columns=["kind", "conv_id", "feature_text", "scorer_shingles"]
    )
    t = t.filter(pc.equal(t.column("kind"), 0))
    key = cid64(t.column("conv_id").combine_chunks())
    order = np.argsort(key)
    take = pa.array(order)
    text = pc.utf8_slice_codeunits(
        t.column("feature_text").combine_chunks(), 0, text_cap
    )
    if isinstance(text, pa.ChunkedArray):  # pragma: no cover
        text = text.combine_chunks()
    lut = pa.table(
        {
            "key": pa.array(key[order]),
            "feature_text": text.take(take),
            "scorer_shingles": t.column("scorer_shingles").combine_chunks().take(take),
        }
    )
    return ray.put(lut)


def score_pairs(
    pairs_with_text: ray.data.Dataset,
    cfg: Config,
    scorer_cls: type | None = None,
    lut_ref=None,
    pairs_rows: int | None = None,
) -> ray.data.Dataset:
    from mediachain_indexer_ray.config import default_parallelism

    # WIDTH GUARD: map_batches tasks are at least one input BLOCK, so a pair
    # set that upstream emitted as few blocks (small band-row corpora produce
    # P_bands=1 even when pair volume explodes quadratically — measured: 1500
    # homogeneous conversations → 436k pairs in ONE block → the whole scoring
    # stage ran on one core, 371 s instead of ~20) must be split to pool
    # width before scoring. repartition without shuffle is a single
    # split/coalesce pass over the (id,simhash)-narrow pair rows.
    try:
        cluster_cpus_pre = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover
        cluster_cpus_pre = 8
    if pairs_rows is not None and pairs_rows > 0:
        target_blocks = max(
            1, min(-(-pairs_rows // cfg.pair_batch_size), 2 * cluster_cpus_pre)
        )
        nb = None
        try:
            nb = pairs_with_text.num_blocks()
        except Exception:
            nb = None
        if nb is not None and nb < target_blocks:
            pairs_with_text = pairs_with_text.repartition(target_blocks)

    # fixed-size actor pool on ALL BUT ONE core: an autoscaling (1, hi) pool
    # ramps up too slowly and serializes the stage behind actor startup; the
    # input is a materialized (plasma-backed) pairs dataset, so there is no
    # upstream compute to starve — one core is left for the executor/driver
    # loop (a pool pinning EVERY core can deadlock small clusters). Round 1
    # sized this at default_parallelism()//4 ≈ half the cores, which left
    # 8 of 16 CPUs idle through the whole scoring stage.
    try:
        cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover
        cluster_cpus = 8
    if (
        lut_ref is not None
        and pairs_rows is not None
        and pairs_rows <= TASK_SCORE_MAX_PAIRS
    ):
        # small candidate set on the broadcast path: plain TASKS on the warm
        # worker pool instead of a fresh actor pool — per-call state is just
        # a zero-copy plasma get + weight vector (the segmented shingle cache
        # only serves the join path), while each actor spawn is a cold
        # process (~0.3-0.5 s) that can dominate the whole stage at this
        # size. The actor pool remains the scale path below.
        cls = scorer_cls or PairScorer

        def _score(b: pa.Table, _cache={}) -> pa.Table:
            inst = _cache.get("i")
            if inst is None:
                inst = _cache["i"] = cls(cfg, lut_ref)
            return inst(b)

        return pairs_with_text.map_batches(
            _score,
            batch_format="pyarrow",
            batch_size=cfg.pair_batch_size,
            zero_copy_batch=True,
        )
    # ~3/4 of the cores: all-but-one measured SLOWER on this box (15 cold
    # actor processes each ramp up and page-fault the broadcast LUT at once);
    # 3/4 keeps headroom for the executor loop and async checkpoint writes
    hi = max(cfg.scorer_concurrency, (3 * cluster_cpus) // 4)
    hi = max(1, min(hi, cluster_cpus - 1))
    if pairs_rows is not None:
        # data-aware pool: each actor spawn is a fresh process (~0.2-0.4 s
        # plus its LUT page-in), so a small candidate set must not pay for a
        # full-width pool — ≥30k pairs (≈1 s of kernel work) per actor, floor
        # scorer_concurrency. At scale the row term saturates hi, so sizing
        # still follows the cluster.
        hi = max(
            min(cfg.scorer_concurrency, hi),
            min(hi, -(-pairs_rows // 30_000)),
        )
    return pairs_with_text.map_batches(
        scorer_cls or PairScorer,
        fn_constructor_args=(cfg, lut_ref),
        batch_format="pyarrow",
        batch_size=cfg.pair_batch_size,
        concurrency=hi,
        num_cpus=1,
    )
