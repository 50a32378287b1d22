"""Deterministic synthetic transcript corpus + labeled duplicate ground truth.

Replaces the reference's eval-corpus machinery (Copydays download + variant
grouping, ``[ref: mc_datasets.py iter_copydays — unverified]``, SURVEY.md S2):
offline, seeded, and transcript-native. The duplicate-injection taxonomy is
pinned by /root/repo/FIXTURES.md §A2 — exact copies, near-text edits, turn-level
edits, metadata-only edits, and viral templates (hot-block skew on purpose).

All randomness flows from one seed via ``np.random.default_rng(seed + stream)``.
Output row order is byte-stable (sorted by conv_id, turn_idx) but consumers must
never rely on it — tests shuffle the row order to prove that.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from mediachain_indexer_ray import schema as S

_PUNCT = list(".,!?;:")


@dataclass(frozen=True)
class FixtureSpec:
    n_base: int = 200
    seed: int = 42
    dup_base_frac: float = 0.20     # share of base convs that get variants
    n_viral: int = 2                # viral-template bases (hot blocks)
    viral_fanout: int = 60          # variants per viral base
    vocab_size: int = 5000
    topic_size: int = 150
    n_topics: int = 0               # 0 → n_base // 25 (≥ 8)
    max_turns: int = 40
    n_hard_negative_pairs: int = 0  # 0 → n_base // 4
    n_random_negative_pairs: int = 0  # 0 → n_base // 2

    @property
    def topics(self) -> int:
        return self.n_topics or max(8, self.n_base // 25)


def _make_vocab(rng: np.random.Generator, n: int) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = set()
    out = []
    while len(out) < n:
        ln = int(rng.integers(3, 11))
        w = "".join(letters[rng.integers(0, 26, ln)])
        if w not in words:
            words.add(w)
            out.append(w)
    return out


def _gen_turn_text(rng: np.random.Generator, topic_words: list[str], filler: list[str]) -> str:
    n_words = int(np.exp(rng.uniform(np.log(4), np.log(300))))
    words = []
    for _ in range(n_words):
        pool = topic_words if rng.random() < 0.6 else filler
        words.append(pool[int(rng.integers(0, len(pool)))])
        if rng.random() < 0.08:
            words[-1] += _PUNCT[int(rng.integers(0, len(_PUNCT)))]
    return " ".join(words)


def _char_edit(rng: np.random.Generator, text: str, frac: float, vocab: list[str]) -> str:
    """Edit ≤ frac of chars: typos, word swaps, punctuation/whitespace noise."""
    if not text or frac <= 0:
        return text
    budget = max(1, int(len(text) * frac))
    chars = list(text)
    n_edits = int(rng.integers(1, budget + 1))
    spent = 0
    while spent < n_edits and chars:
        op = rng.random()
        p = int(rng.integers(0, len(chars)))
        if op < 0.45:  # substitute char
            chars[p] = chr(97 + int(rng.integers(0, 26)))
            spent += 1
        elif op < 0.6:  # delete char
            chars.pop(p)
            spent += 1
        elif op < 0.75:  # insert char
            chars.insert(p, chr(97 + int(rng.integers(0, 26))))
            spent += 1
        elif op < 0.9:  # punctuation / whitespace
            chars.insert(p, " " if rng.random() < 0.5 else _PUNCT[int(rng.integers(0, 6))])
            spent += 1
        else:  # swap a whole word (counts as several chars)
            s = "".join(chars)
            ws = s.split(" ")
            if len(ws) > 1:
                wi = int(rng.integers(0, len(ws)))
                cost = len(ws[wi])
                ws[wi] = vocab[int(rng.integers(0, len(vocab)))]
                chars = list(" ".join(ws))
                spent += max(1, cost)
            else:
                spent += 1
    return "".join(chars)


def _variant(rng, turns, kind: str, vocab):
    """turns: list of dicts(role, text, tool, dt). Returns edited copy."""
    out = [dict(t) for t in turns]
    if kind == "exact":
        return out
    if kind == "near":
        for t in out:
            t["text"] = _char_edit(rng, t["text"], 0.10, vocab)
        return out
    if kind == "turn":
        op = rng.random()
        if op < 0.4 and len(out) > 2:
            out.pop(int(rng.integers(1, len(out))))
        elif op < 0.7:
            p = int(rng.integers(1, len(out)))
            out.insert(p, dict(out[p - 1]))
        else:
            out.append(dict(out[-1]))
        for t in out:
            t["text"] = _char_edit(rng, t["text"], 0.05, vocab)
        return out
    if kind == "meta":
        for t in out:
            if rng.random() < 0.3:
                t["role"] = t["role"].capitalize()
            if t["tool"] and rng.random() < 0.5:
                t["tool"] = t["tool"] + "_v2"
            t["dt"] = t["dt"] + int(rng.integers(60, 600)) * 1_000_000
            t["text"] = _char_edit(rng, t["text"], 0.02, vocab)
        return out
    if kind == "viral":
        for t in out:
            t["text"] = _char_edit(rng, t["text"], 0.04, vocab)
        return out
    raise ValueError(kind)


_VARIANT_KINDS = ["exact", "near", "near", "turn", "meta"]  # ≈ taxonomy shares


def make_corpus(spec: FixtureSpec) -> tuple[pa.Table, pa.Table]:
    """Returns ``(transcripts, labels)`` Arrow tables (schemas §1.2 / LABELS
    minus block_key, which the blocker fills — see pipelines/evaluate.py)."""
    rng = np.random.default_rng(spec.seed)
    vocab = _make_vocab(rng, spec.vocab_size)
    filler = vocab[: spec.vocab_size // 10]
    topics = [
        [vocab[i] for i in rng.choice(spec.vocab_size, spec.topic_size, replace=False)]
        for _ in range(spec.topics)
    ]

    convs: dict[str, list[dict]] = {}
    conv_topic: dict[str, int] = {}
    families: dict[str, list[str]] = {}

    base_ids = [f"c{i:08d}" for i in range(spec.n_base)]
    t0 = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)
    for i, cid in enumerate(base_ids):
        topic = int(rng.integers(0, spec.topics))
        conv_topic[cid] = topic
        n_turns = int(rng.integers(2, spec.max_turns + 1))
        start = t0 + int(rng.integers(0, 300 * 24 * 3600)) * 1_000_000
        turns = []
        dt = start
        for ti in range(n_turns):
            if ti == 0 and rng.random() < 0.2:
                role = "system"
            elif rng.random() < 0.10:
                role = "tool"
            else:
                role = "user" if ti % 2 == 0 else "assistant"
            tool = f"tool_{int(rng.integers(0, 20))}" if role == "tool" else ""
            turns.append(
                dict(role=role, text=_gen_turn_text(rng, topics[topic], filler),
                     tool=tool, dt=dt)
            )
            dt += int(rng.integers(1, 300)) * 1_000_000
        convs[cid] = turns
        families[cid] = [cid]

    # duplicate injection (FIXTURES.md §A2)
    n_dup = int(spec.n_base * spec.dup_base_frac)
    dup_bases = [base_ids[i] for i in rng.choice(spec.n_base, n_dup, replace=False)]
    viral_bases = set(dup_bases[: spec.n_viral])
    for cid in dup_bases:
        if cid in viral_bases:
            n_var, kinds = spec.viral_fanout, None
        else:
            n_var = int(rng.integers(1, 5))
            kinds = None
        for j in range(n_var):
            kind = "viral" if cid in viral_bases else _VARIANT_KINDS[
                int(rng.integers(0, len(_VARIANT_KINDS)))
            ]
            vid = f"{cid}v{j}"
            convs[vid] = _variant(rng, convs[cid], kind, vocab)
            conv_topic[vid] = conv_topic[cid]
            families[cid].append(vid)

    # ---- transcripts table -------------------------------------------------
    rows_conv, rows_idx, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    for cid in sorted(convs):
        for ti, t in enumerate(convs[cid]):
            rows_conv.append(cid)
            rows_idx.append(ti)
            rows_role.append(t["role"])
            rows_text.append(t["text"])
            rows_tool.append(t["tool"])
            rows_ts.append(t["dt"])
    transcripts = pa.table(
        {
            "conv_id": pa.array(rows_conv, pa.string()),
            "turn_idx": pa.array(rows_idx, pa.int32()),
            "role": pa.array(rows_role, pa.string()),
            "text": pa.array(rows_text, pa.string()),
            "tool": pa.array(rows_tool, pa.string()),
            "ts": pa.array(np.asarray(rows_ts, dtype=np.int64)).cast(pa.timestamp("us")),
        }
    )

    # ---- labels ------------------------------------------------------------
    pos: list[tuple[str, str]] = []
    for fam in families.values():
        if len(fam) > 1:
            pos.extend(
                (a, b) if a < b else (b, a)
                for a, b in itertools.combinations(sorted(fam), 2)
            )
    # hard negatives: same topic, different family
    by_topic: dict[int, list[str]] = {}
    for cid in base_ids:
        by_topic.setdefault(conv_topic[cid], []).append(cid)
    neg: set[tuple[str, str]] = set()
    n_hard = spec.n_hard_negative_pairs or max(8, spec.n_base // 4)
    attempts = 0
    while len(neg) < n_hard and attempts < n_hard * 20:
        attempts += 1
        topic = int(rng.integers(0, spec.topics))
        members = by_topic.get(topic, [])
        if len(members) < 2:
            continue
        a, b = (members[int(rng.integers(0, len(members)))] for _ in range(2))
        if a != b:
            neg.add((min(a, b), max(a, b)))
    n_rand = spec.n_random_negative_pairs or max(8, spec.n_base // 2)
    while len(neg) < n_hard + n_rand:
        a, b = (base_ids[int(rng.integers(0, spec.n_base))] for _ in range(2))
        if a != b:
            neg.add((min(a, b), max(a, b)))
    pos_set = set(pos)
    neg = {p for p in neg if p not in pos_set}

    all_pairs = sorted(pos_set) + sorted(neg)
    labels = pa.table(
        {
            "a": pa.array([p[0] for p in all_pairs], pa.string()),
            "b": pa.array([p[1] for p in all_pairs], pa.string()),
            "is_dup": pa.array(
                [p in pos_set for p in all_pairs], pa.bool_()
            ),
        }
    )
    return S.validate(transcripts, S.TRANSCRIPTS, where="fixtures"), labels


def _chunk_tables(
    spec: FixtureSpec,
    chunk_idx: int,
    base_lo: int,
    base_hi: int,
    vocab: list[str],
    topics: list[list[str]],
    topic_of_base: np.ndarray,
    dup_base_idx: set[int],
    viral_base_idx: set[int],
) -> tuple[pa.Table, pa.Table]:
    """Generate bases [base_lo, base_hi) + their variants + positive labels.
    Deterministic per (spec.seed, chunk_idx) — independent of chunk count
    ONLY for a fixed chunk size, which parallel_write_corpus pins."""
    rng = np.random.default_rng(spec.seed + 7_000_000 + chunk_idx)
    filler = vocab[: spec.vocab_size // 10]
    t0 = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)

    convs: dict[str, list[dict]] = {}
    families: dict[str, list[str]] = {}
    for i in range(base_lo, base_hi):
        cid = f"c{i:08d}"
        topic = int(topic_of_base[i])
        n_turns = int(rng.integers(2, spec.max_turns + 1))
        start = t0 + int(rng.integers(0, 300 * 24 * 3600)) * 1_000_000
        turns = []
        dt = start
        for ti in range(n_turns):
            if ti == 0 and rng.random() < 0.2:
                role = "system"
            elif rng.random() < 0.10:
                role = "tool"
            else:
                role = "user" if ti % 2 == 0 else "assistant"
            tool = f"tool_{int(rng.integers(0, 20))}" if role == "tool" else ""
            turns.append(
                dict(role=role, text=_gen_turn_text(rng, topics[topic], filler),
                     tool=tool, dt=dt)
            )
            dt += int(rng.integers(1, 300)) * 1_000_000
        convs[cid] = turns
        families[cid] = [cid]
        if i in dup_base_idx:
            n_var = spec.viral_fanout if i in viral_base_idx else int(rng.integers(1, 5))
            for j in range(n_var):
                kind = "viral" if i in viral_base_idx else _VARIANT_KINDS[
                    int(rng.integers(0, len(_VARIANT_KINDS)))
                ]
                vid = f"{cid}v{j}"
                convs[vid] = _variant(rng, convs[cid], kind, vocab)
                families[cid].append(vid)

    rows_conv, rows_idx, rows_role, rows_text, rows_tool, rows_ts = [], [], [], [], [], []
    for cid in sorted(convs):
        for ti, t in enumerate(convs[cid]):
            rows_conv.append(cid)
            rows_idx.append(ti)
            rows_role.append(t["role"])
            rows_text.append(t["text"])
            rows_tool.append(t["tool"])
            rows_ts.append(t["dt"])
    transcripts = pa.table(
        {
            "conv_id": pa.array(rows_conv, pa.string()),
            "turn_idx": pa.array(rows_idx, pa.int32()),
            "role": pa.array(rows_role, pa.string()),
            "text": pa.array(rows_text, pa.string()),
            "tool": pa.array(rows_tool, pa.string()),
            "ts": pa.array(np.asarray(rows_ts, dtype=np.int64)).cast(pa.timestamp("us")),
        }
    )
    pos = []
    for fam in families.values():
        if len(fam) > 1:
            pos.extend(
                (a, b) if a < b else (b, a)
                for a, b in itertools.combinations(sorted(fam), 2)
            )
    pos_t = pa.table(
        {
            "a": pa.array([p[0] for p in pos], pa.string()),
            "b": pa.array([p[1] for p in pos], pa.string()),
        }
    )
    return transcripts, pos_t


_PAR_CHUNK_BASES = 2000  # pinned: chunk seeding depends on it


def parallel_write_corpus(
    spec: FixtureSpec, out_dir: str, shuffle_rows: bool = False
) -> tuple[str, str]:
    """Ray-parallel corpus generator for large benchmark corpora (the
    sequential :func:`write_corpus` is single-threaded Python and dominates
    bench wall time beyond ~1M turns). Produces a DIFFERENT (but equally
    deterministic) corpus than write_corpus for the same spec — fixtures used
    by tests keep the sequential path; bench uses this one.

    Shards per row-range on disk (part-*.parquet under <out>/transcripts/) —
    the resumable-output layout a 100 TB corpus would use."""
    import os

    import pyarrow.parquet as pq

    import ray

    rng = np.random.default_rng(spec.seed)
    vocab = _make_vocab(rng, spec.vocab_size)
    topics = [
        [vocab[i] for i in rng.choice(spec.vocab_size, spec.topic_size, replace=False)]
        for _ in range(spec.topics)
    ]
    topic_of_base = rng.integers(0, spec.topics, spec.n_base)
    n_dup = int(spec.n_base * spec.dup_base_frac)
    dup_idx_arr = rng.choice(spec.n_base, n_dup, replace=False)
    dup_base_idx = set(int(x) for x in dup_idx_arr)
    viral_base_idx = set(int(x) for x in dup_idx_arr[: spec.n_viral])

    chunk_fn = ray.remote(_chunk_tables)
    vocab_ref = ray.put(vocab)
    topics_ref = ray.put(topics)
    futs = []
    for ci, lo in enumerate(range(0, spec.n_base, _PAR_CHUNK_BASES)):
        futs.append(
            chunk_fn.remote(
                spec, ci, lo, min(lo + _PAR_CHUNK_BASES, spec.n_base),
                vocab_ref, topics_ref, topic_of_base, dup_base_idx, viral_base_idx,
            )
        )

    os.makedirs(out_dir, exist_ok=True)
    tdir = os.path.join(out_dir, "transcripts")
    os.makedirs(tdir, exist_ok=True)
    pos_tables = []
    shuffle_rng = np.random.default_rng(spec.seed + 999)
    for ci, fut in enumerate(futs):
        tt, pos_t = ray.get(fut)
        if shuffle_rows:
            tt = tt.take(shuffle_rng.permutation(tt.num_rows))
        pq.write_table(tt, os.path.join(tdir, f"part-{ci:05d}.parquet"),
                       row_group_size=16384)
        pos_tables.append(pos_t)

    pos = pa.concat_tables(pos_tables)
    pos_pairs = sorted(zip(pos.column("a").to_pylist(), pos.column("b").to_pylist()))
    pos_set = set(pos_pairs)
    base_ids = [f"c{i:08d}" for i in range(spec.n_base)]
    by_topic: dict[int, list[str]] = {}
    for i, cid in enumerate(base_ids):
        by_topic.setdefault(int(topic_of_base[i]), []).append(cid)
    neg: set[tuple[str, str]] = set()
    n_hard = spec.n_hard_negative_pairs or max(8, spec.n_base // 4)
    attempts = 0
    while len(neg) < n_hard and attempts < n_hard * 20:
        attempts += 1
        topic = int(rng.integers(0, spec.topics))
        members = by_topic.get(topic, [])
        if len(members) < 2:
            continue
        a, b = (members[int(rng.integers(0, len(members)))] for _ in range(2))
        if a != b:
            neg.add((min(a, b), max(a, b)))
    n_rand = spec.n_random_negative_pairs or max(8, spec.n_base // 2)
    while len(neg) < n_hard + n_rand:
        a, b = (base_ids[int(rng.integers(0, spec.n_base))] for _ in range(2))
        if a != b:
            neg.add((min(a, b), max(a, b)))
    neg = {p for p in neg if p not in pos_set}
    all_pairs = pos_pairs + sorted(neg)
    labels = pa.table(
        {
            "a": pa.array([p[0] for p in all_pairs], pa.string()),
            "b": pa.array([p[1] for p in all_pairs], pa.string()),
            "is_dup": pa.array([p in pos_set for p in all_pairs], pa.bool_()),
        }
    )
    lp = os.path.join(out_dir, "labels.parquet")
    pq.write_table(labels, lp)
    return tdir, lp


def write_corpus(spec: FixtureSpec, out_dir: str, shuffle_rows: bool = False) -> tuple[str, str]:
    """Write transcripts.parquet + labels.parquet under out_dir; returns paths.
    ``shuffle_rows`` permutes row order on disk (tests use it to prove assembly
    does not depend on file order)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    transcripts, labels = make_corpus(spec)
    if shuffle_rows:
        rng = np.random.default_rng(spec.seed + 999)
        transcripts = transcripts.take(rng.permutation(transcripts.num_rows))
    tp = os.path.join(out_dir, "transcripts.parquet")
    lp = os.path.join(out_dir, "labels.parquet")
    # small row groups: a single-file corpus must still split into many read
    # tasks (SURVEY.md §4 partitioning)
    pq.write_table(transcripts, tp, row_group_size=16384)
    pq.write_table(labels, lp)
    return tp, lp
