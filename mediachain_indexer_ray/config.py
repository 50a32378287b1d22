"""Engine configuration.

Analog of the reference's env-var config module (``[ref: mc_config.py — unverified]``,
SURVEY.md §2 X3): a single frozen dataclass, every tunable in one place, a single seed
from which ALL randomness derives, and a stable content hash so lineage manifests can
record exactly which configuration produced a checkpoint.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field, replace


@dataclass(frozen=True)
class Config:
    # ---- determinism -------------------------------------------------------
    seed: int = 42
    # bumped on breaking checkpoint-schema changes so stale checkpoints from
    # older engine versions are rebuilt, not reused (folds into content_hash)
    engine_schema_version: int = 5

    # ---- model selection (SURVEY.md X1: reference duplicate_mode) ----------
    duplicate_mode: str = "baseline_ng"   # "baseline" | "baseline_ng"

    # ---- text normalization / shingling (SURVEY.md M1, F7) -----------------
    shingle_k: int = 5          # char k-gram width for MinHash shingles
    feature_text_max_chars: int = 2048   # truncation for derived features only;
                                         # stored `text` is NEVER mutated

    # ---- MinHash / SimHash signatures (SURVEY.md M4) -----------------------
    sig_text_max_chars: int = 4096   # signature input cap (norm text): long
                                     # enough that band recall survives 10%
                                     # char edits (F1 gate), half the shingle
                                     # hashing cost of 8192; the scorer is the
                                     # final arbiter on its own 2048-char cap
    shingle_sample_mod: int = 2      # content-defined shingle sampling (1=off)
    num_perm: int = 128         # K minhash permutations
    num_bands: int = 32         # B bands ...
    band_rows: int = 4          # ... of R rows each; B*R must equal num_perm
    simhash_bits: int = 64

    # ---- blocking / skew control (SURVEY.md M6, A5, O1) --------------------
    hot_block_threshold: int = 64    # band groups larger than this get salted
    max_pairs_per_block: int = 4096  # hard cap on pairs emitted per (salted) block
    simhash_prefilter_bits: int = 26 # drop candidate pairs with hamming > this
                                     # (64-bit simhash; loose on purpose — recall
                                     # is protected by multi-band redundancy)

    # ---- pairwise scoring (SURVEY.md T2, F1, F2) ---------------------------
    lev_max_chars: int = 192    # banded-Levenshtein feature truncation
    jw_max_chars: int = 128     # Jaro-Winkler feature truncation
    lev_band_radius: int = 48   # |i-j| band for the Levenshtein DP
    # decision cascade: char-5-gram Jaccard ≥ fast_accept ⇒ duplicate (near-dup
    # conversations with ≤10% char edits sit ≥ ~0.4; unrelated same-topic
    # negatives ≤ ~0.35 — see FIXTURES.md §A2); Jaccard < fast_reject AND
    # cosine < fast_reject_cosine ⇒ not-duplicate. Only the borderline band
    # pays for the Jaro-Winkler / Levenshtein DP kernels.
    fast_accept_jaccard: float = 0.62
    fast_reject_jaccard: float = 0.15
    fast_reject_cosine: float = 0.85
    scorer_sample_mod: int = 8  # shingle sampling for the scorer's Jaccard
                                # (content-defined → unbiased; ~256-element
                                # sets keep estimator σ ≈ 0.03, half the
                                # gather/sort traffic of mod 4)
    w_jaccard: float = 0.35     # n-gram Jaccard weight
    w_cosine: float = 0.15      # SimHash-cosine weight
    w_jw: float = 0.15          # Jaro-Winkler weight
    w_lev: float = 0.35         # Levenshtein-ratio weight
    tau: float = 0.62           # accept threshold on the weighted score

    # ---- execution sizing (SURVEY.md §4) -----------------------------------
    batch_size_rows: int = 4096      # map_batches batch size for slim rows
    sig_batch_size: int = 128        # signature stage: rows are FAT (~tens of
                                     # KB of doc text) — a batch_size larger
                                     # than the incoming block size makes Ray
                                     # coalesce blocks into one task and
                                     # serializes the stage; keep it small
    pair_batch_size: int = 2048      # scorer actor-pool batch size
    scorer_concurrency: int = 4      # scorer actor pool size (min; scales with CPUs)
    num_hash_partitions: int = 0     # 0 → derive from cluster CPUs
    closure_max_rounds: int = 32     # hash-to-min safety bound (O(log d) expected)
    closure_fanin: int = 256         # R: giant-component relay width — a local
                                     # component larger than R routes member
                                     # registration through R salted virtual
                                     # relay nodes instead of fanning all rows
                                     # into the component-minimum's partition

    # ---- io ----------------------------------------------------------------
    work_dir: str = "/tmp/mc_ray_work"

    def __post_init__(self) -> None:
        if self.num_bands * self.band_rows != self.num_perm:
            raise ValueError(
                f"num_bands*band_rows ({self.num_bands}*{self.band_rows}) "
                f"must equal num_perm ({self.num_perm})"
            )

    # ------------------------------------------------------------------
    def content_hash(self) -> str:
        """Stable hash of every field that affects pipeline OUTPUT (not layout).

        Used as the config fingerprint in lineage manifests: a checkpoint is
        only reusable if this hash matches (SURVEY.md §4 checkpoint/resume).
        Execution-sizing fields are excluded — changing actor counts must not
        invalidate checkpoints.
        """
        d = asdict(self)
        for k in ("batch_size_rows", "pair_batch_size", "scorer_concurrency",
                  "num_hash_partitions", "work_dir"):
            d.pop(k)
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def with_(self, **kw) -> "Config":
        return replace(self, **kw)

    @staticmethod
    def from_env(**overrides) -> "Config":
        """12-factor style: MCRAY_<FIELD> env vars override defaults."""
        kw = {}
        for f in Config.__dataclass_fields__.values():
            env = os.environ.get(f"MCRAY_{f.name.upper()}")
            if env is not None:
                typ = type(f.default)
                kw[f.name] = typ(env)
        kw.update(overrides)
        return Config(**kw)


def default_parallelism() -> int:
    """Partition count for hash-bucketed wide stages: ~2 buckets per CPU in the
    cluster, floor 8 — at 100 TB on a 256-node cluster this derives from cluster
    resources, not from a constant."""
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
        else:
            cpus = os.cpu_count() or 8
    except Exception:  # pragma: no cover
        cpus = os.cpu_count() or 8
    return max(8, 2 * cpus)


def sized_parallelism(rows: int | None, rows_per_part: int) -> int:
    """Data-aware partition count for a wide stage: enough partitions that each
    holds ≲ rows_per_part rows, capped at the CPU-derived default (2×CPUs) and
    floored at 4. At 100 TB the rows term saturates the cap, so partitioning
    scales with the cluster; at test scale it keeps tiny shuffles from paying
    2×CPUs of per-task overhead for kilobytes of data."""
    P = default_parallelism()
    if rows is None or rows <= 0:
        return P
    import math

    return max(4, min(P, math.ceil(rows / rows_per_part)))
