"""Continuous (streaming-batch) ingest — the engine analog of the reference's
live blockchain tail (``[ref: mc_ingest.py receive_blockchain_into_indexer —
unverified]``, SURVEY.md S3). The reference consumes a gRPC stream with
at-least-once delivery into an idempotent index; here the stream is a WATCHED
DIRECTORY of transcript parquet shards (the shape object stores and log
tailers deliver at 100 TB), processed as micro-batches:

    wave 0 shards  → full dedupe (the BASE run)
    later waves    → accumulated delta, incrementally deduped against the base
    delta ≥ compact_ratio × base → major compaction (full re-run over all
                                   shards, delta log reset)

At-least-once semantics hold end-to-end: re-delivered shards re-enter the
delta, and assembly's (conv_id, turn_idx) dedup + deterministic cluster ids
make re-processing a no-op (idempotent ingest, SURVEY.md D1). A ledger file
records processed shards so a restarted watcher resumes where it stopped;
every underlying stage resumes from its Parquet checkpoint.
"""

from __future__ import annotations

import json
import os
import time

import ray.data

from mediachain_indexer_ray.config import Config

LEDGER = "ingest_ledger.json"


class IngestWatcher:
    """Poll-driven micro-batch ingester. ``run_once()`` processes any new
    shards and returns a status dict; ``watch()`` loops it."""

    def __init__(self, watch_dir: str, work_root: str, cfg: Config,
                 *, compact_ratio: float = 0.5):
        self.watch_dir = watch_dir
        self.work_root = work_root
        self.cfg = cfg
        self.compact_ratio = compact_ratio
        os.makedirs(work_root, exist_ok=True)
        self._ledger_path = os.path.join(work_root, LEDGER)
        if os.path.exists(self._ledger_path):
            with open(self._ledger_path) as f:
                self.state = json.load(f)
        else:
            self.state = {"processed": [], "base_shards": [], "delta_shards": [],
                          "generation": 0}

    # -- helpers -------------------------------------------------------------
    def _save(self) -> None:
        tmp = self._ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
        os.replace(tmp, self._ledger_path)

    def _new_shards(self) -> list[str]:
        seen = set(self.state["processed"])
        return sorted(
            f for f in os.listdir(self.watch_dir)
            if f.endswith(".parquet") and f not in seen
        )

    def _stage_dir(self, name: str, shards: list[str]) -> str:
        """Hard-link the named shards into a stable staging dir (a stage's
        input must not mutate under it while the pipeline runs)."""
        d = os.path.join(self.work_root, name)
        os.makedirs(d, exist_ok=True)
        for s in shards:
            dst = os.path.join(d, s)
            if not os.path.exists(dst):
                os.link(os.path.join(self.watch_dir, s), dst)
        return d

    def _rows(self, shards: list[str]) -> int:
        import pyarrow.parquet as pq

        return sum(
            pq.read_metadata(os.path.join(self.watch_dir, s)).num_rows
            for s in shards
        )

    def base_work_dir(self) -> str:
        return os.path.join(self.work_root, f"base_g{self.state['generation']}")

    def current_work_dir(self) -> str:
        """Work dir holding the LATEST clusters (delta run if one exists)."""
        if self.state["delta_shards"]:
            return os.path.join(self.work_root, f"delta_g{self.state['generation']}")
        return self.base_work_dir()

    # -- one micro-batch -----------------------------------------------------
    def run_once(self) -> dict:
        from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
        from mediachain_indexer_ray.pipelines.incremental import incremental_dedupe

        new = self._new_shards()
        if not new and self.state["base_shards"]:
            return {"action": "idle", "new_shards": 0}

        if not self.state["base_shards"]:
            # first wave: the base run
            if not new:
                return {"action": "idle", "new_shards": 0}
            self.state["base_shards"] = new
            self.state["processed"] += new
            staged = self._stage_dir(f"stage_base_g{self.state['generation']}", new)
            out = dedupe_pipeline(staged, self.cfg.with_(
                work_dir=self.base_work_dir()))
            out["_checkpoints"].flush()
            self._save()
            return {"action": "base", "new_shards": len(new),
                    "clusters": out["clusters"].count()}

        self.state["delta_shards"] += new
        self.state["processed"] += new
        base_rows = self._rows(self.state["base_shards"])
        delta_rows = self._rows(self.state["delta_shards"])

        if delta_rows >= self.compact_ratio * base_rows:
            # major compaction: full run over everything, delta log reset
            gen = self.state["generation"] + 1
            all_shards = self.state["base_shards"] + self.state["delta_shards"]
            self.state.update(
                {"generation": gen, "base_shards": all_shards, "delta_shards": []}
            )
            staged = self._stage_dir(f"stage_base_g{gen}", all_shards)
            out = dedupe_pipeline(staged, self.cfg.with_(
                work_dir=self.base_work_dir()))
            out["_checkpoints"].flush()
            self._save()
            return {"action": "compact", "new_shards": len(new),
                    "clusters": out["clusters"].count()}

        # incremental: ACCUMULATED delta vs the base (checkpoint fingerprints
        # invalidate the delta stages as the staged dir grows — re-processing
        # is bounded by the delta size, never the base)
        gen = self.state["generation"]
        staged = self._stage_dir(f"stage_delta_g{gen}", self.state["delta_shards"])
        out = incremental_dedupe(
            staged, self.base_work_dir(), self.cfg,
            os.path.join(self.work_root, f"delta_g{gen}"),
        )
        out["_checkpoints"].flush()
        self._save()
        return {"action": "delta", "new_shards": len(new),
                "clusters": out["clusters"].count()}

    def clusters(self) -> ray.data.Dataset:
        from mediachain_indexer_ray.state.checkpoint import read_checkpoint

        return read_checkpoint(os.path.join(self.current_work_dir(), "clusters"))

    # -- the loop ------------------------------------------------------------
    def watch(self, *, poll_interval: float = 5.0, max_cycles: int | None = None,
              stop_after_idle: int | None = None) -> list[dict]:
        log, idle = [], 0
        cycles = 0
        while True:
            st = self.run_once()
            log.append(st)
            idle = idle + 1 if st["action"] == "idle" else 0
            cycles += 1
            if max_cycles is not None and cycles >= max_cycles:
                return log
            if stop_after_idle is not None and idle >= stop_after_idle:
                return log
            time.sleep(poll_interval)
