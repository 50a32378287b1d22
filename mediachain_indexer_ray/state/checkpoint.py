"""Per-stage Parquet checkpoints with lineage manifests (SURVEY.md §4).

The reference has no checkpointing — a crashed ``dedupe_reindex`` restarts from
zero, saved only by idempotent ES ``_id`` writes (``[ref: mc_ingest.py —
unverified]``). BASELINE.json:6 mandates better: "every stage writes
per-partition lineage manifests and counters so the job resumes from the last
completed Parquet checkpoint."

Mechanics: each stage directory holds ``part-*.parquet`` plus ``_manifest.json``
recording {stage, input fingerprint, config hash, row count, counters, wall
time}. A stage is SKIPPED (output re-read) iff its manifest's fingerprint
matches the current (inputs + config). Writes go to a temp dir and are renamed
into place, so a partially-written stage is never mistaken for a completed one.
Stage fingerprints chain: a stage's fingerprint folds in its inputs' manifest
hashes, so editing the corpus or config invalidates everything downstream —
and ONLY downstream.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid


import ray.data

from mediachain_indexer_ray.config import default_parallelism

MANIFEST = "_manifest.json"


def read_checkpoint(
    path: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Read a stage checkpoint with a DATA-AWARE block count: enough blocks
    to keep every core busy on a big checkpoint (written with small row
    groups for splitability), but never splintering a small one into dozens
    of near-empty tasks whose scheduling overhead dominates (measured: the
    incremental clusters stage spent ~2 s of its 3 s wall re-reading three
    sub-30k-row checkpoints at 64 blocks each). ``columns`` prunes at the
    read (SURVEY.md §4)."""
    import pyarrow.parquet as pq

    files = [path] if os.path.isfile(path) else [
        os.path.join(r, f)
        for r, _, fs in sorted(os.walk(path))
        for f in sorted(fs) if f.endswith(".parquet")
    ]
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    total_bytes = sum(os.stat(f).st_size for f in files)
    P = int(max(1, min(
        default_parallelism(),
        max(rows // 32_768, total_bytes // (128 << 20), 1),
    )))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=P)


def _dir_fingerprint(path: str) -> str:
    """Fingerprint of an input parquet file/dir: paths + sizes + mtimes."""
    h = hashlib.sha256()
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"{path}:{st.st_size}:{int(st.st_mtime)}".encode())
    else:
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f == MANIFEST or not f.endswith(".parquet"):
                    continue
                st = os.stat(os.path.join(root, f))
                h.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


class CheckpointManager:
    def __init__(self, work_dir: str, config_hash: str, *, async_writes: bool = False):
        self.work_dir = work_dir
        self.config_hash = config_hash
        self._manifest_hashes: dict[str, str] = {}
        self._manifests_mem: dict[str, dict] = {}
        self._pending: dict[str, "threading.Thread"] = {}
        self._write_errors: dict[str, BaseException] = {}
        self.async_writes = async_writes
        self.events: list[dict] = []  # run log: hit/miss per stage
        os.makedirs(work_dir, exist_ok=True)

    # -- async write support -------------------------------------------------
    def wait(self, name: str | None = None) -> None:
        """Join the background checkpoint write for `name` (or all). A failed
        write (disk full, permission) re-raises HERE — "durable before return"
        must not report success over a silently-missing checkpoint."""
        import threading  # noqa: F401  (typing)

        names = [name] if name else list(self._pending)
        for n in names:
            t = self._pending.pop(n, None)
            if t is not None:
                t.join()
        for n in ([name] if name else list(self._write_errors)):
            err = self._write_errors.pop(n, None)
            if err is not None:
                self.events.append({"stage": n, "action": "write_failed",
                                    "error": repr(err)})
                raise RuntimeError(
                    f"async checkpoint write for stage {n!r} failed"
                ) from err

    def flush(self) -> None:
        self.wait(None)

    # -- fingerprints --------------------------------------------------------
    def input_fingerprint(self, *parts: str) -> str:
        """Combine raw-input paths and/or upstream stage names into one
        fingerprint (order-sensitive)."""
        h = hashlib.sha256(self.config_hash.encode())
        for p in parts:
            if p in self._manifest_hashes:  # upstream stage
                h.update(self._manifest_hashes[p].encode())
            else:  # external path
                h.update(_dir_fingerprint(p).encode())
        return h.hexdigest()[:16]

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.work_dir, name)

    def valid(self, name: str, fingerprint: str) -> bool:
        """Side-effect-free peek: would ``run(name, fingerprint, ...)`` skip?
        Lets a caller decide whether to PREFETCH work for a stage that is
        about to run (e.g. overlap the scorer's broadcast-LUT build with the
        pair-emission shuffle) without paying it on the resume path."""
        mpath = os.path.join(self.stage_dir(name), MANIFEST)
        if not os.path.exists(mpath):
            return False
        try:
            with open(mpath) as f:
                man = json.load(f)
        except (OSError, json.JSONDecodeError):  # pragma: no cover
            return False
        return (
            man.get("fingerprint") == fingerprint
            and man.get("config_hash") == self.config_hash
        )

    # -- run-or-skip ---------------------------------------------------------
    def run(
        self,
        name: str,
        fingerprint: str,
        build: "callable[[], ray.data.Dataset]",
        counters: dict | None = None,
    ) -> ray.data.Dataset:
        """Return the checkpointed Dataset for `name`, building + writing it
        only if no valid checkpoint exists."""
        out_dir = self.stage_dir(name)
        mpath = os.path.join(out_dir, MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as f:
                man = json.load(f)
            if man.get("fingerprint") == fingerprint and man.get("config_hash") == self.config_hash:
                self._manifest_hashes[name] = man["manifest_hash"]
                self.events.append({"stage": name, "action": "skip"})
                return read_checkpoint(out_dir)
            shutil.rmtree(out_dir)

        t0 = time.time()
        # materialize into the object store FIRST, then write the checkpoint
        # from the materialized blocks and hand the plasma-backed dataset to
        # the next stage: the disk write is for RESUME, not for the critical
        # path — re-reading every stage's output from disk serialized each
        # stage boundary behind checkpoint I/O (object-store spilling covers
        # the does-not-fit-in-memory case)
        ds = build().materialize()
        rows = ds.count()  # metadata on a materialized dataset — free
        man = {
            "stage": name,
            "fingerprint": fingerprint,
            "config_hash": self.config_hash,
            "rows": rows,
            "wall_sec": round(time.time() - t0, 3),
            "counters": counters or {},
            "engine": "mediachain_indexer_ray",
        }
        man["manifest_hash"] = hashlib.sha256(
            json.dumps(man, sort_keys=True).encode()
        ).hexdigest()[:16]
        try:
            # per-operator execution stats (task wall-time histograms) for
            # post-hoc scaling profiles; added AFTER the manifest hash so the
            # volatile timing strings never leak into lineage fingerprints
            man["exec_stats_tail"] = ds.stats()[-4000:]
        except Exception:  # pragma: no cover — stats are best-effort
            pass
        tmp = out_dir + f".tmp-{uuid.uuid4().hex[:8]}"

        def _write() -> None:
            os.makedirs(tmp, exist_ok=True)
            # bounded file sizes AND small row groups: the row group is the
            # atom a parquet read can split on — a checkpoint written as a few
            # one-row-group files collapses every downstream stage to ~2 read
            # tasks no matter how many CPUs the cluster has
            ds.write_parquet(tmp, max_rows_per_file=16384, row_group_size=1024)
            # the manifest is written LAST and the rename is atomic, so a
            # partially-written checkpoint is never mistaken for complete
            with open(os.path.join(tmp, MANIFEST), "w") as f:
                json.dump(man, f, indent=1)
            if os.path.exists(out_dir):  # pragma: no cover — concurrent writer
                shutil.rmtree(out_dir)
            os.rename(tmp, out_dir)

        if self.async_writes:
            import threading

            def _write_guarded() -> None:
                try:
                    _write()
                except BaseException as e:  # surfaced by wait()/flush()
                    self._write_errors[name] = e

            t = threading.Thread(
                target=_write_guarded, name=f"ckpt-{name}", daemon=False
            )
            t.start()
            self._pending[name] = t
        else:
            _write()
        self._manifests_mem[name] = man
        self._manifest_hashes[name] = man["manifest_hash"]
        self.events.append(
            {"stage": name, "action": "run", "rows": rows, "wall_sec": man["wall_sec"]}
        )
        return ds  # plasma-backed; resume path re-reads from disk instead

    def manifest(self, name: str) -> dict:
        if name in self._manifests_mem:  # async write may still be in flight
            return self._manifests_mem[name]
        with open(os.path.join(self.stage_dir(name), MANIFEST)) as f:
            return json.load(f)
