#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6/§7-10, BASELINE.md protocol).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus the flagship transcript dedupe over a deterministic
synthetic corpus (~``$GRAFT_BENCH_TURNS`` turns, default 500k, cached in /tmp),
then prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "flagship": {"turns": T, "sec": S, "turns_per_sec": R}}

``--scaling``: runs the identical flagship job in two FRESH processes at
num_cpus=8 and num_cpus=32 over the same corpus (the sandbox evidence protocol
for the N→4N cluster criterion, BASELINE.md) and records results in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("GRAFT_BENCH_TURNS", "500000"))

BENCH_QUERIES = [
    "events_by_type",
    "assemble_events",
    "pricing_summary",
    "customer_order_revenue",
    "sessionize_events",
    "top_tokens",
    "token_stats",
    "ann_cosine_topk",
    "minhash_dedup_documents",
    "exact_dedup_documents",
]


def _bench_corpus_path() -> tuple[str, int]:
    """Deterministic synthetic transcript corpus sized to ~BENCH_TURNS turns,
    generated once and cached (generation is driver-side numpy/python; ~70
    turns/base incl. variants)."""
    from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus

    n_base = max(200, int(BENCH_TURNS / 34))
    spec = FixtureSpec(n_base=n_base, viral_fanout=150, seed=42)
    d = f"/tmp/mcray_bench_{n_base}_{spec.seed}"
    marker = f"{d}/transcripts.parquet"
    if not os.path.exists(marker):
        t0 = time.time()
        write_corpus(spec, d, shuffle_rows=True)
        print(f"[bench] corpus generated in {time.time()-t0:.0f}s -> {d}",
              file=sys.stderr)
    import pyarrow.parquet as pq

    turns = pq.read_metadata(marker).num_rows
    return marker, turns


def _run_flagship(corpus: str, work_dir: str) -> dict:
    from mediachain_indexer_ray.config import Config
    from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline

    shutil.rmtree(work_dir, ignore_errors=True)
    cfg = Config(work_dir=work_dir)
    t0 = time.time()
    out = dedupe_pipeline(corpus, cfg)
    n_clusters = out["clusters"].count()
    sec = time.time() - t0
    return {"sec": round(sec, 2), "n_clusters": n_clusters}


def main_default() -> None:
    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(os.path.dirname(__file__), "__ray_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()

    corpus, turns = _bench_corpus_path()

    times: dict[str, float] = {}
    total0 = time.time()
    for name in BENCH_QUERIES:
        t0 = time.time()
        res = qs[name](SF_DIR)
        # consume: Datasets are lazy — count() executes the full pipeline
        try:
            import ray.data

            if isinstance(res, ray.data.Dataset):
                res.count()
        except Exception:
            pass
        times[name] = round(time.time() - t0, 2)
        print(f"[bench] {name}: {times[name]}s", file=sys.stderr)

    t0 = time.time()
    fl = _run_flagship(corpus, "/tmp/mcray_bench_work")
    fl_sec = time.time() - t0
    times["flagship_dedupe"] = round(fl_sec, 2)
    total = time.time() - total0

    out = {
        "metric": "pipeline wall time (sf tables + flagship transcript dedupe)",
        "value": round(total, 2),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "flagship": {
            "turns": turns,
            "sec": round(fl_sec, 2),
            "turns_per_sec": round(turns / fl_sec, 1),
            "n_clusters": fl["n_clusters"],
        },
    }
    ray.shutdown()
    print(json.dumps(out))


def main_child(corpus: str, work_dir: str) -> None:
    """Scaling-run child: fresh Ray session at $RAY_GRAFT_CPUS, flagship only."""
    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    res = _run_flagship(corpus, work_dir)
    ray.shutdown()
    print(json.dumps(res))


def main_scaling() -> None:
    corpus, turns = _bench_corpus_path()
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child-flagship",
             corpus, f"/tmp/mcray_scale_work_{cpus}"],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"child run at {cpus} cpus failed")
        child = json.loads(proc.stdout.strip().splitlines()[-1])
        results[cpus] = {
            "sec": child["sec"],
            "turns_per_sec": round(turns / child["sec"], 1),
            "wall_incl_startup": round(time.time() - t0, 1),
        }
        print(f"[scaling] {cpus} cpus: {results[cpus]}", file=sys.stderr)

    eff = (results[32]["turns_per_sec"] / results[8]["turns_per_sec"]) / 4.0
    out = {
        "metric": "flagship dedupe scaling efficiency (8 -> 32 cpus, fresh sessions)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "flagship@8cpus_sec": results[8]["sec"],
            "flagship@32cpus_sec": results[32]["sec"],
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": turns,
        "turns_per_sec": {str(k): v["turns_per_sec"] for k, v in results.items()},
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"| cpus | wall sec | turns/sec |\n|---|---|---|\n"
            f"| 8 | {results[8]['sec']} | {results[8]['turns_per_sec']} |\n"
            f"| 32 | {results[32]['sec']} | {results[32]['turns_per_sec']} |\n\n"
            f"corpus: {turns} turns; efficiency (T32/T8)/4 = **{eff:.3f}** "
            f"(target ≥ 0.8, BASELINE.json:2)\n"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--child-flagship" in sys.argv:
        i = sys.argv.index("--child-flagship")
        main_child(sys.argv[i + 1], sys.argv[i + 2])
    else:
        main_default()
