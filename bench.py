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
N and 4N CPUs ($GRAFT_SCALING_CPUS, default "4,16") over the same corpus (the
sandbox evidence protocol for the N→4N cluster criterion, BASELINE.md) and
records results in BENCH/BASELINE.md. The scaling corpus is ≥13M turns so
compute dominates the per-stage constants.

``--hw-calib``: fresh-process raw-numpy kernels (compute-bound matmul +
DRAM-bound stream) at the same CPU pair — measures the HOST's attainable
scaling ceiling with zero engine code, appended to BENCH/BASELINE.md so every
job-level efficiency number can be read against the hardware's own bracket.
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
    generated once and cached. Generated with the RAY-PARALLEL generator
    (sharded parquet layout); starts a temporary local Ray session if none is
    active (parent of the --scaling child runs)."""
    import pyarrow.parquet as pq

    import ray

    from mediachain_indexer_ray.fixtures import FixtureSpec, parallel_write_corpus

    n_base = max(200, int(BENCH_TURNS / 34))
    spec = FixtureSpec(n_base=n_base, viral_fanout=150, seed=42)
    d = f"/tmp/mcray_benchp_{n_base}_{spec.seed}"
    marker = f"{d}/transcripts"
    if not os.path.exists(marker):
        own_ray = not ray.is_initialized()
        if own_ray:
            ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
        t0 = time.time()
        parallel_write_corpus(spec, d, shuffle_rows=True)
        print(f"[bench] corpus generated in {time.time()-t0:.0f}s -> {d}",
              file=sys.stderr)
        if own_ray:
            ray.shutdown()

    turns = sum(
        pq.read_metadata(os.path.join(marker, f)).num_rows
        for f in sorted(os.listdir(marker))
        if f.endswith(".parquet")
    )
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
    stages = {
        e["stage"]: e["wall_sec"] for e in out["_checkpoints"].events
        if e.get("action") == "run"
    }
    return {"sec": round(sec, 2), "n_clusters": n_clusters, "stages": stages}


def _run_incremental(corpus: str) -> dict:
    """Delta-path measurement (VERDICT r3 #9): base dedupe over all corpus
    shards but the last, then ``incremental_dedupe`` of the last shard
    (~1/8 of the corpus) against the completed base run. Shards are
    conversation-local by construction (fixtures._chunk_tables), so the
    base/delta conv_id sets are disjoint."""
    import glob

    from mediachain_indexer_ray.config import Config
    from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
    from mediachain_indexer_ray.pipelines.incremental import incremental_dedupe

    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    if len(files) < 2:
        return {}
    base_dir = "/tmp/mcray_bench_incr_base"
    shutil.rmtree(base_dir, ignore_errors=True)
    os.makedirs(base_dir)
    for f in files[:-1]:
        os.symlink(f, os.path.join(base_dir, os.path.basename(f)))
    delta = files[-1]

    w_base, w_inc = "/tmp/mcray_bench_incr_wb", "/tmp/mcray_bench_incr_wi"
    shutil.rmtree(w_base, ignore_errors=True)
    shutil.rmtree(w_inc, ignore_errors=True)
    cfg = Config(work_dir=w_base)
    t0 = time.time()
    dedupe_pipeline(base_dir, cfg)
    base_sec = time.time() - t0
    t0 = time.time()
    out = incremental_dedupe(delta, w_base, cfg, w_inc)
    n_rows = out["clusters"].count()
    delta_sec = time.time() - t0

    import pyarrow.parquet as pq

    delta_turns = pq.read_metadata(delta).num_rows
    return {
        "base_sec": round(base_sec, 2),
        "delta_sec": round(delta_sec, 2),
        "delta_turns": delta_turns,
        "delta_turns_per_sec": round(delta_turns / delta_sec, 1),
        "merged_cluster_rows": n_rows,
        # per-stage walls: the delta wall is NOT O(delta) — band re-emission
        # spans base∪delta reps and closure spans the merged edge set; what
        # the delta path avoids at scale is re-SCORING old×old pairs
        "stages": {
            e["stage"]: round(e["wall_sec"], 2)
            for e in out["_checkpoints"].events
            if e.get("action") == "run"
        },
    }


def _run_streaming(corpus: str) -> dict:
    """IngestWatcher wall times (VERDICT r4 next #7): base wave, two
    incremental micro-batches, then a compaction-triggering wave — the full
    pipelines/streaming.py lifecycle, measured per cycle."""
    import glob

    from mediachain_indexer_ray.config import Config
    from mediachain_indexer_ray.pipelines.streaming import IngestWatcher

    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    if len(files) < 4:
        return {}
    watch_dir = "/tmp/mcray_bench_stream_watch"
    work_root = "/tmp/mcray_bench_stream_work"
    shutil.rmtree(watch_dir, ignore_errors=True)
    shutil.rmtree(work_root, ignore_errors=True)
    os.makedirs(watch_dir)
    n_base = max(1, len(files) - 3)
    waves = [
        ("base", files[:n_base]),
        ("delta1", files[n_base:n_base + 1]),
        ("delta2", files[n_base + 1:n_base + 2]),
        # remaining shards push delta past compact_ratio x base -> compaction
        ("compact", files[n_base + 2:]),
    ]
    cfg = Config(work_dir=work_root)
    # ratio picked from the ACTUAL shard rows (the tail shard can be small):
    # midway between the two-micro-batch and final-wave delta fractions, so
    # the cycle actions are exactly base/delta/delta/compact — one of each
    # lifecycle phase
    import pyarrow.parquet as pq

    rows = [pq.read_metadata(f).num_rows for f in files]
    base_r = sum(rows[:n_base])
    two = sum(rows[n_base:n_base + 2])
    alld = sum(rows[n_base:])
    w = IngestWatcher(watch_dir, work_root, cfg,
                      compact_ratio=(two + alld) / (2 * base_r))
    out: dict = {"cycles": {}}
    for name, wave in waves:
        for f in wave:
            os.symlink(f, os.path.join(watch_dir, os.path.basename(f)))
        t0 = time.time()
        st = w.run_once()
        out["cycles"][name] = {
            "action": st["action"],
            "sec": round(time.time() - t0, 2),
            "new_shards": st["new_shards"],
        }
        print(f"[bench] streaming {name}: {st['action']} "
              f"{out['cycles'][name]['sec']}s", file=sys.stderr)
    out["final_clusters"] = w.clusters().count()
    out["total_sec"] = round(sum(c["sec"] for c in out["cycles"].values()), 2)
    return out


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

    # warm the worker pool + object store once so the first timed query
    # measures steady-state pipeline cost, not cluster cold-start
    ray.data.range(100_000, override_num_blocks=NUM_CPUS).map_batches(
        lambda b: b
    ).count()

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
    print(f"[bench] flagship_dedupe: {times['flagship_dedupe']}s", file=sys.stderr)
    # headline `value` stays comparable to rounds 1-3 (sf tables + flagship);
    # the incremental leg's base run is setup, so it reports separately below
    total = time.time() - total0

    inc = _run_incremental(corpus)
    if inc:
        times["incremental_delta"] = inc["delta_sec"]
        print(f"[bench] incremental_delta: {inc['delta_sec']}s "
              f"(base {inc['base_sec']}s)", file=sys.stderr)

    stream = _run_streaming(corpus)
    if stream:
        times["streaming_cycles"] = stream["total_sec"]

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
            "stages": {k: round(v, 2) for k, v in fl["stages"].items()},
        },
    }
    if inc:
        out["incremental"] = inc
    if stream:
        out["streaming"] = stream
    ray.shutdown()
    print(json.dumps(out))


def _warm_cpu(seconds: float = 4.0) -> None:
    """Spin the CPU before timing: this VM's clock ramps over several seconds
    of load (cold-start numpy throughput is up to 25× below warm — measured,
    see BENCH/BASELINE.md), which would corrupt scaling comparisons."""
    import numpy as np

    x = np.random.default_rng(0).integers(0, 2**63, 8_000_000, dtype=np.uint64)
    t0 = time.time()
    while time.time() - t0 < seconds:
        x = (x >> np.uint64(30)) ^ x
        x *= np.uint64(0x9E3779B97F4A7C15)


def _warm_workers(num_cpus: int, seconds: float = 3.0) -> None:
    """Spin EVERY Ray worker before timing: workers are fresh processes and
    this VM's per-core clock ramps over seconds of load (see _warm_cpu) — an
    unwarmed 16-worker pool pays the ramp inside the first timed stage, which
    systematically deflates the high-CPU leg of the scaling comparison."""
    import numpy as np

    import ray

    @ray.remote(num_cpus=1)
    def _spin() -> int:
        x = np.random.default_rng(0).integers(0, 2**63, 4_000_000, dtype=np.uint64)
        t0 = time.time()
        while time.time() - t0 < seconds:
            x = (x >> np.uint64(30)) ^ x
            x *= np.uint64(0x9E3779B97F4A7C15)
        return int(x[0])

    ray.get([_spin.remote() for _ in range(num_cpus)])


def main_child(corpus: str, work_dir: str) -> None:
    """Scaling-run child: fresh Ray session at $RAY_GRAFT_CPUS, flagship only."""
    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    _warm_cpu()
    _warm_workers(NUM_CPUS)
    res = _run_flagship(corpus, work_dir)
    ray.shutdown()
    print(json.dumps(res))


SCALING_CPUS = tuple(
    int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(",")
)


def main_hwcalib_child(cpus: int) -> None:
    """Raw-hardware calibration child (no engine code): measures this box's own
    N→4N ceiling with two pure-numpy kernels — matmul (compute-bound, mostly
    cache-resident) and stream (big-array add, DRAM-bandwidth-bound). The
    flagship's hot stages span both regimes (hash/shingle/shuffle stages are
    bandwidth-heavy), so the kernel pair brackets the best scaling ANY software
    could show on this VM at the moment of measurement."""
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")

    @ray.remote(num_cpus=1)
    def mm(seed: int) -> float:
        rng = np.random.default_rng(seed)
        a = rng.standard_normal((1024, 1024))
        b = rng.standard_normal((1024, 1024))
        s = 0.0
        for _ in range(6):
            s += float((a @ b)[0, 0])
        return s

    @ray.remote(num_cpus=1)
    def stream(seed: int) -> float:
        a = np.full(20_000_000, float(seed))  # ~160 MB live, far beyond L3
        b = np.full(20_000_000, 2.0)
        s = 0.0
        for _ in range(6):
            a += b
            s += float(a[0])
        return s

    t_warm = time.time()
    while time.time() - t_warm < 4.0:  # clock-ramp + worker warm-up, untimed
        ray.get([mm.remote(i) for i in range(cpus)])
    out = {"cpus": cpus}
    for name, fn in (("matmul", mm), ("stream", stream)):
        t0 = time.time()
        ray.get([fn.remote(1000 + i) for i in range(64)])
        out[f"{name}_sec"] = round(time.time() - t0, 2)
    ray.shutdown()
    print(json.dumps(out))


def main_hwcalib() -> None:
    """Interleaved fresh-process raw-kernel runs at SCALING_CPUS; appends the
    measured hardware ceiling to BENCH/BASELINE.md next to the job runs."""
    lo, hi = SCALING_CPUS
    factor = hi / lo
    reps = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    rows = []
    for _ in range(reps):
        pair = {}
        for cpus in (lo, hi):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child-hwcalib", str(cpus)],
                capture_output=True, text=True, timeout=600,
            )
            pair[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        rows.append(pair)
        print(json.dumps(pair), file=sys.stderr)
    effs = {
        k: [round(p[lo][f"{k}_sec"] / (p[hi][f"{k}_sec"] * factor), 3)
            for p in rows]
        for k in ("matmul", "stream")
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## hardware calibration {time.strftime('%Y-%m-%d %H:%M:%S')} "
            f"({lo} -> {hi} cpus, fresh interleaved processes)\n\n"
            f"| kernel | per-pair efficiency (max attainable by ANY software) |\n"
            f"|---|---|\n"
            f"| matmul (compute-bound) | {effs['matmul']} |\n"
            f"| stream (DRAM-bound) | {effs['stream']} |\n\n"
            f"raw walls: {json.dumps(rows)}\n"
        )
    print(json.dumps({"metric": "raw-kernel hw scaling ceiling",
                      "efficiencies": effs}))


def _run_child(cpus: int, corpus: str) -> dict:
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
    child["startup"] = round(time.time() - t0 - child["sec"], 1)
    return child


def main_scaling() -> None:
    """N vs 4N scaling evidence (BASELINE.md protocol). Default pair is 4→16
    CPUs: raw-Ray calibration on this VM (see BENCH/BASELINE.md) shows the box
    delivers only ~2.5x on 8→32 vCPUs even for pure warm-worker numpy — the
    hardware saturates — while 4→16 delivers ~3.6x, so 4→16 is the honest
    software-scaling measurement.

    Runs are INTERLEAVED (lo, hi) pairs so slow VM drift (steal, thermal)
    hits both levels alike; the PRIMARY metric is the MEDIAN of per-pair
    efficiencies (VERDICT r1 #1: the criterion must hold at the median, not
    best-of-N). Best-of-N is reported alongside for continuity."""
    global BENCH_TURNS
    # ≥13M turns: at 2M the per-stage constants dominate the 16-CPU run
    # (measured 0.49 efficiency vs 0.93 at 12M — see BENCH/BASELINE.md)
    BENCH_TURNS = max(BENCH_TURNS, 13_000_000)
    corpus, turns = _bench_corpus_path()
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    # per-rep hardware bracket (VERDICT r3 #1): one raw-kernel calibration
    # pair runs in the SAME MINUTE as each job pair, so every efficiency
    # number carries the box state it was measured under
    bracket = os.environ.get("GRAFT_SCALING_BRACKET", "1") != "0"
    lo, hi = SCALING_CPUS
    factor = hi / lo
    secs = {lo: [], hi: []}
    stages = {}
    pair_effs = []
    brackets = []
    for rep in range(repeats):
        for cpus in (lo, hi):
            child = _run_child(cpus, corpus)
            secs[cpus].append(child["sec"])
            stages[cpus] = child.get("stages") or stages.get(cpus)
            print(f"[scaling] rep {rep} {cpus} cpus: {child['sec']}s "
                  f"(+startup {child['startup']}s)", file=sys.stderr)
        eff = secs[lo][-1] / (secs[hi][-1] * factor)
        pair_effs.append(round(eff, 3))
        print(f"[scaling] rep {rep} pair efficiency: {eff:.3f}", file=sys.stderr)
        if bracket:
            cal = {}
            for cpus in (lo, hi):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child-hwcalib", str(cpus)],
                    capture_output=True, text=True, timeout=600,
                )
                cal[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
            br = {
                k: round(cal[lo][f"{k}_sec"] / (cal[hi][f"{k}_sec"] * factor), 3)
                for k in ("matmul", "stream")
            }
            brackets.append(br)
            print(f"[scaling] rep {rep} hw bracket: {br}", file=sys.stderr)
    import statistics

    # statistics.median averages the two middle values for even repeat
    # counts — sorted()[n//2] picked the upper-middle, biasing the primary
    # metric upward (ADVICE r2)
    med = statistics.median(pair_effs)
    best = min(secs[lo]) / (min(secs[hi]) * factor)
    out = {
        "metric": f"flagship dedupe scaling efficiency ({lo} -> {hi} cpus, "
                  f"median of {repeats} interleaved pairs)",
        "value": round(med, 3),
        "unit": "efficiency",
        "queries": {
            f"flagship@{lo}cpus_sec": min(secs[lo]),
            f"flagship@{hi}cpus_sec": min(secs[hi]),
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": turns,
        "all_secs": secs,
        "pair_efficiencies": pair_effs,
        "scaling_efficiency": round(med, 3),
        "scaling_efficiency_best": round(best, 3),
        "turns_per_sec": {str(c): round(turns / min(s), 1)
                          for c, s in secs.items()},
        "stage_walls": stages,
        "hw_brackets": brackets,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run {time.strftime('%Y-%m-%d %H:%M:%S')} "
            f"(interleaved pairs, median primary)\n\n"
            f"| cpus | wall secs (all reps) | best turns/sec |\n|---|---|---|\n"
            f"| {lo} | {secs[lo]} | {round(turns / min(secs[lo]), 1)} |\n"
            f"| {hi} | {secs[hi]} | {round(turns / min(secs[hi]), 1)} |\n\n"
            f"corpus: {turns} turns; per-pair efficiencies {pair_effs} → "
            f"**median {med:.3f}** (target ≥ 0.8, BASELINE.json:2); "
            f"best-of-{repeats} {best:.3f}\n"
        )
        if brackets:
            f.write(
                "\nper-rep same-minute hardware brackets (raw-kernel "
                "efficiency ceilings measured immediately after each pair):\n\n"
                "| rep | job pair eff | matmul ceiling | stream (DRAM) ceiling |\n"
                "|---|---|---|---|\n"
            )
            for i, (pe, br) in enumerate(zip(pair_effs, brackets)):
                f.write(f"| {i} | {pe} | {br['matmul']} | {br['stream']} |\n")
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--child-flagship" in sys.argv:
        i = sys.argv.index("--child-flagship")
        main_child(sys.argv[i + 1], sys.argv[i + 2])
    elif "--hw-calib" in sys.argv:
        main_hwcalib()
    elif "--child-hwcalib" in sys.argv:
        i = sys.argv.index("--child-hwcalib")
        main_hwcalib_child(int(sys.argv[i + 1]))
    else:
        main_default()
