"""CLI entry points (SURVEY.md X2/X3) — the analog of the reference's
``setup_main`` dispatch + ``mediachain-indexer-{ingest,models,eval}`` console
scripts (``[ref: mc_generic.py setup_main, setup.py — unverified]``).

    python -m mediachain_indexer_ray.cli ingest  --input T.parquet --work W
    python -m mediachain_indexer_ray.cli dedupe  --input T.parquet --work W
    python -m mediachain_indexer_ray.cli eval    --input T.parquet --labels L.parquet --work W
    python -m mediachain_indexer_ray.cli fixture --out DIR --n-base 200

Config comes from CLI flags layered over ``MCRAY_*`` env vars (12-factor) over
defaults; the effective config is printed at startup like the reference does.
This is the ``ray job submit`` entrypoint: submit with
``ray job submit -- python -m mediachain_indexer_ray.cli dedupe ...``.
"""

from __future__ import annotations

import argparse
import json
import sys

from mediachain_indexer_ray.config import Config


def _add_config_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--seed", type=int)
    p.add_argument("--tau", type=float)
    p.add_argument("--num-bands", type=int, dest="num_bands")
    p.add_argument("--band-rows", type=int, dest="band_rows")
    p.add_argument("--hot-block-threshold", type=int, dest="hot_block_threshold")
    p.add_argument("--work", dest="work_dir")


def _cfg_from_args(args: argparse.Namespace) -> Config:
    overrides = {
        k: v
        for k, v in vars(args).items()
        if v is not None and k in Config.__dataclass_fields__
    }
    cfg = Config.from_env(**overrides)
    print(f"[config] {json.dumps(cfg.__dict__, default=str)}", file=sys.stderr)
    return cfg


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def cmd_ingest(args) -> int:
    """Read + validate + assemble the corpus; write conversations checkpoint."""
    _ensure_ray()
    cfg = _cfg_from_args(args)
    from mediachain_indexer_ray.sources.transcripts import read_transcripts
    from mediachain_indexer_ray.stages.assemble import assemble
    from mediachain_indexer_ray.state.checkpoint import CheckpointManager

    cp = CheckpointManager(cfg.work_dir, cfg.content_hash())
    fp = cp.input_fingerprint(args.input)
    ds = cp.run("conversations", fp, lambda: assemble(read_transcripts(args.input), cfg))
    print(json.dumps({"conversations": ds.count(), "work_dir": cfg.work_dir}))
    return 0


def cmd_dedupe(args) -> int:
    _ensure_ray()
    cfg = _cfg_from_args(args)
    from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline

    out = dedupe_pipeline(args.input, cfg)
    cl = out["clusters"]
    n = cl.count()
    cp = out["_checkpoints"]
    print(json.dumps({"clusters_rows": n, "stages": cp.events,
                      "work_dir": cfg.work_dir}, default=str))
    return 0


def cmd_eval(args) -> int:
    _ensure_ray()
    cfg = _cfg_from_args(args)
    import pandas as pd

    from mediachain_indexer_ray.pipelines.dedupe import dedupe_pipeline
    from mediachain_indexer_ray.pipelines.evaluate import evaluate_clusters, sweep_eval

    labels = pd.read_parquet(args.labels)
    if args.sweep:
        # reference mc_eval grid semantics: P/R/F1 over (bands, τ)
        taus = [float(x) for x in args.taus.split(",")] if args.taus else None
        bands = [int(x) for x in args.bands.split(",")] if args.bands else None
        df = sweep_eval(args.input, labels, cfg, cfg.work_dir, taus, bands)
        print(df.to_string(index=False), file=sys.stderr)
        best = df.loc[df["f1_milli"].idxmax()]
        print(json.dumps({
            "grid": df.to_dict(orient="records"),
            "best": best.to_dict(),
        }, default=int))
        return 0
    out = dedupe_pipeline(args.input, cfg)
    m = evaluate_clusters(labels, out["clusters"], out["pairs"], out["signatures"])
    print(json.dumps(m))
    return 0 if m["f1"] >= args.min_f1 else 1


def cmd_fixture(args) -> int:
    from mediachain_indexer_ray.fixtures import FixtureSpec, write_corpus

    spec = FixtureSpec(n_base=args.n_base, seed=args.seed or 42,
                       viral_fanout=args.viral_fanout)
    tp, lp = write_corpus(spec, args.out, shuffle_rows=args.shuffle)
    print(json.dumps({"transcripts": tp, "labels": lp}))
    return 0


def cmd_watch(args) -> int:
    """Continuous micro-batch ingest: tail a directory of transcript shards,
    dedupe deltas incrementally against the base run (reference
    receive_blockchain_into_indexer semantics, batch-equivalent)."""
    _ensure_ray()
    cfg = _cfg_from_args(args)
    from mediachain_indexer_ray.pipelines.streaming import IngestWatcher

    w = IngestWatcher(args.watch_dir, cfg.work_dir, cfg)
    log = w.watch(
        poll_interval=args.poll_interval,
        max_cycles=args.max_cycles,
        stop_after_idle=args.stop_after_idle,
    )
    print(json.dumps({"cycles": log, "work_dir": w.current_work_dir()}))
    return 0


def cmd_ann_index(args) -> int:
    """Build the persisted IVF-Flat ANN index over an embeddings parquet
    (build once, query many via /ann or ann_index_search)."""
    _ensure_ray()
    import ray.data

    from mediachain_indexer_ray.pipelines.annindex import build_ann_index

    ds = ray.data.read_parquet(args.embeddings,
                               columns=[args.id_col, args.emb_col])
    stats = build_ann_index(
        ds, args.out, id_col=args.id_col, emb_col=args.emb_col,
        n_centroids=args.centroids, train_sample=args.train_sample,
        seed=args.seed,
    )
    print(json.dumps(stats))
    return 0


def cmd_serve(args) -> int:
    """Serve /search, /dupe_lookup, /score, /ann, /feedback over a completed
    run (the reference's mc_web surface, batch-checkpoint-backed)."""
    _ensure_ray()
    cfg = _cfg_from_args(args)
    from mediachain_indexer_ray.serve import serve

    httpd = serve(cfg.work_dir, cfg, port=args.port,
                  ann_index_dir=args.ann_index)
    print(
        json.dumps({"listening": f"http://127.0.0.1:{httpd.server_address[1]}"}),
        flush=True,
    )
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:  # pragma: no cover
        httpd.shutdown()
    return 0


def cmd_bench(args) -> int:
    """X2 parity: `bench` subcommand delegates to the repo bench harness in a
    child process (bench.py owns its own Ray session / fresh-process protocol)."""
    import os
    import subprocess
    import sys

    bench = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    cmd = [sys.executable, bench] + (["--scaling"] if args.scaling else [])
    return subprocess.call(cmd)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mediachain_indexer_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest", help="read+validate+assemble the corpus")
    p.add_argument("--input", required=True)
    _add_config_flags(p)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("dedupe", help="full dedupe pipeline (flagship)")
    p.add_argument("--input", required=True)
    _add_config_flags(p)
    p.set_defaults(fn=cmd_dedupe)

    p = sub.add_parser("eval", help="dedupe + P/R/F1 vs labeled pairs")
    p.add_argument("--input", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--min-f1", type=float, default=0.0)
    p.add_argument("--sweep", action="store_true",
                   help="grid sweep over (bands, tau) instead of one run")
    p.add_argument("--taus", help="comma-separated tau grid (with --sweep)")
    p.add_argument("--bands", help="comma-separated num_bands grid (with --sweep)")
    _add_config_flags(p)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("fixture", help="generate a labeled synthetic corpus")
    p.add_argument("--out", required=True)
    p.add_argument("--n-base", type=int, default=200)
    p.add_argument("--viral-fanout", type=int, default=60)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--shuffle", action="store_true")
    p.set_defaults(fn=cmd_fixture)

    p = sub.add_parser("watch", help="continuous ingest: tail a shard directory")
    p.add_argument("--watch-dir", required=True, dest="watch_dir")
    p.add_argument("--poll-interval", type=float, default=5.0, dest="poll_interval")
    p.add_argument("--max-cycles", type=int, default=None, dest="max_cycles")
    p.add_argument("--stop-after-idle", type=int, default=None, dest="stop_after_idle")
    _add_config_flags(p)
    p.set_defaults(fn=cmd_watch)

    p = sub.add_parser("ann-index",
                       help="build the persisted IVF ANN index (build once)")
    p.add_argument("embeddings", help="embeddings parquet path")
    p.add_argument("out", help="index output directory")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--emb-col", default="embedding")
    p.add_argument("--centroids", type=int, default=32)
    p.add_argument("--train-sample", type=int, default=16_384)
    p.add_argument("--seed", type=int, default=42)
    p.set_defaults(fn=cmd_ann_index)

    p = sub.add_parser("serve", help="HTTP serving surface over a completed run")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--ann-index", default=None,
                   help="persisted IVF index dir for /ann "
                        "(default: <work_dir>/ann_index if present)")
    _add_config_flags(p)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="repo bench harness (bench.py)")
    p.add_argument("--scaling", action="store_true")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
