"""CLI — the reference's ``codesearch index|search|stats`` surface
(/root/reference/codesearch/cli/main.py) over the distributed engine.

Usage:
    python -m distributedcodesearchengine_ray.cli index  <corpus_dir> --index-dir DIR [--mode entity|file] [--no-resume] [--embeddings]
    python -m distributedcodesearchengine_ray.cli search "<query>" --index-dir DIR [--limit N]
        [--language L] [--entity-type T] [--repo R] [--hybrid] [--method dense|wand]
    python -m distributedcodesearchengine_ray.cli stats  --index-dir DIR
    python -m distributedcodesearchengine_ray.cli serve  --index-dir DIR [--host H] [--port P]
    python -m distributedcodesearchengine_ray.cli version

Owns its Ray session (guarded init; the driver-facing entry points never
call ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="distributedcodesearchengine-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="build the sharded index from a parquet corpus")
    pi.add_argument("corpus")
    pi.add_argument("--index-dir", required=True)
    pi.add_argument("--mode", choices=["entity", "file"], default="entity")
    pi.add_argument("--no-resume", action="store_true")
    pi.add_argument("--embeddings", action="store_true")
    pi.add_argument("--docs-per-partition", type=int, default=10_000)

    ps = sub.add_parser("search", help="BM25 / hybrid search")
    ps.add_argument("query")
    ps.add_argument("--index-dir", required=True)
    ps.add_argument("--limit", type=int, default=20)
    ps.add_argument("--language")
    ps.add_argument("--entity-type")
    ps.add_argument("--repo")
    ps.add_argument("--hybrid", action="store_true")
    ps.add_argument("--method", choices=["dense", "wand"], default="dense")
    ps.add_argument(
        "--ann", choices=["exact", "lsh", "ivf"], default="exact",
        help="semantic-side strategy for --hybrid (lsh/ivf need the matching embeddings layout)",
    )

    pt = sub.add_parser("stats", help="index stats")
    pt.add_argument("--index-dir", required=True)

    pg = sub.add_parser("ingest", help="walk a checked-out repo tree into a parquet corpus")
    pg.add_argument("repo_dir")
    pg.add_argument("--out", required=True, help="corpus output directory")
    pg.add_argument("--repo", help="repo name (default: directory basename)")

    pv = sub.add_parser("serve", help="run the HTTP API server")
    pv.add_argument("--index-dir", required=True)
    pv.add_argument("--host", default="127.0.0.1")
    pv.add_argument("--port", type=int, default=8080)
    pv.add_argument("--mode", choices=["entity", "file"], default="entity")

    sub.add_parser("version", help="print the engine version")

    args = p.parse_args(argv)

    if args.cmd == "version":
        from . import __version__

        print(json.dumps({"version": __version__}))
        return 0

    if args.cmd == "ingest":  # pure-filesystem walk; no Ray session needed
        import os

        from .sources.ingest import ingest_directory

        out = ingest_directory(args.repo_dir, args.out, repo_name=args.repo)
        import pyarrow.parquet as pq

        n = sum(
            pq.ParquetFile(os.path.join(out, f)).metadata.num_rows
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        print(json.dumps({"corpus": out, "files_ingested": n}))
        return 0

    if args.cmd == "serve":
        _ensure_ray()
        from .server import SearchServer

        srv = SearchServer(args.index_dir, args.host, args.port, mode=args.mode)
        print(f"serving on {args.host}:{srv.start()}", flush=True)
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            srv.stop()
        return 0

    import os

    if args.cmd in ("search", "stats") and not os.path.exists(
        os.path.join(args.index_dir, "manifest.json")
    ):
        print(
            f"error: no index at {args.index_dir} (run `index` first)", file=sys.stderr
        )
        return 2
    _ensure_ray()
    from .engine import CodeSearchEngine

    eng = CodeSearchEngine(
        args.index_dir,
        mode=getattr(args, "mode", "entity"),
        ann_method=getattr(args, "ann", "exact"),
    )
    try:
        if args.cmd == "index":
            m = eng.index_corpus(
                args.corpus,
                resume=not args.no_resume,
                with_embeddings=args.embeddings,
                docs_per_partition=args.docs_per_partition,
            )
            print(
                json.dumps(
                    {
                        "n_docs": m.n_docs,
                        "vocab_size": m.vocab_size,
                        "num_partitions": m.num_partitions,
                        "build_id": m.build_id,
                        "phase_sec": m.extra.get("phase_sec", {}),
                    }
                )
            )
        elif args.cmd == "search":
            hits = eng.search(
                args.query,
                limit=args.limit,
                language=args.language,
                entity_type=args.entity_type,
                repo_filter=args.repo,
                use_hybrid=args.hybrid,
                method=args.method,
            )
            for h in hits:
                print(
                    json.dumps(
                        {
                            k: h.get(k)
                            for k in (
                                "rank", "doc_id", "score", "name", "path",
                                "file_path", "signature", "highlights",
                            )
                            if k in h
                        },
                        default=str,
                    )
                )
        elif args.cmd == "stats":
            print(json.dumps(eng.stats()))
    finally:
        eng.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
