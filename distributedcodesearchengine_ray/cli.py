"""CLI — the reference's ``codesearch index|search|stats`` surface
(/root/reference/codesearch/cli/main.py) over the distributed engine.

Usage:
    python -m distributedcodesearchengine_ray.cli index  <corpus_dir> --index-dir DIR [--mode entity|file] [--no-resume] [--embeddings]
    python -m distributedcodesearchengine_ray.cli search "<query>" --index-dir DIR [--limit N]
        [--language L] [--entity-type T] [--repo R] [--hybrid] [--method dense|wand|fuzzy|regexp|common_terms|decay]
    python -m distributedcodesearchengine_ray.cli stats  --index-dir DIR
    python -m distributedcodesearchengine_ray.cli dedup  <table> [--method exact|minhash|simhash|ngram|embed]
        [--threshold J] [--clusters] [--out DIR]
    python -m distributedcodesearchengine_ray.cli grep   "<needle>" <corpus_dir> --index-dir DIR
        [--regex] [--ignore-case] [--files-only] [--limit N]
    python -m distributedcodesearchengine_ray.cli compact --index-dir DIR [--max-docs N] [--max-bytes B]
    python -m distributedcodesearchengine_ray.cli merge  IDX_A IDX_B --out DIR
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
    pi.add_argument(
        "--append", action="store_true",
        help="add the corpus to an existing index (new docs get the next "
        "docIDs; old partitions untouched)",
    )
    pi.add_argument(
        "--dedup-on-insert", action="store_true",
        help="with --append: drop files whose exact content is already indexed",
    )
    pi.add_argument(
        "--positions", action="store_true",
        help="also build per-term position postings (positional phrase search)",
    )

    ps = sub.add_parser("search", help="BM25 / hybrid search")
    ps.add_argument("query")
    ps.add_argument("--index-dir", required=True)
    ps.add_argument("--limit", type=int, default=20)
    ps.add_argument("--language")
    ps.add_argument("--entity-type")
    ps.add_argument("--repo")
    ps.add_argument("--hybrid", action="store_true")
    ps.add_argument("--method", choices=["dense", "wand", "fuzzy", "regexp", "common_terms", "decay"], default="dense")
    ps.add_argument(
        "--facets",
        metavar="COL",
        help="print COL value counts over the full thresholded result set "
        "instead of ranked hits (e.g. --facets language)",
    )
    ps.add_argument(
        "--collapse",
        metavar="COL",
        help="field collapsing: print the best hit per distinct COL value "
        "(top --limit groups) instead of ranked hits",
    )
    ps.add_argument(
        "--ranker",
        choices=["bm25", "qld"],
        default="bm25",
        help="scoring function: BM25 (reference semantics) or "
        "query-likelihood Dirichlet",
    )
    ps.add_argument(
        "--range-syntax", action="store_true",
        help="enable lo..hi term-range chunks in the query "
        "(TermRangeQuery expansion; off by default so '..' is literal)",
    )
    ps.add_argument(
        "--positional", action="store_true",
        help="positional phrase search: the query tokens must appear "
        "adjacently in order (needs an index built with --positions)",
    )
    ps.add_argument(
        "--slop", type=int, default=0,
        help="with --positional: allow up to SLOP skipped tokens between "
        "consecutive phrase tokens (ordered proximity)",
    )
    ps.add_argument(
        "--ann", choices=["exact", "lsh", "ivf"], default="exact",
        help="semantic-side strategy for --hybrid (lsh/ivf need the matching embeddings layout)",
    )
    ps.add_argument(
        "--expand", action="store_true",
        help="pseudo-relevance-feedback expansion (RM3): top feedback docs "
        "contribute their strongest tf*idf terms to the query before re-ranking",
    )
    ps.add_argument("--fb-k", type=int, default=10, help="with --expand: feedback depth")
    ps.add_argument("--n-exp", type=int, default=10, help="with --expand: expansion terms")

    pm = sub.add_parser("similar", help="find docs similar to doc_id (more-like-this)")
    pm.add_argument("doc_id", type=int)
    pm.add_argument("--index-dir", required=True)
    pm.add_argument("--limit", type=int, default=20)
    pm.add_argument("--language")
    pm.add_argument("--entity-type")
    pm.add_argument("--repo")

    pu = sub.add_parser("suggest", help="spelling suggestions from the index vocabulary")
    pu.add_argument("term")
    pu.add_argument("--index-dir", required=True)
    pu.add_argument("--max-dist", type=int, default=1)
    pu.add_argument("--limit", type=int, default=10)

    pt = sub.add_parser("stats", help="index stats")
    pt.add_argument("--index-dir", required=True)

    pc_ = sub.add_parser(
        "compact", help="merge small appended segments (search-identical)"
    )
    pc_.add_argument("--index-dir", required=True)
    pc_.add_argument("--max-docs", type=int, default=200_000)
    pc_.add_argument("--max-bytes", type=int, default=256 << 20)

    pm = sub.add_parser(
        "merge", help="segment-merge two indexes (== appending B's corpus to A)"
    )
    pm.add_argument("index_a")
    pm.add_argument("index_b")
    pm.add_argument("--out", required=True, help="output index dir (must be empty)")

    pg = sub.add_parser("ingest", help="walk a checked-out repo tree into a parquet corpus")
    pg.add_argument("repo_dir")
    pg.add_argument("--out", required=True, help="corpus output directory")
    pg.add_argument("--repo", help="repo name (default: directory basename)")

    pd_ = sub.add_parser(
        "dedup", help="near-duplicate analysis over a parquet document table"
    )
    pd_.add_argument("table", help="parquet file or directory with id+text columns")
    pd_.add_argument(
        "--method",
        choices=["exact", "minhash", "simhash", "ngram", "embed"],
        default="ngram",
        help="exact hash | MinHash-LSH candidates | SimHash candidates | "
        "exact n-gram Jaccard join | embedding cosine (needs an embedding column)",
    )
    pd_.add_argument("--threshold", type=float, default=0.5)
    pd_.add_argument("--max-hamming", type=int, default=3, help="simhash cutoff")
    pd_.add_argument("--id-col", default="doc_id")
    pd_.add_argument("--text-col", default="text")
    pd_.add_argument(
        "--clusters", action="store_true",
        help="also group pairs into transitive families (connected components)",
    )
    pd_.add_argument("--out", help="write pairs/survivors parquet here")
    pd_.add_argument("--limit", type=int, default=10, help="rows to print")

    pcu = sub.add_parser(
        "curate",
        help="end-to-end training-data curation funnel over a parquet "
        "document table: exact dedup -> Gopher gate -> benchmark "
        "decontamination -> token-budget selection; writes the slim "
        "per-doc flag table, the selected doc ids, and the audit",
    )
    pcu.add_argument("table", help="documents parquet file, or a directory containing documents.parquet")
    pcu.add_argument("--out", required=True, help="output dir: flags/ selected/ audit.json")
    pcu.add_argument(
        "--benchmark",
        help="decontamination benchmark file: parquet with a 'text' "
        "column, or plain text one entry per line (default: the "
        "synthetic doc_id %% 19 half of the input, for demos)",
    )

    pr = sub.add_parser(
        "grep",
        help="exact substring/regex search over corpus file contents "
        "(trigram index, built on first use under --index-dir)",
    )
    pr.add_argument("needle")
    pr.add_argument("corpus", help="parquet corpus directory")
    pr.add_argument("--index-dir", required=True)
    pr.add_argument("--regex", action="store_true", help="RE2 regex (per line)")
    pr.add_argument("--ignore-case", action="store_true")
    pr.add_argument("--files-only", action="store_true", help="print matching files, not lines")
    pr.add_argument("--limit", type=int, default=20, help="rows to print (0 = all)")

    px = sub.add_parser(
        "delete",
        help="tombstone-delete docs (logical delete; no partition rewrite)",
    )
    px.add_argument("value", help="value to delete, e.g. a repo name")
    px.add_argument("--index-dir", required=True)
    px.add_argument(
        "--column", default="repo_name",
        help="docmeta column to match (default repo_name; file mode: repo)",
    )

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

    if args.cmd == "curate":
        _ensure_ray()
        import os
        import tempfile

        import ray.data as rd

        from .pipelines import queries as Q
        from .stages.selection import token_budget_select

        src = os.path.abspath(args.table)
        if os.path.isdir(src):
            in_dir = src
            if not os.path.exists(os.path.join(in_dir, "documents.parquet")):
                print(json.dumps({"error": "directory has no documents.parquet"}))
                return 2
        else:  # single parquet file: present it under the expected name
            in_dir = tempfile.mkdtemp(prefix="curate_in_", dir="/tmp")
            os.symlink(src, os.path.join(in_dir, "documents.parquet"))
        import shutil

        os.makedirs(args.out, exist_ok=True)
        flags_dir = os.path.join(args.out, "flags")
        sel_dir = os.path.join(args.out, "selected")
        # a re-run must replace, not append: Ray's parquet sink adds
        # UUID-named files next to a previous run's, and every
        # downstream read would silently sum both runs
        for d in (flags_dir, sel_dir):
            shutil.rmtree(d, ignore_errors=True)
        audit = Q.curation_funnel(
            in_dir,
            flags_path=flags_dir,
            benchmark_path=os.path.abspath(args.benchmark) if args.benchmark else None,
        )
        # selection membership: the same budget walk over the persisted
        # slim flags (token_budget_select reuses the funnel's semantics)
        s3 = rd.read_parquet(
            flags_dir,
            columns=["doc_id", "n_tokens", "score", "gopher", "contaminated", "winner"],
        ).filter(expr="winner == 1 and gopher == 1 and contaminated == 0")
        selected = token_budget_select(
            s3, Q.TOKEN_BUDGET_NUM, Q.TOKEN_BUDGET_DEN
        ).select_columns(["doc_id", "score", "n_tokens"])
        selected.write_parquet(sel_dir)
        rows = audit.to_pylist()
        with open(os.path.join(args.out, "audit.json"), "w") as f:
            json.dump(rows, f, indent=1)
        print(json.dumps({
            "out": args.out,
            "stages": {r["stage"]: {"n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
                       for r in rows},
        }))
        return 0

    if args.cmd == "dedup":
        _ensure_ray()
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        paths = args.table
        if os.path.isdir(paths):
            paths = [
                os.path.join(paths, f)
                for f in sorted(os.listdir(paths))
                if f.endswith(".parquet")
            ]
        if args.method == "exact":
            if args.clusters:
                print(
                    "error: --clusters applies to pair-producing methods "
                    "(minhash/simhash/ngram/embed); exact dedup already returns "
                    "one survivor per identical-content group",
                    file=sys.stderr,
                )
                return 2
            from .stages.dedup import exact_dedup

            ds = rd.read_parquet(paths)
            n_in = ds.count()
            kept = exact_dedup(ds, text_col=args.text_col, id_col=args.id_col)
            if args.out:
                import shutil

                # Ray writes uniquely-named files and never clears the dir;
                # stale survivors from a previous run would mix in and be
                # double-counted
                shutil.rmtree(args.out, ignore_errors=True)
                kept.write_parquet(args.out)
                n_kept = sum(
                    pq.ParquetFile(os.path.join(args.out, f)).metadata.num_rows
                    for f in os.listdir(args.out)
                    if f.endswith(".parquet")
                )
            else:
                n_kept = kept.count()
            print(
                json.dumps(
                    {"method": "exact", "rows_in": n_in, "rows_kept": n_kept,
                     "dropped": n_in - n_kept, "out": args.out}
                )
            )
            return 0
        if args.method == "minhash":
            from .stages.dedup import minhash_lsh_candidates

            ds = rd.read_parquet(paths, columns=[args.id_col, args.text_col])
            pairs = (
                minhash_lsh_candidates(ds, text_col=args.text_col, id_col=args.id_col)
                .to_pandas()
                .drop_duplicates(["id_a", "id_b"], ignore_index=True)
            )
            pairs_tbl = pa.Table.from_pandas(pairs, preserve_index=False)
            exactness = "candidates (LSH, verify downstream)"
        elif args.method == "simhash":
            from .stages.dedup import simhash_candidates

            ds = rd.read_parquet(paths, columns=[args.id_col, args.text_col])
            cand = simhash_candidates(ds, text_col=args.text_col, id_col=args.id_col)
            cdf = cand.to_pandas().drop_duplicates(["id_a", "id_b"], ignore_index=True)
            cdf = cdf[cdf["hamming"] <= args.max_hamming].reset_index(drop=True)
            pairs_tbl = pa.Table.from_pandas(cdf, preserve_index=False)
            exactness = f"candidates (SimHash Hamming<={args.max_hamming})"
        elif args.method == "embed":
            from .stages.dedup import embedding_cosine_dups_exact

            ds = rd.read_parquet(paths)
            id_col = args.id_col
            names = ds.schema().names
            if id_col not in names and "vec_id" in names:
                id_col = "vec_id"  # embeddings tables key on vec_id
            pairs_ds = embedding_cosine_dups_exact(
                ds, threshold=args.threshold, id_col=id_col
            )
            pairs_tbl = pa.concat_tables(
                ray.get(pairs_ds.to_arrow_refs()), promote_options="default"
            )
            exactness = "exact (cosine)"
        else:  # ngram
            from .stages.simjoin import ngram_jaccard_join

            ds = rd.read_parquet(paths, columns=[args.id_col, args.text_col])
            pairs_tbl = ngram_jaccard_join(
                ds, threshold=args.threshold, id_col=args.id_col, text_col=args.text_col
            )
            exactness = "exact (prefix-filter Jaccard)"
        summary = {
            "method": args.method,
            "exactness": exactness,
            "pairs": pairs_tbl.num_rows,
        }
        if args.clusters:
            from .stages.components import connected_components

            cc = connected_components(pairs_tbl)
            summary["clustered_docs"] = cc.num_rows
            summary["clusters"] = len(set(cc["cluster_id"].to_pylist()))
            if args.out:
                os.makedirs(args.out, exist_ok=True)
                pq.write_table(cc, os.path.join(args.out, "clusters.parquet"))
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pairs_tbl, os.path.join(args.out, "pairs.parquet"))
            summary["out"] = args.out
        print(json.dumps(summary))
        for row in pairs_tbl.slice(0, args.limit).to_pylist():
            print(json.dumps(row, default=str))
        return 0

    if args.cmd == "grep":
        _ensure_ray()
        import os
        import time

        from .stages.corpus_grep import build_corpus_trigram_index, corpus_grep

        tri_dir = os.path.join(args.index_dir, "trigram")
        t0 = time.time()
        build_corpus_trigram_index(args.corpus, tri_dir)
        build_sec = round(time.time() - t0, 3)
        t0 = time.time()
        hits = corpus_grep(
            tri_dir,
            args.corpus,
            args.needle,
            regex=args.regex,
            ignore_case=args.ignore_case,
        )
        if args.files_only:
            import pyarrow as pa

            hits = (
                hits.group_by(["repo", "path"])
                .aggregate([("line_no", "count")])
                .rename_columns(["repo", "path", "n_lines"])
                .sort_by([("repo", "ascending"), ("path", "ascending")])
            )
        print(
            json.dumps(
                {
                    "matches": hits.num_rows,
                    "index_build_sec": build_sec,
                    "grep_sec": round(time.time() - t0, 3),
                }
            )
        )
        n = hits.num_rows if args.limit == 0 else min(args.limit, hits.num_rows)
        for row in hits.slice(0, n).to_pylist():
            print(json.dumps(row, default=str))
        return 0

    if args.cmd == "merge":
        _ensure_ray()
        from .pipelines.build_index import merge_indexes

        m = merge_indexes(args.index_a, args.index_b, args.out)
        print(
            json.dumps(
                {
                    "n_docs": m.n_docs,
                    "vocab_size": m.vocab_size,
                    "num_partitions": m.num_partitions,
                    "build_id": m.build_id,
                    "merged_from": m.extra.get("merged_from", []),
                }
            )
        )
        return 0

    if args.cmd == "compact":
        _ensure_ray()
        from .pipelines.build_index import compact_index

        m = compact_index(
            args.index_dir,
            max_docs_per_partition=args.max_docs,
            max_bytes_per_partition=args.max_bytes,
        )
        print(
            json.dumps(
                {
                    "n_docs": m.n_docs,
                    "live_partitions": len(m.partitions),
                    "compactions": m.extra.get("compactions", []),
                }
            )
        )
        return 0

    if args.cmd == "delete":
        _ensure_ray()
        from .pipelines.build_index import tombstone_delete

        m = tombstone_delete(args.index_dir, args.column, args.value)
        print(
            json.dumps(
                {
                    "n_docs": m.n_docs,
                    "vocab_size": m.vocab_size,
                    "tombstoned_docs": m.extra.get("tombstoned_docs", 0),
                    "deletes": m.extra.get("deletes", []),
                }
            )
        )
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

    if args.cmd in ("search", "similar", "suggest", "stats") and not os.path.exists(
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
            if args.append:
                from .pipelines.build_index import append_index

                m = append_index(
                    args.index_dir,
                    args.corpus,
                    dedup_on_insert=args.dedup_on_insert,
                    docs_per_partition=args.docs_per_partition,
                    resume=not args.no_resume,
                )
            else:
                m = eng.index_corpus(
                    args.corpus,
                    resume=not args.no_resume,
                    with_embeddings=args.embeddings,
                    docs_per_partition=args.docs_per_partition,
                    with_positions=args.positions,
                )
            print(
                json.dumps(
                    {
                        "n_docs": m.n_docs,
                        "vocab_size": m.vocab_size,
                        "num_partitions": m.num_partitions,
                        "build_id": m.build_id,
                        "appends": len(m.extra.get("appends", [])),
                        "phase_sec": m.extra.get("phase_sec", {}),
                    }
                )
            )
        elif args.cmd == "search" and args.positional:
            qe = eng._bm25()
            filters = {}
            if args.language:
                filters["language"] = args.language
            if args.entity_type:
                filters["entity_type"] = args.entity_type
            if args.repo:
                filters["repo_name"] = args.repo
            hits = qe.search_phrase_positional(
                args.query, limit=args.limit, filters=filters or None,
                slop=args.slop,
            )
            df = qe.hits_with_meta(hits)
            for rank, row in enumerate(df.to_dict("records")):
                print(
                    json.dumps(
                        {
                            "rank": rank,
                            **{
                                k: row.get(k)
                                for k in ("doc_id", "score", "name", "path",
                                          "file_path", "signature")
                                if k in row
                            },
                        },
                        default=str,
                    )
                )
        elif args.cmd == "search" and args.facets:
            counts = eng.facets(
                args.query,
                facet_col=args.facets,
                language=args.language,
                entity_type=args.entity_type,
                repo_filter=args.repo,
            )
            print(
                json.dumps(
                    {"query": args.query, "facet": args.facets,
                     "total": sum(counts.values()), "counts": counts}
                )
            )
        elif args.cmd == "search" and args.collapse:
            rows = eng.collapse(args.query, collapse_col=args.collapse, limit=args.limit)
            for r in rows:
                print(json.dumps(r))
        elif args.cmd == "search" and args.ranker == "qld":
            for rank, h in enumerate(eng.search_qld(args.query, limit=args.limit)):
                print(json.dumps({"rank": rank, **h}))
        elif args.cmd == "search":
            if args.expand:
                hits = eng.search_expanded(
                    args.query,
                    limit=args.limit,
                    fb_k=args.fb_k,
                    n_exp=args.n_exp,
                    language=args.language,
                    entity_type=args.entity_type,
                    repo_filter=args.repo,
                )
            else:
                hits = eng.search(
                    args.query,
                    limit=args.limit,
                    language=args.language,
                    entity_type=args.entity_type,
                    repo_filter=args.repo,
                    use_hybrid=args.hybrid,
                    method=args.method,
                    range_syntax=args.range_syntax,
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
        elif args.cmd == "similar":
            hits = eng.find_similar(
                args.doc_id,
                limit=args.limit,
                language=args.language,
                entity_type=args.entity_type,
                repo_filter=args.repo,
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
        elif args.cmd == "suggest":
            for row in eng.suggest(args.term, max_dist=args.max_dist, limit=args.limit):
                print(json.dumps(row))
        elif args.cmd == "stats":
            print(json.dumps(eng.stats()))
    finally:
        eng.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
