"""`ray job submit` entrypoint for the full build+query job.

On a real cluster:

    ray job submit --working-dir /root/repo -- \
        python jobs/build_job.py --corpus s3://bucket/corpus --index-dir /shared/idx

In this sandbox there is no job-submission server (no dashboard), so the
same entrypoint runs as a plain script against the local Ray:

    python jobs/build_job.py --corpus /tmp/rcs_bench/corpus-200000-r4 --index-dir /tmp/idx

Prints one JSON line of build + query metrics (same shape the per-round
bench records), and exercises checkpoint-resume: re-submitting the same job
against the same index dir skips completed partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--index-dir", required=True)
    p.add_argument("--mode", default="entity", choices=["entity", "file"])
    p.add_argument("--docs-per-partition", type=int, default=10_000)
    p.add_argument("--queries", nargs="*", default=["parse json", "send HTTP request"])
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine

    t0 = time.time()
    manifest = build_index(
        args.corpus, args.index_dir, mode=args.mode,
        docs_per_partition=args.docs_per_partition, resume=True,
    )
    build_sec = time.time() - t0

    engine = QueryEngine(args.index_dir, prewarm_terms=128)
    try:
        t0 = time.time()
        results = engine.search_batch([(q, None) for q in args.queries], limit=10)
        query_sec = time.time() - t0
    finally:
        engine.close()

    print(
        json.dumps(
            {
                "n_docs": manifest.n_docs,
                "vocab_size": manifest.vocab_size,
                "num_partitions": manifest.num_partitions,
                "build_sec": round(build_sec, 3),
                "phase_sec": manifest.extra.get("phase_sec", {}),
                "query_sec": round(query_sec, 3),
                "hits": {q: len(r) for q, r in zip(args.queries, results)},
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
