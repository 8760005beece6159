"""Benchmark harness (driver-run per round; also the scaling evidence).

Headline: entity-mode inverted-index build throughput (files/sec) over the
deterministic synthetic corpus, plus warm query latency p50/p99 over the
reference-style query set, plus the training-data pipelines over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N}

``--scaling``: runs the same build+query job in fresh processes at
num_cpus=N and 4N (default 4 vs 16 — below this VM's ~16-worker memory
bandwidth wall, see BASELINE.md; override GRAFT_SCALE_LO/HI) on identical
input and reports both throughputs plus efficiency = (t_lo / t_hi) / 4,
the sandbox stand-in for N-vs-4N nodes.  Scale the input with
GRAFT_BENCH_FILES: at 1M files the parallel phases dominate the fixed
per-execution overheads that cap the ratio on 7-second builds.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

BENCH_QUERIES = [
    "JSON parsing",
    "parse json",
    "send HTTP request",
    "validate an email address",
    "import return",
    "json json parse",
    "download file save disk",
    "HTTPClientFactory",
    "merge sorted lists",
    "authenticate user token",
    "retry request backoff",
    "load configuration environment",
]


PIPELINES = (
    ("substring_search", "substring_search"),
    ("regex_search", "regex_search"),
    ("bm25_topk", "bm25_topk"),
    ("phrase_positional", "phrase_positional"),
    ("bm25_tombstone", "bm25_tombstone"),
    ("bm25_rm3", "bm25_rm3"),
    ("snippet_windows", "snippet_windows"),
    ("term_df_top100", "term_df_top100"),
    ("dedup_exact", "dedup_exact"),
    ("minhash_near_dups", "minhash_near_dups"),
    ("ngram_jaccard_dups", "ngram_jaccard_dups"),
    ("dedup_clusters", "dedup_clusters"),
    ("doc_pagerank", "doc_pagerank"),
    ("embed_cosine_dups", "embed_cosine_dups"),
    ("kmeans_clusters", "kmeans_clusters"),
    ("knn_cosine", "knn_cosine"),
    ("knn_int8", "knn_int8"),
    ("heavy_hitter_tokens", "heavy_hitter_tokens"),
    ("repetition_stats", "repetition_stats_q"),
    ("lm_perplexity", "lm_perplexity"),
    ("dsir_weights", "dsir_weights_q"),
    ("dsir_select", "dsir_select_q"),
    ("tfidf_keywords", "tfidf_keywords_q"),
    ("term_cooccurrence", "term_cooccurrence_q"),
    ("semantic_dedup", "semantic_dedup_q"),
    ("nb_classify", "nb_classify"),
    ("bpe_vocab", "bpe_vocab"),
    ("pack_sequences", "pack_sequences_q"),
    ("stratified_sample", "stratified_sample_q"),
    ("decontaminate", "decontaminate_q"),
    ("line_dedup", "line_dedup"),
    ("dup_spans", "dup_spans"),
    ("global_shuffle", "global_shuffle"),
    ("training_mix", "training_mix"),
    ("doc_chunks", "doc_chunks"),
    ("gopher_gate", "gopher_gate_q"),
    ("dedup_keep_best", "dedup_keep_best"),
    ("significant_terms", "significant_terms"),
    ("token_budget_select", "token_budget_select_q"),
    ("clean_text", "clean_text_q"),
    ("token_quantiles", "token_quantiles"),
    ("q1_lineitem", "q1_lineitem"),
    ("q3_shipping", "q3_shipping"),
    ("events_hourly", "events_hourly"),
    ("events_sliding", "events_sliding"),
    ("sessionize", "sessionize"),
    ("clicks_last_purchase", "clicks_last_purchase"),
    ("purchases_before_click", "purchases_before_click"),
    ("events_rollup", "events_rollup"),
    ("events_cube", "events_cube"),
    ("user_running_value", "user_running_value"),
    ("user_moving_sum", "user_moving_sum"),
    ("user_event_gaps", "user_event_gaps"),
    ("user_set_ops", "user_set_ops"),
    ("event_type_sample", "event_type_sample"),
    ("token_quantiles_by_lang", "token_quantiles_by_lang"),
    ("customers_no_urgent", "customers_no_urgent"),
    ("doc_deciles", "doc_deciles"),
    ("lineitem_profile", "lineitem_profile"),
    ("knn_pq", "knn_pq"),
    ("knn_ivfpq", "knn_ivfpq"),
    ("hard_negatives", "hard_negatives"),
    ("media_pipeline", "media_pipeline"),
    ("alpha_mix_sample", "alpha_mix_sample"),
    ("dup_triangles", "dup_triangles"),
    ("q5_local_supplier_volume", "q5_local_supplier_volume"),
    ("cohort_retention", "cohort_retention"),
    ("vocab_set_ops", "vocab_set_ops"),
    ("length_outliers", "length_outliers"),
    ("nation_above_avg_orders", "nation_above_avg_orders"),
    ("custdist", "custdist"),
    ("small_qty_revenue", "small_qty_revenue"),
    ("large_volume_orders", "large_volume_orders"),
    ("value_percentiles", "value_percentiles"),
    ("entropy_by_lang", "entropy_by_lang"),
    ("urgent_lineitems_semi", "urgent_lineitems_semi"),
    ("bm25_fuzzy", "bm25_fuzzy"),
    ("bm25_msm", "bm25_msm"),
    ("rolling_distinct_users", "rolling_distinct_users"),
    ("value_mad_by_type", "value_mad_by_type"),
    ("hourly_anomalies", "hourly_anomalies"),
    ("event_transitions", "event_transitions"),
    ("cdc_upsert", "cdc_upsert"),
    ("cdc_incremental_agg", "cdc_incremental_agg"),
    ("supplier_cnt_by_parttype", "supplier_cnt_by_parttype"),
    ("spend_rank_in_nation", "spend_rank_in_nation"),
    ("user_value_twap", "user_value_twap"),
    ("weighted_median_price", "weighted_median_price"),
    ("q4_order_priority", "q4_order_priority"),
    ("q9_product_profit", "q9_product_profit"),
    ("q12_priority_by_returnflag", "q12_priority_by_returnflag"),
    ("q21_waiting_suppliers", "q21_waiting_suppliers"),
    ("lineitem_matrix_stats", "lineitem_matrix_stats"),
    ("weighted_avg_price", "weighted_avg_price"),
    ("match_phrase_prefix", "match_phrase_prefix"),
    ("bm25_rescore", "bm25_rescore"),
    ("multi_match_bm25f", "multi_match_bm25f"),
    ("significant_text", "significant_text"),
    ("eql_sequence", "eql_sequence"),
    ("bm25_term_range", "bm25_term_range"),
    ("federated_search", "federated_search"),
    ("ks_test_value", "ks_test_value"),
    ("spearman_qty_discount", "spearman_qty_discount"),
    ("cusum_daily_revenue", "cusum_daily_revenue"),
    ("scd2_intervals", "scd2_intervals"),
    ("geo_distance_rings", "geo_distance_rings"),
    ("geohash_cells", "geohash_cells"),
    ("geotile_cells", "geotile_cells"),
    ("rank_eval_pr", "rank_eval_pr"),
    ("has_child_orders", "has_child_orders"),
    ("logreg_lang_en", "logreg_lang_en"),
    ("moving_percentiles_daily", "moving_percentiles_daily"),
    ("linear_attribution", "linear_attribution"),
    ("categorize_text_docs", "categorize_text_docs"),
    ("curation_funnel", "curation_funnel"),
    ("span_containing", "span_containing_q"),
    ("geo_bounds_centroid", "geo_bounds_centroid"),
    ("knn_radius", "knn_radius"),
    ("frequent_itemsets", "frequent_itemsets"),
    ("hybrid_linear", "hybrid_linear"),
    ("holt_daily_revenue", "holt_daily_revenue"),
    ("daily_revenue_normalize", "daily_revenue_normalize"),
    ("orders_top_with_ties", "orders_top_with_ties"),
    ("orders_date_range_agg", "orders_date_range_agg"),
    ("weekly_event_rate", "weekly_event_rate"),
    ("bm25_count", "bm25_count"),
    # round-4 additions
    ("filters_agg_orders", "filters_agg_orders"),
    ("top_metrics_by_type", "top_metrics_by_type"),
    ("bm25_distance_feature", "bm25_distance_feature"),
    ("combined_fields", "combined_fields_bm25"),
    ("span_within", "span_within_q"),
)


def _time_pipelines(Q, sf_dir: str, only: set, results: dict) -> None:
    import ray.data

    for name, attr in PIPELINES:
        if only and name not in only:
            continue
        fn = getattr(Q, attr)
        t0 = time.time()
        res = fn(sf_dir)
        try:  # force execution if lazy
            if isinstance(res, ray.data.Dataset):
                res.count()
        except Exception:
            pass
        results[f"{name}_sec"] = round(time.time() - t0, 3)


def _run_pipelines(sf_dir: str, num_cpus: int, only: set, results: dict) -> dict:
    """GRAFT_BENCH_PIPELINES_ONLY path: just the sf-dir pipeline entries
    (optionally GRAFT_BENCH_ONLY-filtered) on an already-warm box — the
    interleaved re-measure protocol's unit of work."""
    import shutil as _sh
    import glob as _glob

    from distributedcodesearchengine_ray.pipelines import queries as Q

    # untimed warmup: spin up the task-worker pool (process start + module
    # imports) so the FIRST timed entry doesn't absorb it — the full-bench
    # path gets this for free from the untimed mini-build
    import ray.data as _rd

    _rd.range(100_000, override_num_blocks=max(64, 2 * num_cpus)).map_batches(
        lambda t: t, batch_format="pyarrow"
    ).count()

    if not only or {"substring_search", "regex_search", "grep_lines"} & only:
        for stale in _glob.glob("/tmp/rcs_cache/tridx-*"):
            _sh.rmtree(stale, ignore_errors=True)
        t0 = time.time()
        Q._trigram_index(sf_dir)
        results["trigram_build_sec"] = round(time.time() - t0, 3)
    _time_pipelines(Q, sf_dir, only, results)
    total = sum(v for k, v in results.items() if k.endswith("_sec"))
    out = {
        "metric": "pipeline secs (pipelines-only mode)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": results,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    import ray

    ray.shutdown()
    return out


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("GRAFT_BENCH_FILES", "200000"))
    richness = int(os.environ.get("GRAFT_BENCH_RICHNESS", "4"))

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from distributedcodesearchengine_ray.pipelines import queries as Q
    from distributedcodesearchengine_ray.pipelines.build_index import build_index
    from distributedcodesearchengine_ray.pipelines.query import QueryEngine
    from distributedcodesearchengine_ray.sources.corpus import write_corpus

    results: dict = {}

    # re-measure protocol (BASELINE.md "drift"): GRAFT_BENCH_PIPELINES_ONLY
    # skips corpus/build/query/append/merge and runs just the sf-dir
    # pipeline entries; GRAFT_BENCH_ONLY=a,b,c filters to named entries.
    # Interleaving several such runs on an idle box is how round-over-round
    # pipeline deltas are separated from the box's ~2x ambient drift.
    only = {s for s in os.environ.get("GRAFT_BENCH_ONLY", "").split(",") if s}
    pipelines_only = bool(os.environ.get("GRAFT_BENCH_PIPELINES_ONLY"))
    if pipelines_only:
        return _run_pipelines(sf_dir, num_cpus, only, results)

    # corpus: generated once, cached on disk (identical at every CPU level)
    corpus_dir = f"/tmp/rcs_bench/corpus-{n_files}-r{richness}"
    t0 = time.time()
    write_corpus(corpus_dir, n_files=n_files, seed=42, num_shards=64, richness=richness)
    results["corpus_gen_sec"] = round(time.time() - t0, 3)

    # warm the page cache AND the Ray worker pool (worker-process startup +
    # module imports are per-session costs a long-lived cluster would not
    # pay inside the measured window): untimed mini-build first
    import shutil

    warm_corpus = "/tmp/rcs_bench/corpus-warm"
    write_corpus(warm_corpus, n_files=2000, seed=42, num_shards=8)
    shutil.rmtree("/tmp/rcs_bench/warm_idx", ignore_errors=True)
    build_index(warm_corpus, "/tmp/rcs_bench/warm_idx", mode="entity",
                docs_per_partition=1000, resume=False)
    import pyarrow.dataset as pads

    pads.dataset(corpus_dir, format="parquet").to_table(columns=["repo"])

    # --- headline: entity-mode index build (parse -> postings -> lexicon)
    index_dir = f"/tmp/rcs_bench/index-{num_cpus}-{n_files}-r{richness}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    manifest = build_index(
        corpus_dir, index_dir, mode="entity",
        docs_per_partition=max(2000, manifest_docs_hint(n_files)), resume=False,
    )
    build_sec = time.time() - t0
    results["build_sec"] = round(build_sec, 3)
    results["build_files_per_sec"] = round(n_files / build_sec, 1)
    results["build_docs"] = manifest.n_docs
    results["build_partitions"] = manifest.num_partitions


    if os.environ.get("GRAFT_BENCH_BUILD_ONLY"):
        out = {
            "metric": "entity-index build sec (build-only mode)",
            "value": round(build_sec, 3),
            "unit": "sec",
            "queries": results,
            "sf": sf_dir,
            "num_cpus": num_cpus,
        }
        ray.shutdown()
        return out

    # --- query latency (warm actors)
    # half the cluster (the engine's own default): at 46 partitions, 8
    # actors serialize ~6 partitions per query — 16 measured ~1.6x lower
    # p50 and ~1.8x higher batch qps on the 9.5M-doc index
    engine = QueryEngine(index_dir, num_actors=min(16, num_cpus), prewarm_terms=256)
    try:
        engine.search("warmup query", limit=20)
        lats = []
        for _ in range(3):
            for q in BENCH_QUERIES:
                t0 = time.time()
                engine.search(q, limit=20)
                lats.append(time.time() - t0)
        lats.sort()
        results["query_p50_ms"] = round(1000 * statistics.median(lats), 2)
        results["query_p99_ms"] = round(1000 * lats[int(0.99 * (len(lats) - 1))], 2)
        # batched throughput
        t0 = time.time()
        engine.search_batch([(q, None) for q in BENCH_QUERIES] * 4, limit=20)
        results["query_batch_qps"] = round(len(BENCH_QUERIES) * 4 / (time.time() - t0), 1)
    finally:
        engine.close()

    # --- incremental append: +5% new files onto the built index; cost must
    # track the APPENDED volume, not the index size (old partitions are
    # never read).  Appended rows use ids past the corpus so keys are new.
    n_app = max(1000, n_files // 20)
    app_dir = f"/tmp/rcs_bench/append-{n_files}-{n_app}-r{richness}"
    if not os.path.exists(os.path.join(app_dir, "_DONE")):
        import pyarrow.parquet as _pq

        from distributedcodesearchengine_ray.sources.corpus import (
            _rows_to_table,
            gen_corpus_row,
        )

        os.makedirs(app_dir, exist_ok=True)
        per = -(-n_app // 8)
        for s in range(8):
            lo, hi = n_files + s * per, min(n_files + (s + 1) * per, n_files + n_app)
            if lo < hi:
                _pq.write_table(
                    _rows_to_table([gen_corpus_row(i, 42, richness) for i in range(lo, hi)]),
                    os.path.join(app_dir, f"part-{s:05d}.parquet"),
                )
        open(os.path.join(app_dir, "_DONE"), "w").write("1")
    from distributedcodesearchengine_ray.pipelines.build_index import append_index

    t0 = time.time()
    manifest = append_index(
        index_dir, app_dir, docs_per_partition=max(2000, manifest_docs_hint(n_files))
    )
    append_sec = time.time() - t0
    results["append_sec"] = round(append_sec, 3)
    results["append_files_per_sec"] = round(n_app / append_sec, 1)
    results["append_docs"] = manifest.n_docs - results["build_docs"]

    if os.environ.get("GRAFT_BENCH_SKIP_PIPELINES"):
        out = {
            "metric": "build + query latency (pipelines skipped)",
            "value": round(build_sec, 3),
            "unit": "sec",
            "queries": results,
            "sf": sf_dir,
            "num_cpus": num_cpus,
        }
        ray.shutdown()
        return out

    # --- segment merge: combine the built index with itself — zero text
    # reprocessing, cost ∝ side-B postings bytes + the lexicon exchange
    from distributedcodesearchengine_ray.pipelines.build_index import merge_indexes

    merge_out = f"/tmp/rcs_bench/merged-{num_cpus}-{n_files}-r{richness}"
    shutil.rmtree(merge_out, ignore_errors=True)
    t0 = time.time()
    mm = merge_indexes(index_dir, index_dir, merge_out)
    results["merge_sec"] = round(time.time() - t0, 3)
    results["merge_docs"] = mm.n_docs
    shutil.rmtree(merge_out, ignore_errors=True)

    # --- trigram fulltext index over the sf documents table: cold build,
    # then warm substring + regex queries (index probe + verify only)
    import glob as _glob

    for stale in _glob.glob("/tmp/rcs_cache/tridx-*"):
        shutil.rmtree(stale, ignore_errors=True)
    t0 = time.time()
    Q._trigram_index(sf_dir)
    results["trigram_build_sec"] = round(time.time() - t0, 3)

    # --- training-data pipelines over the sf dir
    _time_pipelines(Q, sf_dir, set(), results)

    out = {
        "metric": "entity-index build files/sec + query p50/p99 + pipeline secs",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": results,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return out


def manifest_docs_hint(n_files: int) -> int:
    # target ~45 doc-range partitions at bench scale, but cap partition size
    # so larger corpora fan out further (a fixed partition COUNT makes
    # partitions grow with input — worse balance and bigger per-task memory)
    return max(1000, min(n_files // 45, 10_000))


def run_scaling() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default N=4 vs 4N=16: this sandbox VM's memory bandwidth saturates
    # around ~16 concurrent memory-heavy workers, so 8-vs-32 measures the
    # bandwidth wall of the box, not the engine's parallel scaling (see
    # BASELINE.md).  Override with GRAFT_SCALE_LO/HI.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_SKIP_PIPELINES="1")
        env.pop("GRAFT_BENCH_BUILD_ONLY", None)
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # interleaved best-of-3 per level: wall-clock on this box drifts by up
    # to 2x run-to-run, which would otherwise swamp the ratio
    runs = [run(lo), run(hi), run(lo), run(hi), run(lo), run(hi)]
    r_lo = min(runs[0::2], key=lambda r: r["value"])
    r_hi = min(runs[1::2], key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    q_lo = max(r["queries"]["query_batch_qps"] for r in runs[0::2])
    q_hi = max(r["queries"]["query_batch_qps"] for r in runs[1::2])
    return {
        "metric": f"index-build + query scaling efficiency (N={lo} vs 4N={hi} cpus)",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "files_per_sec_lo": r_lo["queries"]["build_files_per_sec"],
        "files_per_sec_hi": r_hi["queries"]["build_files_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "query_qps_lo": q_lo,
        "query_qps_hi": q_hi,
        "query_scaling_efficiency": round((q_hi / q_lo) / (hi / lo), 3),
        "sf": sf_dir,
    }


def run_reference_baseline() -> dict:
    """Measured single-process reference-equivalent baseline: the same
    parse -> entity-doc projection -> tokenize -> BM25Okapi fit -> dense
    query semantics the reference runs in one process
    (repo_indexer.index_directory + BM25Index), on a subset of the bench
    corpus.  Recorded in BASELINE.md for the matches-or-beats comparison."""
    import time

    from distributedcodesearchengine_ray.functions.tokenizer import tokenize
    from distributedcodesearchengine_ray.pipelines.oracle import BM25Oracle, oracle_search
    from distributedcodesearchengine_ray.sources.corpus import gen_corpus_rows
    from distributedcodesearchengine_ray.stages.parse import entity_document, parse_content
    from distributedcodesearchengine_ray.sources.corpus import SKIP_DIRS, SUPPORTED_EXTENSIONS

    n_files = int(os.environ.get("GRAFT_REF_FILES", "20000"))
    richness = int(os.environ.get("GRAFT_BENCH_RICHNESS", "4"))

    def keep(path):
        if any(path.startswith(d + "/") or f"/{d}/" in path for d in SKIP_DIRS):
            return False
        return any(path.lower().endswith(e) for e in SUPPORTED_EXTENSIONS)

    rows = [r for r in gen_corpus_rows(n_files, seed=42, richness=richness) if keep(r["path"])]
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))

    t0 = time.time()
    corpus_tokens = []
    for r in rows:
        for e in parse_content(r["content"], r["path"], r["repo"], r["lang"]):
            corpus_tokens.append(tokenize(entity_document(e)))
    oracle = BM25Oracle(corpus_tokens)
    build_sec = time.time() - t0

    lats = []
    for q in BENCH_QUERIES:
        t0 = time.time()
        oracle_search(oracle, q, limit=20)
        lats.append(time.time() - t0)
    lats.sort()
    return {
        "metric": "reference-equivalent single-process baseline",
        "n_files": n_files,
        "n_docs": len(corpus_tokens),
        "build_sec": round(build_sec, 3),
        "files_per_sec": round(n_files / build_sec, 1),
        "query_p50_ms": round(1000 * statistics.median(lats), 1),
        "query_max_ms": round(1000 * lats[-1], 1),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--reference-baseline" in sys.argv:
        print(json.dumps(run_reference_baseline()))
    else:
        print(json.dumps(run_bench()))
