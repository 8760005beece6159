"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship distributed BM25 build+query over the
sf0.001 ``documents`` table; ``queries()`` exposes one callable per
implemented operator/pipeline (SURVEY.md §2 + the training-data operator
suite); ``oracle_sql()`` provides the matching DuckDB oracles (same column
names, integer-rounded float encodings on both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributedcodesearchengine_ray.pipelines import queries as Q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the sharded BM25
    index over documents (tokenize -> partitioned postings -> lexicon
    shuffle -> manifest) and answer the reference-style keyword query."""
    return Q.bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # code-search core (SURVEY.md §2: M7/A1/A2/K1/F3/F4 + J2/D1, A3)
        "tokenize_counts": Q.tokenize_counts,
        "term_df_top100": Q.term_df_top100,
        "heavy_hitter_tokens": Q.heavy_hitter_tokens,  # 2-pass sketch, SQL oracle
        "significant_terms": Q.significant_terms,  # ES-style fg-vs-bg G2/LLR terms, milli-nat oracle
        "significant_text": Q.significant_text,  # ES significant_text: G2 terms of the query's result set
        "vocab_set_ops": Q.vocab_set_ops,  # vocabulary set algebra between lang slices, one-bit-flag fold
        "bm25_topk": Q.bm25_topk,
        "federated_search": Q.federated_search,  # scatter-gather across 2 sub-indexes, exact global stats
        "bm25_explain": Q.bm25_explain,  # _explain: per-term BM25 score decomposition of the top hits
        "bm25_boosting": Q.bm25_boosting,  # ES boosting query: negative-match demotion at score*0.5
        "span_first": Q.span_first_q,  # Lucene span_first: first occurrence within N positions, positional index
        "span_containing": Q.span_containing_q,  # Lucene span_containing: a..b span holding c, positional index
        "span_within": Q.span_within_q,  # Lucene span_within: little phrase inside a..b span
        "bm25_wildcard": Q.bm25_wildcard,  # scored wildcard search: lexicon expansion ranked as OR'd BM25
        "bm25_top_hits": Q.bm25_top_hits,  # ES top_hits: top-k hits per lang bucket, groups ranked by best
        "docs_sorted_top": Q.docs_sorted_top,  # native Dataset.sort multi-key export
        "orders_top_with_ties": Q.orders_top_with_ties,  # FETCH FIRST k WITH TIES via the threshold pattern
        "orders_date_range_agg": Q.orders_date_range_agg,  # ES date_range half-open buckets
        "weekly_event_rate": Q.weekly_event_rate,  # ES rate agg (per-day, weekly buckets)
        "bm25_topk_wand": Q.bm25_topk_wand,
        "bm25_page2": Q.bm25_page2,  # search-after deep pagination, OFFSET oracle
        "bm25_collapse": Q.bm25_collapse,  # field collapsing: best hit per lang group
        "qld_topk": Q.qld_topk,  # query-likelihood Dirichlet LM ranking, full SQL oracle
        "bm25_topk_lang": Q.bm25_topk_lang,
        "lang_histogram": Q.lang_histogram,
        "bm25_facets": Q.bm25_facets,  # facet counts over the full result set
        "bm25_count": Q.bm25_count,  # ES _count: thresholded match total, no hits fetched
        "bm25_boolean": Q.bm25_boolean,  # +term/-term operators, shared scoring CTE
        "more_like_this": Q.more_like_this,  # find-similar via top tf*idf terms
        "search_ndcg": Q.search_ndcg,  # NDCG@10/MRR eval vs synthetic qrels, BM25-in-SQL + DCG oracle
        "rank_eval_pr": Q.rank_eval_pr,  # ES rank_eval: P@10/R@10 vs boolean-AND qrels
        "has_child_orders": Q.has_child_orders,  # ES has_child join-field, score_mode=max
        "percolate_queries": Q.percolate_queries,  # reverse search: registered boolean queries vs corpus
        "bm25_rm3": Q.bm25_rm3,  # pseudo-relevance-feedback expansion, two-pass SQL oracle
        "bm25_rescore": Q.bm25_rescore,  # ES rescore: top-window rerank, O(window) secondary scoring
        "multi_match_bm25f": Q.multi_match_bm25f,  # ES multi_match most_fields: per-field BM25 + boosts
        "combined_fields": Q.combined_fields_bm25,  # ES combined_fields: term-centric merged-field BM25
        "snippet_windows": Q.snippet_windows,  # best-window highlighter, window-count SQL oracle
        "phrase_positional": Q.phrase_positional,  # positional phrase (token adjacency), BM25+EXISTS oracle
        "phrase_proximity": Q.phrase_proximity,  # ordered proximity slop=1, gap-constraint oracle
        "bm25_tombstone": Q.bm25_tombstone,  # BM25 after tombstone delete == never-indexed oracle
        "substring_search": Q.substring_search,  # trigram index + verify, contains() oracle
        "regex_search": Q.regex_search,  # Cox-style required-literal pruning, RE2 oracle
        "grep_lines": Q.grep_lines,  # line-level grep, zipped-unnest oracle
        "substring_search_nocase": Q.substring_search_nocase,  # case-variant trigram groups
        "wildcard_term_df": Q.wildcard_term_df,  # lexicon wildcard expansion, LIKE oracle
        "spell_suggest": Q.spell_suggest,  # did-you-mean over the lexicon, levenshtein oracle
        "bm25_dismax": Q.bm25_dismax,  # disjunction-max multi-clause scoring (dis_max)
        "bm25_msm": Q.bm25_msm,  # minimum_should_match: >= k distinct query terms
        "bm25_synonyms": Q.bm25_synonyms,  # query-time synonym expansion, additive scoring
        "bm25_fuzzy": Q.bm25_fuzzy,  # fuzzy search: per-token levenshtein expansion + BM25
        "redact_props": Q.redact_props,  # PII/number redaction, chained-replace oracle
        "props_k_by_type": Q.props_k_by_type,  # JSON field extraction via RE2
        # dedup suite
        "dedup_exact": Q.dedup_exact,
        "dedup_by_key": Q.dedup_by_key,
        "minhash_near_dups": Q.minhash_near_dups,  # rows-only (no SQL oracle)
        "ngram_jaccard_dups": Q.ngram_jaccard_dups,  # exact PPJoin, SQL oracle
        "dedup_clusters": Q.dedup_clusters,  # connected components, recursive-SQL oracle
        "dedup_keep_best": Q.dedup_keep_best,  # keep longest per cluster, closure+window oracle
        "doc_pagerank": Q.doc_pagerank,  # integer PageRank over the near-dup graph, unrolled-SQL oracle
        "dup_triangles": Q.dup_triangles,  # triangle enumeration over the near-dup graph, 3-way self-join oracle
        "dup_graph_bfs": Q.dup_graph_bfs,  # multi-source BFS hop distances, recursive-SQL oracle
        "dup_degree_hist": Q.dup_degree_hist,  # near-dup graph degree distribution incl. isolated docs
        "simhash_near_dups": Q.simhash_near_dups,  # rows-only, scalar-oracle gated
        "clone_pairs": Q.clone_pairs,  # winnowing clone join, rows-only (pytest brute-force gate)
        # text analysis
        "lang_id_profile": Q.lang_id_profile,
        "lang_id_confusion": Q.lang_id_confusion,  # declared-vs-predicted language confusion matrix
        "wau_mau": Q.wau_mau,  # WAU/MAU stickiness via week-grain rolling distinct
        "quality_by_lang": Q.quality_by_lang,
        "quality_filter": Q.quality_filter,
        "token_totals": Q.token_totals,
        "token_quantiles": Q.token_quantiles,  # exact CDF quantiles, quantile_disc oracle
        "doc_deciles": Q.doc_deciles,  # distributed NTILE over a corpus-wide total order
        "length_histogram": Q.length_histogram,  # numeric range facet, fixed-width buckets
        "lineitem_profile": Q.lineitem_profile,  # column profiling: exact distinct/min/max/nulls
        "clean_text": Q.clean_text_q,  # C4-style normalization, regexp_replace oracle
        "repetition_stats": Q.repetition_stats_q,  # Gopher repetition signals, exact-int oracle
        "gopher_gate": Q.gopher_gate_q,  # composed Gopher quality gate: per-rule flags + keep
        "lm_perplexity": Q.lm_perplexity,  # CCNet bigram-LM scoring, milli-nat integer oracle
        "dsir_weights": Q.dsir_weights_q,  # DSIR importance weights, two-LM ratio oracle
        "dsir_select": Q.dsir_select_q,  # Gumbel-top-k importance resampling, md5-gumbel oracle
        "token_budget_select": Q.token_budget_select_q,  # quality-ordered token-budget curation, window oracle
        "tfidf_keywords": Q.tfidf_keywords_q,  # per-doc top-3 tf*idf, window oracle
        "term_cooccurrence": Q.term_cooccurrence_q,  # top-vocab PMI pairs, self-join oracle
        "bpe_vocab": Q.bpe_vocab,  # BPE tokenizer training, rows-only (pytest exactness gate)
        "nb_classify": Q.nb_classify,  # Naive-Bayes source classifier, unrolled-NB SQL oracle
        "logreg_lang_en": Q.logreg_lang_en,  # distributed logistic regression, unrolled-GD oracle
        "fingerprint_profile": Q.fingerprint_profile,  # rows-only
        "distinct_users_hll": Q.distinct_users_hll,  # HLL sketch, rows-only (pytest register-exact gate)
        # training-data layout (packing / sampling / splitting)
        "pack_sequences": Q.pack_sequences_q,  # distributed prefix sum, window-SQL oracle
        "training_mix": Q.training_mix,  # composed quality->dedup->pack pipeline, composed SQL oracle
        "stratified_sample": Q.stratified_sample_q,  # hash-Bernoulli per stratum
        "train_test_split": Q.train_test_split_q,  # deterministic 90/5/5 split
        "decontaminate": Q.decontaminate_q,  # benchmark 5-gram overlap, semi-join oracle
        "cdc_upsert": Q.cdc_upsert,  # MERGE/upsert: change stream resolved by one algebraic groupby
        "scd2_intervals": Q.scd2_intervals,  # SCD type-2 validity intervals from a change stream
        "cdc_incremental_agg": Q.cdc_incremental_agg,  # incremental view maintenance, O(|changes|) deltas
        "snapshot_diff": Q.snapshot_diff,  # table-version reconciliation: added/removed/changed per lang
        "source_share_within_lang": Q.source_share_within_lang,  # ES normalize: percent-of-parent bps
        "user_value_twap": Q.user_value_twap,  # time-weighted average (LOCF integral), integer partials
        "bm25_boosted": Q.bm25_boosted,  # query-time term boosts via duplicate-token rule
        "line_dedup": Q.line_dedup,  # CCNet corpus-wide paragraph dedup, window+agg oracle
        "dup_spans": Q.dup_spans,  # Lee-2022 exact-substring dup spans, exploded-window oracle
        "doc_chunks": Q.doc_chunks,  # sliding-window long-doc chunking, generate_series oracle
        "global_shuffle": Q.global_shuffle,  # seeded md5 permutation, row_number oracle
        # similarity search
        "embed_cosine_dups": Q.embed_cosine_dups,
        "knn_cosine": Q.knn_cosine,
        "knn_int8": Q.knn_int8,  # int8 scalar-quantized ANN + exact rescore
        "knn_radius": Q.knn_radius,  # cosine radius search (similarity threshold, no top-k cap)
        "knn_cosine_filtered": Q.knn_cosine_filtered,
        "knn_l2": Q.knn_l2,  # exact Euclidean top-k, sequential-accumulation distance
        "knn_pq": Q.knn_pq,  # product-quantization ADC search, rows-only (pytest ADC-oracle gate)
        "knn_ivfpq": Q.knn_ivfpq,  # IVF-PQ cell-probed ADC, rows-only (pytest restricted-oracle gate)
        "hard_negatives": Q.hard_negatives,  # contrastive hard-negative mining (cosine band top-k)
        "media_pipeline": Q.media_pipeline,  # multimodal decode/features/frame-sample, rows-only (pytest gates)
        "alpha_mix_sample": Q.alpha_mix_sample,  # mT5 temperature-sampled language mixture, exact integer targets
        "knn_mmr": Q.knn_mmr,  # MMR diversified rerank, rows-only (pytest full-numpy gate)
        "hybrid_rrf": Q.hybrid_rrf,  # J1/K3 weighted-RRF fusion, full-SQL oracle
        "hybrid_linear": Q.hybrid_linear,  # ES linear retriever: min-max-normalized weighted fusion
        "label_centroids": Q.label_centroids,
        "kmeans_clusters": Q.kmeans_clusters,  # iterative Lloyd's, unrolled-SQL oracle
        "semantic_dedup": Q.semantic_dedup_q,  # SemDeDup: kmeans + within-cluster cosine, full-SQL oracle
        # streaming-shaped events
        "events_hourly": Q.events_hourly,
        "events_sliding": Q.events_sliding,
        "sessionize": Q.sessionize,
        "cohort_retention": Q.cohort_retention,  # weekly cohort-retention matrix, date_trunc oracle
        "user_last_event": Q.user_last_event,  # algebraic argmax (last-touch attribution), row_number oracle
        "customer_rfm": Q.customer_rfm,  # RFM segmentation metrics, algebraic fold
        "abc_analysis": Q.abc_analysis,  # Pareto/ABC classification, integer-exact cut
        "events_time_decay": Q.events_time_decay,  # exponential time-decay user scoring (trending shape)
        "value_mad_by_type": Q.value_mad_by_type,  # robust median/MAD via bounded-domain histograms
        "rolling_distinct_users": Q.rolling_distinct_users,  # 24h rolling exact distinct, per-user interval coverage
        "top_user_by_type": Q.top_user_by_type,  # grouped mode / heavy-hitter argmax fold
        "hour_dow_pivot": Q.hour_dow_pivot,  # crosstab pivot: hour-of-day x weekday heatmap
        "event_transitions": Q.event_transitions,  # Markov bigram counts over per-user ordered streams
        "value_corr_by_type": Q.value_corr_by_type,  # algebraic-moments Pearson r, integer partials
        "hourly_anomalies": Q.hourly_anomalies,  # rolling z-score anomaly flags per event type
        "cusum_daily_revenue": Q.cusum_daily_revenue,  # CUSUM change-point walk, integer cents
        "mann_kendall_daily_revenue": Q.mann_kendall_daily_revenue,  # MK trend test, tie-corrected
        "ewma_daily_orders": Q.ewma_daily_orders,  # exponential smoothing, recursive-CTE oracle
        "holt_daily_revenue": Q.holt_daily_revenue,  # Holt level+trend smoothing, recursive-CTE oracle
        "daily_revenue_normalize": Q.daily_revenue_normalize,  # ES normalize pipeline agg (percent_of_sum + rescale_0_1)
        "zorder_events": Q.zorder_events,  # Z-order/Morton clustering keys (layout primitive)
        "geo_distance_rings": Q.geo_distance_rings,  # ES geo_distance rings (hash-derived coords)
        "moving_percentiles_daily": Q.moving_percentiles_daily,  # ES moving_percentiles (trailing-7d p50/p90)
        "linear_attribution": Q.linear_attribution,  # multi-touch linear attribution (7d lookback)
        "curation_funnel": Q.curation_funnel,  # end-to-end curation: dedup -> gopher -> decontam -> budget
        "categorize_text_docs": Q.categorize_text_docs,  # ES categorize_text (log-template clustering)
        "geohash_cells": Q.geohash_cells,  # ES geohash_grid precision-5 cells
        "geotile_cells": Q.geotile_cells,  # ES geotile_grid z/x/y mercator tiles
        "filters_agg_orders": Q.filters_agg_orders,  # ES filters agg + other_bucket
        "top_metrics_by_type": Q.top_metrics_by_type,  # ES top_metrics (latest value per type)
        "geo_bounds_centroid": Q.geo_bounds_centroid,  # ES geo_bounds + geo_centroid per segment
        "value_quantile_normalize": Q.value_quantile_normalize,  # empirical-CDF rank transform, bps
        "filters_agg_events": Q.filters_agg_events,  # ES filters agg: named buckets + other_bucket
        "full_outer_balance": Q.full_outer_balance,  # FULL OUTER join of two pre-aggregated folds
        "lineitem_unpivot": Q.lineitem_unpivot,  # UNPIVOT/melt: wide measures to long in one scan
        "funnel_counts": Q.funnel_counts,  # ordered funnel stages, chained min-after-min oracle
        "funnel_time_to_convert": Q.funnel_time_to_convert,  # first-view -> first-purchase latency
        "ab_test_conversion": Q.ab_test_conversion,  # hash-armed A/B conversion + pooled z
        "zipf_fit_terms": Q.zipf_fit_terms,  # Zipf power-law OLS over top-100 dfs, integer moments
        "eql_sequence": Q.eql_sequence,  # EQL sequence-by-user with maxspan, searchsorted chain walk
        "region_nation_rollup": Q.region_nation_rollup,  # dimension-hierarchy ROLLUP over a fact join
        "events_debounce": Q.events_debounce,  # dedup-within-window (alert suppression), LAG oracle
        "orders_yoy": Q.orders_yoy,  # year-over-year growth, LAG over the yearly aggregate
        "events_rollup": Q.events_rollup,  # ROLLUP grouping sets, algebraic fold
        "events_cube": Q.events_cube,  # full CUBE lattice, one scan + algebraic fold
        "user_running_value": Q.user_running_value,  # ordered window cumsum
        "user_moving_sum": Q.user_moving_sum,  # bounded-frame moving window (ROWS 3 PRECEDING)
        "user_event_gaps": Q.user_event_gaps,  # LAG inter-arrival gaps, integer seconds
        "basket_pairs": Q.basket_pairs,  # market-basket top co-occurring part pairs
        "frequent_itemsets": Q.frequent_itemsets,  # ES frequent_item_sets over (user, day) baskets
        "user_set_ops": Q.user_set_ops,  # UNION/INTERSECT/EXCEPT via membership bitmask
        "event_type_sample": Q.event_type_sample,  # per-group deterministic md5 sample
        "token_quantiles_by_lang": Q.token_quantiles_by_lang,  # grouped exact quantiles
        "length_outliers": Q.length_outliers,  # per-lang 2-sigma outliers, integer-exact z-test
        "clicks_last_purchase": Q.clicks_last_purchase,  # as-of join, native-ASOF oracle
        "purchases_before_click": Q.purchases_before_click,  # range join, BETWEEN oracle
        # relational coverage (joins / grouped aggregates / top-k)
        "q1_lineitem": Q.q1_lineitem,
        "top_parts_by_revenue": Q.top_parts_by_revenue,
        "revenue_by_part_type": Q.revenue_by_part_type,
        "orders_by_nation": Q.orders_by_nation,
        "nation_above_avg_orders": Q.nation_above_avg_orders,  # correlated aggregate (above group average)
        "q3_shipping": Q.q3_shipping,
        "q5_local_supplier_volume": Q.q5_local_supplier_volume,  # 5-way join + local-supplier mask
        "top2_orders_per_nation": Q.top2_orders_per_nation,
        "supplier_balance_by_region": Q.supplier_balance_by_region,
        "distinct_users_by_type": Q.distinct_users_by_type,
        "customers_no_urgent": Q.customers_no_urgent,  # distributed anti-join
        "orders_with_returns": Q.orders_with_returns,  # distributed semi-join, EXISTS oracle
        "supplier_coverage": Q.supplier_coverage,  # relational division: suppliers covering all brands
        "user_day_streak": Q.user_day_streak,  # gaps-and-islands longest consecutive-day run
        "order_skyline": Q.order_skyline,  # Pareto-frontier skyline, NOT-EXISTS dominance oracle
        "length_gini": Q.length_gini,  # sort-free integer-exact Gini via histograms
        "query_term_stats": Q.query_term_stats,  # termvectors introspection: df/cf/idf from the index
        "top_terms_concat": Q.top_terms_concat,  # ordered string_agg of per-lang top-df terms
        "ttr_by_lang": Q.ttr_by_lang,  # type-token ratio per lang, COUNT DISTINCT oracle
        "custdist": Q.custdist,  # TPC-H Q13 shape: LEFT-JOIN count distribution w/ zero bucket
        "small_qty_revenue": Q.small_qty_revenue,  # TPC-H Q17 shape: correlated avg, bloom prefilter
        "large_volume_orders": Q.large_volume_orders,  # TPC-H Q18 shape: HAVING + enrich join
        "priority_share": Q.priority_share,  # RATIO_TO_REPORT percent-of-total window
        "weighted_median_price": Q.weighted_median_price,  # quantity-weighted lower median, integer-exact
        "value_percentiles": Q.value_percentiles,  # quantile_cont, exact sort-free interpolation
        "entropy_by_lang": Q.entropy_by_lang,  # char-distribution entropy partials, integer-exact
        "urgent_lineitems_semi": Q.urgent_lineitems_semi,  # bloom-prefiltered EXISTS semi-join
        "supplier_cnt_by_parttype": Q.supplier_cnt_by_parttype,  # Q16 shape: grouped distinct-supplier counts
        "idle_customers": Q.idle_customers,  # Q22 shape: scalar threshold + distributed anti-join
        "spend_rank_in_nation": Q.spend_rank_in_nation,  # aggregation-then-DENSE_RANK window top-3
        "q7_volume_shipping": Q.q7_volume_shipping,  # Q7 shape: bilateral two-nation trade by ship year
        "q8_market_share": Q.q8_market_share,  # Q8 shape: national share of a region/part-type market, integer bps
        "q10_returned_items": Q.q10_returned_items,  # Q10 shape: top customers by returned-item revenue
        "q14_promo_revenue": Q.q14_promo_revenue,  # Q14 shape: promo revenue share, two-counter fold
        "extended_stats_by_type": Q.extended_stats_by_type,  # ES extended_stats: skew/kurtosis via exact hi/lo moments
        "value_boxplot_by_type": Q.value_boxplot_by_type,  # boxplot agg: exact quartiles + Tukey-fence outliers
        "value_ttest": Q.value_ttest,  # Welch two-sample t-test, exact moment partials
        "value_autocorr": Q.value_autocorr,  # lag-1 autocorrelation of the hourly revenue series
        "composite_buckets_page": Q.composite_buckets_page,  # ES composite agg: after-key bucket pagination
        "hapax_by_lang": Q.hapax_by_lang,  # rare_terms: hapax legomena count/ratio per lang
        "events_hourly_dense": Q.events_hourly_dense,  # date_histogram min_doc_count=0, zero-filled buckets
        "user_type_adjacency": Q.user_type_adjacency,  # ES adjacency_matrix: pairwise distinct-user intersections
        "value_percentile_ranks": Q.value_percentile_ranks,  # ES percentile_ranks: bps at-or-below fixed thresholds
        "cumulative_users": Q.cumulative_users,  # cumulative_cardinality: first-seen users per day + running total
        "ccnet_buckets": Q.ccnet_buckets,  # CCNet head/middle/tail perplexity terciles per lang
        "value_trend_by_type": Q.value_trend_by_type,  # distributed OLS slope/intercept from exact moments
        "nation_order_rank_dist": Q.nation_order_rank_dist,  # PERCENT_RANK + CUME_DIST windows
        "cheapest_supplier_per_brand": Q.cheapest_supplier_per_brand,  # Q2-essence correlated argmin + join-back
        "q4_order_priority": Q.q4_order_priority,  # Q4 shape: decorrelated EXISTS via orderkey-grain max
        "q9_product_profit": Q.q9_product_profit,  # Q9 shape: multi-dimension profit by (nation, year)
        "q12_priority_by_returnflag": Q.q12_priority_by_returnflag,  # Q12 shape: two-counter priority pivot
        "q15_top_supplier": Q.q15_top_supplier,  # Q15 shape: max-revenue supplier view, ties kept
        "q19_discounted_revenue": Q.q19_discounted_revenue,  # Q19 shape: OR-disjunction branch mask revenue
        "q20_part_promotion": Q.q20_part_promotion,  # Q20 shape: nested-IN semi-join chain + HAVING
        "q21_waiting_suppliers": Q.q21_waiting_suppliers,  # Q21 shape: sole-late-supplier on multi-supplier orders
        "match_phrase_prefix": Q.match_phrase_prefix,  # ES match_phrase_prefix: lexicon-expanded final slot
        "lineitem_matrix_stats": Q.lineitem_matrix_stats,  # ES matrix_stats: pairwise cov/corr from exact moments
        "weighted_avg_price": Q.weighted_avg_price,  # ES weighted_avg: qty-weighted price per return flag
        "daily_purchase_ratio": Q.daily_purchase_ratio,  # bucket_script + derivative + bucket_selector pipeline aggs
        "auc_length_en": Q.auc_length_en,  # exact ROC-AUC from one bounded-domain histogram, no sort
        "kappa_quality_gates": Q.kappa_quality_gates,  # Cohen's kappa between two quality gates
        "bm25_function_score": Q.bm25_function_score,  # ES function_score: field_value_factor sqrt(dl) boost
        "bm25_decay_gauss": Q.bm25_decay_gauss,  # ES function_score gauss decay on doc length
        "bm25_pinned": Q.bm25_pinned,  # ES pinned query: curated ids first, organic follows
        "hhi_supplier_revenue": Q.hhi_supplier_revenue,  # Herfindahl concentration, integer bps
        "top_metrics_by_lang": Q.top_metrics_by_lang,  # ES top_metrics: packed-int algebraic argmax
        "bm25_terms_set": Q.bm25_terms_set,  # ES terms_set: per-doc dynamic minimum_should_match
        "string_stats_by_lang": Q.string_stats_by_lang,  # ES string_stats incl. Shannon char entropy
        "daily_order_moving_stats": Q.daily_order_moving_stats,  # moving_fn + serial_diff pipeline aggs
        "docs_random_score": Q.docs_random_score,  # ES random_score: seeded deterministic ranking
        "multi_terms_counts": Q.multi_terms_counts,  # ES multi_terms: compound-key buckets
        "bm25_regexp": Q.bm25_regexp,  # Lucene regexp query: vocab full-match expansion
        "bm25_term_range": Q.bm25_term_range,  # Lucene TermRangeQuery: [lo,hi) lexicon slice
        "chi2_lang_source": Q.chi2_lang_source,  # Pearson chi-square independence test
        "mutual_info_lang_source": Q.mutual_info_lang_source,  # MI + marginal entropies, micro-nats
        "ks_test_value": Q.ks_test_value,  # two-sample Kolmogorov-Smirnov, pure-integer D
        "spearman_qty_discount": Q.spearman_qty_discount,  # Spearman rho via exact tie ranks
        "ztest_quality_en": Q.ztest_quality_en,  # two-proportion z-test on a quality gate
        "diversified_sample": Q.diversified_sample,  # ES diversified_sampler: per-lang cap
        "phrase_suggest": Q.phrase_suggest,  # ES phrase suggester: bigram-LM did-you-mean
        "completion_suggest": Q.completion_suggest,  # ES completion suggester: prefix top-k
        "bm25_match_bool_prefix": Q.bm25_match_bool_prefix,  # ES match_bool_prefix
        "span_not": Q.span_not_q,  # Lucene span_not: positional exclusion window
        "span_near": Q.span_near_q,  # Lucene span_near unordered: proximity window
        "bm25_rank_feature": Q.bm25_rank_feature,  # ES rank_feature saturation boost
        "bm25_distance_feature": Q.bm25_distance_feature,  # ES distance_feature recency boost
        "auto_date_histogram": Q.auto_date_histogram,  # ES auto_date_histogram ladder
        "daily_bucket_stats": Q.daily_bucket_stats,  # ES stats_bucket + percentiles_bucket
        "bucket_sort_daily": Q.bucket_sort_daily,  # ES bucket_sort: order/from/size
        "bm25_common_terms": Q.bm25_common_terms,  # Lucene CommonTermsQuery: df-gated MUSTs
        "q6_forecast_revenue": Q.q6_forecast_revenue,  # TPC-H Q6 streaming filter-sum
    }


def oracle_sql() -> dict[str, str]:
    return Q.build_oracle_sql()
