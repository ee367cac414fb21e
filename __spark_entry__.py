"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in ``heapdumpstardiver_spark`` (see
SURVEY.md §2 for the operator inventory each entry maps to).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import heapdumpstardiver_spark as hds


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return hds.QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# Driver-check scheduling: the driver verifies at most ~50 queries per
# round, taken in dict order. r6 front: (1) survival_kaplan_meier — the
# one red r5 driver row, rewritten this round with a bit-stable
# fold-product and DECIMAL(18,6)->STRING rendering, so the canonical
# record can go green; (2) the full 37-query never-driver-checked
# backlog (r5 queue order preserved — 37 < the ~50 cap, so the backlog
# reaches zero this round); (3) the queries whose hashed output was
# re-rendered decimal-stable this round (exp/ln boundary sweep, r5
# verdict item 3) — their existing green rows describe the previous
# schema, so a fresh canonical row matters more than re-checking an
# unchanged stale query. Staleness rotation (r1-r3 vintage greens)
# follows and overflows into r7. Everything is locally parity-checked
# every round regardless (scripts/verify_contract.py, 186/186).
_CHECK_PRIORITY = [
    # 1: the only non-green driver row anywhere (r5: hash-only fail)
    "survival_kaplan_meier",
    # 2: never driver-checked backlog (37) — r5 queue order
    "partition_key_advisor", "ab_power_analysis",
    "cross_source_duplication", "gini_revenue_concentration",
    "seasonality_index_dow", "importance_weight_ess",
    "mix_rate_decomposition", "retention_decay_fit",
    "gc_root_path", "time_weighted_avg_user", "gap_fill_interpolate",
    "quality_classifier_score", "vocab_oov_coverage",
    "funnel_conversion", "retention_cohort", "anomaly_zscore_daily",
    "asof_join_tolerance", "sketch_union_cascade",
    "exact_substring_runs", "similarity_pq_adc",
    "table_profile", "join_key_skew_profile",
    "importance_resample_dsir", "bpe_pair_merge_candidates",
    "chunk_documents_overlap",
    "star_join_supplier_volume", "k_anonymity_audit",
    "curation_funnel_accounting",
    "fuzzy_join_levenshtein", "seasonal_naive_error",
    "decile_feature_binning", "latest_event_per_user",
    "textrank_keywords", "price_trend_regression",
    "rolling_1h_range_frame", "locf_forward_fill",
    "percentile_cont_groups",
    # new this round (stdlib baseline-JPEG codec; ANN recall eval;
    # LSH banding sweep) — need first rows
    "multimodal_jpeg_decode", "ann_recall_at_k", "lsh_tuning_curve",
    # 3: output re-rendered decimal-stable this round — fresh rows wanted
    "zipf_alpha_fit", "bigram_pmi_topk", "bm25_keyword_search",
    "tfidf_top_terms", "unigram_logprob_score", "bigram_logprob_score",
    "trending_leaderboard_decayed", "eb_shrunk_rates", "heaps_law_fit",
    "weighted_sample_aes", "benford_digit_audit", "psi_drift_by_decile",
    # ---- ~r6 cap lands about here (1 + 37 + 12) ----
    "l_diversity_audit", "token_entropy_by_source",
    # staleness rotation (oldest green rows first: r1-r3 vintage) — r7
    "approx_distinct_sketch", "pricing_summary", "count_distinct",
    "string_funcs", "arithmetic_charge", "dedup_exact",
    "dedup_prefix_groups", "ngram_shingle_overlap", "similarity_topk",
    "having_dup_groups", "conditional_agg", "two_level_agg",
    "weighted_topk", "rollup_agg", "bucket_histogram",
    "pattern_classifier", "category_like_chains", "global_topk",
    "union_by_name", "bitmask_decode", "systematic_sample",
    "pack_sequences_greedy", "sql_passthrough_reserved",
    "struct_field_access", "cube_agg", "set_ops_except_intersect",
    "pivot_status_year", "salted_heavy_hitter_agg",
    "grouping_sets_agg", "correlated_scalar_subquery",
    "unpivot_measures",
    # r3/r4/r5-checked greens, freshest last:
    "similarity_lsh_bucketed", "embedding_norms", "text_quality",
    "token_count_regex", "lang_id_confusion", "doc_fingerprint",
    "minhash_lsh_candidates", "embedding_near_dup_pairs",
    "simhash_fingerprint", "similarity_ivf_probe", "jaccard_pairs",
    "vocab_topk", "dedup_keep_best", "incremental_dedup_new_batch",
    "multimodal_payload_stats", "multimodal_fingerprint_topk",
    "multimodal_frame_sample", "multimodal_feature_extract",
    "dedup_connected_components", "dedup_cluster_representatives",
    "decontaminate_ngram_overlap", "data_mix_weighted_sample",
    "train_test_split_hash", "quality_filter_chain",
    "stratified_sample_per_source", "passage_dup_coverage",
    "repetition_filter_gopher",
    "minhash_verify_jaccard", "token_budget_select",
    "kmeans_embedding_clusters", "quality_percentile_gate",
    "scan_filter_project", "like_patterns", "pagination",
    "join_fact_fact", "enrichment_join", "join_ratio_filter",
    "join_semi", "join_anti", "hierarchy_join", "explode_tokens",
    "reachability_live_census", "multimodal_png_decode",
    "semantic_dedup_centroid",
    "single_retainer_bytes", "dominator_retained",
    "window_sliding_15m", "session_window_native",
    "decile_binning_broadcast_cuts",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _CHECK_PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(hds.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin for each query (same column names/types)."""
    return _ordered(dict(hds.ORACLE_SQL))
