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
# round, taken in dict order. Order the registry never-driver-checked
# first so the cap drains the backlog: r5 front = the two streaming
# batch-twins (r4 verdict item 7: fresh driver rows gate the streaming
# layer) and the two plan-rewritten queries (items 3-4: bigram PMI's
# global window → broadcast scalar, zipf's global row_number →
# two-phase bucket rank — the rewrite needs a canonical green row),
# then the 85 queries with no driver row yet in their r4 queue order.
# The ~50-slot cap lands on the first 4 + ~46 of the backlog; the rest
# plus anything new this round queue for r6. Everything below the
# `== r4 cap ==` marker was driver-checked green in r3/r4 (freshest
# last) and is locally parity-tested every round regardless
# (scripts/verify_contract.py).
_CHECK_PRIORITY = [
    # streaming batch-twins (r4 verdict item 7)
    "window_sliding_15m", "session_window_native",
    # plan-rewritten this round (r4 verdict items 3-4)
    "bigram_pmi_topk", "zipf_alpha_fit",
    # never driver-checked — r4 queue order
    "decile_binning_broadcast_cuts", "shipping_priority_topk",
    "returned_item_revenue", "dormant_rich_customers",
    "scd2_merge_batch", "constraint_audit", "copurchase_triangle_count",
    "concurrent_sessions_peak", "bm25_keyword_search",
    "relational_division", "revenue_mom_change",
    "embedding_covariance_block", "weighted_sample_aes",
    "pareto_frontier_per_group", "benford_digit_audit",
    "markov_transition_matrix", "quantile_normalize_by_source",
    "cuped_adjusted_metric", "survival_kaplan_meier",
    "raking_ipf_mix_weights", "user_acquisition_curve",
    "l_diversity_audit", "psi_drift_by_decile", "ks_test_two_sample",
    "bootstrap_mean_ci", "trimmed_robust_stats", "daily_acf",
    "ips_offpolicy_value", "incremental_view_merge",
    "attribution_last_touch", "rfm_segmentation",
    "late_supplier_blame", "large_volume_orders",
    "reverse_search_percolate", "cusum_changepoint", "containment_pairs",
    "trending_leaderboard_decayed", "heaps_law_fit", "greedy_source_coverage",
    "eb_shrunk_rates", "label_coherence_audit", "tukey_outlier_fences",
    "hard_negative_mining", "cohens_kappa_langid", "calibration_reliability",
    "table_diff_audit", "partition_key_advisor", "ab_power_analysis",
    "cross_source_duplication", "gini_revenue_concentration",
    # ---- ~r5 cap lands about here (4 + 46) ----
    "seasonality_index_dow", "importance_weight_ess",
    "mix_rate_decomposition", "retention_decay_fit",
    "approx_distinct_sketch",
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
    # ==== r4 cap ==== below here: driver-checked green in r3/r4.
    # r3-checked (stale by one round):
    "similarity_lsh_bucketed", "embedding_norms", "text_quality",
    "token_count_regex", "lang_id_confusion", "doc_fingerprint",
    "minhash_lsh_candidates", "embedding_near_dup_pairs",
    "simhash_fingerprint", "similarity_ivf_probe", "jaccard_pairs",
    "vocab_topk", "dedup_keep_best", "tfidf_top_terms",
    "token_entropy_by_source", "incremental_dedup_new_batch",
    "multimodal_payload_stats", "multimodal_fingerprint_topk",
    "multimodal_frame_sample", "multimodal_feature_extract",
    "dedup_connected_components", "dedup_cluster_representatives",
    "decontaminate_ngram_overlap", "data_mix_weighted_sample",
    "train_test_split_hash", "quality_filter_chain",
    "stratified_sample_per_source", "passage_dup_coverage",
    "unigram_logprob_score", "repetition_filter_gopher",
    "minhash_verify_jaccard", "token_budget_select",
    "kmeans_embedding_clusters", "quality_percentile_gate",
    "scan_filter_project", "like_patterns", "pagination",
    "join_fact_fact", "enrichment_join", "join_ratio_filter",
    "join_semi", "join_anti", "hierarchy_join", "explode_tokens",
    # r4-checked (freshest):
    "reachability_live_census", "multimodal_png_decode",
    "semantic_dedup_centroid", "bigram_logprob_score",
    "single_retainer_bytes", "dominator_retained",
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
