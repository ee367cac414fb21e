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


# Driver-check scheduling: the driver verifies at most ~50 queries
# per round, taken in dict order. r9 front (r8 was 50/50 green —
# first fully green driver round; CORRECTNESS_r08.json):
# (1) the 7 registry entries the driver has NEVER sampled — they
#     landed after the r8 head was written and sat in the tail. The
#     r8 judge independently verified all 7 exact at sf0.01
#     (scripts/verify_contract.py); this head slot converts that
#     local truth into canonical driver rows (r8 verdict item 3).
#     stl_ma_decompose / mood_median_test additionally carry this
#     round's ADVICE fixes (dow now 1=Sunday like
#     seasonality_index_dow; χ² ladder NULL past dof 6), and
#     minhash_prefilter_jaccard (re-listed) carries the new
#     BAND_BUCKET_CAP — all re-verified locally.
# (2) queries NEW in r9 — first canonical rows.
# (3) staleness rotation (standing tail policy: max green-row age ≤3
#     rounds): r8's rotation consumed the r3-vintage block through
#     bitmask_decode; r9 resumes at systematic_sample, then the
#     r4-vintage block. Everything is locally parity-checked every
#     round regardless (verify_contract.py at sf0.01 + sf0.1).
_CHECK_PRIORITY = [
    # 1: never-sampled tail entries — land first canonical rows
    "benjamini_hochberg_fdr", "durbin_watson_autocorr",
    "jarque_bera_normality", "ljung_box_test", "mood_median_test",
    "stl_ma_decompose", "two_proportion_z_test",
    # re-sample: BAND_BUCKET_CAP landed this round (r8 verdict item 4)
    "minhash_prefilter_jaccard",
    # 2: new in r9 — need first driver rows
    "mann_kendall_trend", "runs_test_median", "sign_test_paired",
    "cohens_d_effect", "pacf_yule_walker", "page_hinkley_drift",
    "ewma_control_chart", "assortativity_degree", "kcore_fixpoint",
    "winnowing_fingerprints", "t_closeness_audit",
    "cochran_armitage_trend", "isotonic_calibration",
    "conformal_interval_naive", "hill_tail_index", "cronbach_alpha",
    "hurst_rs_exponent", "friedman_kendall_w", "moran_i_grid",
    "theil_inequality_decomposition", "periodogram_seasonal_power",
    "cross_correlation_lead_lag", "gumbel_block_maxima",
    "auc_rank_separability", "span_corruption_masking",
    "pinball_loss_quantile_eval", "markov_entropy_rate",
    "g_test_independence", "mcc_confusion_metrics",
    # 3: staleness rotation — r3-vintage remainder, oldest first
    "systematic_sample", "pack_sequences_greedy",
    "sql_passthrough_reserved", "struct_field_access", "cube_agg",
    "set_ops_except_intersect", "pivot_status_year",
    "salted_heavy_hitter_agg", "grouping_sets_agg",
    "correlated_scalar_subquery", "unpivot_measures",
    "approx_quantile_sketch", "asof_join_last_event",
    "asof_join_next_event", "date_trunc_daily", "ema_user_value",
    "freq_items_sketch", "hierarchy_closure", "hprof_object_kinds",
    "hprof_record_tally", "json_extract_agg",
    "percentile_disc_groups", "range_join_nearby",
    "rollup_hypertable_cascade", "sessionize_lag",
    "window_rank_topk", "window_running_sum", "window_tumbling_hour",
    # ---- ~r9 cap (50): 8 never-sampled/recap + 17 r9-new head slots
    # leave ~25 rotation slots, so the cap lands near the end of the
    # 27-entry r3-remainder above; its last entries and the r4 block
    # below overflow to r10 under the standing staleness policy ----
    # r4-vintage greens, next-oldest first — r10 rotation overflow
    "multimodal_payload_stats", "multimodal_fingerprint_topk",
    "multimodal_frame_sample", "multimodal_feature_extract",
    "scan_filter_project", "like_patterns", "pagination",
    "join_fact_fact", "enrichment_join", "join_ratio_filter",
    "join_semi", "join_anti", "hierarchy_join", "explode_tokens",
    "similarity_lsh_bucketed", "embedding_norms", "text_quality",
    "token_count_regex", "lang_id_confusion", "doc_fingerprint",
    "minhash_lsh_candidates", "embedding_near_dup_pairs",
    "simhash_fingerprint", "similarity_ivf_probe", "jaccard_pairs",
    "vocab_topk", "dedup_connected_components",
    "dedup_cluster_representatives", "decontaminate_ngram_overlap",
    "data_mix_weighted_sample", "train_test_split_hash",
    "quality_filter_chain", "stratified_sample_per_source",
    "repetition_filter_gopher", "minhash_verify_jaccard",
    "token_budget_select", "kmeans_embedding_clusters",
    "quality_percentile_gate", "reachability_live_census",
    "semantic_dedup_centroid", "single_retainer_bytes",
    "dominator_retained",
    # r5-vintage greens (r6/r7-checked greens follow in registration
    # order via _ordered's tail — they are the youngest):
    "window_sliding_15m", "session_window_native",
    "decile_binning_broadcast_cuts", "attribution_last_touch",
    "bootstrap_mean_ci", "cohens_kappa_langid",
    "concurrent_sessions_peak", "copurchase_triangle_count",
    "daily_acf", "dormant_rich_customers",
    "embedding_covariance_block", "greedy_source_coverage",
    "hard_negative_mining", "incremental_view_merge",
    "ips_offpolicy_value", "ks_test_two_sample",
    "label_coherence_audit", "large_volume_orders",
    "late_supplier_blame", "markov_transition_matrix",
    "pareto_frontier_per_group", "quantile_normalize_by_source",
    "relational_division", "returned_item_revenue",
    "revenue_mom_change", "reverse_search_percolate",
    "rfm_segmentation", "scd2_merge_batch", "shipping_priority_topk",
    "table_diff_audit", "trimmed_robust_stats",
    "tukey_outlier_fences", "user_acquisition_curve",
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
