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
# round, taken in dict order. r7 front: (1) the survival_kaplan_meier
# DISCRIMINATING EXPERIMENT (r6 verdict item 1) — the one red driver
# row (hash-only, two rounds, locally unreproducible) plus THREE new
# twins that share its exact pipeline and change only the final
# projection / day-cast spelling. The four rows read as a truth
# table: any integer-twin red ⇒ counts/join logic or driver-side
# data (time zones are structurally excluded —
# tests/test_survival_tz.py; the oracle's running product is now a
# version-stable recursive CTE rather than a windowed list_reduce);
# integer green + original red ⇒ the decimal-string rendering, and
# `survival_km_micro`'s BIGINT contract is the shipped fix. (1b) the
# 20 operators NEW this round — first canonical rows. (2) the 16
# queries whose output rendering changed in the r6 decimal-stable
# sweep but whose green rows predate it — fresh canonical rows that
# match the tree. (3) staleness rotation: the oldest green rows
# (r1-r3 vintage); 4+20+16 = 40 head slots leave ~10 rotation slots,
# the rest overflow to r8 under the standing tail policy. Everything
# is locally parity-checked every round regardless
# (scripts/verify_contract.py, 211/211 at sf0.01; full sf0.1 pass
# also green this round).
_CHECK_PRIORITY = [
    # 1: survival discriminating experiment (r6 verdict item 1).
    # NOTE (r7 analysis, tests/test_survival_tz.py): session-TZ shift
    # is structurally excluded — all casts are lazy, so load and day
    # conversions share one zone and cancel; any integer-row red
    # therefore indicts counts/join logic or driver-side data, and
    # integer-green + original-red indicts the decimal-string
    # rendering (micro-units become the contract).
    "survival_km_risk_table", "survival_km_day_ntz",
    "survival_km_micro", "survival_kaplan_meier",
    # 1b: new this round — need first driver rows
    "lsh_tuning_recommend", "multimodal_jpeg_color_decode",
    "boilerplate_passage_filter", "label_balance_resample",
    "winsorized_robust_stats", "prefilter_pruned_semi_join",
    "anomaly_mad_robust", "multimodal_jpeg_420_decode",
    "pareto_frontier_docs", "rolling_origin_backtest",
    "geo_grid_neighbor_pairs", "did_estimator",
    "multimodal_jpeg_progressive_decode",
    "compressibility_quality_score", "inverted_index_postings",
    "scd2_point_in_time_join", "association_rules_lift",
    "uplift_decile_curve", "multimodal_jpeg_422_decode",
    # 2: r6 decimal-stable sweep re-rendered these outputs; their green
    # rows describe the PREVIOUS schema — refresh (r6 verdict item 2)
    "benford_digit_audit", "psi_drift_by_decile",
    "token_entropy_by_source", "weighted_sample_aes",
    "l_diversity_audit", "raking_ipf_mix_weights",
    "pii_redaction_scrub", "passage_dup_coverage", "dedup_keep_best",
    "incremental_dedup_new_batch", "cusum_changepoint",
    "calibration_reliability", "cuped_adjusted_metric",
    "constraint_audit", "containment_pairs", "multimodal_png_decode",
    # 3: staleness rotation — oldest green rows first (r1-r3 vintage)
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
    # ---- ~r7 cap lands ~21 entries above here (4 + 20 + 16 + ~10) ----
    # r3/r4 vintage greens, next-oldest first — r8 rotation overflow
    "multimodal_payload_stats", "multimodal_fingerprint_topk",
    "multimodal_frame_sample", "multimodal_feature_extract",
    "scan_filter_project", "like_patterns", "pagination",
    "join_fact_fact", "enrichment_join", "join_ratio_filter",
    "join_semi", "join_anti", "hierarchy_join", "explode_tokens",
    "hierarchy_closure", "hprof_record_tally", "hprof_object_kinds",
    "date_trunc_daily", "window_tumbling_hour", "json_extract_agg",
    # r4/r5-checked greens, freshest last (r6-checked greens follow in
    # registration order via _ordered's tail — they are the youngest):
    "similarity_lsh_bucketed", "embedding_norms", "text_quality",
    "token_count_regex", "lang_id_confusion", "doc_fingerprint",
    "minhash_lsh_candidates", "embedding_near_dup_pairs",
    "simhash_fingerprint", "similarity_ivf_probe", "jaccard_pairs",
    "vocab_topk",
    "dedup_connected_components", "dedup_cluster_representatives",
    "decontaminate_ngram_overlap", "data_mix_weighted_sample",
    "train_test_split_hash", "quality_filter_chain",
    "stratified_sample_per_source",
    "repetition_filter_gopher",
    "minhash_verify_jaccard", "token_budget_select",
    "kmeans_embedding_clusters", "quality_percentile_gate",
    "reachability_live_census",
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
