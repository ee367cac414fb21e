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
# per round, taken in dict order.
#
# FRESHNESS POLICY (restated r10, per the r9 verdict): every
# registered query's canonical driver row is re-sampled within SIX
# rounds — the attainable cadence at ~50 samples/round over a
# 284-query registry (a full pass takes ~6 rounds once new-query head
# slots are paid). The per-round compensating gate is the local
# registry-wide `scripts/verify_contract.py` pass at sf0.01 + sf0.1,
# which re-checks EVERY oracle-paired query each round regardless of
# what the driver samples.
#
# r10 front (final counts):
# (1) the 18 queries NEW in r10 — first canonical rows.
# (2) conformal_interval_naive + kcore_fixpoint re-sampled: both
#     carry r9 ADVICE fixes (empty-calibration shape parity; oracle
#     unroll budget 30→40 with loud error() on overrun).
# (3) staleness rotation, oldest vintage first: after r9 the
#     cumulative record holds 15 r3-vintage and 42 r4-vintage green
#     rows; the 15 r3 rows head the rotation (r9 verdict done-bar:
#     zero rows older than r4 after r10). 18+2+15 = 35 head slots
#     leave ~15 under the ~50 cap, so the r4 block below is sampled
#     through ~hierarchy_join; its remainder (~27 rows, from
#     explode_tokens) leads the r11 rotation, then the r5 block.
_CHECK_PRIORITY = [
    # 1: new in r10 — need first driver rows
    "incremental_dedup_lsh_batch", "bpe_train_merges",
    "growth_by_retainer", "kneser_ney_trigram_score",
    "tokenizer_apply_bpe", "saturation_dedup_curve",
    "cdc_chunk_dedup", "good_turing_vocab_estimate",
    "context_window_loss", "embedding_quantization_error",
    "mmr_diverse_selection", "stratified_kfold_assignment",
    "random_projection_distortion", "lsh_plane_recall_curve",
    "temperature_sampling_weights", "fragment_reassembly_candidates",
    "cross_source_ngram_matrix", "ngram_repetition_curve",
    # 2: re-sample r9-ADVICE-fixed queries
    "conformal_interval_naive", "kcore_fixpoint",
    # 3: staleness rotation — r3-vintage remainder (15), oldest first
    "asof_join_next_event", "date_trunc_daily", "ema_user_value",
    "freq_items_sketch", "hierarchy_closure", "hprof_object_kinds",
    "hprof_record_tally", "json_extract_agg",
    "percentile_disc_groups", "range_join_nearby",
    "rollup_hypertable_cascade", "sessionize_lag",
    "window_rank_topk", "window_running_sum", "window_tumbling_hour",
    # 4: r4-vintage greens (42) — ~27 fit under the ~50 cap this
    # round; the tail leads the r11 rotation. embedding_near_dup_
    # pairs and kmeans_embedding_clusters are placed early: both are
    # this round's verdict watch items.
    "embedding_near_dup_pairs", "kmeans_embedding_clusters",
    "multimodal_payload_stats", "multimodal_fingerprint_topk",
    "multimodal_frame_sample", "multimodal_feature_extract",
    "scan_filter_project", "like_patterns", "pagination",
    "join_fact_fact", "enrichment_join", "join_ratio_filter",
    "join_semi", "join_anti", "hierarchy_join", "explode_tokens",
    "similarity_lsh_bucketed", "embedding_norms", "text_quality",
    "token_count_regex", "lang_id_confusion", "doc_fingerprint",
    "minhash_lsh_candidates",
    "simhash_fingerprint", "similarity_ivf_probe", "jaccard_pairs",
    "vocab_topk", "dedup_connected_components",
    "dedup_cluster_representatives", "decontaminate_ngram_overlap",
    "data_mix_weighted_sample", "train_test_split_hash",
    "quality_filter_chain", "stratified_sample_per_source",
    "repetition_filter_gopher", "minhash_verify_jaccard",
    "token_budget_select",
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
