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
# FRESHNESS POLICY (r10, restated with the cadence math kept generic
# so the text survives registry growth): every registered query's
# canonical driver row is re-sampled within ceil(registry_size / ~50)
# rounds — six at the current 310-query registry (new-query head
# slots are paid first each round). The per-round compensating gate
# is the local registry-wide `scripts/verify_contract.py` pass at
# sf0.01 + sf0.1, which re-checks EVERY oracle-paired query each
# round regardless of what the driver samples.
#
# r11 front:
# (1) the queries NEW in r11 — first canonical rows.
# (2) staleness rotation, oldest vintage first: after r10 the record
#     holds 27 r4-vintage greens (the explode_tokens…dominator_
#     retained block below — r10 sampled the first 15 r4 rows) and
#     33 r5-vintage greens. The r11 build added 29 new queries, so
#     29 + 27 = 56 overfills the ~50 cap: if the driver cuts at 50,
#     the last ~6 r4 rows (token_budget_select onward) spill and
#     lead the r12 rotation together with the full r5 block (33 rows,
#     from window_sliding_15m). Done-bar: zero rows older than r5
#     after r11 modulo that ≤5-row cap spill (every spilled row was
#     re-verified exact by this round's local 330-query registry gate
#     at BOTH sf0.01 and sf0.1); r4+r5 clear fully in r12.
_CHECK_PRIORITY = [
    # 1: new in r11 — need first driver rows
    "image_phash_near_dup", "unigram_train_stats",
    "tokenizer_apply_unigram", "incremental_dedup_lsh_multiday",
    "video_phash_near_dup", "audio_fingerprint_near_dup",
    "tokenizer_fertility_compare", "cross_modal_consistency_audit",
    "hybrid_search_rrf", "mutual_knn_near_dup",
    "zorder_clustering_audit", "event_sequence_pattern",
    "ccnet_perplexity_buckets", "tokenizer_apply_wordpiece",
    "kcenter_coreset_selection", "rank_biased_overlap",
    "filtered_ann_pre_vs_post", "embedding_mean_shift_drift",
    "ngram_coverage_curve", "lsh_multiprobe_gain",
    "ivf_index_lifecycle_probe", "simhash_hamming_near_dup",
    "ndcg_lexical_vs_dense", "packing_strategy_advisor",
    "event_trigram_patterns", "embedding_power_iteration_pca",
    "leakage_free_feature_matrix", "percolate_with_exclusions",
    "warc_record_tally",
    # 2: staleness rotation — r4-vintage remainder (27), oldest first
    "explode_tokens", "similarity_lsh_bucketed", "embedding_norms",
    "text_quality", "token_count_regex", "lang_id_confusion",
    "doc_fingerprint", "minhash_lsh_candidates", "simhash_fingerprint",
    "similarity_ivf_probe", "jaccard_pairs", "vocab_topk",
    "dedup_connected_components", "dedup_cluster_representatives",
    "decontaminate_ngram_overlap", "data_mix_weighted_sample",
    "train_test_split_hash", "quality_filter_chain",
    "stratified_sample_per_source", "repetition_filter_gopher",
    "minhash_verify_jaccard", "token_budget_select",
    "quality_percentile_gate", "reachability_live_census",
    "semantic_dedup_centroid", "single_retainer_bytes",
    "dominator_retained",
    # 3: r5-vintage greens (33) — ~15 fit under the ~50 cap this
    # round; the tail leads the r12 rotation.
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
