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
# rounds (new-query head slots are paid first each round). The
# per-round compensating gate is the local registry-wide
# `scripts/verify_contract.py` pass at sf0.01 + sf0.1, which
# re-checks EVERY oracle-paired query each round regardless of what
# the driver samples.
#
# r12 front (composition validated by `scripts/update_counts.py`
# --check-head, which derives every count from the registry and the
# CORRECTNESS_r*.json record instead of prose arithmetic):
# (1) the staleness rotation FIRST this round (r11 verdict item 1):
#     the r4-vintage cap-spill rows, then the full r5-vintage block.
#     Done-bar: the post-r12 vintage histogram shows zero rows older
#     than r6.
# (2) the queries whose output contract changed in r12 (the sketch
#     family's rows-only → oracle-gated-audit promotion) — their old
#     greens pinned a different schema, so they need fresh canonical
#     rows.
# (3) the queries NEW in r12 — first canonical rows.
_CHECK_PRIORITY = [
    # 1a: r4-vintage cap-spill rows (oldest in the record)
    "token_budget_select", "quality_percentile_gate",
    "reachability_live_census", "semantic_dedup_centroid",
    "single_retainer_bytes", "dominator_retained",
    # 1b: r5-vintage block
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
    # 2: re-contracted in r12 (sketch audits — new output schema)
    "approx_distinct_sketch", "approx_quantile_sketch",
    "freq_items_sketch", "sketch_union_cascade",
    "compressibility_quality_score",
    # 3: new in r12 — need first driver rows
    "quality_classifier_train", "quality_classifier_apply_trained",
    "matryoshka_truncation_recall", "loo_source_ablation",
    "arrow_ipc_record_tally", "arrow_ipc_roundtrip_tally",
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
