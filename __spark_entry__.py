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
# r13 front (composition validated by `scripts/update_counts.py`
# --check-head, which derives every count from the registry and the
# CORRECTNESS_r*.json record instead of prose arithmetic):
# (1) the query NEW in r13 — first canonical row.
# (2) the full 48-row r6-vintage block (r12 verdict item 1) — the
#     oldest rows in the record. Done-bar: the post-r13 vintage
#     histogram shows zero rows older than r7 and --check-head
#     reports "stale rows NOT in head: 0".
# (3) one spare slot: the alphabetically-first r7-vintage row, giving
#     the r14 rotation a head start.
# The SIX queries added later in r13 (after this head was composed per
# the r12 verdict's "48-row block first, at most 2 new slots") are
# never-green and take the r14 head FIRST per the standing policy:
# 6 new + the 44 remaining r7-vintage rows = exactly 50 slots.
# --check-head reports them under "never-green", distinct from stale.
_CHECK_PRIORITY = [
    # 1: new in r13
    "ivfpq_adc_probe",
    # 2: the r6-vintage block
    "ab_power_analysis", "ann_recall_at_k", "anomaly_zscore_daily",
    "asof_join_tolerance", "bigram_logprob_score", "bigram_pmi_topk",
    "bm25_keyword_search", "bpe_pair_merge_candidates",
    "chunk_documents_overlap", "cross_source_duplication",
    "curation_funnel_accounting", "decile_feature_binning",
    "eb_shrunk_rates", "exact_substring_runs", "funnel_conversion",
    "fuzzy_join_levenshtein", "gap_fill_interpolate", "gc_root_path",
    "gini_revenue_concentration", "heaps_law_fit",
    "importance_resample_dsir", "importance_weight_ess",
    "join_key_skew_profile", "k_anonymity_audit",
    "latest_event_per_user", "locf_forward_fill", "lsh_tuning_curve",
    "mix_rate_decomposition", "multimodal_jpeg_decode",
    "partition_key_advisor", "percentile_cont_groups",
    "price_trend_regression", "quality_classifier_score",
    "retention_cohort", "retention_decay_fit",
    "rolling_1h_range_frame", "seasonal_naive_error",
    "seasonality_index_dow", "similarity_pq_adc",
    "star_join_supplier_volume", "table_profile", "textrank_keywords",
    "tfidf_top_terms", "time_weighted_avg_user",
    "trending_leaderboard_decayed", "unigram_logprob_score",
    "vocab_oov_coverage", "zipf_alpha_fit",
    # 3: spare slot — stalest-next (r7) row
    "anomaly_mad_robust",
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
