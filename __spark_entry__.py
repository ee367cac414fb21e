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
# round, taken in dict order. Order the registry so the least-recently
# driver-verified queries come first: queries never checked through r2
# (all of windows.py + the late relational extras + new this round),
# then the r2 hash-fix and r1-green-but-rotated queries, then the
# r2-green remainder (freshest last). Keeps every query's staleness
# bounded at one round.
_CHECK_PRIORITY = [
    # never driver-checked through r2
    "sql_passthrough_reserved", "struct_field_access", "cube_agg",
    "set_ops_except_intersect", "pivot_status_year",
    "salted_heavy_hitter_agg", "grouping_sets_agg",
    "correlated_scalar_subquery", "unpivot_measures", "window_rank_topk",
    "window_running_sum", "sessionize_lag", "date_trunc_daily",
    "window_tumbling_hour", "json_extract_agg", "asof_join_last_event",
    "range_join_nearby", "percentile_disc_groups",
    "rollup_hypertable_cascade", "approx_quantile_sketch",
    "session_window_native", "freq_items_sketch", "ema_user_value",
    # new this round
    "hierarchy_closure", "hprof_record_tally", "pii_redaction_scrub",
    "window_sliding_15m", "hprof_object_kinds", "asof_join_next_event",
    # r2 hash-fail, oracle fixed this round — needs a fresh row
    "pack_sequences_greedy",
    # green in r1, rotated out of r2's cap
    "pricing_summary", "count_distinct", "having_dup_groups",
    "conditional_agg", "two_level_agg", "weighted_topk", "rollup_agg",
    "bucket_histogram", "pattern_classifier", "category_like_chains",
    "global_topk", "union_by_name", "string_funcs", "arithmetic_charge",
    "bitmask_decode", "systematic_sample",
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
