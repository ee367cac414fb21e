"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a repeated fact-fact join is the
shuffle of both sides on the join key. Writing the facts ONCE as
bucketed+sorted tables (hash(key) → fixed bucket count) lets every
subsequent equi-join or aggregation on that key run with NO exchange:
Spark matches bucket files pairwise per task. This module wraps the
write/read pattern; `tests/test_bucketing.py` asserts the exchange-free
plan.

The reference has no analogue (DuckDB re-hashes per query); this is
pure Spark physical design — the same role its robo chunk files play
for parallel writes, extended to co-located reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 16,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Persist *df* as a bucketed (and optionally sorted) managed
    parquet table. Joins/aggregations keyed on *bucket_cols* between
    tables sharing *n_buckets* need no shuffle."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
