"""Window-function and event-time operators (SURVEY.md §2B B33-B34,
B37-B38 extension surface).

The reference has no `OVER` clause and no streaming (SURVEY §2B
B37/B38); these queries provide that surface over the `orders` and
`events` fixture tables. The batch event-time queries here have exact
Structured Streaming twins in ``heapdumpstardiver_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..exprs import round_col, round_sql
from ..registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_rank_topk",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rn <= 3
    """,
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the per-category top-k the
    reference can only do globally (analyze_heap_parquet.py:308-321).
    One shuffle on the partition key; no global sort."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {round_sql("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_total
    FROM orders WHERE o_custkey < 200
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer — analytic frame aggregation."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        round_col(F.sum("o_totalprice").over(w)).alias("running_total"),
    )


@query(
    "sessionize_lag",
    oracle="""
    SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM (
        SELECT user_id,
               CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM (
            SELECT user_id, ts,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
            FROM events
        )
    )
    GROUP BY user_id
    """,
)
def sessionize_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag — the batch
    twin of a session window. Microsecond epoch arithmetic keeps both
    engines exact."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_sess = F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0)
    return (
        e.select("user_id", new_sess.alias("new_sess"))
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "date_trunc_daily",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS n_events,
           {round_sql("sum(value)")} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def date_trunc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-truncated event-time aggregation (B34 gap: the reference
    has no date/timestamp functions; `events.ts` provides them)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_col(F.sum("value")).alias("total_value"),
        )
    )


@query(
    "window_tumbling_hour",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           {round_sql("sum(value)")} AS total_value,
           {round_sql("avg(value)", 4)} AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def window_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window — batch twin of the Structured
    Streaming windowed aggregation (see streaming/windowed.py); F.window
    is the same operator Spark uses under watermarks."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round_col(F.sum("value")).alias("total_value"),
            round_col(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )


@query(
    "json_extract_agg",
    oracle=f"""
    SELECT event_type,
           {round_sql("avg(CAST(json_extract_string(props, '$.k') AS INT))", 4)} AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
           count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction (B34 gap) — `events.props` is a
    JSON-ish VARCHAR; get_json_object stays JVM-side."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        round_col(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(F.lit(1)).alias("cnt"),
    )
