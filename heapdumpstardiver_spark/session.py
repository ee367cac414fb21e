"""SparkSession factory.

Local-mode defaults are tuned for the test harness (local[N], AQE on,
shuffle partitions matched to cores, UTC timezone so timestamp values
agree with the DuckDB oracle). On a real cluster the same builder is
used with master/memory supplied by the environment; the scale-bearing
choices (AQE, adaptive coalescing, broadcast threshold) carry over.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "heapdumpstardiver-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # broadcast conversion — the core 100-TB posture.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for toPandas / pandas_udf exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ObjectHashAggregate (collect_set/collect_list — the dedup
        # bucket aggregations) falls back to sort-based aggregation
        # after only 128 distinct keys by default, which serializes the
        # hot path of every bucketing query. Per-key buffers here are
        # small id-arrays, so 1M in-memory groups per task is a few tens
        # of MB; past that the sort-based fallback (the spill path)
        # still engages.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
        # RocksDB state store: bounded-memory streaming state (vs the
        # default in-heap HDFS-backed provider) and required by the
        # Spark 4 transformWithState stateful-processor API.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
