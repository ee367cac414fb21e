"""Structured Streaming operators over the `events` stream.

The reference is pure batch ETL (SURVEY §2B B38 — no streaming
anywhere); this module provides the streaming surface a 100-TB
training-data pipeline needs, as exact twins of the batch event-time
queries in ``queries/windows.py``:

- tumbling windowed aggregation with a watermark for late data
  (`F.window` — identical operator to the batch version);
- session windows via `F.session_window` (gap semantics identical to
  the batch lag-based sessionizer);
- streaming dedup with `dropDuplicatesWithinWatermark` (state-bounded
  exact dedup — the streaming face of the dedup operators in
  ``queries/llm.py``);
- a custom stateful per-key accumulator via ``applyInPandasWithState``
  (the escape hatch for operators watermark/window can't express).

All transformations are sink-agnostic: tests drive them with
``trigger(availableNow=True)`` + memory sink, production would use a
Kafka/file source and a Delta/parquet sink with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of event parquet files (schema pinned —
    streaming sources cannot infer)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts with late-data watermark —
    streaming twin of `window_tumbling_hour`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding (hopping) event-time window counts — each event lands in
    window/slide overlapping windows; streaming twin of
    `window_sliding_15m`. State per open window is bounded by the
    watermark exactly as for tumbling windows, ×(overlap factor)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation (gap-merged) — streaming twin of the
    batch `sessionize_lag` query; same 30-minute inactivity semantics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exact streaming dedup on event_id with bounded state: duplicates
    arriving within the watermark horizon are dropped, state older than
    the horizon is evicted."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def click_view_attribution(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "2 hours",
    horizon: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: every click pairs with the same user's
    views in the preceding *horizon* — the attribution join of an
    event pipeline. Both sides carry a watermark and the join condition
    bounds event-time distance, so Spark can size the join state to the
    horizon and evict rows older than the watermark: state stays
    O(traffic within horizon) regardless of stream lifetime — the only
    stream-stream join shape that survives at 100 TB/day. Append-mode
    output (rows emit once both watermarks pass the join window).

    With ``how="left_outer"`` unmatched clicks ALSO emit — with null
    view columns — once the view-side watermark passes their match
    window, i.e. when no qualifying view can arrive anymore: the
    "unattributed conversion" stream. Same bounded state; the null
    emission is driven by watermark-timed state eviction, so it is
    exactly as late as the watermark and no later.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        "click_ts",
        "view_ts",
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch of the stream
    joins the (bounded) static dimension, broadcast to the executors —
    stateless, no watermark needed, and the standard way reference
    data (user profiles, type registries) reaches a stream. The static
    side is re-resolvable per batch, so a dimension refresh is picked
    up without restarting the query."""
    return events.join(
        F.broadcast(dim), events[left_key] == dim[right_key], "left"
    )


def running_counts_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count + value
    sum via applyInPandasWithState — the pattern for stateful logic
    beyond built-in windows (B38/B39 extension)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts_tws(events: DataFrame) -> DataFrame:
    """Running per-user event count + value sum via
    ``transformWithStateInPandas`` — the Spark 4 stateful-processor API
    (typed ValueState/ListState/MapState + timers), the modern successor
    of :func:`running_counts_stateful`'s ``applyInPandasWithState``.

    Requires the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``), which also gives bounded-memory
    state at scale — the session helper sets it. Executing (not
    building) the query additionally needs ``google.protobuf`` for the
    state-server protocol; environments without it should use
    :func:`running_counts_stateful`.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    class RunningCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningCounts(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint: str, output_mode: str = "complete"):
    """Drain a stream into a memory sink with availableNow (test/demo
    harness; production sinks swap in here)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def write_foreach_batch_idempotent(
    stream_df: DataFrame, out_dir: str, checkpoint: str, query_name: str = "fb_sink"
):
    """foreachBatch sink with the idempotent-overwrite pattern: each
    micro-batch lands in ``out_dir/batch_id=<n>`` with
    ``mode("overwrite")``, so a batch REPLAYED after a failure (Spark's
    foreachBatch delivery is at-least-once: the epoch commits to the
    checkpoint only after the sink function returns) overwrites its own
    partition instead of appending twice. Idempotent writes over
    at-least-once delivery is how end-to-end exactly-once is built for
    sinks without transactional commit — the parquet analogue of the
    MERGE-by-batch-id pattern.

    The batch-id directory is also a Hive partition column, so
    downstream reads of ``out_dir`` see one logical table and can
    partition-prune by ingestion batch."""
    import os

    def _write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
