"""Continuous heap monitoring: the HPROF directory tail composed with
the census/diff analytics — the streaming face of the MAT
compare-dumps workflow the snapshot layer serves in batch
(``ingest/snapshots.py``; ≙ the reference's one-dump-at-a-time CLI,
generalized to a spool of dumps arriving over time).

A fleet spools heap dumps into a directory (crashed-JVM handler, a
periodic jmap cron, an upload-bucket mount). The tail
(``sources/hprof_source.HprofTailStreamReader``) plans each newly
committed dump as record-boundary byte-range splits, so one arriving
multi-GB dump parallelizes across the cluster within its own
micro-batch. Because discovery is whole-file (a dump never straddles
micro-batches), a per-batch census is COMPLETE for every dump it
contains — the monitor needs no cross-batch aggregation state, and
each batch's output commits to its own ``batch=<id>`` partition with
overwrite, making foreachBatch's at-least-once replay idempotent
(the ``streaming/lsh_dedup.py`` commit discipline).

Growth attribution then reads the accumulated census table: for each
(kind, class) the per-dump object count is compared to the previous
dump in arrival order — the positive deltas name the classes an
accumulating leak is feeding, without ever re-reading an old dump.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def dump_census(instances: DataFrame) -> DataFrame:
    """Per-(dump, kind, class) census over an ``instances``-view
    relation: object count and total ``n`` (bytes for instances,
    element counts for arrays — the view's per-kind unit). A plain
    shuffle-bounded rollup: the grouped width is bounded by loaded
    classes, never heap size."""
    return (
        instances.groupBy("dump", "kind", "class_obj_id")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.sum("n").alias("total_n"),
        )
    )


def streaming_heap_census(
    spark: SparkSession,
    spool_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    split_bytes: int = 64 << 20,
):
    """Drain the dump spool with availableNow, committing each
    micro-batch's per-dump census to ``batch=<id>`` (overwrite →
    replay-idempotent). Returns the started query."""
    from ..sources.hprof_source import register

    register(spark)
    tail = (
        spark.readStream.format("hprof")
        .option("view", "instances")
        .option("split_bytes", str(split_bytes))
        .load(spool_dir)
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        dump_census(batch).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    return (
        tail.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def census_growth(census: DataFrame) -> DataFrame:
    """Growth attribution across the dump sequence: for each
    (kind, class), object-count and total-``n`` deltas vs the PREVIOUS
    dump in name order (spools name dumps by timestamp, so name order
    is arrival order). Classes absent from a dump count as zero on
    that side — a class appearing or vanishing is itself growth
    signal. Output: one row per (dump, kind, class) with positive
    ``delta_objects`` — "what grew", the compare-dumps answer.

    Scale shape: a dense (dump × class) frame via a dumps-x-classes
    cross of two SMALL distinct relations (dump count × loaded-class
    count rows — metadata-sized, never heap-sized), left-joined to
    the census, then one lag window per (kind, class)."""
    dumps = census.select("dump").distinct()
    classes = census.select("kind", "class_obj_id").distinct()
    dense = (
        dumps.crossJoin(classes)  # metadata-sized × metadata-sized
        .join(census, ["dump", "kind", "class_obj_id"], "left")
        .fillna(0, subset=["n_objects", "total_n"])
    )
    w = (
        Window.partitionBy("kind", "class_obj_id")
        .orderBy("dump")
    )
    scored = dense.select(
        "dump",
        "kind",
        "class_obj_id",
        "n_objects",
        F.lag("n_objects", 1).over(w).alias("prev_objects"),
        (F.col("total_n") - F.lag("total_n", 1).over(w)).alias("delta_n"),
    )
    deltas = scored.where(
        F.col("prev_objects").isNotNull()
        & (F.col("n_objects") > F.col("prev_objects"))
    ).select(
        "dump",
        "kind",
        "class_obj_id",
        "n_objects",
        (F.col("n_objects") - F.col("prev_objects")).alias("delta_objects"),
        "delta_n",
    )
    return deltas.orderBy(F.desc("delta_objects"), "dump", "kind", "class_obj_id")
