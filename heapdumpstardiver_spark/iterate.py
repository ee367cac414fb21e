"""Helpers for data-dependent iterative fixpoints (k-core peeling,
label propagation, connected components).

Long iterative loops need TWO disciplines, not one:

1. ``localCheckpoint`` truncates LINEAGE so round r+1's plan doesn't
   nest round r's (the `dedup_connected_components` discipline).
2. But ``localCheckpoint`` deliberately PRESERVES Catalyst statistics
   (``LogicalRDD.rewriteStatsAndConstraints``): a round that joins the
   previous state TWICE (e.g. k-core filters both edge endpoints
   against the alive set) squares the estimated ``sizeInBytes`` every
   round — the BigInt's digit count DOUBLES per round, and by round
   ~25 stats arithmetic alone OOMs the driver
   (``SizeInBytesOnlyStatsPlanVisitor`` dividing 100M-digit
   BigIntegers; observed on kcore_fixpoint at sf0.1, round 27).

``checkpoint_flat`` does both: materialize via localCheckpoint, then
rewrap the SAME materialized internal RDD as a fresh LogicalRDD with
default statistics — constant-size stats per round, no recomputation,
no data movement. On a real cluster the equivalent discipline is
checkpointing state to the warehouse every N rounds; this is the
zero-I/O local-mode form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_flat(df: DataFrame) -> DataFrame:
    """Materialize *df* and return it with flat lineage AND reset
    (default) Catalyst stats, so iterative loops that reference the
    result multiple times per round cannot compound size estimates
    exponentially. The returned frame reuses the checkpointed
    partitions — nothing is recomputed or copied.

    (A lazy-checkpoint variant — materialization deferred to the
    caller's convergence count, one job per round instead of two —
    was A/B-measured at sf0.1 and came out ~0.6 s SLOWER warm
    (10.2 vs 9.6 s over 27 k-core rounds): the per-round count on
    already-materialized partitions is cheap, so eager stays.)"""
    ck = df.localCheckpoint()
    jdf = ck._jdf
    spark = ck.sparkSession
    fresh = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(fresh, spark)
