"""GC-root reachability over the heap object graph — BFS as iterative
DataFrame joins.

The reference encodes the heap as a relational graph (field value =
object id → join, /root/reference/mcp_server/server.py:179-184) but can
only walk a fixed number of hops by writing one JOIN per hop; an
arbitrary-depth traversal ("is this object live?", "how much is
floating garbage?") is outside its SQL surface. Here it is a
first-class operator: build the edge list once from the warehouse,
then breadth-first-expand a frontier with anti-join de-duplication —
the same bounded-iteration shape as dedup_connected_components
(queries/pipeline.py), rounds bounded by graph diameter.

Edge sources (complete by construction of the warehouse):
- per-class Object-typed fields, discovered from ``_field_types``
  (the declared layout written at ingest — a class-registry-sized
  metadata read, same posture as the reference's schema pass);
- ``_object_arrays`` element lists (one explode);
- ``_static_fields`` refs (class object → referee).

Scale notes: the per-class loop is driver-side over the CLASS REGISTRY
(thousands), never over instances; each class contributes a
column-pruned scan of exactly (obj_id + its ref columns). The edge
list is localCheckpoint-ed once and every BFS round is one join + one
anti-join over fixed-width (src, dst) longs. On a long-lived warehouse
the edge table is worth persisting (write it as `_heap_edges`) so
repeated liveness queries skip the union-of-scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Warehouse


def _empty_pairs(wh: Warehouse, a: str, b: str) -> DataFrame:
    return wh.spark.createDataFrame([], f"{a} long, {b} long")


def heap_edges(wh: Warehouse) -> DataFrame:
    """(src, dst) reference edges for the whole heap, dst != 0 (the
    null sentinel, SURVEY §1.2, never creates an edge).

    Every per-class / system table lookup tolerates a missing table:
    ingest only writes a table when it has >=1 row (loaded classes with
    zero instances are common in real dumps), so absence means "no
    edges from that source", not an error — the same guard
    default_mode.py:121-124 applies to the ref-resolution pass."""
    ft = wh.table("_field_types").filter(F.col("field_type") == "Object")
    by_class: dict[str, list[str]] = {}
    # Driver-side over the class registry only (bounded like the
    # reference's schema generation, dump_to_parquet.rs:521-533).
    for r in ft.select("class_name", "field_name").collect():
        by_class.setdefault(r["class_name"], []).append(r["field_name"])

    parts = []
    for cls, fields in sorted(by_class.items()):
        try:
            t = wh.table(cls)
        except KeyError:
            continue  # class loaded but zero instances → no table, no edges
        refs = F.array(*[F.col(f"`{f}`") for f in fields])
        parts.append(
            t.select(
                F.col("obj_id").alias("src"), F.explode(refs).alias("dst")
            )
        )
    try:
        oa = wh.table("_object_arrays").select(
            F.col("obj_id").alias("src"), F.explode("elements").alias("dst")
        )
    except KeyError:
        oa = _empty_pairs(wh, "src", "dst")
    try:
        sf = wh.table("_static_fields").select(
            F.col("class_obj_id").alias("src"), F.col("ref_id").alias("dst")
        )
    except KeyError:
        sf = _empty_pairs(wh, "src", "dst")
    edges = oa
    for p in parts:
        edges = edges.unionByName(p)
    edges = edges.unionByName(sf)
    return edges.filter(F.col("dst") != 0)


def reachable_from_roots(wh: Warehouse, max_rounds: int = 1024) -> DataFrame:
    """(obj_id) of every object reachable from any GC root.

    BFS: frontier ⋈ edges → next hop, anti-join against the visited
    set, iterate until a round adds nothing (the only correct stop —
    reference chains like long linked lists can be arbitrarily deep).
    *max_rounds* is a runaway backstop, not a truncation: exceeding it
    with a non-empty frontier raises rather than silently returning a
    partial set that would misreport live objects as floating garbage.
    The driver only ever sees a per-round scalar count; each round is
    one join + one anti-join over checkpoint-truncated lineage."""
    edges = heap_edges(wh).localCheckpoint()
    try:
        roots = (
            wh.table("_gc_roots")
            .filter(F.col("obj_id") != 0)
            .select("obj_id")
            .distinct()
            .localCheckpoint()
        )
    except KeyError:  # dump with no GC-root records → nothing is live
        return wh.spark.createDataFrame([], "obj_id long")
    visited = roots
    frontier = roots
    for _ in range(max_rounds):
        # Lazy checkpoint + count(): the emptiness probe doubles as
        # the materializing job — one action per round. `visited`
        # stays a lazy union of checkpointed frontiers (each piece's
        # lineage already truncated).
        nxt = (
            edges.join(frontier, edges.src == frontier.obj_id)
            .select(F.col("dst").alias("obj_id"))
            .distinct()
            .join(visited, "obj_id", "left_anti")
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            return visited
        visited = visited.unionByName(nxt)
        frontier = nxt
    raise RuntimeError(
        f"reachability BFS did not converge within {max_rounds} rounds "
        "(frontier still growing) — raise max_rounds; refusing to return "
        "a partial reachable set"
    )


def unreachable_by_type(wh: Warehouse, k: int = 20) -> DataFrame:
    """Floating garbage census: objects in ``_object_index`` that no GC
    root reaches, counted per type — the "what is this dead weight"
    leak-triage view the reference's fixed-join SQL cannot express."""
    live = reachable_from_roots(wh)
    return (
        wh.table("_object_index")
        .join(live, "obj_id", "left_anti")
        .groupBy("type_name")
        .agg(F.count(F.lit(1)).alias("n_unreachable"))
        .orderBy(F.desc("n_unreachable"), "type_name")
        .limit(k)
    )


def liveness_summary(wh: Warehouse) -> DataFrame:
    """One-row summary: total objects, reachable, unreachable."""
    total = wh.table("_object_index").select("obj_id")
    live = reachable_from_roots(wh)
    return (
        total.join(live.withColumn("live", F.lit(1)), "obj_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.sum(F.coalesce(F.col("live"), F.lit(0)))
            .cast("long")
            .alias("n_reachable"),
            F.sum(F.when(F.col("live").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unreachable"),
        )
    )
