"""Snapshot (incremental-ingest) tests: two heap states appended as
Hive partitions of one warehouse; per-snapshot reads must prune at the
scan, and the diff operators must report exactly the objects that
appeared/disappeared between the states."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heapdumpstardiver_spark.catalog import Warehouse
from heapdumpstardiver_spark.ingest import (
    append_snapshot,
    list_snapshots,
    object_diff,
    snapshot_summary,
    type_histogram_delta,
)
from heapdumpstardiver_spark.ingest.hprof_writer import build_test_dump

N_EXTRA = 3


@pytest.fixture(scope="module")
def snap_wh(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("snap")
    a, b = str(d / "a.hprof"), str(d / "b.hprof")
    truth_a = build_test_dump(a)
    # later heap state: 3 new Strings appeared, the Base instance was freed
    truth_b = build_test_dump(b, extra_strings=N_EXTRA, omit_base=True)
    wh_dir = str(d / "wh")
    append_snapshot(spark, a, wh_dir, 1)
    append_snapshot(spark, b, wh_dir, 2)
    return Warehouse(spark, wh_dir), wh_dir, truth_a, truth_b


def _n_objects(truth):
    return (
        truth["instances"] + truth["prim_arrays"] + truth["object_arrays"] + truth["class_dumps"]
    )


def test_list_and_duplicate_refused(spark, snap_wh, tmp_path):
    wh, wh_dir, truth_a, _ = snap_wh
    assert list_snapshots(wh_dir) == [1, 2]
    dump = str(tmp_path / "again.hprof")
    build_test_dump(dump)
    with pytest.raises(FileExistsError):
        append_snapshot(spark, dump, wh_dir, 2)


def test_snapshot_summary(snap_wh):
    wh, _, truth_a, truth_b = snap_wh
    rows = {r["snapshot"]: r for r in snapshot_summary(wh).collect()}
    assert rows[1]["n_objects"] == _n_objects(truth_a)
    assert rows[2]["n_objects"] == _n_objects(truth_b)
    assert rows[2]["n_objects"] - rows[1]["n_objects"] == N_EXTRA - 1


def test_union_read_spans_snapshots(snap_wh):
    wh, _, truth_a, truth_b = snap_wh
    s = wh.table("java.lang.String")
    assert s.count() == truth_a["strings"] + truth_b["strings"]
    per_snap = {r["snapshot"]: r["n"] for r in
                s.groupBy("snapshot").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_snap == {1: truth_a["strings"], 2: truth_b["strings"]}


def test_type_histogram_delta(snap_wh):
    wh, _, _, _ = snap_wh
    d = {r["type_name"]: r["delta"] for r in type_histogram_delta(wh, 1, 2).collect()}
    assert d["java.lang.String"] == N_EXTRA
    assert d["com.test.Base"] == -1
    assert all(v == 0 for t, v in d.items() if t not in ("java.lang.String", "com.test.Base"))


def test_object_diff_exact(snap_wh):
    wh, _, truth_a, truth_b = snap_wh
    rows = object_diff(wh, 1, 2).collect()
    new = [r for r in rows if r["status"] == "new"]
    freed = [r for r in rows if r["status"] == "freed"]
    assert len(new) == N_EXTRA and all(r["type_name"] == "java.lang.String" for r in new)
    assert len(freed) == 1 and freed[0]["type_name"] == "com.test.Base"
    assert freed[0]["obj_id"] == truth_a["base_inst"]
    # retained objects only appear when asked for, and account for the rest
    full = object_diff(wh, 1, 2, include_retained=True)
    n_retained = full.filter(F.col("status") == "retained").count()
    assert n_retained == _n_objects(truth_a) - 1


def test_snapshot_read_prunes_partitions(snap_wh):
    """A single-snapshot read must show the snapshot predicate under
    PartitionFilters (directory pruning), not as a data filter."""
    wh, _, _, _ = snap_wh
    df = wh.table("_object_index").filter(F.col("snapshot") == 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    (scan,) = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "snapshot" in pf and "2" in pf, scan


def test_snapshot_view_runs_analytics_per_state(spark, snap_wh):
    """The waste-check layer runs unchanged against a snapshot-pinned
    view, and sees each heap state's own numbers."""
    from heapdumpstardiver_spark.analytics import waste as W
    from heapdumpstardiver_spark.ingest import SnapshotView

    _, wh_dir, _, _ = snap_wh
    v1 = SnapshotView(spark, wh_dir, 1)
    f1 = W.check_duplicate_strings(v1)
    # snapshot 1 is the standard test heap: 3x"hello" + 2x[1,2,3] dups
    assert f1.affected_count == 5 and len(f1.sub_findings) == 2
    assert W.check_gc_roots(v1).affected_count == 9

    v2 = SnapshotView(spark, wh_dir, 2)
    f2 = W.check_duplicate_strings(v2)
    # snapshot 2 added 3 more "hello"-content strings: 6x + 2x dups
    assert f2.affected_count == 8 and len(f2.sub_findings) == 2

    # the pinned view prunes partitions at the scan
    plan = (
        v2.table("java.lang.String")._jdf.queryExecution().executedPlan().toString()
    )
    (scan,) = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert "snapshot" in scan.split("PartitionFilters:")[1].split("]")[0], scan


def test_compact_table_flat_and_partitioned(spark, tmp_path_factory):
    """Compaction merges many tiny part files into few, preserves every
    row, and keeps Hive partition directories (snapshot layout)."""
    from heapdumpstardiver_spark.catalog import compact_table
    from heapdumpstardiver_spark.ingest import append_snapshot

    d = tmp_path_factory.mktemp("compact")
    dump = str(d / "t.hprof")
    build_test_dump(dump)
    wh_dir = str(d / "wh")
    # tiny splits -> many part files per table
    append_snapshot(spark, dump, wh_dir, 1, target_split_bytes=64)
    append_snapshot(spark, dump, wh_dir, 2, target_split_bytes=64)

    wh = Warehouse(spark, wh_dir)
    before_rows = wh.table("_object_index").count()
    per_snap_before = dict(
        (r["snapshot"], r["n"])
        for r in wh.table("_object_index")
        .groupBy("snapshot").agg(F.count(F.lit(1)).alias("n")).collect()
    )

    stats = compact_table(spark, wh_dir, "_object_index")
    assert stats["files_before"] > stats["files_after"]

    wh2 = Warehouse(spark, wh_dir)
    assert wh2.table("_object_index").count() == before_rows
    per_snap_after = dict(
        (r["snapshot"], r["n"])
        for r in wh2.table("_object_index")
        .groupBy("snapshot").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert per_snap_after == per_snap_before
    # partition directories survived (pruning still works)
    df = wh2.table("_object_index").filter(F.col("snapshot") == 1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    (scan,) = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert "snapshot" in scan.split("PartitionFilters:")[1].split("]")[0]


def test_growth_by_retainer_attribution(spark, tmp_path):
    """hold_extras emits the leaking-collection shape and
    growth_by_retainer attributes every new object to its sole
    retainer: 6 new Strings -> the new Object[], the Object[] -> the
    new Child, the rooted Child itself unreferenced."""
    from heapdumpstardiver_spark.queries import relational as rel

    rows = {
        (r["retainer_type"], r["grown_type"]): r
        for r in rel.growth_by_retainer(spark, "").collect()
    }
    s = rows[("java.lang.Object[]", "java.lang.String")]
    assert s["n_new"] == 6 and s["grown_bytes"] == 6 * (16 + 14)
    a = rows[("com.test.Child", "java.lang.Object[]")]
    assert a["n_new"] == 1 and a["grown_bytes"] == 16 + 8 * 6
    c = rows[("(unreferenced)", "com.test.Child")]
    assert c["n_new"] == 1
    assert len(rows) == 3


def test_hold_extras_truth_consistency(tmp_path):
    """The hold_extras knob keeps the recorded ground truth additive:
    object/edge/root counts grow by exactly the holder shape."""
    base = build_test_dump(str(tmp_path / "x1.hprof"), extra_strings=4)
    held = build_test_dump(
        str(tmp_path / "x2.hprof"), extra_strings=4, hold_extras=True
    )
    assert len(held["objects"]) == len(base["objects"]) + 2
    # +4 array->string edges, +1 child->array edge
    assert len(held["edges"]) == len(base["edges"]) + 4 + 1
    assert held["gc_roots"] == base["gc_roots"] + 1
    assert held["holder_child"] == held["edges"][-1][0]
