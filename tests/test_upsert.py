"""MERGE-style upsert: partition-scoped dynamic overwrite on
partitioned tables (untouched partitions never rewritten), atomic
full-rewrite otherwise; update/insert accounting in both."""

import glob
import os

import pytest

from heapdumpstardiver_spark.catalog import upsert_table, write_table


@pytest.fixture
def wh_dir(tmp_path):
    return str(tmp_path / "wh")


def test_full_rewrite_upsert(spark, wh_dir):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k LONG, s STRING, v DOUBLE"
    )
    write_table(base, wh_dir, "t")
    upd = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k LONG, s STRING, v DOUBLE"
    )
    stats = upsert_table(spark, wh_dir, "t", upd, keys=["k"])
    assert stats["strategy"] == "full-rewrite"
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    got = {r.k: (r.s, r.v) for r in spark.read.parquet(os.path.join(wh_dir, "t")).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_partition_scoped_upsert_leaves_other_partitions_alone(spark, wh_dir):
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0), (4, "d3", 40.0)],
        "k LONG, day STRING, v DOUBLE",
    )
    write_table(base, wh_dir, "t", partition_by=["day"])
    path = os.path.join(wh_dir, "t")
    untouched_before = sorted(glob.glob(os.path.join(path, "day=d2", "*.parquet"))) + \
        sorted(glob.glob(os.path.join(path, "day=d3", "*.parquet")))

    upd = spark.createDataFrame(
        [(2, "d1", 99.0), (5, "d1", 50.0)], "k LONG, day STRING, v DOUBLE"
    )
    stats = upsert_table(spark, wh_dir, "t", upd, keys=["k"])
    assert stats["strategy"] == "partition-scoped"
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    assert stats["partitions_touched"] == 1

    untouched_after = sorted(glob.glob(os.path.join(path, "day=d2", "*.parquet"))) + \
        sorted(glob.glob(os.path.join(path, "day=d3", "*.parquet")))
    assert untouched_before == untouched_after  # bytes on disk never rewritten

    got = {r.k: (r.day, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("d1", 10.0), 2: ("d1", 99.0), 3: ("d2", 30.0),
        4: ("d3", 40.0), 5: ("d1", 50.0),
    }


def test_upsert_survives_overwrite_of_read_path(spark, wh_dir):
    """The partition-scoped branch reads the very partitions it then
    dynamically overwrites — the merged slice must be materialized
    before the write starts, or Spark either refuses (path-in-use) or
    reads its own half-written output."""
    rows = [(i, "d1", float(i)) for i in range(1000)]
    base = spark.createDataFrame(rows, "k LONG, day STRING, v DOUBLE")
    write_table(base, wh_dir, "t", partition_by=["day"])
    upd = spark.createDataFrame(
        [(i, "d1", -1.0) for i in range(0, 1000, 2)], "k LONG, day STRING, v DOUBLE"
    )
    stats = upsert_table(spark, wh_dir, "t", upd, keys=["k"])
    assert stats["rows_updated"] == 500 and stats["rows_inserted"] == 0
    df = spark.read.parquet(os.path.join(wh_dir, "t"))
    assert df.count() == 1000
    assert df.filter("v = -1.0").count() == 500


def test_multilevel_partition_upsert_preserves_layout(spark, wh_dir):
    """A day=/hour= two-level table must be rewritten with BOTH
    partition levels — a single-level rewrite flattens the touched
    day and corrupts the table against untouched ones."""
    base = spark.createDataFrame(
        [(1, "d1", 0, 1.0), (2, "d1", 1, 2.0), (3, "d2", 0, 3.0)],
        "k LONG, day STRING, hr LONG, v DOUBLE",
    )
    write_table(base, wh_dir, "t", partition_by=["day", "hr"])
    path = os.path.join(wh_dir, "t")

    upd = spark.createDataFrame(
        [(1, "d1", 0, 9.0), (4, "d1", 0, 4.0)], "k LONG, day STRING, hr LONG, v DOUBLE"
    )
    stats = upsert_table(spark, wh_dir, "t", upd, keys=["k"])
    assert stats["strategy"] == "partition-scoped"
    # layout intact: hour level still present under the touched day
    assert os.path.isdir(os.path.join(path, "day=d1", "hr=0"))
    assert os.path.isdir(os.path.join(path, "day=d1", "hr=1"))
    got = {r.k: (r.day, r.hr, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("d1", 0, 9.0), 2: ("d1", 1, 2.0), 3: ("d2", 0, 3.0), 4: ("d1", 0, 4.0),
    }
