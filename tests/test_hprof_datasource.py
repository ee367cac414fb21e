"""The hprof Python DataSource must agree with the driver-side
count-records ground truth and split at record boundaries."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from heapdumpstardiver_spark.ingest.convert import count_records
from heapdumpstardiver_spark.sources import register
from heapdumpstardiver_spark.ingest.hprof_writer import build_test_dump


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    p = tmp_path_factory.mktemp("ds") / "basic.hprof"
    build_test_dump(str(p))
    return str(p)


def test_record_counts_match_cli(spark, dump):
    register(spark)
    df = spark.read.format("hprof").load(dump)
    got = {
        r["tag_name"]: r["n"]
        for r in df.groupBy("tag_name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = dict(count_records(dump))
    assert got == want and len(got) >= 3


def test_small_splits_preserve_every_record(spark, dump):
    register(spark)
    whole = spark.read.format("hprof").load(dump)
    tiny = (
        spark.read.format("hprof").option("split_bytes", "128").load(dump)
    )
    assert tiny.rdd.getNumPartitions() > 1
    a = sorted(r["offset"] for r in whole.collect())
    b = sorted(r["offset"] for r in tiny.collect())
    assert a == b


def test_predicate_and_projection_compose(spark, dump):
    register(spark)
    df = spark.read.format("hprof").load(dump)
    big = df.filter(F.col("body_len") > 100).select("offset", "body_len")
    rows = big.collect()
    assert all(r["body_len"] > 100 for r in rows)


def test_strings_view_matches_driver_index(spark, dump):
    from heapdumpstardiver_spark.ingest.index import build_index

    register(spark)
    df = spark.read.format("hprof").option("view", "strings").load(dump)
    got = {r["string_id"]: r["value"] for r in df.collect()}
    want = build_index(dump).strings
    assert got == want and len(got) > 5


def test_gc_roots_view_matches_warehouse(spark, dump, tmp_path):
    from heapdumpstardiver_spark.catalog import Warehouse
    from heapdumpstardiver_spark.ingest import ingest_hprof

    register(spark)
    out = str(tmp_path / "wh")
    ingest_hprof(spark, dump, out)
    wh = Warehouse(spark, out)
    want = sorted(
        (r["obj_id"], r["root_type"])
        for r in wh.table("_gc_roots").select("obj_id", "root_type").collect()
    )
    got = sorted(
        (r["obj_id"], r["root_type"])
        for r in spark.read.format("hprof")
        .option("view", "gc_roots")
        .load(dump)
        .select("obj_id", "root_type")
        .collect()
    )
    assert got == want and len(got) >= 5


def test_instances_view_matches_object_index(spark, dump, tmp_path):
    from heapdumpstardiver_spark.catalog import Warehouse
    from heapdumpstardiver_spark.ingest import ingest_hprof

    register(spark)
    out = str(tmp_path / "wh2")
    ingest_hprof(spark, dump, out)
    wh = Warehouse(spark, out)
    want = sorted(r["obj_id"] for r in wh.table("_object_index").collect())
    view = spark.read.format("hprof").option("view", "instances").load(dump)
    got = sorted(r["obj_id"] for r in view.collect())
    assert got == want and len(got) > 10
    kinds = {r["kind"] for r in view.collect()}
    assert kinds >= {"instance", "object_array", "primitive_array", "class"}


def test_record_tally_query_matches_oracle(spark):
    import duckdb

    from heapdumpstardiver_spark import ORACLE_SQL, QUERIES

    got = [
        (r["tag_name"], r["n"])
        for r in QUERIES["hprof_record_tally"](spark, "unused").collect()
    ]
    want = [
        (r[0], r[1])
        for r in duckdb.connect().execute(ORACLE_SQL["hprof_record_tally"]).fetchall()
    ]
    assert got == want
