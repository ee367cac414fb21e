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


# ---------------------------------------------------------------------------
# Directory addressing: a fleet of dumps as ONE DataFrame
# ---------------------------------------------------------------------------


def test_directory_scan_adds_dump_column(spark, tmp_path):
    """Reading a DIRECTORY scans every *.hprof and prefixes rows with
    the dump basename; per-dump tallies must equal single-file reads
    of the same dumps (the schema without the prefix)."""
    register(spark)
    d = tmp_path / "fleet"
    d.mkdir()
    build_test_dump(str(d / "a.hprof"))
    build_test_dump(str(d / "b.hprof"), extra_strings=4, hold_extras=True)
    df = spark.read.format("hprof").load(str(d))
    assert df.columns[0] == "dump"
    got = {
        (r["dump"], r["tag_name"]): r["n"]
        for r in df.groupBy("dump", "tag_name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {}
    for name in ("a.hprof", "b.hprof"):
        single = spark.read.format("hprof").load(str(d / name))
        assert single.columns[0] == "offset"  # single-file schema unchanged
        for r in single.groupBy("tag_name").agg(F.count(F.lit(1)).alias("n")).collect():
            want[(name, r["tag_name"])] = r["n"]
    assert got == want
    # the extra objects live in heap SUB-records (the top-level tally
    # is unchanged by design) — the instances view tells the dumps apart
    inst = spark.read.format("hprof").option("view", "instances").load(str(d))
    counts = {r["dump"]: r["n"] for r in inst.groupBy("dump").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["b.hprof"] > counts["a.hprof"]


def test_directory_scan_mixes_id_sizes(spark, tmp_path):
    """id_size rides in each partition, so 32-bit and 64-bit JVM dumps
    coexist in one directory scan with correct per-dump decode."""
    register(spark)
    d = tmp_path / "fleet"
    d.mkdir()
    build_test_dump(str(d / "w64.hprof"), id_size=8)
    build_test_dump(str(d / "w32.hprof"), id_size=4)
    view = spark.read.format("hprof").option("view", "instances").load(str(d))
    per_dump = {
        name: sorted(
            r["obj_id"] for r in view.filter(F.col("dump") == name).collect()
        )
        for name in ("w64.hprof", "w32.hprof")
    }
    for name in per_dump:
        single = sorted(
            r["obj_id"]
            for r in spark.read.format("hprof")
            .option("view", "instances")
            .load(str(d / name))
            .collect()
        )
        assert per_dump[name] == single and len(single) > 10


# ---------------------------------------------------------------------------
# Streaming tail: continuous heap-dump monitoring
# ---------------------------------------------------------------------------


def test_tail_offset_planning_expands_ranges(tmp_path):
    """Unlike the shard tails, a new dump is expanded into record-
    boundary byte-range splits at plan time — and replanning with no
    new dumps yields an empty plan."""
    from heapdumpstardiver_spark.sources.hprof_source import HprofTailStreamReader

    d = tmp_path / "spool"
    d.mkdir()
    build_test_dump(str(d / "a.hprof"))
    r = HprofTailStreamReader(str(d), split_bytes=128, view="records")
    first = r.latestOffset()
    parts = r.partitions(r.initialOffset(), first)
    assert len(parts) > 1  # one dump, MANY range splits
    assert {p.dump for p in parts} == {"a.hprof"}
    # ranges tile the body contiguously, no overlap, no gap
    spans = sorted((p.start, p.end) for p in parts)
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    assert r.partitions(first, r.latestOffset()) == []
    build_test_dump(str(d / "b.hprof"))
    parts2 = r.partitions(first, r.latestOffset())
    assert {p.dump for p in parts2} == {"b.hprof"}


def test_tail_streams_new_dumps_only(spark, tmp_path):
    """Two availableNow drains over one checkpoint: a dump committed
    between drains is read by drain 2 alone, and the streamed rows
    equal a batch directory scan of the final spool."""
    register(spark)
    spool = tmp_path / "spool"
    spool.mkdir()
    build_test_dump(str(spool / "a.hprof"))
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("hprof")
            .option("view", "instances")
            .load(str(spool))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first > 10
    build_test_dump(str(spool / "b.hprof"), extra_strings=2, hold_extras=True)
    drain()
    got = spark.read.parquet(out)
    batch = spark.read.format("hprof").option("view", "instances").load(str(spool))
    assert got.count() == batch.count()  # no re-read of a.hprof
    assert sorted(
        (r["dump"], r["obj_id"]) for r in got.select("dump", "obj_id").collect()
    ) == sorted(
        (r["dump"], r["obj_id"]) for r in batch.select("dump", "obj_id").collect()
    )
    # the per-dump census — the monitoring read — distinguishes the dumps
    census = {
        (r["dump"], r["kind"]): r["n"]
        for r in got.groupBy("dump", "kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert census[("b.hprof", "instance")] > census[("a.hprof", "instance")]


def test_tail_refuses_single_file_address(spark, tmp_path):
    register(spark)
    p = tmp_path / "one.hprof"
    build_test_dump(str(p))
    q = (
        spark.readStream.format("hprof")
        .load(str(p))
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    # the refusal surfaces in the stream thread, not at start()
    with pytest.raises(Exception, match="DIRECTORY"):
        q.awaitTermination()


def test_streaming_census_and_growth(spark, tmp_path):
    """The continuous-monitoring composition: tail the spool, commit a
    replay-idempotent per-dump census per batch, attribute growth to
    classes across the dump sequence."""
    from heapdumpstardiver_spark.streaming.heap_monitor import (
        census_growth,
        dump_census,
        streaming_heap_census,
    )

    spool = tmp_path / "spool"
    spool.mkdir()
    out = str(tmp_path / "census")
    ck = str(tmp_path / "ck")
    build_test_dump(str(spool / "d0.hprof"))
    q = streaming_heap_census(spark, str(spool), out, ck)
    q.awaitTermination(240)
    build_test_dump(str(spool / "d1.hprof"), extra_strings=5, hold_extras=True)
    q = streaming_heap_census(spark, str(spool), out, ck)
    q.awaitTermination(240)

    cols = ["dump", "kind", "class_obj_id", "n_objects", "total_n"]
    streamed = spark.read.parquet(out).select(*cols)
    batch = dump_census(
        spark.read.format("hprof").option("view", "instances").load(str(spool))
    ).select(*cols)
    key = lambda r: tuple((r[c] if r[c] is not None else -1) for c in cols)
    assert sorted(map(key, streamed.collect())) == sorted(
        map(key, batch.collect())
    ) and streamed.count() > 4

    growth = census_growth(streamed).collect()
    assert growth and all(r["dump"] == "d1.hprof" for r in growth)
    assert all(r["delta_objects"] > 0 for r in growth)
    # the held extra Strings dominate the growth set
    assert max(r["delta_objects"] for r in growth) >= 5
