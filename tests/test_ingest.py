"""HPROF ingestion tests: write a deterministic dump, convert it with
the Spark pipeline, and verify every output table — schemas, values,
inheritance flattening, shadow renames, GC roots, frames/traces,
hierarchy — plus split-count invariance and the record tally."""

from __future__ import annotations

import pytest

from heapdumpstardiver_spark.catalog import Warehouse
from heapdumpstardiver_spark.ingest import count_records, ingest_hprof
from heapdumpstardiver_spark.ingest.hprof_writer import build_test_dump


@pytest.fixture(scope="session", params=[8, 4], ids=["id8", "id4"])
def dump(tmp_path_factory, request):
    """The same logical heap in both HPROF id widths (64/32-bit JVM);
    every test below runs against each."""
    d = tmp_path_factory.mktemp(f"hprof_id{request.param}")
    path = str(d / "test.hprof")
    truth = build_test_dump(path, id_size=request.param)
    return path, truth


@pytest.fixture(scope="session")
def warehouse(spark, dump, tmp_path_factory):
    path, truth = dump
    out = str(tmp_path_factory.mktemp("heap_out"))
    summary = ingest_hprof(spark, path, out)
    return Warehouse(spark, out), summary, truth


def test_summary_and_tables(warehouse):
    wh, summary, truth = warehouse
    t = summary["tables"]
    assert t["java.lang.String"] == truth["strings"]
    assert t["_object_arrays"] == truth["object_arrays"]
    assert t["_gc_roots"] == truth["gc_roots"]
    assert t["_primitive_arrays_byte"] == truth["byte_arrays"]
    assert t["_primitive_arrays_int"] == 1
    assert t["_primitive_arrays_double"] == 1
    assert t["_primitive_arrays_long"] == 1
    # object index: instances + prim arrays + object arrays + class dumps
    assert t["_object_index"] == (
        truth["instances"] + truth["prim_arrays"] + truth["object_arrays"] + truth["class_dumps"]
    )


def test_string_table_schema_and_join(warehouse):
    wh, _, truth = warehouse
    s = wh.table("java.lang.String")
    assert [f.name for f in s.schema.fields] == ["obj_id", "value", "coder", "hash", "hashIsZero"]
    b = wh.table("_primitive_arrays_byte")
    joined = s.join(b, s.value == b.obj_id).count()
    assert joined == truth["strings"]  # every string's value resolves


def test_inheritance_flattening_and_shadow_rename(warehouse, spark):
    wh, _, truth = warehouse
    child = wh.table("com.test.Child")
    # Child's own fields first (id, ref), then Base's — shadowed id renamed
    assert [f.name for f in child.schema.fields] == ["obj_id", "id", "ref", "Base@id", "flag"]
    row = child.collect()[0]
    assert row["id"] == 77
    assert row["ref"] == truth["child_ref"]
    assert row["Base@id"] == -5
    assert row["flag"] is False
    base = wh.table("com.test.Base").collect()[0]
    assert base["id"] == 1234567 and base["flag"] is True


def test_primitive_array_values(warehouse):
    wh, _, _ = warehouse
    ints = wh.table("_primitive_arrays_int").collect()[0]
    assert ints["values"] == [0, 0, 0]
    dbl = wh.table("_primitive_arrays_double").collect()[0]
    assert dbl["values"] == [1.5, -2.25]
    lng = wh.table("_primitive_arrays_long").collect()[0]
    assert lng["values"] == []


def test_object_arrays_and_nulls(warehouse):
    wh, _, _ = warehouse
    rows = {r["obj_id"]: r for r in wh.table("_object_arrays").collect()}
    lens = sorted(len(r["elements"]) for r in rows.values())
    assert lens == [0, 3]
    three = next(r for r in rows.values() if len(r["elements"]) == 3)
    assert three["elements"][1] == 0  # null ref encoded as 0, not NULL
    assert three["class_name"] == "java.lang.Object[]"


def test_gc_roots_kinds(warehouse):
    wh, _, _ = warehouse
    rows = wh.table("_gc_roots").collect()
    kinds = sorted(r["root_type"] for r in rows)
    assert kinds == sorted(
        [
            "Unknown", "JniGlobal", "JniLocal", "JavaStackFrame", "NativeStack",
            "SystemClass", "ThreadBlock", "BusyMonitor", "ThreadObj",
        ]
    )
    jni_local = next(r for r in rows if r["root_type"] == "JniLocal")
    assert jni_local["thread_serial"] == 10 and jni_local["frame_index"] == 0
    unknown = next(r for r in rows if r["root_type"] == "Unknown")
    assert unknown["thread_serial"] is None


def test_static_fields(warehouse):
    wh, _, _ = warehouse
    rows = {r["field_name"]: r for r in wh.table("_static_fields").collect()}
    assert rows["COUNTER"]["primitive_value"] == "7"
    assert rows["COUNTER"]["ref_id"] == 0
    assert rows["SHARED"]["field_type"] == "Object"
    assert rows["SHARED"]["ref_id"] == 0xBEEF


def test_frames_traces_hierarchy(warehouse):
    wh, _, _ = warehouse
    frames = {r["frame_id"]: r for r in wh.table("_stack_frames").collect()}
    assert frames[0xF1]["method_name"] == "main"
    assert frames[0xF1]["class_name"] == "com.test.Base"  # serial 5
    assert frames[0xF2]["line_num"] == -2  # compiled-method sentinel
    traces = {r["stack_trace_serial"]: r for r in wh.table("_stack_traces").collect()}
    assert traces[2]["frame_ids"] == [0xF1, 0xF2]
    # referential integrity: every trace frame resolves
    ids = set(frames)
    assert all(f in ids for t in traces.values() for f in t["frame_ids"])
    hier = {r["class_name"]: r for r in wh.table("_class_hierarchy").collect()}
    assert hier["com.test.Child"]["super_class_name"] == "com.test.Base"
    assert hier["java.lang.Object"]["super_class_name"] is None


def test_object_index_type_names(warehouse):
    wh, _, _ = warehouse
    types = {r["type_name"] for r in wh.table("_object_index").collect()}
    assert "java.lang.String" in types
    assert "byte[]" in types
    assert "java.lang.Object[]" in types
    assert "class com.test.Child" in types


def test_split_invariance(spark, dump, tmp_path_factory):
    """Tiny splits (many tasks) must produce identical totals — the
    split planner may not lose or double-count sub-records."""
    path, truth = dump
    out = str(tmp_path_factory.mktemp("heap_out_splits"))
    summary = ingest_hprof(spark, path, out, target_split_bytes=64)
    assert summary["n_splits"] > 2
    wh = Warehouse(spark, out)
    assert wh.table("java.lang.String").count() == truth["strings"]
    assert wh.table("_object_index").count() == (
        truth["instances"] + truth["prim_arrays"] + truth["object_arrays"] + truth["class_dumps"]
    )


def test_count_records(dump):
    path, _ = dump
    tally = dict(count_records(path))
    assert tally["LoadClass"] == 6
    assert tally["HeapDumpSegment"] == 2
    assert tally["StackTrace"] == 2
    assert tally["Utf8"] > 10


def test_waste_checks_on_ingested_warehouse(warehouse):
    """End-to-end: the analytics layer runs directly on ingest output."""
    from heapdumpstardiver_spark.analytics import waste as W

    wh, _, _ = warehouse
    f = W.check_duplicate_strings(wh)
    assert f is not None
    # two dup groups: 3×"hello" + 2×[1,2,3] → 5 duplicate strings
    assert f.affected_count == 5
    assert len(f.sub_findings) == 2
    roots = W.check_gc_roots(wh)
    assert roots.affected_count == 9


@pytest.mark.parametrize(
    "n_cut,expect_strings",
    [
        # 30 bytes: drops the HeapDumpEnd record (9) and slices into the
        # last String instance of segment 2 → that one record is lost
        (30, 5),
        # 5 bytes: leaves a partial HeapDumpEnd header; all data intact
        (5, 6),
    ],
    ids=["mid_record", "mid_header"],
)
def test_truncated_dump(spark, tmp_path_factory, n_cut, expect_strings):
    """A dump cut short (disk full / killed process) is refused under
    strict mode with a clear error, and under strict=False ingests
    every complete record before the cut."""
    d = tmp_path_factory.mktemp(f"trunc_{n_cut}")
    path = str(d / "full.hprof")
    truth = build_test_dump(path)
    assert truth["strings"] == 6
    data = open(path, "rb").read()
    cut_path = str(d / "cut.hprof")
    with open(cut_path, "wb") as f:
        f.write(data[: len(data) - n_cut])

    with pytest.raises(ValueError, match="truncated"):
        ingest_hprof(spark, cut_path, str(d / "wh_strict"))

    summary = ingest_hprof(spark, cut_path, str(d / "wh"), strict=False)
    assert summary["truncated"] is True
    wh = Warehouse(spark, str(d / "wh"))
    # segment 1 is fully intact: its 4 strings, roots, arrays all land
    assert wh.table("_gc_roots").count() == 9
    assert wh.table("java.lang.String").count() == expect_strings


def test_gzipped_dump_ingests_identically(spark, tmp_path):
    """A .hprof.gz dump (detected by magic bytes, not extension) must
    produce the same warehouse as the plain dump — gzip is how heap
    dumps usually travel."""
    import gzip

    from heapdumpstardiver_spark.catalog import Warehouse
    from heapdumpstardiver_spark.ingest import ingest_hprof
    from heapdumpstardiver_spark.ingest.hprof_writer import build_test_dump

    plain = str(tmp_path / "t.hprof")
    build_test_dump(plain)
    gz = str(tmp_path / "t.hprof.gz")
    with open(plain, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())

    import os
    os.environ["SPARK_GRAFT_SCRATCH"] = str(tmp_path / "scratch")
    try:
        m1 = ingest_hprof(spark, plain, str(tmp_path / "wh_plain"))
        m2 = ingest_hprof(spark, gz, str(tmp_path / "wh_gz"))
    finally:
        del os.environ["SPARK_GRAFT_SCRATCH"]
    assert m1["total_rows"] == m2["total_rows"]
    w1 = Warehouse(spark, str(tmp_path / "wh_plain"))
    w2 = Warehouse(spark, str(tmp_path / "wh_gz"))
    assert w1.table_names() == w2.table_names()
    idx1 = sorted((r["obj_id"], r["type_name"]) for r in w1.table("_object_index").collect())
    idx2 = sorted((r["obj_id"], r["type_name"]) for r in w2.table("_object_index").collect())
    assert idx1 == idx2
