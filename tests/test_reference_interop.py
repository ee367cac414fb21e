"""Interop with a warehouse written by the reference binary: the flat
{Class}_{cid}[_chunk{N}].parquet naming scheme, "_"-prefixed system
files Spark cannot list, unsigned-64-bit ids, and (default mode)
Struct{id,type} reference columns. The waste-analysis suite must run
unchanged against the attached warehouse and produce the same numbers
as on the native layout."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from heapdumpstardiver_spark.analytics import run_waste_analysis
from heapdumpstardiver_spark.catalog import Warehouse
from heapdumpstardiver_spark.interop import (
    attach_reference_warehouse,
    is_robo_layout,
    scan_reference_dir,
)
from tests.heap_fixtures import convert_to_reference_layout, generate_heap_warehouse


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    native = str(tmp_path_factory.mktemp("native_wh"))
    ref = str(tmp_path_factory.mktemp("ref_wh"))
    truth = generate_heap_warehouse(native)
    convert_to_reference_layout(native, ref, robo=True, chunks=2)
    return native, ref, truth


@pytest.fixture(scope="module")
def ref_wh(spark, dirs, tmp_path_factory):
    _, ref, _ = dirs
    view = str(tmp_path_factory.mktemp("ref_view"))
    return attach_reference_warehouse(spark, ref, view)


def test_layout_scan_and_mode_probe(dirs):
    native, ref, _ = dirs
    assert is_robo_layout(ref)
    tables = scan_reference_dir(ref)
    # class-id + chunk suffixes stripped, chunks merged per logical table
    assert len(tables["java.util.HashMap"]) == 2
    assert len(tables["_object_index"]) == 2
    assert "_primitive_arrays_byte" in tables
    # every native table resolved
    native_tables = {
        ("_" + s[4:] if (s := f[: -len(".parquet")]).startswith("sys_") else s)
        for f in os.listdir(native)
        if f.endswith(".parquet")
    }
    assert set(tables) == native_tables


def test_schemas_match_native_engine_convention(spark, dirs, ref_wh):
    """u64 ids must surface as the engine's int64, not decimal(20,0)."""
    native, _, _ = dirs
    nat = Warehouse(spark, native)
    for t in ("_object_index", "java.lang.String", "_object_arrays"):
        assert ref_wh.table(t).schema == nat.table(t).schema, t
        assert ref_wh.table(t).count() == nat.table(t).count(), t


def test_waste_analysis_matches_native(spark, dirs, ref_wh):
    """The 13 checks run unchanged on the attached reference warehouse
    and agree with the native run, number for number."""
    native, _, _ = dirs
    nat_findings = {
        f.check_name: (f.estimated_waste_bytes, f.affected_count, f.details)
        for f in run_waste_analysis(Warehouse(spark, native), max_tier=3)
    }
    ref_findings = {
        f.check_name: (f.estimated_waste_bytes, f.affected_count, f.details)
        for f in run_waste_analysis(ref_wh, max_tier=3)
    }
    assert nat_findings.keys() == ref_findings.keys()
    assert ref_findings == nat_findings


def test_open_warehouse_autodetect_and_service(spark, dirs):
    """A reference user points the query/analyze surface at their
    existing dump directory unchanged — layout auto-detected."""
    from heapdumpstardiver_spark.interop import (
        ReferenceWarehouse,
        looks_like_reference_layout,
        open_warehouse,
    )
    from heapdumpstardiver_spark.service import SessionManager, query_heap

    native, ref, truth = dirs
    assert looks_like_reference_layout(ref)
    assert not looks_like_reference_layout(native)
    assert isinstance(open_warehouse(spark, ref), ReferenceWarehouse)
    assert not isinstance(open_warehouse(spark, native), ReferenceWarehouse)

    mgr = SessionManager(spark)
    sess = mgr.create_session(ref, session_id="refdump")
    try:
        view = sess.view_name("_object_index")
        out = query_heap(mgr, f"SELECT count(*) AS n FROM {view}")
        assert out["rows"][0]["n"] == truth["total_objects"]
    finally:
        mgr.close_session("refdump")


def test_default_mode_struct_refs(spark, tmp_path):
    """Non-robo layout: Struct{id,type} refs (util.rs:139-142) flatten
    to bare ids by default, or keep the struct with a normalized id."""
    ref = tmp_path / "ref_default"
    ref.mkdir()
    big = (1 << 64) - 5  # u64 that must reinterpret to a negative i64
    t = pa.table(
        {
            "obj_id": pa.array([1, 2, big], pa.uint64()),
            "next": pa.array(
                [
                    {"id": 10, "type": "com.test.Node"},
                    {"id": big, "type": "com.test.Node"},
                    {"id": 0, "type": None},
                ],
                pa.struct([("id", pa.uint64()), ("type", pa.string())]),
            ),
        }
    )
    pq.write_table(t, str(ref / "com.test.Node_1234.parquet"))
    assert not is_robo_layout(str(ref))

    wh = attach_reference_warehouse(spark, str(ref), str(tmp_path / "v1"))
    df = wh.table("com.test.Node")
    assert df.schema.simpleString() == "struct<obj_id:bigint,next:bigint>"
    rows = {r["obj_id"]: r["next"] for r in df.collect()}
    assert rows[1] == 10 and rows[2] == -5 and rows[big - (1 << 64)] == 0

    wh2 = attach_reference_warehouse(
        spark, str(ref), str(tmp_path / "v2"), flatten_refs=False
    )
    df2 = wh2.table("com.test.Node")
    assert df2.schema["next"].dataType.simpleString() == "struct<id:bigint,type:string>"
    r = {x["obj_id"]: x["next"] for x in df2.collect()}
    assert r[2]["id"] == -5 and r[2]["type"] == "com.test.Node"


def test_export_reference_layout_round_trip(spark, tmp_path):
    """Native warehouse → export_reference_layout → attach → identical
    tables and waste numbers; the exported directory satisfies the
    reference's own layout probes (robo chunk files, u64 ids)."""
    from heapdumpstardiver_spark.interop import export_reference_layout

    native = str(tmp_path / "native")
    out = str(tmp_path / "exported")
    os.makedirs(native)
    generate_heap_warehouse(native)
    summary = export_reference_layout(spark, native, out, robo=True, chunks=3)
    assert summary["tables"] > 0 and summary["files"] >= summary["tables"]

    # layout probes the reference resolver itself applies
    assert is_robo_layout(out)
    tables = scan_reference_dir(out)
    nat = Warehouse(spark, native)
    assert set(tables) == set(nat.table_names())
    # class files carry a class-obj-id suffix the reference resolver
    # strips ({base}_* glob); ids come from _class_hierarchy when the
    # class is listed there (fixture hierarchy only covers its
    # com.heaptest.* chain, so java.* classes use the 0 fallback)
    import re

    assert all(
        re.search(r"_\d+_chunk\d+\.parquet$", os.path.basename(f))
        for f in tables["java.lang.String"]
    )
    # ids round-trip as unsigned 64-bit on disk
    t = pq.read_table(tables["_object_index"][0])
    assert t.schema.field("obj_id").type == pa.uint64()

    view = str(tmp_path / "view")
    ref_wh = attach_reference_warehouse(spark, out, view)
    for name in nat.table_names():
        a, b = nat.table(name), ref_wh.table(name)
        assert a.schema == b.schema, name
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect())), name
    nat_findings = {
        f.check_name: (f.estimated_waste_bytes, f.affected_count)
        for f in run_waste_analysis(nat, max_tier=3)
    }
    ref_findings = {
        f.check_name: (f.estimated_waste_bytes, f.affected_count)
        for f in run_waste_analysis(ref_wh, max_tier=3)
    }
    assert ref_findings == nat_findings


def test_export_default_mode_single_files(spark, tmp_path):
    """Non-robo export: one file per table, no chunk suffixes, and the
    robo probe reports default mode."""
    from heapdumpstardiver_spark.interop import export_reference_layout

    native = str(tmp_path / "native")
    out = str(tmp_path / "exported")
    os.makedirs(native)
    generate_heap_warehouse(native)
    export_reference_layout(spark, native, out, robo=False)
    assert not is_robo_layout(out)
    assert all("_chunk" not in f for f in os.listdir(out))
    view = str(tmp_path / "view")
    ref_wh = attach_reference_warehouse(spark, out, view)
    nat = Warehouse(spark, native)
    assert ref_wh.table("_object_index").count() == nat.table("_object_index").count()


def test_export_ingested_warehouse_real_cids(spark, tmp_path):
    """End-to-end: HPROF → ingest → export → attach. Class files carry
    the REAL class-obj-id from the ingested _class_hierarchy, and every
    table round-trips."""
    from heapdumpstardiver_spark.ingest import ingest_hprof
    from heapdumpstardiver_spark.ingest.hprof_writer import build_test_dump
    from heapdumpstardiver_spark.interop import export_reference_layout

    dump = str(tmp_path / "t.hprof")
    build_test_dump(dump, id_size=8)
    native = str(tmp_path / "wh")
    ingest_hprof(spark, dump, native)
    out = str(tmp_path / "ref")
    export_reference_layout(spark, native, out, robo=True, chunks=2)

    nat = Warehouse(spark, native)
    cids = {
        r["class_name"]: r["class_obj_id"] & 0xFFFFFFFFFFFFFFFF
        for r in nat.table("_class_hierarchy").collect()
    }
    tables = scan_reference_dir(out)
    class_tables = [n for n in tables if not n.startswith("_")]
    assert class_tables
    for name in class_tables:
        assert name in cids, name
        assert any(
            os.path.basename(f).startswith(f"{name}_{cids[name]}_chunk")
            for f in tables[name]
        ), name
    view = str(tmp_path / "view")
    ref_wh = attach_reference_warehouse(spark, out, view)
    for name in nat.table_names():
        assert nat.table(name).count() == ref_wh.table(name).count(), name
