"""Task/job-commit protocol tests: duplicate task attempts must not
corrupt the warehouse (attempt-scoped temps + atomic rename), orphaned
temps are invisible to readers and swept, the job publishes an atomic
_MANIFEST.json + _SUCCESS marker, and mixed flat/partitioned layouts
are refused at ingest time."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from heapdumpstardiver_spark.catalog import Warehouse
from heapdumpstardiver_spark.ingest import ingest_hprof
from heapdumpstardiver_spark.ingest import convert as C
from heapdumpstardiver_spark.ingest.hprof_writer import build_test_dump
from heapdumpstardiver_spark.ingest.index import build_index


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    d = tmp_path_factory.mktemp("hprof_commit")
    path = str(d / "test.hprof")
    truth = build_test_dump(path, id_size=8)
    return path, truth


@pytest.fixture(scope="module")
def ingested(spark, dump, tmp_path_factory):
    path, truth = dump
    out = str(tmp_path_factory.mktemp("heap_commit_out"))
    summary = ingest_hprof(spark, path, out)
    return path, out, summary


def _warehouse_listing(out):
    files = {}
    for dirpath, _, fs in os.walk(out):
        for f in fs:
            p = os.path.join(dirpath, f)
            files[os.path.relpath(p, out)] = os.path.getsize(p)
    return files


def _table_rows(out, table):
    d = os.path.join(out, table)
    return sum(
        pq.read_table(os.path.join(d, f)).num_rows
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def test_duplicate_task_attempt_is_idempotent(dump, ingested):
    """Simulate a zombie/speculative re-execution of split 0: re-running
    _process_split against the committed warehouse must leave an
    identical file set (atomic replace, same content) and no temps."""
    path, out, summary = ingested
    before = _warehouse_listing(out)
    rows_before = _table_rows(out, "sys_object_index")

    idx = build_index(path)
    registry = C._class_registry(idx)
    task = (0, [idx.splits[0]])
    # duplicate attempt (runs driver-side here; same code path as executor)
    list(C._process_split(task, path, out, registry, dict(idx.class_names),
                          idx.header.id_size, None))

    after = _warehouse_listing(out)
    assert set(after) == set(before)
    assert not [f for f in after if f.endswith(".tmp")]
    assert _table_rows(out, "sys_object_index") == rows_before


def test_orphan_temp_invisible_and_swept(spark, ingested):
    """A temp left by a killed attempt (hidden '.' prefix) must not be
    read by Spark, and the driver sweep removes it."""
    path, out, summary = ingested
    tdir = os.path.join(out, "sys_object_index")
    orphan = os.path.join(tdir, "._part-0.attempt-999.tmp")
    with open(orphan, "wb") as f:
        f.write(b"half-written garbage, not parquet")
    wh = Warehouse(spark, out)
    assert wh.table("_object_index").count() == summary["tables"]["_object_index"]
    removed = C._sweep_orphan_temps(out)
    assert removed == 1
    assert not os.path.exists(orphan)


def test_manifest_and_success_marker(spark, ingested):
    path, out, summary = ingested
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["partitions"][""]["tables"] == summary["tables"]
    # verifying reader accepts the committed warehouse...
    wh = Warehouse(spark, out, require_manifest=True)
    assert "_object_index" in wh.table_names()
    # ...and refuses one without the job commit marker
    os.rename(os.path.join(out, "_SUCCESS"), os.path.join(out, "_SUCCESS.bak"))
    try:
        with pytest.raises(RuntimeError, match="commit marker"):
            Warehouse(spark, out, require_manifest=True)
    finally:
        os.rename(os.path.join(out, "_SUCCESS.bak"), os.path.join(out, "_SUCCESS"))


def test_flat_then_partition_append_refused(spark, dump, tmp_path_factory):
    """Appending a snapshot=<id> partition into a flat warehouse would
    mix root-level part files and Hive dirs in one table dir; the layout
    guard refuses it up front with a clear error."""
    path, _ = dump
    out = str(tmp_path_factory.mktemp("heap_layout_guard"))
    ingest_hprof(spark, path, out)
    with pytest.raises(ValueError, match="flat .*layout"):
        ingest_hprof(spark, path, out, partition="snapshot=1")
