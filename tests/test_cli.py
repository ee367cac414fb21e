"""CLI surface tests — subprocess-isolated because the CLI owns (and
stops) its SparkSession, which must not kill the shared test session."""

import json
import os
import subprocess
import sys

import pytest

from heapdumpstardiver_spark.ingest.hprof_writer import build_test_dump

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "heapdumpstardiver_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    path = str(d / "t.hprof")
    build_test_dump(path)
    return path


def test_count_records(dump):
    r = run_cli("count-records", "-f", dump)
    assert r.returncode == 0, r.stderr
    assert "Utf8" in r.stdout and "HeapDumpSegment" in r.stdout


def test_convert_then_query(dump, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("cli_wh") / "wh")
    r = run_cli("dump-objects-to-parquet", "-f", dump, "-o", wh, "--overwrite")
    assert r.returncode == 0, r.stderr
    manifest = json.loads(r.stdout[r.stdout.index("{") :])
    assert manifest["total_rows"] > 0
    assert "_object_index" in manifest["tables"]

    r2 = run_cli(
        "query",
        "-w",
        wh,
        "--sql",
        "SELECT count(*) AS n FROM cli___object_index",
        "--limit",
        "5",
    )
    assert r2.returncode == 0, r2.stderr
    out = json.loads(r2.stdout[r2.stdout.index("{") :])
    assert "error" not in out, out
    assert out["rows"][0]["n"] == manifest["tables"]["_object_index"]

    r3 = run_cli("profile", "-w", wh, "-t", "_object_index")
    assert r3.returncode == 0, r3.stderr
    prof = json.loads(r3.stdout[r3.stdout.index("{") :])
    assert prof["n_rows"] == manifest["tables"]["_object_index"]
    assert prof["columns"]["type_name"]["n_distinct"] > 1


def test_snapshot_cli_roundtrip(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_snap")
    a, b = str(d / "a.hprof"), str(d / "b.hprof")
    build_test_dump(a)
    build_test_dump(b, extra_strings=2, omit_base=True)
    wh = str(d / "wh")

    r1 = run_cli("append-snapshot", "-f", a, "-w", wh, "--id", "1")
    assert r1.returncode == 0, r1.stderr
    m1 = json.loads(r1.stdout[r1.stdout.index("{") :])
    assert m1["snapshots"] == [1]

    r2 = run_cli("append-snapshot", "-f", b, "-w", wh, "--id", "2")
    assert r2.returncode == 0, r2.stderr
    m2 = json.loads(r2.stdout[r2.stdout.index("{") :])
    assert m2["snapshots"] == [1, 2]

    r3 = run_cli("snapshot-diff", "-w", wh, "--before", "1", "--after", "2")
    assert r3.returncode == 0, r3.stderr
    diff = json.loads(r3.stdout[r3.stdout.index("{") :])
    assert diff["n_new"] == 2 and diff["n_freed"] == 1
    deltas = {row["type_name"]: row["delta"] for row in diff["type_deltas"]}
    assert deltas == {"java.lang.String": 2, "com.test.Base": -1}


def test_dump_objects_printer(dump):
    r = run_cli("dump-objects", "-f", dump, "--max-elems", "4")
    assert r.returncode == 0, r.stderr
    out = r.stdout
    # classes with statics, flattened+renamed instance fields, arrays
    # with element caps, and GC roots all resolve
    assert "class com.test.Base" in out and "static int COUNTER = 7" in out
    assert "long Base@id = -5" in out
    assert "byte[5] [104, 101, 108, 108, ...]" in out
    assert "root SystemClass" in out

    r2 = run_cli("dump-objects", "-f", dump, "--limit", "3")
    assert r2.returncode == 0
    assert len([ln for ln in r2.stdout.splitlines() if ln.startswith("id ")]) == 3


def test_export_jsonl_round_trips(spark, tmp_path):
    from heapdumpstardiver_spark.catalog import export_jsonl, load_table
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    out = str(tmp_path / "docs_jsonl")
    export_jsonl(d, out, shards=4)
    import glob

    files = glob.glob(out + "/part-*.json.gz")
    assert len(files) == 4
    back = spark.read.json(out)
    assert back.count() == d.count()
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = {r["doc_id"]: r["text"] for r in d.collect()}
    assert got == want
