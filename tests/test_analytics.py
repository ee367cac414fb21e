"""Heap analytics layer tests: run the 13 waste checks + profiling
queries on the deterministic heap fixture and verify the numbers
against an independent DuckDB computation over the same parquet files
(the oracle-style rigor of the driver's gate, applied to the heap
surface)."""

from __future__ import annotations

import duckdb
import pytest

from heapdumpstardiver_spark.analytics import profile, run_waste_analysis
from heapdumpstardiver_spark.analytics import waste as W
from heapdumpstardiver_spark.catalog import Warehouse
from tests.heap_fixtures import generate_heap_warehouse


@pytest.fixture(scope="session")
def heap_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("heap_warehouse")
    truth = generate_heap_warehouse(str(d))
    return str(d), truth


@pytest.fixture(scope="session")
def wh(spark, heap_dir):
    return Warehouse(spark, heap_dir[0])


@pytest.fixture(scope="session")
def hcon(heap_dir):
    con = duckdb.connect()
    con.execute(f"SET FILE_SEARCH_PATH='{heap_dir[0]}'")
    return con


def _q1(hcon, sql):
    return hcon.execute(sql).fetchone()


def test_summary_and_top_types(wh, hcon, heap_dir):
    _, truth = heap_dir
    row = profile.run_summary(wh).collect()[0]
    assert row["total_objects"] == truth["total_objects"]
    assert row["unique_classes"] == truth["unique_classes"]
    top = profile.run_top_types(wh, limit=5).collect()
    want = hcon.execute(
        "SELECT type_name, count(*) c FROM 'sys_object_index.parquet' "
        "GROUP BY 1 ORDER BY c DESC, type_name LIMIT 5"
    ).fetchall()
    assert [(r["type_name"], r["obj_count"]) for r in top] == want


def test_byte_array_distribution(wh, hcon):
    rows = {r["bucket"]: r["count"] for r in profile.run_byte_array_distribution(wh).collect()}
    want = dict(
        hcon.execute(
            "SELECT CASE WHEN len(values)<100 THEN '0-99' WHEN len(values)<1000 THEN '100-999' "
            "WHEN len(values)<10000 THEN '1K-10K' WHEN len(values)<100000 THEN '10K-100K' "
            "ELSE '100K+' END b, count(*) FROM 'sys_primitive_arrays_byte.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert rows == want


def test_large_byte_arrays(wh):
    rows = profile.run_large_byte_arrays(wh).collect()
    assert len(rows) == 2  # exactly the two 120K arrays
    assert all(r["size_bytes"] > 102400 for r in rows)


def test_duplicate_strings_matches_duckdb(wh, hcon):
    f = W.check_duplicate_strings(wh)
    assert f is not None
    want = _q1(
        hcon,
        """
        WITH sb AS (
            SELECT s.obj_id, md5(array_to_string(b.values, ',')) AS h, len(b.values) AS l
            FROM 'java.lang.String.parquet' s
            JOIN 'sys_primitive_arrays_byte.parquet' b ON s.value = b.obj_id
            WHERE b.obj_id != 0
        ), d AS (
            SELECT h, count(*) c, min(l) l FROM sb GROUP BY h HAVING count(*) > 1
        )
        SELECT CAST(sum(c) AS BIGINT), CAST(sum((c-1)*l) AS BIGINT), count(*) FROM d
        """,
    )
    total_dups, wasted, unique_vals = want
    assert f.affected_count == total_dups
    assert f.estimated_waste_bytes == wasted + (total_dups - unique_vals) * 40
    assert len(f.sub_findings) == 10


def test_bad_collections_counts(wh, heap_dir):
    _, t = heap_dir
    f = W.check_bad_collections(wh)
    assert f is not None
    total_empty = (
        t["hashmap_empty"] + t["arraylist_empty"] + t["linkedlist_empty"]
        + t["treemap_empty"] + t["chm_empty"]
    )
    total_single = (
        t["hashmap_single"] + t["arraylist_single"] + t["linkedlist_single"]
        + t["treemap_single"] + t["chm_single"]
    )
    assert f.affected_count == total_empty + total_single
    # waste formula spot-check: HashMap line
    hm_line = next(s for s in f.sub_findings if s.strip().startswith("HashMap"))
    assert f"{t['hashmap_empty']:,} empty" in hm_line


def test_bad_object_arrays_patterns(wh, heap_dir):
    _, t = heap_dir
    f = W.check_bad_object_arrays(wh)
    assert f is not None
    assert f.affected_count == t["oa_zero"] + t["oa_all_null"] + t["oa_single"] + t["oa_sparse"]


def test_bad_primitive_arrays(wh, heap_dir):
    _, t = heap_dir
    f = W.check_bad_primitive_arrays(wh)
    assert f is not None
    # 7 non-byte types × (3 zero + 3 single + 2 all-zero) + byte table's own
    # 20 zero + 15 single + 10 all-zero
    expected = 7 * (3 + 3 + 2) + 20 + 15 + 10
    assert f.affected_count == expected


def test_boxed_numbers(wh, heap_dir):
    _, t = heap_dir
    f = W.check_boxed_numbers(wh)
    assert f is not None
    assert f.affected_count == t["boxed_total"]
    assert f.estimated_waste_bytes == t["boxed_total"] * 16


def test_collection_sizing(wh, heap_dir):
    _, t = heap_dir
    f = W.check_collection_sizing(wh)
    assert f is not None
    assert f.affected_count == t["hashmap_sparse"] + t["arraylist_oversized"]


def test_duplicate_byte_arrays_matches_duckdb(wh, hcon):
    f = W.check_duplicate_byte_arrays(wh)
    assert f is not None
    want = _q1(
        hcon,
        """
        WITH h AS (
            SELECT md5(array_to_string(values, ',')) AS h, len(values) AS l
            FROM 'sys_primitive_arrays_byte.parquet'
            WHERE len(values) > 0 AND len(values) <= 10240
        ), d AS (SELECT h, count(*) c, min(l) l FROM h GROUP BY h HAVING count(*) > 1)
        SELECT CAST(sum(c) AS BIGINT), CAST(sum((c-1)*l) AS BIGINT), count(*) FROM d
        """,
    )
    assert f.affected_count == want[0]
    assert f.estimated_waste_bytes == want[1] + (want[0] - want[2]) * 16


def test_class_count_below_threshold(wh):
    # fixture has far fewer than 10K classes → check must return None
    assert W.check_class_count(wh) is None


def test_gc_roots(wh, heap_dir):
    _, t = heap_dir
    f = W.check_gc_roots(wh)
    assert f is not None
    assert f.affected_count == t["gc_roots_total"]
    assert len(f.sub_findings) == 9


def test_direct_byte_buffers(wh, heap_dir):
    _, t = heap_dir
    f = W.check_direct_byte_buffers(wh)
    assert f is not None
    assert f.estimated_waste_bytes == t["dbb_empty"] * 64 + t["dbb_untouched_bytes"]


def test_thread_stacks(wh, heap_dir):
    _, t = heap_dir
    f = W.check_thread_stacks(wh)
    assert f is not None
    assert f.affected_count == t["threads_alive"]
    assert any("Thread status breakdown:" in s for s in f.sub_findings)
    assert any("ALIVE|PARKED" in s for s in f.sub_findings)
    assert any("Stack depth distribution:" in s for s in f.sub_findings)
    assert any("ThreadPoolExecutor" in s for s in f.sub_findings)


def test_duplicate_object_arrays(wh, hcon):
    f = W.check_duplicate_object_arrays(wh)
    assert f is not None
    want = _q1(
        hcon,
        """
        WITH h AS (
            SELECT md5(array_to_string(elements, ',')) AS h, len(elements) AS l
            FROM 'sys_object_arrays.parquet' WHERE len(elements) BETWEEN 1 AND 100
        ), d AS (SELECT h, count(*) c, min(l) l FROM h GROUP BY h HAVING count(*) > 1)
        SELECT CAST(sum(c) AS BIGINT), CAST(sum((c-1)*l*4) AS BIGINT), count(*) FROM d
        """,
    )
    assert f.affected_count == want[0]
    assert f.estimated_waste_bytes == want[1] + (want[0] - want[2]) * 16


def test_estimated_shallow_size(wh, heap_dir):
    _, t = heap_dir
    f = W.check_estimated_shallow_size(wh)
    assert f is not None
    assert f.severity == "INFO"
    assert len(f.sub_findings) == 15


def test_run_waste_analysis_orchestration(wh):
    findings = run_waste_analysis(wh, max_tier=3)
    names = [f.check_name for f in findings]
    # class_count legitimately absent (<10K classes); everything else fires
    assert len(findings) == 12, names
    # sorted by waste desc then severity
    wastes = [f.estimated_waste_bytes for f in findings]
    assert wastes == sorted(wastes, reverse=True)
    tiers = {f.check_name: f.tier for f in findings}
    assert tiers["Duplicate Strings"] == 1
    assert tiers["Thread Stacks"] == 2
    # tier filtering
    t1 = run_waste_analysis(wh, max_tier=1)
    assert all(f.tier == 1 for f in t1) and len(t1) == 5


def test_sampled_duplicate_strings(wh):
    f = W.check_duplicate_strings(wh, sample_fraction=0.5)
    assert f is not None
    assert "[sampled 50%, scaled]" in f.details


def test_auto_engaged_sampling_above_row_threshold(wh, monkeypatch):
    """Above AUTO_SAMPLE_ROWS strings the 20% Bernoulli sample engages
    automatically (reference's >5M rule) without an explicit
    sample_fraction; an explicit fraction still overrides."""
    monkeypatch.setattr(W, "AUTO_SAMPLE_ROWS", 3)
    f = W.check_duplicate_strings(wh)
    assert f is not None and "[sampled 20%, scaled]" in f.details
    # explicit override still wins over the auto rule
    f2 = W.check_duplicate_strings(wh, sample_fraction=0.5)
    assert f2 is not None and "[sampled 50%, scaled]" in f2.details
    # and below the threshold the scan stays exact
    monkeypatch.setattr(W, "AUTO_SAMPLE_ROWS", 5_000_000)
    f3 = W.check_duplicate_strings(wh)
    assert f3 is not None and "sampled" not in f3.details
