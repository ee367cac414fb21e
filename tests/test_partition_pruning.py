"""Partitioned parquet layout → partition pruning at the scan.

Writes events hash-partitioned by calendar day via catalog.write_table
(partition_by), then asserts a day-filtered read shows the predicate
under PartitionFilters (directory pruning — zero I/O for other days),
not just as a data filter."""

from pyspark.sql import functions as F

from heapdumpstardiver_spark.catalog import Warehouse, load_table, write_table

from conftest import SF_DIR


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    root = str(tmp_path / "wh")
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_table(events, root, "events_by_day", partition_by=["day"])

    wh = Warehouse(spark, root)
    df = wh.table("events_by_day").filter(F.col("day") == "2024-01-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    (scan,) = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "2024-01-03" in pf, scan
    # the day predicate must NOT degrade into a post-scan data filter
    assert "PushedFilters: []" in scan or "day" not in scan.split("PushedFilters:")[1]

    # and the result is correct vs an unpartitioned filter
    want = (
        load_table(spark, SF_DIR, "events")
        .filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-03")
        .count()
    )
    assert df.count() == want > 0


def test_sorted_write_tightens_row_group_stats(spark, tmp_path):
    """sort_by produces non-overlapping per-row-group min/max ranges on
    the sort column, so a value predicate can skip row groups; an
    unsorted write of the same data has (near-)full-range stats in
    every row group."""
    import os

    import pyarrow.parquet as pq

    root = str(tmp_path / "wh")
    events = load_table(spark, SF_DIR, "events")
    # single task + small row groups → several row groups per file
    one = events.coalesce(1)
    small_rg = {"parquet.block.size": str(64 * 1024), "parquet.page.size": str(8 * 1024)}
    write_table(one, root, "ev_sorted", sort_by=["user_id"], options=small_rg)
    write_table(one, root, "ev_raw", options=small_rg)

    def ranges(table):
        d = os.path.join(root, table)
        out = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                col = next(
                    g.column(i) for i in range(g.num_columns)
                    if g.column(i).path_in_schema == "user_id"
                )
                out.append((col.statistics.min, col.statistics.max))
        return out

    sorted_rgs, raw_rgs = ranges("ev_sorted"), ranges("ev_raw")
    assert len(sorted_rgs) > 2, "need multiple row groups for the test to mean anything"
    # sorted: row-group ranges are disjoint (or touch at one value)
    for (lo1, hi1), (lo2, hi2) in zip(sorted_rgs, sorted_rgs[1:]):
        assert hi1 <= lo2, (sorted_rgs,)
    # unsorted: ranges overlap — every row group spans ~the full domain
    overlaps = sum(
        1 for (lo1, hi1), (lo2, hi2) in zip(raw_rgs, raw_rgs[1:]) if hi1 > lo2
    )
    assert overlaps == len(raw_rgs) - 1, (raw_rgs,)
