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
