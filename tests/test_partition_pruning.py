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


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """Z-ordered layout: parquet row-group min/max stats must allow
    skipping on BOTH interleaved columns, where a plain sort_by layout
    only skips on its leading column. Compared quantitatively on the
    same data, same file/row-group geometry."""
    import glob

    import pyarrow.parquet as pq

    from heapdumpstardiver_spark.catalog import write_table_zordered

    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("a"),
        F.col("l_partkey").cast("long").alias("b"),
        "l_quantity",
    )
    amax, bmax = li.agg(F.max("a"), F.max("b")).first()
    # scale both dims into [0, 2^10)
    scaled = li.select(
        (F.col("a") * 1024 / (amax + 1)).cast("long").alias("a"),
        (F.col("b") * 1024 / (bmax + 1)).cast("long").alias("b"),
        "l_quantity",
    )
    root = str(tmp_path / "wh")
    write_table_zordered(scaled, root, "li_z", zorder_by=("a", "b"), bits=10, files=32)
    write_table(
        scaled.repartition(32).sortWithinPartitions("a"), root, "li_a"
    )

    def overlap_fraction(table_dir: str, col: str, lo: int, hi: int) -> float:
        total = hit = 0
        for f in glob.glob(f"{table_dir}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col:
                        total += 1
                        s = c.statistics
                        if s is None or (s.min <= hi and s.max >= lo):
                            hit += 1
        assert total > 0
        return hit / total

    # point-range predicate on the SECOND dimension: z-order must skip
    # a solid majority of row groups; the a-sorted layout skips none.
    z_b = overlap_fraction(f"{root}/li_z", "b", 100, 131)
    a_b = overlap_fraction(f"{root}/li_a", "b", 100, 131)
    assert z_b < 0.5, z_b
    assert a_b > 0.9, a_b
    # and the first dimension still skips under z-order too
    z_a = overlap_fraction(f"{root}/li_z", "a", 100, 131)
    assert z_a < 0.5, z_a

    # sanity: the layout changes bytes, not answers
    wh = Warehouse(spark, root)
    n_z = wh.table("li_z").filter(F.col("b").between(100, 131)).count()
    n_a = wh.table("li_a").filter(F.col("b").between(100, 131)).count()
    assert n_z == n_a > 0


def test_corrupt_shard_tolerance(spark, tmp_path):
    """A damaged parquet shard fails a strict read loudly (default) and
    is skipped under ignore_corrupt=True — the posture a multi-hour
    100-TB scan needs for the occasional bad object-store shard, as an
    explicit opt-in rather than a silent default."""
    import pytest as _pytest

    from heapdumpstardiver_spark.catalog import load_table

    d = tmp_path / "lineitem.parquet"
    spark.range(200).selectExpr("id AS l_orderkey").write.parquet(str(d))
    (d / "part-corrupt-shard.parquet").write_bytes(b"PAR1" + b"\x00" * 64)

    with _pytest.raises(Exception):
        load_table(spark, str(tmp_path), "lineitem").count()

    ok = load_table(spark, str(tmp_path), "lineitem", ignore_corrupt=True)
    assert ok.count() == 200


def test_schema_evolution_merge_read(spark, tmp_path):
    """A table appended across epochs with an added column reads as
    the union schema under merge_schema=True (old rows null-filled);
    the default read keeps the homogeneous fast path."""
    from heapdumpstardiver_spark.catalog import load_table

    d = tmp_path / "orders.parquet"
    spark.createDataFrame([(1, 10.0)], "k LONG, v DOUBLE").write.parquet(str(d))
    spark.createDataFrame(
        [(2, 20.0, "new")], "k LONG, v DOUBLE, tag STRING"
    ).write.mode("append").parquet(str(d))

    merged = load_table(spark, str(tmp_path), "orders", merge_schema=True)
    assert set(merged.columns) == {"k", "v", "tag"}
    rows = {r.k: r.tag for r in merged.collect()}
    assert rows == {1: None, 2: "new"}
