"""Bucketed co-located join: both fact tables bucketed on the join key
→ the join plan has NO shuffle exchange, and results match the plain
join exactly."""

import pytest
from pyspark.sql import functions as F

from heapdumpstardiver_spark.bucketing import write_bucketed
from heapdumpstardiver_spark.catalog import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, sort_cols="l_orderkey")
    write_bucketed(o, "b_orders", "o_orderkey", 8, sort_cols="o_orderkey")
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # Force a non-broadcast join so the bucket co-location is what
    # eliminates the exchanges.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(li_t)
            .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        # no exchange below the join: bucket layout already co-locates
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    got = {
        (r["o_orderstatus"], r["n"])
        for r in (
            spark.table(li_t)
            .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    want = {
        (r["o_orderstatus"], r["n"])
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want
