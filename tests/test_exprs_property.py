"""Property-based cross-engine determinism tests for exprs.py.

The oracle comparison depends on Spark and DuckDB producing
bit-identical doubles for every computed value. These tests drive the
portable helpers with hypothesis-generated inputs and assert exact
(not approximate) equality against DuckDB evaluating the SQL twin —
the strongest local guarantee that the driver's value-hash compare
can't be tripped by a pathological float.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from heapdumpstardiver_spark.exprs import round_sql

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


def py_round_halfup(x: float, n: int) -> float:
    # The reference semantics both engines implement via
    # floor(x*10^n + 0.5)/10^n with sign handling — plain Python floats
    # are IEEE doubles, so this is a third independent implementation.
    import math

    p = float(10**n)
    if x >= 0:
        return math.floor(x * p + 0.5) / p
    return -(math.floor(-x * p + 0.5) / p)


@settings(max_examples=300, deadline=None)
@given(x=finite, n=st.integers(min_value=0, max_value=6))
def test_round_sql_matches_ieee_reference(x, n):
    con = duckdb.connect()
    # The value is fed through a parameter (a column-like runtime
    # value), NOT a SQL literal: DuckDB's constant folder evaluates
    # double arithmetic on literals through a different path that can
    # disagree with its runtime path in the last ulp above 2^53.
    # Production expressions always operate on DOUBLE columns.
    got = con.execute(f"SELECT {round_sql('($1 + 0.0)', n)}", [x]).fetchone()[0]
    assert got == py_round_halfup(x, n)


@settings(max_examples=200, deadline=None)
@given(
    vec=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e3, max_value=1e3),
        min_size=1,
        max_size=64,
    )
)
def test_duckdb_dot_product_is_left_fold(vec):
    # exprs.dot relies on list_dot_product being a sequential left
    # fold; verify against a Python loop (IEEE doubles, same order).
    con = duckdb.connect()
    got = con.execute(
        "SELECT list_dot_product($1::DOUBLE[], $1::DOUBLE[])", [vec]
    ).fetchone()[0]
    acc = 0.0
    for x in vec:
        acc = acc + x * x
    assert got == acc


@pytest.mark.parametrize("n", [0, 2, 4])
def test_round_sql_and_spark_round_col_agree(spark, n):
    # One Spark round-trip over a grid of awkward values (halfway
    # points, negatives, subnormal-ish) — exact equality with DuckDB.
    from pyspark.sql import functions as F

    from heapdumpstardiver_spark.exprs import round_col

    values = [
        0.0, -0.0, 2.675, -2.675, 0.5, -0.5, 1.005, -1.005,
        123456.789555, -123456.789555, 1e-9, -1e-9, 0.49999999999999994,
    ]
    sdf = spark.createDataFrame([(v,) for v in values], ["x"])
    spark_out = [
        r["r"] for r in sdf.select(round_col(F.col("x"), n).alias("r")).collect()
    ]
    con = duckdb.connect()
    duck_out = [
        con.execute(f"SELECT {round_sql('($1 + 0.0)', n)}", [v]).fetchone()[0]
        for v in values
    ]
    assert spark_out == duck_out


@settings(max_examples=300, deadline=None)
@given(x=finite)
def test_qc_round6_matches_round_sql(x):
    """The driver-side rounding twin the trained classifier uses
    between GD rounds (`llm._qc_round6`) must agree bit-exactly with
    the SQL rounding the oracle unrolls — a disagreement on ANY
    double would silently diverge the weight trajectories."""
    from heapdumpstardiver_spark.queries.llm import _qc_round6

    con = duckdb.connect()
    got = con.execute(f"SELECT {round_sql('($1 + 0.0)', 6)}", [x]).fetchone()[0]
    want = _qc_round6(x)
    # round_sql normalizes -0.0 via + CAST(0 AS DOUBLE); _qc_round6
    # does the same with + 0.0 — compare bit patterns, not just ==
    import struct

    assert struct.pack("d", got) == struct.pack("d", want), (x, got, want)


def test_cosine_bn_is_bit_identical_to_cosine(spark):
    """r14: cosine_bn (norm-hoisted cosine) must produce the same
    IEEE doubles as the inline cosine — same quotient
    dot/(sqrt(aa)·bn), each factor evaluated once."""
    import math

    from pyspark.sql import functions as F

    from heapdumpstardiver_spark.exprs import cosine, cosine_bn, dot

    rows = [
        ([1.0, 2.5, -3.75, 0.125], [0.5, -1.5, 2.25, 4.0]),
        ([1e-12, -1e12, 3.14159, 2.71828], [1.0, 1.0, 1.0, 1.0]),
        ([0.1, 0.2, 0.3, 0.4], [-0.4, 0.3, -0.2, 0.1]),
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    out = df.select(
        cosine(F.col("a"), F.col("b")).alias("inline"),
        cosine_bn(
            F.col("a"), F.col("b"), F.sqrt(dot(F.col("b"), F.col("b")))
        ).alias("hoisted"),
    ).collect()
    for r in out:
        assert math.isclose(r["inline"], r["hoisted"], rel_tol=0, abs_tol=0) or (
            r["inline"] == r["hoisted"]
        ), (r["inline"], r["hoisted"])
