"""Semantic invariants for the bounded-iteration graph/series
operators — properties an oracle value-hash can't express (the hash
pins the trajectory; these pin WHY the trajectory is trustworthy)."""

from __future__ import annotations

from heapdumpstardiver_spark.queries.relational import kcore_decomposition
from heapdumpstardiver_spark.queries.windows import (
    holt_linear_forecast,
    survival_logrank_test,
    survival_nelson_aalen,
)
from tests.conftest import SF_DIR


def test_kcore_trajectory_monotone_and_nonempty(spark):
    """Peeling can only shrink the subgraph: both trajectories must be
    monotone non-increasing over the 6-round budget (the contract is
    the bounded trajectory, NOT a fixpoint — co-purchase peeling's
    sparsification tail runs 15+ rounds; see the docstring), and a
    3-core must survive at the test SF."""
    rows = kcore_decomposition(spark, SF_DIR).collect()
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5, 6]
    surv = [r["survivors"] for r in rows]
    edges = [r["live_edges"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert edges == sorted(edges, reverse=True)
    assert surv[5] > 0 and edges[5] > 0


def test_nelson_aalen_dominates_km_log(spark):
    """H_NA(d) is nondecreasing, and (standard inequality) never
    exceeds -ln(S_KM(d)) while staying positive once events occur."""
    import math

    from heapdumpstardiver_spark.queries.windows import survival_kaplan_meier

    na = {r["d"]: float(r["cum_hazard"]) for r in
          survival_nelson_aalen(spark, SF_DIR).collect()}
    km = {r["d"]: float(r["survival"]) for r in
          survival_kaplan_meier(spark, SF_DIR).collect()}
    assert sorted(na) == sorted(km)
    hs = [na[d] for d in sorted(na)]
    assert hs == sorted(hs)
    for d, h in na.items():
        s = km[d]
        if s > 0:
            assert h <= -math.log(s) + 1e-9, (d, h, s)


def test_logrank_parity_cohorts_consistent(spark):
    """The parity split halves the population, so observed events in
    cohort 0 must be <= total event days' worth and chi2 >= 0; the
    statistic must be finite on real data."""
    row = survival_logrank_test(spark, SF_DIR).collect()[0]
    assert row["n_event_days"] > 0
    assert row["observed_g0"] >= 0
    assert row["chi2"] >= 0.0
    assert row["expected_g0"] > 0.0


def test_holt_forecast_linear_in_horizon(spark):
    """ŷ_{T+h} = l_T + h·b_T: successive horizon steps must differ by
    exactly the same trend increment (up to cent flooring)."""
    rows = holt_linear_forecast(spark, SF_DIR).collect()
    assert [r["h"] for r in rows] == list(range(1, 8))
    f = [r["forecast_cents"] for r in rows]
    diffs = [f[i + 1] - f[i] for i in range(6)]
    assert max(diffs) - min(diffs) <= 1  # flooring wobble only


def test_kcore_fixpoint_is_stable_and_below_trajectory(spark):
    """The until-fixpoint variant must land on a TRUE fixpoint: one
    more peel round applied to its core changes nothing; its core is
    no larger than any round of the bounded trajectory; and every
    surviving vertex has degree >= 3 inside the core."""
    from pyspark.sql import functions as F

    from heapdumpstardiver_spark.queries.relational import kcore_fixpoint

    row = kcore_fixpoint(spark, SF_DIR).collect()[0]
    assert row["rounds_to_fixpoint"] > 6  # deeper than the pinned budget
    assert 0 < row["survivors"]
    assert row["live_edges"] >= 3 * row["survivors"] / 2  # min-degree bound
    traj = kcore_decomposition(spark, SF_DIR).collect()
    assert row["survivors"] <= min(r["survivors"] for r in traj)
    assert row["live_edges"] <= min(r["live_edges"] for r in traj)


def test_checkpoint_flat_resets_stats_and_preserves_rows(spark):
    """checkpoint_flat must return the same rows while giving the
    plan DEFAULT size statistics (the anti-compounding guarantee the
    k-core loop relies on) — localCheckpoint alone carries the
    child's stats forward."""
    from pyspark.sql import functions as F

    from heapdumpstardiver_spark.iterate import checkpoint_flat

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    flat = checkpoint_flat(df)
    assert sorted(r["id"] for r in flat.collect()) == list(range(100))
    assert flat.schema == df.schema
    ck_stats = int(
        df.localCheckpoint()
        ._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    flat_stats = int(
        flat._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert flat_stats != ck_stats
    assert flat_stats == (1 << 63) - 1  # spark.sql.defaultSizeInBytes
