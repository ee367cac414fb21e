"""Semantic invariants for the round-9 operator families — properties
the oracle value-hash can't express: the hash pins WHAT came out,
these pin WHY it is trustworthy (monotonicity, mean preservation,
bounds, internal consistency)."""

from __future__ import annotations

import heapdumpstardiver_spark as hds
from tests.conftest import SF_DIR


def _rows(spark, name):
    return hds.QUERIES[name](spark, SF_DIR).collect()


def test_isotonic_fit_monotone_and_mean_preserving(spark):
    """PAVA output must be non-decreasing in the regressor, and the
    isotonic projection preserves the WEIGHTED mean (it is an L2
    projection onto the monotone cone) — up to 4dp output rounding."""
    rows = _rows(spark, "isotonic_calibration")
    assert [r["hour"] for r in rows] == list(range(24))
    iso = [r["iso_avg"] for r in rows]
    assert iso == sorted(iso)
    w = [r["n_events"] for r in rows]
    raw_mean = sum(a * b for a, b in zip(w, (r["raw_avg"] for r in rows)))
    iso_mean = sum(a * b for a, b in zip(w, iso))
    assert abs(raw_mean - iso_mean) <= sum(w) * 1e-3  # 4dp rounding budget


def test_conformal_split_and_coverage_bounds(spark):
    row = _rows(spark, "conformal_interval_naive")[0]
    assert row["q_cents"] >= 0
    assert 0.0 <= row["coverage"] <= 1.0
    assert row["nominal"] == 0.9
    assert row["n_cal"] >= 4 * row["n_test"] - 5  # ~80/20 split


def test_friedman_w_in_unit_interval(spark):
    row = _rows(spark, "friedman_kendall_w")[0]
    assert row["chi2_friedman"] >= 0.0
    assert 0.0 <= row["kendalls_w"] <= 1.0
    assert row["k_items"] == 5


def test_moran_expected_value_and_bounds(spark):
    row = _rows(spark, "moran_i_grid")[0]
    assert abs(row["expected_i"] + 1.0 / (row["n_cells"] - 1)) < 1e-4
    assert -1.5 <= row["moran_i"] <= 1.5  # loose Moran bound
    assert row["w_pairs"] > 0


def test_auc_bounds_and_gini_identity(spark):
    row = _rows(spark, "auc_rank_separability")[0]
    assert 0.0 <= row["auc"] <= 1.0
    assert abs(row["gini_coef"] - (2 * row["auc"] - 1)) <= 2e-6
    assert row["n_pos"] > 0 and row["n_neg"] > 0


def test_winnowing_overlap_coefficient_bounds(spark):
    rows = _rows(spark, "winnowing_fingerprints")
    assert rows, "winnowing found no overlapping pairs at test SF"
    for r in rows:
        assert 0.0 < r["overlap_coef"] <= 1.0
        assert r["shared_fp"] <= min(r["nfp_a"], r["nfp_b"])
    shared = [r["shared_fp"] for r in rows]
    assert shared == sorted(shared, reverse=True)


def test_hurst_rs_grows_with_block_size(spark):
    """R/S ~ c * m^H with H > 0, so the average rescaled range must
    strictly increase with block size; the fitted H must be in the
    meaningful (0, 1.5) band."""
    rows = _rows(spark, "hurst_rs_exponent")
    assert [r["m"] for r in rows] == [8, 16, 32]
    rs = [float(r["avg_rs"]) for r in rows]
    assert rs[0] < rs[1] < rs[2]
    h = float(rows[0]["hurst_h"])
    assert all(float(r["hurst_h"]) == h for r in rows)
    assert 0.0 < h < 1.5


def test_mann_kendall_label_matches_z(spark):
    row = _rows(spark, "mann_kendall_trend")[0]
    z = row["z_stat"]
    expect = (
        "increasing" if z > 1.96 else "decreasing" if z < -1.96 else "no_trend"
    )
    assert row["trend"] == expect
    assert row["var18"] > 0


def test_ccf_bounds_and_lag_grid(spark):
    rows = _rows(spark, "cross_correlation_lead_lag")
    assert [r["lag"] for r in rows] == list(range(-3, 4))
    assert all(abs(r["ccf"]) <= 1.0 for r in rows)


def test_gumbel_scale_positive_and_return_level_above_location(spark):
    row = _rows(spark, "gumbel_block_maxima")[0]
    beta = float(row["gumbel_beta"])
    mu = float(row["gumbel_mu"])
    assert beta > 0
    # -ln(-ln 0.99) > 0, so the 1-in-100 level sits above mu
    assert float(row["return_level_p99"]) > mu


def test_theil_decomposition_additivity(spark):
    row = _rows(spark, "theil_inequality_decomposition")[0]
    t, b, w = (
        float(row["theil_t"]),
        float(row["theil_between"]),
        float(row["theil_within"]),
    )
    assert t >= 0 and b >= 0 and w >= -1e-6
    assert abs((b + w) - t) <= 2e-6  # additivity (within = T - between)
    assert 0.0 <= float(row["between_share"]) <= 1.0


def test_periodogram_power_fraction_bounds(spark):
    rows = _rows(spark, "periodogram_seasonal_power")
    assert [r["period"] for r in rows] == [7, 14, 30]
    assert all(0.0 <= float(r["power_frac"]) <= 1.0 for r in rows)


def test_page_hinkley_alarm_consistency(spark):
    row = _rows(spark, "page_hinkley_drift")[0]
    assert row["max_ph"] >= 0.0
    assert 0 <= row["n_alarm_days"] <= row["n_days"]
    if row["n_alarm_days"] > 0:
        assert row["first_alarm_day"] is not None
    else:
        assert row["first_alarm_day"] is None
    # PH > lambda on some day iff max_ph exceeds lambda
    assert (row["n_alarm_days"] > 0) == (row["max_ph"] > 500.0)


def test_ewma_breaches_bounded(spark):
    row = _rows(spark, "ewma_control_chart")[0]
    assert 0 <= row["n_out_of_control"] <= row["n_days"]
    assert row["max_limit_ratio"] > 0.0
    assert (row["n_out_of_control"] > 0) == (row["max_limit_ratio"] > 1.0)


def test_t_closeness_output_sorted_and_bounded(spark):
    rows = _rows(spark, "t_closeness_audit")
    assert len(rows) == 5
    emds = [r["emd_t"] for r in rows]
    assert all(0.0 <= e <= 1.0 for e in emds)
    assert emds == sorted(emds, reverse=True)
