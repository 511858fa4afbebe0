"""Exact closed-form OLS (kg/ops/stats.py): hand values, perfect fit,
zero-variance NULL contract, numpy cross-check, validation."""

from __future__ import annotations

import numpy as np
import pytest

from kg.ops.stats import ols_fit


def test_ols_perfect_line(spark):
    rows = [("a", x, 3 * x + 2) for x in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_fit(df, "g", "x", "y").collect()[0]
    assert (r["n"], r["slope"], r["intercept"], r["r2"]) == (5, 3.0, 2.0, 1.0)


def test_ols_matches_numpy_polyfit(spark):
    xs = [1, 2, 3, 4, 5, 6, 7, 8]
    ys = [3, 5, 4, 8, 9, 8, 12, 11]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
    )
    r = ols_fit(df, "g", "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    corr = np.corrcoef(xs, ys)[0, 1]
    assert r["slope"] == pytest.approx(slope, abs=1e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert r["r2"] == pytest.approx(corr**2, abs=1e-6)


def test_ols_zero_variance_yields_null(spark):
    df = spark.createDataFrame(
        [("cx", 1, 7), ("cx", 1, 9), ("cy", 1, 5), ("cy", 2, 5)],
        "g string, x long, y long",
    )
    got = {r["g"]: r for r in ols_fit(df, "g", "x", "y").collect()}
    assert got["cx"]["slope"] is None and got["cx"]["r2"] is None
    # constant y: slope/intercept defined (0, 5), r2 NULL (0/0)
    assert got["cy"]["slope"] == 0.0 and got["cy"]["intercept"] == 5.0
    assert got["cy"]["r2"] is None


def test_ols_validates(spark):
    df = spark.createDataFrame([("g", 1, 2)], "g string, x long, y long")
    with pytest.raises(ValueError, match="not in frame"):
        ols_fit(df, "g", "nope", "y")


def test_skew_profile_hand_values(spark):
    """Keys a×4, b×2, c×1, d×1: max=4, avg=2 -> skew 2.0; rank order by
    (count desc, key asc)."""
    from kg.ops.stats import skew_profile

    rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r["key"], r["n"], r["rank"], r["n_rows"], r["n_keys"], r["skew_fp"])
        for r in skew_profile(df, "k", top=3).orderBy("rank").collect()
    ]
    assert got == [
        ("a", 4, 1, 8, 4, 2_000_000),
        ("b", 2, 2, 8, 4, 2_000_000),
        ("c", 1, 3, 8, 4, 2_000_000),
    ]


def test_skew_profile_balanced_and_validation(spark):
    from kg.ops.stats import skew_profile

    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    r = skew_profile(df, "k", top=1).collect()[0]
    assert r["skew_fp"] == 1_000_000  # perfectly balanced
    assert r["key"] == "1"  # integral keys cast to string
    with pytest.raises(ValueError, match="top"):
        skew_profile(df, "k", top=0)


def test_group_quantiles_hand_values(spark):
    """Nearest-rank (type 1): value at rank ceil(q*n)."""
    from kg.ops.stats import group_quantiles

    # g=a: values 1..10 (n=10): p25→rank 3→3, p50→rank 5→5,
    # p75→rank 8→8, p90→rank 9→9, p99→rank 10→10
    # g=b: [7,7,7,100] (n=4): p25→rank 1→7, p50→rank 2→7,
    # p75→rank 3→7, p90→rank 4→100, p99→rank 4→100
    rows = [("a", v) for v in range(1, 11)] + [
        ("b", 7), ("b", 7), ("b", 7), ("b", 100)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["n"], r["p25"], r["p50"], r["p75"], r["p90"], r["p99"])
        for r in group_quantiles(df, "g", "v").collect()
    }
    assert got == {
        "a": (10, 3, 5, 8, 9, 10),
        "b": (4, 7, 7, 7, 100, 100),
    }


def test_group_quantiles_single_row_and_validation(spark):
    from kg.ops.stats import group_quantiles

    df = spark.createDataFrame([("a", 42)], "g string, v long")
    r = group_quantiles(df, "g", "v").collect()[0]
    # every quantile of a 1-row group is that row
    assert (r["p25"], r["p50"], r["p99"]) == (42, 42, 42)
    with pytest.raises(ValueError, match="quantile"):
        group_quantiles(df, "g", "v", qs=[("bad", 5, 4)])


def test_distribution_drift_identical_is_zero(spark):
    from kg.ops.stats import distribution_drift

    df = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 5 + [(None,)], "v string"
    )
    r = distribution_drift(df, df, "v").collect()[0]
    # identical snapshots: p == q in every bin, terms exactly zero
    assert (r["n_a"], r["n_b"], r["psi_fp"], r["psi"]) == (11, 11, 0, 0.0)
    assert r["n_bins"] == 3  # x-bin, y-bin, null-bin


def test_distribution_drift_disjoint_shift(spark):
    """Full categorical swap: psi lands in the 'investigate' band, and
    psi_fp equals the closed-form fixed-point sum."""
    import math

    from kg.ops.stats import distribution_drift

    a = spark.createDataFrame([("x",)] * 10, "v string")
    b = spark.createDataFrame([("y",)] * 10, "v string")
    r = distribution_drift(a, b, "v").collect()[0]
    # md5('x') % 64 = 3, md5('y') % 64 = 32 — distinct bins
    p, q = 11 / 75.0, 1 / 75.0
    term = math.floor(1e9 * (p - q) * math.log(p / q))
    assert r["n_bins"] == 2
    assert r["psi_fp"] == 2 * term
    assert r["psi"] > 0.25


def test_distribution_drift_validation(spark):
    from kg.ops.stats import distribution_drift

    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="n_buckets"):
        distribution_drift(df, df, "v", n_buckets=1)
    with pytest.raises(ValueError, match="not in frame"):
        distribution_drift(df, df, "nope")
