"""Unit tests for kg/ops/quality.py (column_profile, k_anonymity)."""

from __future__ import annotations

import pytest

from kg.ops.quality import column_profile, k_anonymity


def test_column_profile_hand_values(spark):
    rows = [
        (1, "a", None),
        (2, "a", "x"),
        (3, None, "x"),
        (4, "b", "x"),
    ]
    df = spark.createDataFrame(rows, "id long, g string, h string")
    got = {
        r["col_name"]: (
            r["n_rows"],
            r["n_nulls"],
            r["completeness"],
            r["n_distinct"],
            r["distinctness"],
        )
        for r in column_profile(df).collect()
    }
    assert got == {
        "id": (4, 0, 1.0, 4, 1.0),
        "g": (4, 1, 0.75, 2, round(2 / 3, 6)),
        "h": (4, 1, 0.75, 1, round(1 / 3, 6)),
    }


def test_column_profile_all_null_and_validation(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    r = column_profile(df).collect()[0]
    # zero non-null rows: distinctness is NULL, never a div blow-up
    assert (r["n_nulls"], r["completeness"], r["distinctness"]) == (
        2,
        0.0,
        None,
    )
    with pytest.raises(ValueError, match="not in frame"):
        column_profile(df, columns=["nope"])


def test_k_anonymity_hand_values(spark):
    # groups: (a,1)x3, (a,2)x1, (b,1)x2 → k=3: at-risk groups {(a,2),(b,1)}
    rows = [("a", 1)] * 3 + [("a", 2)] + [("b", 1)] * 2
    df = spark.createDataFrame(rows, "q1 string, q2 long")
    r = k_anonymity(df, ["q1", "q2"], k=3).collect()[0]
    assert (
        r["k"],
        r["n_rows"],
        r["n_groups"],
        r["at_risk_groups"],
        r["at_risk_rows"],
        r["at_risk_fraction"],
    ) == (3, 6, 3, 2, 3, 0.5)


def test_k_anonymity_nulls_group_together_and_validation(spark):
    rows = [(None,), (None,), ("a",)]
    df = spark.createDataFrame(rows, "q string")
    r = k_anonymity(df, ["q"], k=2).collect()[0]
    # the two NULLs form one group of 2 (not at risk at k=2)
    assert (r["n_groups"], r["at_risk_groups"], r["at_risk_rows"]) == (2, 1, 1)
    with pytest.raises(ValueError, match="k must"):
        k_anonymity(df, ["q"], k=1)
    with pytest.raises(ValueError, match="not in frame"):
        k_anonymity(df, ["nope"])


def test_l_diversity_hand_values(spark):
    """Homogeneous group flags despite being k-large; diverse group
    passes; NULL sensitive counts as one value."""
    from kg.ops.quality import l_diversity

    rows = (
        [("zipA", "flu")] * 5          # 5 rows, 1 distinct -> at risk
        + [("zipB", "flu"), ("zipB", "cold"), ("zipB", None)]  # 3 distinct
        + [("zipC", None), ("zipC", None)]  # NULL-only: 1 value -> risk
    )
    df = spark.createDataFrame(rows, "zip string, diag string")
    row = l_diversity(df, ["zip"], "diag", l=2).collect()[0]
    assert (row["l"], row["n_rows"], row["n_groups"]) == (2, 10, 3)
    assert (row["at_risk_groups"], row["at_risk_rows"]) == (2, 7)
    assert row["at_risk_fraction"] == 0.7


def test_l_diversity_validates(spark):
    import pytest as _pt

    from kg.ops.quality import l_diversity

    df = spark.createDataFrame([("a", "b")], "zip string, diag string")
    with _pt.raises(ValueError, match="l must"):
        l_diversity(df, ["zip"], "diag", l=1)
    with _pt.raises(ValueError, match="not in frame"):
        l_diversity(df, ["nope"], "diag")
    with _pt.raises(ValueError, match="cannot be a quasi"):
        l_diversity(df, ["zip"], "zip")


def test_t_closeness_hand_values(spark):
    """Global diag split 5 flu / 5 cold.  zipA is all-flu (TV = 0.5 >
    t=0.2 -> at risk); zipB mirrors the global split (TV = 0 -> safe)."""
    from kg.ops.quality import t_closeness

    rows = ([("zipA", "flu")] * 4
            + [("zipB", "flu")] + [("zipB", "cold")] * 5)
    df = spark.createDataFrame(rows, "zip string, diag string")
    # globals: N=10, flu=5, cold=5
    # zipA: ng=4, present flu: |4*10-5*4|=20; absent cold: 4*5=20
    #   -> num=40, den=80, d=0.5 > 0.2 -> risk
    # zipB: ng=6, flu |1*10-5*6|=20, cold |5*10-5*6|=20 -> num=40,
    #   den=120, d=1/3 > 0.2 -> risk too; adjust zipB to match global:
    row = t_closeness(df, ["zip"], "diag", t=0.2).collect()[0]
    assert (row["n_rows"], row["n_groups"]) == (10, 2)
    assert row["at_risk_groups"] == 2 and row["at_risk_rows"] == 10
    assert row["max_distance"] == 0.5

    balanced = ([("zipA", "flu"), ("zipA", "cold")] * 2
                + [("zipB", "flu"), ("zipB", "cold")] * 3)
    row = t_closeness(
        spark.createDataFrame(balanced, "zip string, diag string"),
        ["zip"], "diag", t=0.2,
    ).collect()[0]
    assert row["at_risk_groups"] == 0 and row["max_distance"] == 0.0
    assert row["at_risk_fraction"] == 0.0


def test_t_closeness_validates(spark):
    import pytest as _pt

    from kg.ops.quality import t_closeness

    df = spark.createDataFrame([("a", "b")], "zip string, diag string")
    with _pt.raises(ValueError, match="t must"):
        t_closeness(df, ["zip"], "diag", t=1.5)
    with _pt.raises(ValueError, match="cannot be a quasi"):
        t_closeness(df, ["zip"], "zip")
