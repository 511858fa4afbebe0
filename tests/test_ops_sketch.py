"""MinCount distinct sketch (kg/ops/sketch.py): integer-rule replica,
duplicate invariance, accuracy bound, validation."""

from __future__ import annotations

import hashlib

import pytest

from kg.ops.sketch import DOMAIN, ams_f2, mincount_distinct


def _md560(x: str) -> int:
    return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)


def _replica(vals, k):
    regs = {}
    for v in set(vals):
        h = _md560(v)
        r = h % k
        regs[r] = min(regs.get(r, DOMAIN), h)
    sm = sum(regs.values()) + (k - len(regs)) * DOMAIN
    return len(regs), (k * (k - 1) * DOMAIN) // sm


def test_mincount_matches_python_replica_bitwise(spark):
    vals = [f"tok{i}" for i in range(100)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    row = mincount_distinct(df, "g", "v", k=8).collect()[0]
    hit, est = _replica(vals, 8)
    assert (row["n_registers_hit"], row["distinct_est"]) == (hit, est)


def test_mincount_is_duplicate_invariant(spark):
    vals = [f"tok{i}" for i in range(200)]
    once = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    thrice = spark.createDataFrame(
        [("g", v) for v in vals * 3], "g string, v string"
    )
    assert (
        mincount_distinct(once, "g", "v").collect()
        == mincount_distinct(thrice, "g", "v").collect()
    )


def test_mincount_accuracy_within_4_sigma(spark):
    """k=64 -> sigma ~ 12.5%; 4 sigma = 50% bound, deterministic data."""
    rows = [("big", f"x{i}") for i in range(5000)] + [
        ("small", f"x{i}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        r["g"]: r["distinct_est"]
        for r in mincount_distinct(df, "g", "v", k=64).collect()
    }
    assert abs(got["big"] - 5000) / 5000 < 0.5
    assert abs(got["small"] - 300) / 300 < 0.5


def test_mincount_validates(spark):
    df = spark.createDataFrame([("g", "v")], "g string, v string")
    with pytest.raises(ValueError, match="k must"):
        mincount_distinct(df, "g", "v", k=1)


def test_cms_never_undercounts_and_is_deterministic(spark):
    from kg.ops.sketch import cms_cells, cms_estimate
    from pyspark.sql import functions as F

    rows = [("w%d" % (i % 37),) for i in range(500)]
    df = spark.createDataFrame(rows, "v string")
    cells = cms_cells(df, "v", width=64, depth=4)
    # cell invariant: per-row totals each equal the stream length
    per_row = {
        r["row"]: r["t"]
        for r in cells.groupBy("row").agg(F.sum("cnt").alias("t")).collect()
    }
    assert per_row == {0: 500, 1: 500, 2: 500, 3: 500}
    exact = df.groupBy("v").agg(F.count("*").cast("long").alias("exact_n"))
    est = cms_estimate(cells, exact, "v", width=64, depth=4).collect()
    assert len(est) == 37
    for r in est:
        assert r["cms_n"] >= r["exact_n"], r  # one-sided error
    again = cms_estimate(cells, exact, "v", width=64, depth=4).collect()
    assert sorted(map(tuple, est)) == sorted(map(tuple, again))


def test_cms_wide_sketch_is_exact_and_validation(spark):
    """With width >> distinct values, collisions are unlikely and the
    estimate should equal truth for this fixed seed."""
    import pytest as _pytest

    from kg.ops.sketch import cms_cells, cms_estimate
    from pyspark.sql import functions as F

    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "v string")
    cells = cms_cells(df, "v", width=4096, depth=4)
    exact = df.groupBy("v").agg(F.count("*").cast("long").alias("exact_n"))
    got = {
        r["v"]: (r["exact_n"], r["cms_n"])
        for r in cms_estimate(cells, exact, "v", width=4096, depth=4).collect()
    }
    assert got == {"a": (7, 7), "b": (3, 3), "c": (1, 1)}
    # unseen value probes empty cells -> 0
    unseen = spark.createDataFrame([("zzz",)], "v string")
    assert cms_estimate(cells, unseen, "v", width=4096, depth=4).collect()[0][
        "cms_n"
    ] == 0
    with _pytest.raises(ValueError, match="width"):
        cms_cells(df, "v", width=1)
    with _pytest.raises(ValueError, match="not in frame"):
        cms_cells(df, "nope")


def _ams_sign(e: int, v: str, seed: str = "kg-ams-v1") -> int:
    return 1 if _md560(f"{seed}:{e}:{v}") % 2 == 0 else -1


def test_ams_matches_python_replica_bitwise(spark):
    """z_e = sum of ±1 md5 signs over the ROW stream (not the distinct
    set) — recomputed independently here, f2_est = z²."""
    vals = [f"tok{i % 7}" for i in range(50)]  # repeats matter for F2
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = {r["estimator"]: r for r in ams_f2(df, "v", k=5).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    for e in range(5):
        z = sum(_ams_sign(e, v) for v in vals)
        assert rows[e]["z"] == z
        assert int(rows[e]["f2_est"]) == z * z


def test_ams_median_estimates_self_join_size(spark):
    """Median-of-k estimate lands within 4/√k relative error of the
    exact F2 = Σ f_x² (self-join size) on a skewed stream."""
    freqs = {f"t{i}": (50 if i < 3 else 5) for i in range(40)}
    vals = [v for v, c in freqs.items() for _ in range(c)]
    exact = sum(c * c for c in freqs.values())
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    ests = sorted(int(r["f2_est"]) for r in ams_f2(df, "v", k=9).collect())
    med = ests[4]
    assert abs(med - exact) <= 4 / (9 ** 0.5) * exact, (med, exact)


def test_ams_empty_input_and_validation(spark):
    df = spark.createDataFrame([], "v string")
    rows = ams_f2(df, "v", k=3).collect()
    assert [(r["z"], int(r["f2_est"])) for r in rows] == [(0, 0)] * 3
    some = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="odd"):
        ams_f2(some, "v", k=4)
    with pytest.raises(ValueError, match="not in frame"):
        ams_f2(some, "nope")
