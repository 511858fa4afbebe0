"""MinCount distinct sketch (kg/ops/sketch.py): integer-rule replica,
duplicate invariance, accuracy bound, validation."""

from __future__ import annotations

import hashlib

import pytest

from kg.ops.sketch import DOMAIN, mincount_distinct


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
