"""Event-sequence analytics (kg/ops/events.py): hand-built funnels and
retention triangles with exact expected counts, chaining strictness,
and arg validation."""

from __future__ import annotations

from datetime import datetime

import pytest

from kg.ops import cohort_retention, funnel_steps

_SCHEMA = "user_id long, event_type string, ts timestamp"


def _ts(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


def test_funnel_hand_counts(spark):
    """u1 completes all 3 steps in order; u2 stalls after step 1; u3's
    step-2 event precedes step 1 (must NOT chain); u4 never signs up."""
    rows = [
        (1, "a", _ts(1)), (1, "b", _ts(2)), (1, "c", _ts(3)),
        (2, "a", _ts(1)),
        (3, "b", _ts(1)), (3, "a", _ts(2)),
        (4, "b", _ts(1)), (4, "c", _ts(2)),
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    got = {
        r["step"]: (r["event_type"], r["n_users"], r["pct_of_first"])
        for r in funnel_steps(ev, ["a", "b", "c"]).collect()
    }
    assert got == {
        1: ("a", 3, 1.0),
        2: ("b", 1, round(1 / 3, 6)),
        3: ("c", 1, round(1 / 3, 6)),
    }


def test_funnel_equal_timestamps_do_not_chain(spark):
    ev = spark.createDataFrame(
        [(1, "a", _ts(1)), (1, "b", _ts(1))], _SCHEMA
    )
    got = {r["step"]: r["n_users"] for r in funnel_steps(ev, ["a", "b"]).collect()}
    assert got == {1: 1, 2: 0}


def test_funnel_first_touch_uses_earliest_step1(spark):
    """Step-2 event between two step-1 events chains off the EARLIEST."""
    ev = spark.createDataFrame(
        [(1, "a", _ts(1)), (1, "b", _ts(2)), (1, "a", _ts(3))], _SCHEMA
    )
    got = {r["step"]: r["n_users"] for r in funnel_steps(ev, ["a", "b"]).collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_validates(spark):
    ev = spark.createDataFrame([(1, "a", _ts(1))], _SCHEMA)
    with pytest.raises(ValueError, match="at least one"):
        funnel_steps(ev, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(ev, ["a", "a"])


def test_retention_hand_triangle(spark):
    """Cohort day 1 = {u1, u2}: both active day 0, u1 again at offset 2;
    cohort day 2 = {u3}: active offsets 0 and 1.  Multiple events on
    one day count once."""
    rows = [
        (1, "x", _ts(1, 9)), (1, "x", _ts(1, 12)), (1, "x", _ts(3)),
        (2, "x", _ts(1)),
        (3, "x", _ts(2)), (3, "x", _ts(3)),
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    got = {
        (str(r["cohort_date"]), r["day_offset"]): (
            r["n_active"], r["cohort_size"], r["retention"]
        )
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 2): (1, 2, 0.5),
        ("2024-01-02", 0): (1, 1, 1.0),
        ("2024-01-02", 1): (1, 1, 1.0),
    }


def test_retention_max_offset_truncates_and_validates(spark):
    rows = [(1, "x", _ts(1)), (1, "x", _ts(10))]
    ev = spark.createDataFrame(rows, _SCHEMA)
    got = {r["day_offset"] for r in cohort_retention(ev, max_offset=5).collect()}
    assert got == {0}
    with pytest.raises(ValueError, match="max_offset"):
        cohort_retention(ev, max_offset=-1)
