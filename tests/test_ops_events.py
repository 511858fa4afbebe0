"""Event-sequence analytics (kg/ops/events.py): hand-built funnels and
retention triangles with exact expected counts, chaining strictness,
and arg validation."""

from __future__ import annotations

from datetime import datetime, timedelta

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


def _tus(sec, us=0):
    return datetime(2024, 1, 1, 0, 0, sec, us)


_L_SCHEMA = "user_id long, ts timestamp, tag string"
_R_SCHEMA = "user_id long, ts timestamp, click_id long, click_value double"


def test_asof_hand_matches(spark):
    """p0 matches the equal-instant right row (inclusive tie); p1 skips
    the later right row and takes the greatest preceding one; p2's user
    has no right rows at all -> NULLs; u3's right row never surfaces."""
    from kg.ops import asof_join

    L = spark.createDataFrame(
        [(1, _tus(10), "p1"), (1, _tus(3), "p0"), (2, _tus(5), "p2")],
        _L_SCHEMA,
    )
    R = spark.createDataFrame(
        [(1, _tus(3), 100, 0.5), (1, _tus(7), 200, 0.7),
         (1, _tus(12), 300, 0.9), (3, _tus(1), 400, 0.1)],
        _R_SCHEMA,
    )
    got = {
        r["tag"]: (r["matched_ts"], r["click_id"], r["click_value"])
        for r in asof_join(
            L, R, value_cols=["click_id", "click_value"]
        ).collect()
    }
    assert got == {
        "p0": (_tus(3), 100, 0.5),
        "p1": (_tus(7), 200, 0.7),
        "p2": (None, None, None),
    }


def test_asof_tolerance_voids_stale_matches(spark):
    from kg.ops import asof_join

    L = spark.createDataFrame([(1, _tus(10), "p")], _L_SCHEMA)
    R = spark.createDataFrame([(1, _tus(3), 1, 1.0)], _R_SCHEMA)
    fresh = asof_join(
        L, R, value_cols=["click_id"], tolerance_us=7_000_000
    ).collect()[0]
    assert fresh["click_id"] == 1  # exactly at the tolerance edge: kept
    stale = asof_join(
        L, R, value_cols=["click_id"], tolerance_us=6_999_999
    ).collect()[0]
    assert stale["matched_ts"] is None and stale["click_id"] is None


def test_asof_same_instant_right_dupes_resolve_lexicographically(spark):
    """Two right rows at the same (key, ts): the payload-struct min wins
    deterministically (click_id 5 < 9)."""
    from kg.ops import asof_join

    L = spark.createDataFrame([(1, _tus(5), "p")], _L_SCHEMA)
    R = spark.createDataFrame(
        [(1, _tus(5), 9, 0.1), (1, _tus(5), 5, 0.9)], _R_SCHEMA
    )
    row = asof_join(L, R, value_cols=["click_id", "click_value"]).collect()[0]
    assert (row["click_id"], row["click_value"]) == (5, 0.9)


def test_asof_left_columns_pass_through_and_validation(spark):
    from kg.ops import asof_join

    L = spark.createDataFrame([(1, _tus(5), "p")], _L_SCHEMA)
    R = spark.createDataFrame([(1, _tus(2), 1, 1.0)], _R_SCHEMA)
    out = asof_join(L, R, value_cols=["click_id"])
    assert out.columns == ["user_id", "ts", "tag", "matched_ts", "click_id"]
    with pytest.raises(ValueError, match="value_cols"):
        asof_join(L, R, value_cols=["nope"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(L, R.withColumnRenamed("click_id", "tag"), value_cols=["tag"])
    with pytest.raises(ValueError, match="tolerance_us"):
        asof_join(L, R, value_cols=["click_id"], tolerance_us=-1)
    with pytest.raises(ValueError, match="must exist"):
        asof_join(L.withColumnRenamed("user_id", "u"), R)


def test_asof_no_value_cols_reports_timestamp_only(spark):
    from kg.ops import asof_join

    L = spark.createDataFrame([(1, _tus(5), "p")], _L_SCHEMA)
    R = spark.createDataFrame([(1, _tus(2), 1, 1.0)], _R_SCHEMA)
    row = asof_join(L, R).collect()[0]
    assert row["matched_ts"] == _tus(2)
    assert "click_id" not in asof_join(L, R).columns


def test_range_join_hand_pairs(spark):
    """Half-open [start, end): start-instant matches, end-instant does
    not; key mismatch excluded; interval longer than one bucket still
    finds rows in every covered bucket exactly once."""
    from kg.ops import range_join

    L = spark.createDataFrame(
        [(1, _tus(0), datetime(2024, 1, 1, 0, 30), "w1")],
        "user_id long, t0 timestamp, t1 timestamp, wtag string",
    )
    R = spark.createDataFrame(
        [(1, _tus(0), "at-start"), (1, datetime(2024, 1, 1, 0, 15), "mid"),
         (1, datetime(2024, 1, 1, 0, 30), "at-end"), (2, _tus(5), "other")],
        "user_id long, ts timestamp, rtag string",
    )
    got = sorted(
        r["rtag"]
        for r in range_join(
            L, R, "t0", "t1", key_col="user_id", bucket_s=600
        ).collect()
    )
    assert got == ["at-start", "mid"]  # each exactly once despite 3 buckets


def test_range_join_unkeyed_is_global(spark):
    from kg.ops import range_join

    L = spark.createDataFrame(
        [(_tus(0), _tus(10), "w")], "t0 timestamp, t1 timestamp, wtag string"
    )
    R = spark.createDataFrame(
        [(99, _tus(5), "any-key")], "rid long, ts timestamp, rtag string"
    )
    assert range_join(L, R, "t0", "t1", bucket_s=60).count() == 1


def test_range_join_guard_and_validation(spark):
    from kg.ops import range_join

    L = spark.createDataFrame(
        [(_tus(0), datetime(2024, 1, 2), "w")],
        "t0 timestamp, t1 timestamp, wtag string",
    )
    R = spark.createDataFrame([(_tus(5), "r")], "ts timestamp, rtag string")
    with pytest.raises(Exception, match="buckets"):
        range_join(L, R, "t0", "t1", bucket_s=1, max_buckets=10).count()
    with pytest.raises(ValueError, match="bucket_s"):
        range_join(L, R, "t0", "t1", bucket_s=0)
    with pytest.raises(ValueError, match="missing column"):
        range_join(L, R, "t0", "nope")
    with pytest.raises(ValueError, match="collide"):
        range_join(L, R.withColumnRenamed("rtag", "wtag"), "t0", "t1")
    # empty/inverted intervals produce nothing rather than exploding
    Li = spark.createDataFrame(
        [(_tus(10), _tus(10), "empty"), (_tus(10), _tus(5), "inverted")],
        "t0 timestamp, t1 timestamp, wtag string",
    )
    assert range_join(Li, R, "t0", "t1", bucket_s=60).count() == 0


def test_decayed_activity_hand_values(spark):
    """Weights are 2^-floor(age/half_life), anchored at max ts."""
    from kg.ops.events import decayed_activity

    # half_life_s=10: ages 0s, 10s, 25s → buckets 0, 1, 2 →
    # weights 1, 0.5, 0.25
    def _t(sec):
        return datetime(2024, 1, 1) + timedelta(seconds=sec)

    rows = [
        (1, _t(25), 1.00),   # age 25s → bucket 2 → 0.25, cents 100
        (1, _t(40), 2.00),   # age 10s → bucket 1 → 0.5,  cents 200
        (1, _t(50), 4.00),   # age  0s → bucket 0 → 1.0,  cents 400
        (2, _t(50), 10.00),  # age  0s → bucket 0 → 1.0,  cents 1000
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["user_id"]: (r["n_events"], r["decayed_count"], r["decayed_value"])
        for r in decayed_activity(df, half_life_s=10).collect()
    }
    assert got == {
        1: (3, 1.75, 0.25 * 1.0 + 0.5 * 2.0 + 1.0 * 4.0),
        2: (1, 1.0, 10.0),
    }


def test_decayed_activity_bucket_cap_and_validation(spark):
    from kg.ops.events import decayed_activity

    # age 1000s at half_life 1s → bucket capped at max_buckets → the
    # weight floors to 2^-max_buckets, never a negative shift
    rows = [
        (1, datetime(2024, 1, 1), 1.0),
        (1, datetime(2024, 1, 1) + timedelta(seconds=1000), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = decayed_activity(df, half_life_s=1, max_buckets=10).collect()[0]
    assert r["n_events"] == 2
    assert r["decayed_count"] == round(1.0 + 2.0 ** -10, 6)
    with pytest.raises(ValueError, match="max_buckets"):
        decayed_activity(df, max_buckets=63)
    with pytest.raises(ValueError, match="half_life_s"):
        decayed_activity(df, half_life_s=0)


def test_event_transitions_hand_values(spark):
    """lead pairing per user ordered by (ts, event_id); ties broken by
    id; probs row-normalized."""
    from datetime import datetime

    from kg.ops.events import event_transitions

    t = datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> view  (ts tie on the last two,
        # event_id orders them)
        (1, t, 1, "view"),
        (2, datetime(2024, 1, 2), 1, "click"),
        (3, datetime(2024, 1, 2), 1, "view"),
        # user 2: view -> view
        (4, t, 2, "view"),
        (5, datetime(2024, 1, 3), 2, "view"),
        # user 3: single event, no transition
        (6, t, 3, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {(r["from_type"], r["to_type"]): (r["n"], r["prob"])
           for r in event_transitions(df).collect()}
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_event_transitions_validation(spark):
    import pytest as _pt

    from kg.ops.events import event_transitions

    df = spark.createDataFrame([(1,)], "event_id long")
    with _pt.raises(ValueError, match="not in frame"):
        event_transitions(df)


def test_inter_event_stats_hand_values(spark):
    """Periodic user -> burstiness -1 (sigma=0); moments recomputed
    independently for an irregular user."""
    import math
    from datetime import datetime, timedelta

    from kg.ops.events import inter_event_stats

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: perfectly periodic, 10 s apart -> sigma 0, B = -1
    for i in range(4):
        rows.append((i, 1, "e", t0 + timedelta(seconds=10 * i)))
    # user 2: gaps 1 s and 9 s
    rows += [(10, 2, "e", t0), (11, 2, "e", t0 + timedelta(seconds=1)),
             (12, 2, "e", t0 + timedelta(seconds=10))]
    # user 3: single event -> no row
    rows.append((20, 3, "e", t0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {r["user_id"]: r for r in inter_event_stats(df).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["n_gaps"], got[1]["mean_gap_s"]) == (3, 10.0)
    assert got[1]["std_gap_s"] == 0.0 and got[1]["burstiness"] == -1.0
    n, s, q = 2, (1 + 9) * 10**6, (1**2 + 9**2) * 10**12
    r = math.sqrt(n * q - s * s)
    assert got[2]["n_gaps"] == 2
    assert got[2]["mean_gap_s"] == round(s / (n * 1e6), 6)
    assert got[2]["std_gap_s"] == round(r / (n * 1e6), 6)
    assert got[2]["burstiness"] == round((r - s) / (r + s), 6)


def test_inter_event_stats_zero_gaps_and_validation(spark):
    from datetime import datetime

    import pytest as _pt

    from kg.ops.events import inter_event_stats

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, "e", t), (2, 1, "e", t)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    row = inter_event_stats(df).collect()[0]
    assert row["n_gaps"] == 1 and row["mean_gap_s"] == 0.0
    assert row["burstiness"] is None  # s = 0 -> guarded, no 0/0
    with _pt.raises(ValueError, match="not in frame"):
        inter_event_stats(df.drop("event_id"))
