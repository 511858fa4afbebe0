"""End-to-end test of the event-analytics CLI (jobs/run_events.py)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

import jobs.run_events as cli


def _t(sec):
    return datetime(2024, 1, 1, 0, 0, sec)


_EVENTS = [
    (1, 10, "signup", _t(0), 1.0),
    (2, 10, "click", _t(5), 2.5),
    (3, 10, "purchase", _t(9), 9.0),
    (4, 11, "signup", _t(1), 1.0),
    (5, 11, "purchase", _t(2), 4.0),   # no click before -> asof NULL
    (6, 10, "click", _t(20), 0.5),     # after the purchase: not matched
]


@pytest.fixture()
def events_path(spark, tmp_path):
    p = str(tmp_path / "events")
    spark.createDataFrame(
        _EVENTS,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.mode("overwrite").parquet(p)
    return p


def _run(spark, events_path, tmp_path, *argv):
    out = str(tmp_path / "result")
    cli.main(
        ["--input", events_path, "--output", out, *argv], spark=spark
    )
    return spark.read.parquet(out)


def test_cli_funnel(spark, events_path, tmp_path):
    df = _run(
        spark, events_path, tmp_path,
        "--query", "funnel", "--steps", "signup,click,purchase",
    )
    got = {r["step"]: r["n_users"] for r in df.collect()}
    assert got == {1: 2, 2: 1, 3: 1}


def test_cli_asof(spark, events_path, tmp_path):
    df = _run(
        spark, events_path, tmp_path,
        "--query", "asof", "--left-type", "purchase",
        "--right-type", "click",
    )
    got = {r["anchor_id"]: r["matched_id"] for r in df.collect()}
    assert got == {3: 2, 5: None}


def test_cli_range_join(spark, events_path, tmp_path):
    df = _run(
        spark, events_path, tmp_path,
        "--query", "range-join", "--left-type", "signup",
        "--right-type", "click", "--window-s", "10",
    )
    got = {r["anchor_id"]: (r["n_matches"], r["sum_value"])
           for r in df.collect()}
    assert got == {1: (1, 2.5), 4: (0, 0.0)}


def test_cli_retention_and_guards(spark, events_path, tmp_path):
    df = _run(spark, events_path, tmp_path, "--query", "retention")
    assert df.count() == 1  # single-day data -> one (cohort, 0) cell
    with pytest.raises(SystemExit, match="--steps"):
        cli.main(["--input", events_path, "--query", "funnel"], spark=spark)
    with pytest.raises(SystemExit, match="left-type"):
        cli.main(["--input", events_path, "--query", "asof"], spark=spark)
    with pytest.raises(SystemExit, match="applies to"):
        cli.main(
            ["--input", events_path, "--query", "retention",
             "--steps", "a,b"],
            spark=spark,
        )


def test_cli_decayed(spark, events_path, tmp_path):
    """--query decayed: power-of-two half-life weights, corpus-max
    anchor.  Anchor ts is _t(20); half-life 10 s → ages 20,15,11,19,18,0
    → buckets 2,1,1,1,1,0."""
    df = _run(
        spark, events_path, tmp_path,
        "--query", "decayed", "--half-life-s", "10",
    )
    got = {
        r["user_id"]: (r["n_events"], r["decayed_count"])
        for r in df.collect()
    }
    # user 10: buckets 2,1,1,0 → 0.25+0.5+0.5+1.0; user 11: 1,1 → 1.0
    assert got == {10: (4, 2.25), 11: (2, 1.0)}


def test_cli_decayed_flag_ownership(spark, events_path, tmp_path):
    with pytest.raises(SystemExit, match="half-life-s"):
        _run(
            spark, events_path, tmp_path,
            "--query", "funnel", "--steps", "a,b",
            "--half-life-s", "10",
        )


def test_cli_transitions(spark, events_path, tmp_path):
    got = _run(spark, events_path, tmp_path, "--query", "transitions")
    rows = {(r["from_type"], r["to_type"]): (r["n"], r["prob"])
            for r in got.collect()}
    # user 10: signup->click->purchase->click; user 11: signup->purchase
    assert rows == {
        ("signup", "click"): (1, 0.5),
        ("signup", "purchase"): (1, 0.5),
        ("click", "purchase"): (1, 1.0),
        ("purchase", "click"): (1, 1.0),
    }


def test_cli_burstiness(spark, events_path, tmp_path):
    got = {r["user_id"]: r for r in _run(
        spark, events_path, tmp_path, "--query", "burstiness"
    ).collect()}
    # user 10 has 4 events (3 gaps), user 11 has 2 (1 gap)
    assert got[10]["n_gaps"] == 3 and got[11]["n_gaps"] == 1
    assert got[11]["mean_gap_s"] == 1.0
