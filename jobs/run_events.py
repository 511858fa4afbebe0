"""spark-submit event-analytics entry point over an events table.

    spark-submit --py-files dist/kg.zip jobs/run_events.py \
        --input /path/to/events --query funnel --steps signup,view,click \
        [--output /path/to/result] [--show 20]

The temporal-analytics face of the engine (``kg/ops/events.py``): the
queries a product/analytics consumer runs against the event stream the
pipeline also ingests (``--stream`` in jobs/run_pipeline.py).  Each
``--query`` dispatches to the corresponding operator and either writes
parquet (``--output``) or prints the first ``--show`` rows
deterministically ordered.

Queries:

* ``funnel``      — ordered conversion funnel (``--steps a,b,c``).
* ``retention``   — cohort retention triangle (``--max-offset``).
* ``asof``        — backward-inclusive as-of join: each ``--left-type``
                    event picks the same user's most recent
                    ``--right-type`` event at-or-before it
                    (``--tolerance-s`` voids stale matches).
* ``range-join``  — per ``--left-type`` event, count + value-sum of the
                    same user's ``--right-type`` events within the
                    following ``--window-s`` seconds (bucketized
                    equi-join, never a theta join).
* ``decayed``     — per-user exponentially time-decayed activity score
                    (``--half-life-s``, anchored at the corpus-max
                    timestamp; power-of-two bucketed weights, exact
                    integer sums).
* ``transitions`` — first-order Markov transition matrix over per-user
                    event sequences (lead window ordered by
                    (ts, ``--id-col``); row-normalized probabilities).
* ``burstiness``  — per-user inter-event-gap stats + Goh–Barabási
                    burstiness (exact integer microsecond moments).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "funnel", "retention", "asof", "range-join", "decayed", "transitions",
    "burstiness",
)


def main(argv: list[str] | None = None, spark=None) -> None:
    """``spark=None`` builds and owns a session (spark-submit path);
    a caller-supplied session (tests) is reused and NOT stopped."""
    ap = argparse.ArgumentParser(description="kg event analytics")
    ap.add_argument("--input", required=True, help="events parquet path")
    ap.add_argument("--query", required=True, choices=QUERIES)
    ap.add_argument("--steps", default=None,
                    help="comma-separated ordered event types (funnel)")
    ap.add_argument("--max-offset", type=int, default=None,
                    help="truncate the retention triangle at this many "
                         "days (retention)")
    ap.add_argument("--left-type", default=None,
                    help="anchor event type (asof/range-join)")
    ap.add_argument("--right-type", default=None,
                    help="matched event type (asof/range-join)")
    ap.add_argument("--tolerance-s", type=int, default=None,
                    help="void as-of matches older than this many "
                         "seconds (asof)")
    ap.add_argument("--window-s", type=int, default=1800,
                    help="half-open window length in seconds "
                         "(range-join)")
    ap.add_argument("--bucket-s", type=int, default=None,
                    help="equi-join bucket width in seconds "
                         "(range-join; default window-s/3, min 1)")
    ap.add_argument("--half-life-s", type=int, default=None,
                    help="decay half-life in seconds (decayed; "
                         "default 7 days)")
    ap.add_argument("--user-col", default="user_id")
    ap.add_argument("--type-col", default="event_type")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--id-col", default="event_id")
    ap.add_argument("--value-col", default="value")
    ap.add_argument("--output", default=None,
                    help="write result parquet here instead of printing")
    ap.add_argument("--show", type=int, default=20,
                    help="rows to print when --output is not given")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    if args.query == "funnel" and not args.steps:
        raise SystemExit("--steps is required for funnel")
    if args.query in ("asof", "range-join") and not (
        args.left_type and args.right_type
    ):
        raise SystemExit(
            f"--left-type and --right-type are required for {args.query}"
        )
    for flag, val, owners in (
        ("--steps", args.steps, ("funnel",)),
        ("--left-type", args.left_type, ("asof", "range-join")),
        ("--tolerance-s", args.tolerance_s, ("asof",)),
        ("--half-life-s", args.half_life_s, ("decayed",)),
    ):
        if val is not None and args.query not in owners:
            raise SystemExit(
                f"{flag} applies to {'/'.join(owners)}, not {args.query}"
            )

    from pyspark.sql import functions as F

    from kg.ops import (
        asof_join,
        cohort_retention,
        decayed_activity,
        event_transitions,
        funnel_steps,
        inter_event_stats,
        range_join,
    )

    own_session = spark is None
    if own_session:
        from kg.session import get_spark

        spark = get_spark(
            "kg-events",
            shuffle_partitions=args.shuffle_partitions,
        )
    try:
        ev = spark.read.parquet(args.input)
        u, et, ts = args.user_col, args.type_col, args.ts_col

        if args.query == "funnel":
            steps = [s.strip() for s in args.steps.split(",") if s.strip()]
            res = funnel_steps(ev, steps, user_col=u, type_col=et, ts_col=ts)
            order = ["step"]
        elif args.query == "retention":
            res = cohort_retention(
                ev, user_col=u, ts_col=ts, max_offset=args.max_offset
            )
            order = ["cohort_date", "day_offset"]
        elif args.query == "decayed":
            res = decayed_activity(
                ev,
                user_col=u,
                ts_col=ts,
                value_col=args.value_col,
                half_life_s=args.half_life_s or 7 * 86400,
            )
            order = [u]
        elif args.query == "transitions":
            res = event_transitions(
                ev, user_col=u, type_col=et, ts_col=ts, id_col=args.id_col
            )
            order = ["from_type", "to_type"]
        elif args.query == "burstiness":
            res = inter_event_stats(
                ev, user_col=u, ts_col=ts, id_col=args.id_col
            )
            order = [u]
        elif args.query == "asof":
            left = ev.filter(F.col(et) == args.left_type).select(
                F.col(args.id_col).alias("anchor_id"), u, ts
            )
            right = ev.filter(F.col(et) == args.right_type).select(
                u,
                ts,
                F.col(args.id_col).alias("matched_id"),
                F.col(args.value_col).alias("matched_value"),
            )
            res = asof_join(
                left,
                right,
                key_col=u,
                ts_col=ts,
                value_cols=["matched_id", "matched_value"],
                tolerance_us=(
                    None
                    if args.tolerance_s is None
                    else args.tolerance_s * 1_000_000
                ),
            )
            order = ["anchor_id"]
        else:  # range-join
            left = ev.filter(F.col(et) == args.left_type).select(
                F.col(args.id_col).alias("anchor_id"),
                u,
                F.col(ts).alias("t0"),
                (
                    F.col(ts)
                    + F.expr(f"INTERVAL {args.window_s} SECONDS")
                ).alias("t1"),
            )
            right = ev.filter(F.col(et) == args.right_type).select(
                u, ts, F.col(args.value_col).alias("matched_value")
            )
            bucket_s = args.bucket_s or max(1, args.window_s // 3)
            pairs = range_join(
                left, right, "t0", "t1",
                ts_col=ts, key_col=u, bucket_s=bucket_s,
            )
            agg = pairs.groupBy("anchor_id").agg(
                F.count("*").cast("long").alias("n_matches"),
                F.round(F.sum("matched_value"), 6).alias("sum_value"),
            )
            res = left.join(agg, "anchor_id", "left").select(
                "anchor_id",
                u,
                F.col("t0").alias(ts),
                F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
                F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            )
            order = ["anchor_id"]

        if args.output:
            res.write.mode("overwrite").parquet(args.output)
            print(f"wrote {args.output}")
        else:
            res.orderBy(*order).show(args.show, truncate=False)
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    main()
