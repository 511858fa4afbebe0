"""Event-sequence analytics over the events stream table.

The batch twins of the product-analytics queries every event sink
serves: ordered conversion funnels and cohort retention.  Both are pure
DataFrame chains (joins + hash aggs, zero Python, zero windows over the
corpus) with exact ANSI-SQL oracle twins — timestamps and day arithmetic
are integer-exact, so no fixed-point machinery is needed.

Reference parity note: the reference engine (syedhassaanahmed/
neo-to-cosmos) migrates into a sink that analytics consumers then
query; sequence analytics over an event table is part of this repo's
§2.1 new-engine surface (SURVEY.md), not a translation of any
reference file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kg.hints import maybe_broadcast


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel → one row per step:
    ``(step, event_type, n_users, pct_of_first)``.

    A user completes step k when an event of type ``steps[k]`` occurs
    STRICTLY after their earliest completion of step k−1 (the
    first-touch convention: t₁ = min ts of step 1, t_k = min ts of a
    step-k event with ts > t_{k−1}).  Equal timestamps do NOT chain —
    the strict ``>`` is deterministic and mirrored in the SQL twin.
    ``n_users`` counts users reaching step k; ``pct_of_first`` is the
    classic conversion rate vs step 1 (6dp; step 1 reads 1.0, and an
    empty funnel reports 0 users with NULL pct).

    Plan shape (100 TB): the event scan is filtered to the funnel's
    types ONCE (predicate pushed to the scan); each chaining round is
    one per-user min hash agg + one narrow equi-join on the user key —
    |steps|−1 joins over frames that only SHRINK (users still in the
    funnel), never a self-join of the raw stream, never a window over
    it.  The final report is |steps| constant-size aggs.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(ts_col).alias("t"),
    ).filter(F.col("et").isin(list(steps)))
    reached = (
        base.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_prev"))
    )
    per_step = [reached]
    for s in steps[1:]:
        nxt = (
            base.filter(F.col("et") == s)
            .join(per_step[-1], "u")
            .filter(F.col("t") > F.col("t_prev"))
            .groupBy("u")
            .agg(F.min("t").alias("t_prev"))
        )
        per_step.append(nxt)
    counts = None
    for i, (s, frame) in enumerate(zip(steps, per_step), start=1):
        row = frame.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("step"),
            F.lit(s).alias("event_type"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)
    first = per_step[0].agg(F.count("*").cast("long").alias("_n1"))
    return counts.crossJoin(F.broadcast(first)).select(
        "step",
        "event_type",
        "n_users",
        F.round(
            F.when(
                F.col("_n1") > 0,
                F.col("n_users").cast("double") / F.col("_n1").cast("double"),
            ),
            6,
        ).alias("pct_of_first"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention →
    ``(cohort_date, day_offset, n_active, cohort_size, retention)``:
    users are cohorted by the calendar date of their FIRST event; for
    each (cohort, day-offset) cell, ``n_active`` counts cohort members
    with any event exactly ``day_offset`` days after their cohort date
    and ``retention = n_active / cohort_size`` (6dp).  Offset 0 always
    reads 1.0 (everyone is active on their first day).  ``max_offset``
    optionally truncates the triangle (the dashboards' 30-day view).

    Plan shape (100 TB): one per-user min hash agg (the cohort dim),
    one (user, date) distinct over the scan, one equi-join of the
    distinct frame against the user-keyed cohort dim, and one hash agg
    on the (cohort, offset) cell — day arithmetic is pure integer
    `datediff`, so the twin is exact.  No windows, no Python.
    """
    if max_offset is not None and max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    firsts = (
        events.select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"))
        .groupBy("u")
        .agg(F.to_date(F.min("t")).alias("cohort_date"))
    )
    sizes = firsts.groupBy("cohort_date").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    active = (
        events.select(
            F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
        )
        .distinct()
        .join(firsts, "u")
        .select(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("day_offset"),
            "u",
        )
    )
    if max_offset is not None:
        active = active.filter(F.col("day_offset") <= max_offset)
    cells = active.groupBy("cohort_date", "day_offset").agg(
        F.count("*").cast("long").alias("n_active")
    )
    return cells.join(maybe_broadcast(sizes), "cohort_date").select(
        "cohort_date",
        "day_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    matched_ts_col: str = "matched_ts",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row picks the
    ``right`` row with the GREATEST ``ts_col`` ≤ the left row's
    timestamp, per ``key_col`` — the temporal point-in-time lookup
    (pandas ``merge_asof`` / kdb ``aj`` / Flink temporal join), the
    canonical "what was the last known state when this happened" query
    over event streams.  Output = every left column, plus the matched
    right timestamp as ``matched_ts_col`` and the requested right
    ``value_cols`` (all NULL when no right row precedes).
    ``tolerance_us`` optionally voids matches older than that many
    microseconds (integer-exact arithmetic, mirrored in the SQL twin).

    Plan shape (100 TB): NOT a range join.  Both sides are tagged and
    unioned, then ONE shuffle on the key and one per-key sort order by
    ``(ts, side)`` feeds a running ``last(marker, ignorenulls)`` window
    whose frame is rows-unbounded-preceding→current — the distributed
    sort-merge as-of, O(n log n) per key with O(1) carried state, no
    per-left candidate explosion (the naive left⋈right-on-``≤`` join is
    quadratic per key and is what the DuckDB twin does at oracle
    scale).  Right rows sort BEFORE left rows at equal timestamps, so
    ties match (inclusive).  The right side is first reduced to one row
    per (key, ts) with a deterministic lexicographic-min over the value
    struct — as-of joins over a right side with same-instant duplicates
    are otherwise nondeterministic in every engine.

    Reference parity note: §2.1 new-engine surface (SURVEY.md); the
    reference (syedhassaanahmed/neo-to-cosmos) has no temporal
    operators — this is part of the analytics surface a sink consumer
    expects, not a translation.
    """
    value_cols = list(value_cols or [])
    for c in (key_col, ts_col):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"key/ts column {c!r} must exist on both sides")
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"value_cols not in right frame: {missing}")
    clash = [c for c in [matched_ts_col, *value_cols] if c in left.columns]
    if clash:
        raise ValueError(
            f"output columns {clash} collide with left-side columns; "
            "rename the right-side payload first"
        )
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")

    k, t = F.col(key_col), F.col(ts_col)
    # one deterministic right row per (key, ts): lexicographic min over
    # the payload struct (same rule as the SQL twin's ORDER BY ... ASC)
    if value_cols:
        r1 = (
            right.where(t.isNotNull())
            .groupBy(key_col, ts_col)
            .agg(F.min(F.struct(*value_cols)).alias("_pay"))
        )
    else:
        r1 = (
            right.where(t.isNotNull())
            .select(key_col, ts_col)
            .distinct()
            .withColumn("_pay", F.struct(F.lit(1).alias("_one")))
        )
    r_tag = r1.select(
        k.alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_l"),
        F.struct(F.col(ts_col).alias("_rts"), F.col("_pay")).alias("_r"),
    )
    l_tag = left.select(
        k.alias("_k"),
        t.alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_tag.schema["_r"].dataType.simpleString()).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc_nulls_first(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r_tag.unionByName(l_tag)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    m_ts = F.col("_m._rts")
    if tolerance_us is not None:
        # cast("timestamp") accepts both TIMESTAMP and TIMESTAMP_NTZ
        # inputs (unix_micros rejects NTZ); any session-tz shift is the
        # same on both operands, so the difference is exact either way
        in_tol = (
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(m_ts.cast("timestamp"))
            <= tolerance_us
        )
        merged = merged.withColumn(
            "_m", F.when(m_ts.isNotNull() & in_tol, F.col("_m"))
        )
    out = [F.col(f"_l.`{c}`").alias(c) for c in left.columns]
    out.append(F.col("_m._rts").alias(matched_ts_col))
    out.extend(F.col(f"_m._pay.`{c}`").alias(c) for c in value_cols)
    return merged.select(*out)


def range_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str = "ts",
    key_col: str | None = None,
    bucket_s: int = 3600,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Time-range join: every ``left`` interval ``[start_col, end_col)``
    pairs with every ``right`` row whose ``ts_col`` falls inside it
    (half-open — standard window semantics), optionally ANDed with an
    equi-key.  Output = all left columns + all right columns.

    Plan shape (100 TB): Spark would execute the naive
    ``ts >= start AND ts < end`` theta-join as broadcast-nested-loop —
    quadratic and driver-killing.  This op instead maps TIME to an
    equi-join key: each interval explodes into the ``bucket_s``-second
    bucket ids it covers (``sequence`` — bounded by ``max_buckets``, an
    in-plan ``assert_true`` guard against unbounded intervals), each
    right row computes its single bucket id map-side, the join is a
    plain hash equi-join on (bucket [, key]), and the exact range
    predicate re-filters the candidates.  A right row lives in exactly
    ONE bucket, so no pair is emitted twice and no dedup pass is
    needed.  Pick ``bucket_s`` near the typical interval length: cost
    is O(|left| · len/bucket + candidates), the standard interval
    bucketization every streaming/temporal engine uses.  The DuckDB
    twin runs the naive inequality join — an independent formulation.

    Reference parity note: §2.1 new-engine surface (SURVEY.md); no
    temporal operators exist in the reference.
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be > 0, got {bucket_s}")
    if max_buckets <= 0:
        raise ValueError(f"max_buckets must be > 0, got {max_buckets}")
    for c, side, frame in (
        (start_col, "left", left),
        (end_col, "left", left),
        (ts_col, "right", right),
    ):
        if c not in frame.columns:
            raise ValueError(f"{side} frame is missing column {c!r}")
    if key_col is not None and (
        key_col not in left.columns or key_col not in right.columns
    ):
        raise ValueError(f"key_col {key_col!r} must exist on both sides")
    clash = [c for c in right.columns if c in left.columns and c != key_col]
    if clash:
        raise ValueError(
            f"right columns {clash} collide with left; rename them first"
        )

    bucket_us = int(bucket_s) * 1_000_000

    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    b0 = F.floor(_us(start_col) / bucket_us)
    # end is exclusive: the last covered bucket holds end_us - 1
    b1 = F.floor((_us(end_col) - 1) / bucket_us)
    n_buckets = b1 - b0 + 1
    guard = F.assert_true(
        n_buckets <= max_buckets,
        F.concat(
            F.lit(f"range_join: interval spans > {max_buckets} buckets "),
            F.lit(f"of {bucket_s}s — raise bucket_s or max_buckets"),
        ),
    )
    lx = left.where(
        _us(end_col) > _us(start_col)  # empty/inverted intervals drop
    ).withColumn(
        "_bucket",
        F.explode(F.when(guard.isNull(), F.sequence(b0, b1))),
    )
    rx = right.where(F.col(ts_col).isNotNull()).withColumn(
        "_bucket", F.floor(_us(ts_col) / bucket_us)
    )
    on = ["_bucket"] + ([key_col] if key_col else [])
    return (
        lx.join(rx, on=on)
        .where((_us(ts_col) >= _us(start_col)) & (_us(ts_col) < _us(end_col)))
        .drop("_bucket")
    )


def decayed_activity(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_s: int = 7 * 86400,
    max_buckets: int = 60,
) -> DataFrame:
    """Per-user exponentially time-decayed activity score →
    ``(user_col, n_events, decayed_count, decayed_value)`` — the
    standard recency-weighted engagement/contribution signal, anchored
    at the corpus-max timestamp so the result is a pure function of
    the input (no wall clock; deterministic, resumable).

    Decay discretization: weight = 2^−b where
    ``b = min(max_buckets, Δt_us div half_life_us)`` — whole
    half-lives, the classic power-of-two decay bucketing.  That makes
    every weight an EXACT binary integer ``1 << (max_buckets − b)``
    scaled by 2^max_buckets, so the weighted sums are decimal(38,0)
    integer arithmetic and the op carries a bit-exact SQL twin; floats
    appear only in the final division by 2^max_buckets (itself exactly
    representable) and the 6dp round.  ``value`` enters as integer
    cents (``floor(value·100)``, the library's money contract).

    Plan shape (100 TB): the anchor is a 1-row agg broadcast back via
    ``crossJoin(broadcast(...))`` — no driver action, the whole op is
    one job — then ONE map-side-combinable hash agg per user.  No
    window, no sort, no Python.

    Reference parity note: §2.1 new-engine surface (SURVEY.md); the
    reference (syedhassaanahmed/neo-to-cosmos) has no analytics
    operators.
    """
    if not (1 <= max_buckets <= 62):
        raise ValueError(f"max_buckets must be in [1, 62], got {max_buckets}")
    if half_life_s < 1:
        raise ValueError(f"half_life_s must be >= 1, got {half_life_s}")
    hl_us = half_life_s * 1_000_000
    dec = "decimal(38,0)"
    # cast("timestamp") accepts TIMESTAMP and TIMESTAMP_NTZ alike
    # (unix_micros rejects NTZ); anchor and event share any session-tz
    # shift, so the DIFFERENCE is tz-invariant
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    anchor = events.agg(F.max(us).alias("_anchor"))
    scale = float(1 << max_buckets)
    e = events.crossJoin(F.broadcast(anchor)).select(
        F.col(user_col),
        F.least(
            F.lit(max_buckets).cast("long"),
            F.expr(
                f"(_anchor - unix_micros(cast({ts_col} as timestamp)))"
                f" div {hl_us}"
            ),
        ).alias("_b"),
        F.floor(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    wfp = F.expr(f"shiftleft(1L, cast({max_buckets} - _b as int))")
    return (
        e.groupBy(user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(wfp.cast(dec)).alias("_wsum"),
            F.sum(F.col("_cents").cast(dec) * wfp.cast(dec)).alias("_vsum"),
        )
        .select(
            user_col,
            "n_events",
            F.round(F.col("_wsum").cast("double") / scale, 6).alias(
                "decayed_count"
            ),
            F.round(
                F.col("_vsum").cast("double") / scale / 100.0, 6
            ).alias("decayed_value"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences → ``(from_type, to_type, n, prob)``: how often event
    type A is immediately followed by type B within the same user's
    timeline, with the row-normalized transition probability — the
    journey-flow summary (and anomaly baseline) every product-
    analytics sink serves next after funnels and retention.

    Determinism: successor order is ``(ts, id_col)`` — the unique id
    breaks timestamp ties, so the lead() pairing is total-ordered and
    the twin matches exactly; ``prob`` is one IEEE division rounded to
    6 dp.

    Plan shape (100 TB): ONE shuffle on ``user_col`` (the lead
    window), one hash agg to the |types|² matrix, and the normalizing
    row totals as a window over that matrix-sized frame — never over
    the corpus.
    """
    for c in (user_col, type_col, ts_col, id_col):
        if c not in events.columns:
            raise ValueError(f"column {c!r} not in frame")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("_to", F.lead(type_col).over(w))
        .filter(F.col("_to").isNotNull())
    )
    counts = pairs.groupBy(
        F.col(type_col).alias("from_type"), F.col("_to").alias("to_type")
    ).agg(F.count("*").cast("long").alias("n"))
    row = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(row).cast("double"),
            6,
        ).alias("prob"),
    )


def inter_event_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-event-time statistics →
    ``(user_col, n_gaps, mean_gap_s, std_gap_s, burstiness)``: the
    Goh–Barabási burstiness ``B = (σ−μ)/(σ+μ)`` of the gaps between a
    user's consecutive events — B→−1 periodic (bot-like cadence),
    B≈0 Poisson, B→+1 bursty (human sessions).  The behavioral
    fingerprint run next to :func:`event_transitions` for anomaly /
    bot screening.

    Exactness: gaps are exact integer microseconds (``unix_micros`` /
    ``epoch_us``); per-user moments (n, Σg, Σg²) accumulate in
    decimal(38,0); B is computed n-free as ``(r−s)/(r+s)`` with
    ``r = sqrt(nq − s²)`` — one sqrt of an exactly-derived value and
    one division, so every float step is a single identical IEEE op
    on any engine; outputs round to 6 dp.  Users with fewer than two
    events have no gap and emit no row; an all-equal-timestamp user
    (s = 0) yields NULL burstiness rather than 0/0.

    Plan shape: ONE shuffle on ``user_col`` (the lag window — shared
    shape with :func:`event_transitions`), one hash agg to user-sized
    output, no Python.
    """
    for c in (user_col, ts_col, id_col):
        if c not in events.columns:
            raise ValueError(f"column {c!r} not in frame")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # cast first: unix_micros rejects NTZ; session tz is UTC and any
    # constant shift cancels in the gap difference anyway
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(user_col, ts_col, id_col)
        .withColumn("_g", us - F.lag(us).over(w))
        .filter(F.col("_g").isNotNull())
    )
    dec = "decimal(38,0)"
    m = gaps.groupBy(user_col).agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum(F.col("_g").cast(dec)).alias("_s"),
        F.sum((F.col("_g").cast(dec) * F.col("_g").cast(dec))).alias("_q"),
    )
    n_d = F.col("n_gaps").cast("double")
    s_d = F.col("_s").cast("double")
    r = F.sqrt(
        (
            F.col("n_gaps").cast(dec) * F.col("_q")
            - F.col("_s") * F.col("_s")
        ).cast("double")
    )
    return m.select(
        user_col,
        "n_gaps",
        F.round(s_d / (n_d * F.lit(1e6)), 6).alias("mean_gap_s"),
        F.round(r / (n_d * F.lit(1e6)), 6).alias("std_gap_s"),
        F.when(
            (F.col("_s") > 0),
            F.round((r - s_d) / (r + s_d), 6),
        ).alias("burstiness"),
    )
