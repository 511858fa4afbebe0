"""Exact closed-form statistics: per-group OLS simple linear regression.

Why closed-form at 100 TB: OLS on one regressor needs only the five
moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — ONE map-side-combinable hash
aggregation over the corpus, no iteration, no solver, no Python.  The
sums are taken over INTEGER-valued inputs in decimal(38,0) (DuckDB
HUGEINT), so every intermediate is exact on both engines; floats appear
only in the final slope/intercept/r² divisions, computed from identical
exact integers via identical IEEE operations and rounded to 6dp — the
library's standard cross-engine float contract.

Reference parity note: §2.1 new-engine surface (SURVEY.md); the
reference (syedhassaanahmed/neo-to-cosmos) has no analytics operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,0)"


def ols_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple OLS ``y = slope·x + intercept`` →
    ``(group_col, n, slope, intercept, r2)``.

    ``x_col``/``y_col`` must already be INTEGER-valued (the caller
    fixes units — e.g. money as cents); they are cast to decimal(38,0)
    before summing, so the moment sums are exact at any row count.
    Closed forms (all-integer numerators/denominators):

    * ``slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``
    * ``intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)``
    * ``r²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))``

    r²'s squared terms would overflow decimal(38,0) at extreme scale,
    so each exact integer term converts to double FIRST (int→double
    rounding is IEEE-identical across engines for identical integers)
    and the quotient rounds to 6dp.  Zero-variance groups (constant x,
    or constant y for r²) yield NULL — never a division blow-up.
    """
    for c in (group_col, x_col, y_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in frame")
    # rows with a NULL x or y are excluded ENTIRELY (ADVICE r5): the
    # moment sums skip them anyway (SQL sum ignores NULL), so counting
    # them in n would silently bias slope/intercept/r² with moments
    # inconsistent with n.  n therefore counts exactly the rows that
    # contribute to every sum.
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x = F.col(x_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    agg = df.groupBy(group_col).agg(
        F.count("*").cast(_DEC).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).alias(
        "_num"
    )
    den_x = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).alias(
        "_dx"
    )
    den_y = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).alias(
        "_dy"
    )
    inum = (F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")).alias(
        "_inum"
    )
    t = agg.select(group_col, "_n", num, den_x, den_y, inum)

    def _d(c):
        return F.col(c).cast("double")

    nz = F.col("_dx") != 0
    return t.select(
        group_col,
        F.col("_n").cast("long").alias("n"),
        F.round(F.when(nz, _d("_num") / _d("_dx")), 6).alias("slope"),
        F.round(F.when(nz, _d("_inum") / _d("_dx")), 6).alias("intercept"),
        F.round(
            F.when(
                nz & (F.col("_dy") != 0),
                (_d("_num") * _d("_num")) / (_d("_dx") * _d("_dy")),
            ),
            6,
        ).alias("r2"),
    )


def skew_profile(
    df: DataFrame,
    key_col: str,
    top: int = 5,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic → the ``top`` heaviest keys with
    corpus-level context: ``(key, n, rank, n_rows, n_keys, skew_fp)``
    where ``skew_fp = ⌊10⁶ · max_key_count / avg_key_count⌋`` — the
    hot-partition multiplier a shuffle on this key would suffer (1.0 ⇒
    perfectly balanced; the pipeline's own repo-key measurement read
    20.65× before salting, BENCH/BASELINE.md).  Run this BEFORE keying
    a 100 TB join: it is one hash agg + one constant-size reduce + one
    top-k over the (small) key-count frame, and its verdict decides
    between a plain equi-join, a broadcast, or salting.

    ``skew_fp`` is exact integer arithmetic (decimal sums, truncating
    division), so the SQL twin matches bit-for-bit; key is reported as
    string (the profile is a diagnostic, not a join input).
    """
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").alias("n")
    )
    stats = counts.agg(
        F.sum(F.col("n").cast(_DEC)).alias("_rows"),
        F.count("*").cast(_DEC).alias("_keys"),
        F.max("n").cast(_DEC).alias("_max"),
    ).select(
        F.col("_rows").cast("long").alias("n_rows"),
        F.col("_keys").cast("long").alias("n_keys"),
        # max/avg = max·n_keys/n_rows, all-integer before one div
        F.expr("(_max * _keys * 1000000) div _rows")
        .cast("long")
        .alias("skew_fp"),
    )
    # top-k via sort-limit (TakeOrderedAndProject: per-partition partial
    # top-k, then one merge) — never a global window over the key-count
    # frame, which is O(n_keys) and can itself be huge; the rank window
    # runs over the <= `top` survivors only
    order = [F.desc("n"), F.asc("key")]
    topk = (
        counts.orderBy(*order)
        .limit(top)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)).cast("int"))
    )
    return topk.crossJoin(F.broadcast(stats)).select(
        "key", "n", "rank", "n_rows", "n_keys", "skew_fp"
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Exact per-group quantiles of an integer column via the
    histogram-CDF formulation → ``(group_col, n, <one column per q>)``.

    Quantile semantics are type-1 nearest-rank (the value at rank
    ``ceil(q·n)``) over the NON-NULL values — NULLs are excluded and
    ``n`` counts non-NULL rows only — with each ``q`` given as an exact
    fraction
    ``(name, num, den)`` so the target rank is pure integer arithmetic
    — ``(n·num + den − 1) div den`` — and the op carries a bit-exact
    SQL twin (no float quantile, no interpolation-mode mismatch
    between engines).

    Plan shape (100 TB): the corpus collapses FIRST into a
    ``(group, value, count)`` histogram via one map-side-combinable
    hash agg — for discrete-valued columns (lengths, token counts,
    scores in fixed-point) that frame is |groups|×|distinct values|,
    orders of magnitude smaller than the corpus — and the rank windows
    run over the histogram only.  This is deliberately NOT a per-group
    sort of the raw rows (``percentile``/``sort`` over 100 TB) and NOT
    ``approx_percentile`` (not exact, so not oracle-checkable); it is
    the classic two-level CDF quantile every distributed engine uses
    for bounded-cardinality domains.  All requested quantiles come out
    of ONE final agg — adding a q adds a conditional min, not a pass.

    Reference parity note: §2.1 new-engine surface (SURVEY.md); the
    reference (syedhassaanahmed/neo-to-cosmos) has no analytics
    operators.
    """
    from pyspark.sql import Window

    if qs is None:
        qs = [
            ("p25", 1, 4),
            ("p50", 1, 2),
            ("p75", 3, 4),
            ("p90", 9, 10),
            ("p99", 99, 100),
        ]
    for name, num, den in qs:
        if not (0 < num <= den):
            raise ValueError(f"quantile {name}: need 0 < num <= den")
    # NULL values are excluded BEFORE the histogram (ADVICE r5): they
    # sort first in Spark's ascending cumulative window but can never be
    # selected by min(when(_cum >= target)), so leaving them in silently
    # shifted every quantile low (and DuckDB sorts NULLs last, breaking
    # the bit-exact twin on null-bearing input).  ``n`` therefore counts
    # non-NULL values only — documented semantics on both engines.
    df = df.filter(F.col(value_col).isNotNull())
    hist = df.groupBy(
        group_col, F.col(value_col).cast("long").alias("_value")
    ).agg(F.count("*").alias("_n"))
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = hist.select(
        group_col,
        "_value",
        "_n",
        F.sum("_n").over(w_cum).alias("_cum"),
        F.sum("_n").over(w_tot).alias("_tot"),
    )
    aggs = [F.sum("_n").cast("long").alias("n")]
    for name, num, den in qs:
        target = F.expr(f"(_tot * {num} + {den - 1}) div {den}")
        aggs.append(
            F.min(F.when(F.col("_cum") >= target, F.col("_value"))).alias(name)
        )
    return cdf.groupBy(group_col).agg(*aggs)


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Population Stability Index between two snapshots of a column →
    ONE row ``(n_a, n_b, n_bins, psi_fp, psi)`` — the standard drift
    gate between corpus drops (PSI < 0.1 stable, 0.1–0.25 moderate,
    > 0.25 investigate before training on the new snapshot).

    Bins: deterministic top-60-bit md5 hash buckets (`pmod(md5_60(v),
    n_buckets)`; NULLs get their own bin −1), so arbitrary-cardinality
    columns bound to ``n_buckets + 1`` bins and the binning is
    engine-portable.  Laplace-smoothed shares ``p = (c_a+1)/(N_a+B)``,
    ``q = (c_b+1)/(N_b+B)`` with ``B = n_buckets + 1`` keep every
    observed bin's log finite; bins observed in NEITHER snapshot are
    excluded (documented deviation: with unequal N they would
    contribute a spurious constant).  Exactness contract (the
    token_entropy discipline): one ``(p−q)·ln(p/q)`` double per bin
    computed from exact integers, floored to 1e-9 units, then summed
    as decimal(38,0) — association-order-free, bit-exact twin.

    Plan shape (100 TB): the two snapshots union with a side tag and
    collapse in ONE map-side-combinable hash agg (corpus → ≤ B rows,
    both counts in the same row — no join of any kind; a full-outer
    bin join cannot broadcast and would sort-merge); totals come from
    an O(B) bounded window over the bin frame so the corpus is scanned
    exactly once per snapshot, then a constant-size reduce.  No
    corpus-sized window, no sort, no Python.
    """
    from kg.ops.minhash import md5_60

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    for df, side in ((a, "a"), (b, "b")):
        if col not in df.columns:
            raise ValueError(f"column {col!r} not in frame {side!r}")

    def _tagged(df: DataFrame, side: int) -> DataFrame:
        v = F.col(col).cast("string")
        bucket = F.when(v.isNull(), F.lit(-1)).otherwise(
            F.pmod(md5_60(v), F.lit(n_buckets))
        )
        return df.select(bucket.alias("_bin"), F.lit(side).alias("_side"))

    # union + ONE hash agg instead of two aggs + a full-outer join:
    # Spark cannot broadcast a full-outer join, so the join formulation
    # sort-merges even on the <= B-row bin frames; the tagged union
    # collapses map-side into (bin, ca, cb) with no join at all, and
    # N_a/N_b fall out of the same frame (no extra corpus scans)
    counts = (
        _tagged(a, 0)
        .unionByName(_tagged(b, 1))
        .groupBy("_bin")
        .agg(
            F.sum(F.when(F.col("_side") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("_side") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    B = n_buckets + 1
    # totals via a window over the <= B-row bin frame (NOT a second agg
    # cross-joined back, which re-derives the whole scan subplan and
    # doubles the corpus reads).  A single-partition window is banned on
    # corpus-sized frames; here the frame is bounded by B by
    # construction, so it is O(B) on one task.
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    terms = counts.select(
        "ca",
        "cb",
        F.sum("ca").over(w).cast("long").alias("na"),
        F.sum("cb").over(w).cast("long").alias("nb"),
    )
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + B).cast("double")
    q = (F.col("cb") + 1).cast("double") / (F.col("nb") + B).cast("double")
    term_fp = F.floor(F.lit(1e9) * (p - q) * F.log(p / q)).cast("long")
    dec = "decimal(38,0)"
    return (
        terms.agg(
            F.first("na").alias("n_a"),
            F.first("nb").alias("n_b"),
            F.count("*").cast("long").alias("n_bins"),
            F.sum(term_fp.cast(dec)).alias("_psi_sum"),
        )
        .select(
            "n_a",
            "n_b",
            "n_bins",
            F.col("_psi_sum").cast("long").alias("psi_fp"),
            F.round(F.col("_psi_sum").cast("double") / 1e9, 6).alias("psi"),
        )
    )
