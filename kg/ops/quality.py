"""Data-governance profiling: per-column completeness/distinctness and
k-anonymity risk.

Why this lives in a training-data engine: before a corpus feeds a
trainer, two governance questions precede every statistical one — "is
the table complete enough to trust" (Deequ-style column profiling) and
"can rows be re-identified from quasi-identifier combinations"
(k-anonymity, Sweeney 2002).  Both reduce to hash aggregations, so at
100 TB they cost one corpus pass each — there is no excuse to skip
them, and no reason to leave them un-oracle-checked.

Reference parity note: §2.1 new-engine surface (SURVEY.md); the
reference (syedhassaanahmed/neo-to-cosmos) has no analytics operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column completeness/distinctness profile →
    ``(col_name, n_rows, n_nulls, completeness, n_distinct,
    distinctness)`` — the Deequ-class table health report
    (completeness = non-null fraction; distinctness = distinct
    non-null values / non-null rows; both 6dp).

    Plan shape (100 TB): the frame unpivots to ``(col_name, value)``
    pairs via ``stack`` (row-count × |columns|, but map-side combine on
    the very next hash agg collapses it to |columns| × |distinct
    values| before any shuffle), then ONE (col_name, value) hash agg +
    one |columns|-sized reduce.  This is deliberately NOT N separate
    ``count_distinct`` aggregates in one row (Spark expands those into
    an N-way Expand over the raw corpus with no pre-agg collapse) and
    NOT N sequential jobs.

    Values are compared as strings (profile semantics — distinctness
    of the printed value).  Float columns are legal but their string
    forms differ across engines; keep oracle-twinned profiles on
    int/string/date columns.
    """
    cols = columns or df.columns
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"columns {sorted(missing)} not in frame")
    if not cols:
        raise ValueError("need at least one column to profile")
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in cols
    )
    pairs = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) as (col_name, value)")
    )
    vc = pairs.groupBy("col_name", "value").agg(F.count("*").alias("cnt"))
    prof = vc.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(
            F.when(F.col("value").isNull(), F.col("cnt")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_nulls"),
        F.count(F.when(F.col("value").isNotNull(), True))
        .cast("long")
        .alias("n_distinct"),
    )
    non_null = F.col("n_rows") - F.col("n_nulls")
    return prof.select(
        "col_name",
        "n_rows",
        "n_nulls",
        F.round(non_null.cast("double") / F.col("n_rows"), 6).alias(
            "completeness"
        ),
        "n_distinct",
        F.when(
            non_null > 0,
            F.round(F.col("n_distinct").cast("double") / non_null, 6),
        ).alias("distinctness"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity risk report over a quasi-identifier combination →
    ONE row ``(k, n_rows, n_groups, at_risk_groups, at_risk_rows,
    at_risk_fraction)``: rows whose quasi-identifier group has fewer
    than ``k`` members are re-identifiable at that granularity
    (Sweeney 2002).  Run it on the columns a release would expose;
    a nonzero ``at_risk_fraction`` means generalize or suppress
    before publishing.

    Plan shape (100 TB): one map-side-combinable hash agg on the
    quasi-identifier tuple, then a constant-size reduce — the group
    frame never leaves the executors, no window, no Python.  NULL
    quasi-values group together (SQL GROUP BY semantics, mirrored in
    the twin).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    missing = set(quasi_cols) - set(df.columns)
    if missing:
        raise ValueError(f"quasi_cols {sorted(missing)} not in frame")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    groups = df.groupBy(*quasi_cols).agg(F.count("*").alias("_n"))
    risk = F.col("_n") < k
    return groups.agg(
        F.lit(k).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(risk, 1).otherwise(0)).cast("long").alias(
            "at_risk_groups"
        ),
        F.sum(F.when(risk, F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("at_risk_rows"),
    ).select(
        "k",
        "n_rows",
        "n_groups",
        "at_risk_groups",
        "at_risk_rows",
        F.round(
            F.col("at_risk_rows").cast("double") / F.col("n_rows"), 6
        ).alias("at_risk_fraction"),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity risk report → ONE row ``(l, n_rows,
    n_groups, at_risk_groups, at_risk_rows, at_risk_fraction)``:
    quasi-identifier groups whose SENSITIVE attribute takes fewer than
    ``l`` distinct values leak that attribute even when the group is
    k-anonymous (the homogeneity attack of Machanavajjhala et al.
    2007 — 100 same-diagnosis patients are k=100-anonymous and still
    fully disclosed).  Run AFTER :func:`k_anonymity` on a release
    candidate; nonzero ``at_risk_fraction`` means generalize further
    or suppress.

    Plan shape (100 TB): one hash agg on (quasi tuple, sensitive) —
    map-side combinable — then one agg to the group frame carrying
    both the member count and the exact distinct-sensitive count, then
    a constant-size reduce.  No ``countDistinct`` over the corpus, no
    window, no Python.  NULL sensitive values count as one value
    (GROUP BY semantics, mirrored in the twin).
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    missing = (set(quasi_cols) | {sensitive_col}) - set(df.columns)
    if missing:
        raise ValueError(f"columns {sorted(missing)} not in frame")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive_col {sensitive_col!r} cannot be a quasi column"
        )
    per_value = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").alias("_n")
    )
    groups = per_value.groupBy(*quasi_cols).agg(
        F.sum("_n").alias("_rows"),
        F.count("*").alias("_ell"),
    )
    risk = F.col("_ell") < l
    return groups.agg(
        F.lit(l).cast("long").alias("l"),
        F.sum("_rows").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(risk, 1).otherwise(0)).cast("long").alias(
            "at_risk_groups"
        ),
        F.sum(F.when(risk, F.col("_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("at_risk_rows"),
    ).select(
        "l",
        "n_rows",
        "n_groups",
        "at_risk_groups",
        "at_risk_rows",
        F.round(
            F.col("at_risk_rows").cast("double") / F.col("n_rows"), 6
        ).alias("at_risk_fraction"),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness risk report (Li, Li & Venkatasubramanian 2007,
    total-variation instance) → ONE row ``(t, n_rows, n_groups,
    at_risk_groups, at_risk_rows, at_risk_fraction, max_distance)``:
    a quasi-identifier group fails when the distribution of its
    SENSITIVE attribute sits further than ``t`` (variational
    distance) from the corpus-wide distribution — the skewness attack
    l-diversity misses (a group can show l distinct diagnoses and
    still be 99 % cancer).  The third rung of the release ladder:
    :func:`k_anonymity` (size) → :func:`l_diversity` (variety) →
    t-closeness (shape).

    Exactness: d(g) = Σ_v |n_gv·N − N_v·n_g| / (2·n_g·N) has an
    integer numerator; values ABSENT from a group contribute
    ``N_v·n_g`` each, which folds to the closed form
    ``n_g·(N − Σ_{v∈g} N_v)`` — so the risk test ``d(g) > t`` is the
    exact integer comparison ``num·10⁶ > 2·t_fp·n_g·N`` (t
    fix-pointed to micro-units), never a float sum over values.
    ``max_distance`` is one identical-IEEE division per group then a
    max, rounded to 6 dp.

    Plan shape (100 TB): one hash agg to (quasi, sensitive) cells,
    the group-total dim equi-joined back on the quasi tuple, the
    value-sized global dim broadcast-gated, one agg to the group
    frame, constant-size reduce.  No per-value cross join — the
    absent-value mass is the closed form above.
    """
    from kg.hints import maybe_broadcast

    if not 0 < t < 1:
        raise ValueError(f"t must be in (0, 1), got {t}")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    missing = (set(quasi_cols) | {sensitive_col}) - set(df.columns)
    if missing:
        raise ValueError(f"columns {sorted(missing)} not in frame")
    if sensitive_col in quasi_cols:
        raise ValueError(
            f"sensitive_col {sensitive_col!r} cannot be a quasi column"
        )
    t_fp = round(t * 1_000_000)
    dec = "decimal(38,0)"
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").cast("long").alias("_ngv")
    )
    gtot = cells.groupBy(*quasi_cols).agg(
        F.sum("_ngv").cast("long").alias("_ng")
    )
    vdim = maybe_broadcast(
        cells.groupBy(sensitive_col).agg(
            F.sum("_ngv").cast("long").alias("_nv")
        )
    )
    total = cells.agg(F.sum("_ngv").cast("long").alias("_nt"))
    per_cell = (
        cells.join(gtot, quasi_cols)
        .join(vdim, sensitive_col)
        .crossJoin(F.broadcast(total))
    )
    groups = per_cell.groupBy(*quasi_cols).agg(
        F.max("_ng").alias("_ng"),
        F.max("_nt").alias("_nt"),
        F.sum(
            F.abs(
                F.col("_ngv").cast(dec) * F.col("_nt").cast(dec)
                - F.col("_nv").cast(dec) * F.col("_ng").cast(dec)
            )
        ).alias("_sp"),
        F.sum(F.col("_nv").cast(dec)).alias("_pv"),
    )
    num = (
        F.col("_sp")
        + F.col("_ng").cast(dec)
        * (F.col("_nt").cast(dec) - F.col("_pv"))
    )
    denom = (
        F.lit(2).cast(dec) * F.col("_ng").cast(dec) * F.col("_nt").cast(dec)
    )
    scored = groups.select(
        F.col("_ng"),
        num.alias("_num"),
        denom.alias("_den"),
        (
            num * F.lit(1_000_000).cast(dec)
            > F.lit(t_fp).cast(dec)
            * F.lit(2).cast(dec)
            * F.col("_ng").cast(dec)
            * F.col("_nt").cast(dec)
        ).alias("_risk"),
    )
    return scored.agg(
        F.lit(t_fp / 1_000_000).alias("t"),
        F.sum("_ng").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_risk"), 1).otherwise(0))
        .cast("long")
        .alias("at_risk_groups"),
        F.sum(F.when(F.col("_risk"), F.col("_ng")).otherwise(F.lit(0)))
        .cast("long")
        .alias("at_risk_rows"),
        F.max(
            F.round(
                F.col("_num").cast("double") / F.col("_den").cast("double"),
                6,
            )
        ).alias("max_distance"),
    ).select(
        "t",
        "n_rows",
        "n_groups",
        "at_risk_groups",
        "at_risk_rows",
        F.round(
            F.col("at_risk_rows").cast("double") / F.col("n_rows"), 6
        ).alias("at_risk_fraction"),
        "max_distance",
    )
