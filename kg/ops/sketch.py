"""Stream sketching: MinCount distinct-count (F0), Count–Min point
frequency, and AMS second moment (F2) — the three classical
frequency-moment summaries, each deterministic via salted md5-60 so
every one carries a bit-exact cross-engine SQL twin.

MinCount (KMV family, Giroire 2009; the order-statistics cousin of
HLL):

Why this shape at 100 TB: exact COUNT(DISTINCT x) per group shuffles
every distinct value.  ``approx_count_distinct`` (HLL++) fixes the
shuffle but its sketch is Spark-internal — nothing else can replay it,
so it can never carry a cross-engine oracle.  MinCount gets both: hash
every value once (md5-60, the library's portable hash primitive), route
it to one of ``k`` registers by ``h mod k``, and keep the register MIN —
``min`` is a perfectly associative aggregate, so Spark's partial hash
aggregation combines it map-side and the shuffle carries exactly
O(groups × k) rows no matter how many values flow through.  The
estimator is closed-form integer arithmetic, so the DuckDB twin matches
bit-for-bit.

Estimator: register r sees n_r ≈ n/k distinct uniform draws on [0, D);
its min is ≈ Exp(n/(D·k)), so Σ_r min_r ~ Gamma(k, n/(D·k)) and
``k·(k−1)·D / Σ`` is the (Exp-approximation) unbiased inverse-Gamma
estimate of n, with relative error ≈ 1/√k.  Registers that never fire
contribute the domain max D (the empty-stream min).

Reference parity note: §2.1 new-engine surface (SURVEY.md); the
reference (syedhassaanahmed/neo-to-cosmos) has no sketching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kg.ops.minhash import md5_60

DOMAIN = 1 << 60  # md5_60 range: [0, 2^60)
_EST_CAP = 1 << 62  # ANSI-safe long bound; unreachable on real streams


def mincount_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Approximate distinct ``value_col`` count per ``group_col`` →
    ``(group_col, n_registers_hit, distinct_est)``.

    ``distinct_est = ⌊k·(k−1)·D / Σ'⌋`` with Σ' = Σ register minima,
    missing registers filled with D.  All arithmetic is exact
    decimal(38,0) (the sum of 64 minima overflows BIGINT), truncating
    division matching Spark's ``div`` / the twin's sign-cased ``//``.
    Groups never seen produce no row; the estimate is capped at 2^62
    (an ANSI overflow guard that no real stream reaches, mirrored in
    the twin).  Accuracy ~ 1/√k; k=64 → ~12 % σ.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (the estimator needs k-1), got {k}")
    h = md5_60(F.col(value_col))
    regs = (
        df.select(F.col(group_col), h.alias("_h"))
        .groupBy(group_col, F.pmod(F.col("_h"), F.lit(k)).alias("_r"))
        .agg(F.min("_h").alias("_m"))
    )
    dec = "decimal(38,0)"
    num = k * (k - 1) * DOMAIN
    # Σ' below this bound would push the quotient past the cap — branch
    # BEFORE dividing so the ANSI long-overflow of `div` is unreachable
    cap_bound = num // _EST_CAP
    agg = regs.groupBy(group_col).agg(
        F.count("*").cast("int").alias("n_registers_hit"),
        F.sum(F.col("_m").cast(dec)).alias("_sm"),
    )
    s = (
        F.col("_sm")
        + (F.lit(k) - F.col("n_registers_hit")).cast(dec)
        * F.lit(DOMAIN).cast(dec)
    ).alias("_s")
    return agg.select(group_col, "n_registers_hit", s).select(
        group_col,
        "n_registers_hit",
        F.when(F.col("_s") <= F.lit(cap_bound).cast(dec), F.lit(_EST_CAP))
        .otherwise(
            F.expr(f"CAST({num} AS DECIMAL(38,0)) div _s")
        )
        .cast("long")
        .alias("distinct_est"),
    )


def ams_f2(
    df: DataFrame,
    col: str,
    k: int = 9,
    seed: str = "kg-ams-v1",
) -> DataFrame:
    """AMS second-moment (F2) sketch (Alon–Matias–Szegedy 1996) of
    ``col``'s frequency distribution → one row per estimator
    ``(estimator, z, f2_est)`` with ``z_e = Σ_rows s_e(x)`` over ±1
    four-wise-style sign draws and ``f2_est = z_e²``; the caller takes
    the median over the ``k`` estimators (median-of-means) for the
    standard (ε, δ) guarantee.

    Why F2 at 100 TB: ``F2 = Σ_x f_x²`` IS the self-join size — the
    number of output rows a key-equi self-join (or the skew term of any
    shuffle on that key) would produce.  Computing it exactly costs a
    full groupBy on the key; this sketch answers it in ``k`` counters,
    which is how a planner decides *before* shuffling whether a join
    will blow up.  Completes the library's sketch family: MinCount =
    F0 (distinct), Count–Min = point frequency, AMS = F2.

    Exactness contract: ``s_e(x) = +1 iff md5_60(seed:e:x) is even`` —
    the library's portable hash, so the SAME draws are derivable in
    SQL and the output is bit-exact cross-engine (``z²`` is computed
    in decimal(38,0); |z| ≤ rowcount always fits a long).

    Plan shape: the ``k`` sign sums ride ONE global no-group aggregate
    — a perfectly associative partial agg, so the shuffle carries
    exactly ``k`` longs per task regardless of input size; no explode,
    no groupBy on the value, no Python.
    """
    if k < 1 or k % 2 == 0:
        raise ValueError(f"k must be odd and >= 1 (median-of-k), got {k}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in frame")
    v = F.col(col).cast("string")
    sums = []
    for e in range(k):
        sign = F.when(
            F.pmod(
                md5_60(F.concat_ws(":", F.lit(seed), F.lit(str(e)), v)),
                F.lit(2),
            )
            == 0,
            F.lit(1),
        ).otherwise(F.lit(-1))
        sums.append(F.sum(sign).cast("long").alias(f"_z{e}"))
    agg = df.agg(*sums)
    z_arr = F.array(
        *[F.coalesce(F.col(f"_z{e}"), F.lit(0).cast("long")) for e in range(k)]
    )
    zdec = F.col("z").cast("decimal(19,0)")
    return (
        agg.select(F.posexplode(z_arr).alias("_e", "z"))
        .select(
            F.col("_e").cast("long").alias("estimator"),
            F.col("z"),
            (zdec * zdec).cast("decimal(38,0)").alias("f2_est"),
        )
    )


def cms_cells(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "kg-cms-v1",
) -> DataFrame:
    """Count–Min sketch (Cormode–Muthukrishnan 2005) of ``col``'s
    frequency distribution → ``(row, bucket, cnt)`` cells, ``depth``
    hash rows × ``width`` buckets.

    The CMS is the frequency-estimation counterpart of
    :func:`mincount_distinct`: a fixed ``depth × width`` summary whose
    point estimate ``min_i cells[i][h_i(x)]`` never under-counts and
    over-counts by ≤ ε·N with probability 1−δ (ε = e/width,
    δ = e^−depth) — the sub-linear state behind heavy-hitter and
    frequency queries a 100 TB stream cannot answer exactly online.

    Exactness contract: rows are salted md5-60 buckets
    (``md5_60(seed:i:value) % width`` — the library's portable hash),
    so the sketch itself is DETERMINISTIC and carries a bit-exact SQL
    twin (no random seeds, no engine-specific hashing).

    Plan shape (100 TB): one ``depth``-way posexplode (map-side
    combine collapses it before any shuffle — the same discipline as
    the unpivot in ``column_profile``) into ONE hash agg of at most
    ``depth × width`` output cells.  Perfectly map-side mergeable:
    shards' sketches ADD cell-wise, which is why this is the standard
    distributed-stream summary.
    """
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in frame")
    v = F.col(col).cast("string")
    buckets = F.array(
        *[
            F.pmod(
                md5_60(F.concat_ws(":", F.lit(seed), F.lit(str(i)), v)),
                F.lit(width),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "kg-cms-v1",
) -> DataFrame:
    """Point-estimate ``col``'s frequency for every row of ``items``
    from a :func:`cms_cells` sketch → ``(*items.columns, cms_n)``:
    ``cms_n = min`` over the ``depth`` hashed cells (missing cell ⇒
    the bucket was never touched ⇒ 0).  Must be called with the SAME
    width/depth/seed the sketch was built with.

    Plan shape: items explode ×depth, equi-join the ≤ depth×width cell
    frame (broadcast — the sketch is a fixed-size dim by
    construction), one min-agg back to one row per item.

    The final groupBy keys on ``items``' columns, so DUPLICATE item
    rows collapse to one output row (documented semantics, ADVICE r5 —
    carry your own row id if multiplicity matters); ``items`` must not
    contain columns named ``row``/``bucket``/``cnt``, which this probe
    uses internally.
    """
    if col not in items.columns:
        raise ValueError(f"column {col!r} not in items")
    clash = {"row", "bucket", "cnt"}.intersection(items.columns)
    if clash:
        raise ValueError(
            f"items columns {sorted(clash)} collide with cms_estimate's "
            "reserved probe names (row/bucket/cnt); rename them first"
        )
    v = F.col(col).cast("string")
    buckets = F.array(
        *[
            F.pmod(
                md5_60(F.concat_ws(":", F.lit(seed), F.lit(str(i)), v)),
                F.lit(width),
            )
            for i in range(depth)
        ]
    )
    probes = items.select(
        "*", F.posexplode(buckets).alias("row", "bucket")
    )
    joined = probes.join(F.broadcast(cells), ["row", "bucket"], "left")
    return (
        joined.groupBy(*items.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_n")
        )
    )
