"""Deterministic Lloyd's k-means — the index-construction half of IVF.

``ivf_topk`` (kg/ops/similarity.py) takes caller-supplied centroids; the
r3 driver entry fed it a stand-in selection (the k lowest-id vectors).
This module supplies the real trainer: a fixed number of Lloyd's
iterations as a driver-side DataFrame loop, built so the whole fit is
deterministic AND SQL-expressible — the trained-IVF driver entry carries
a full DuckDB oracle (unrolled iteration CTEs), like every other operator
family in the repo.

Determinism / portability design (each choice is load-bearing):

* **Seeding** — the k lowest-id vectors (total order on the id column).
  No RNG state, no partition-order dependence; k-means++ would need a
  seeded RNG whose stream both engines replicate — cost without benefit
  at the cell counts IVF uses.
* **Assignment** — ``ivf_assign``'s total-order rule (cosine DESC, cid
  ASC, NaN-cosine vectors excluded): one broadcast-NL pass of K cosines
  per row, the same operator the query path uses, so train and probe
  can never disagree on the metric.
* **Mean update in exact fixed point** — a float ``avg`` is
  order-sensitive (partial-aggregation order differs run to run and
  engine to engine); instead each component is summed as
  ``floor(x·10^6)`` BIGINT (exact, order-insensitive) and the mean is
  the exact integer division ``s div n`` in micro-units, converted to
  double by ONE int→double division (identical IEEE result on any
  engine given the same integers — an earlier ``round(s/10⁶/n, 6)``
  formulation double-rounded at a representation boundary and DID
  diverge from DuckDB on real data).  Headroom: the int64 sum bounds
  |x|·rows-per-cell < 9.2e12 — at 10^12 vectors per cell and
  unit-scale components it still fits.
* **Fixed ``iters``, empty cells keep their previous centroid** — the
  round count is part of the operator's signature (not a convergence
  probe), which is what makes the SQL twin a finite CTE chain.

Scale shape (100 TB): per iteration, one broadcast-NL assignment pass
(K cosines/row, all codegen) + one (cid, pos) hash aggregation over
dim × |corpus| exploded rows — both linear in corpus size, shuffling
only (cid, pos, sum, count) partials.  Centroids are ``localCheckpoint``ed
per round so the plan does not deepen with ``iters`` (the CC-fixpoint
loop discipline).  K is assumed executor-broadcastable (an IVF list
count, not a partition of the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

FIXED_POINT = 1_000_000  # 6-dp fixed point, matching the repo's money/cents rule


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 2,
) -> DataFrame:
    """Fit k centroids with ``iters`` deterministic Lloyd's rounds.

    Returns (cid int, cv array<double>) — exactly the centroid contract
    ``ivf_topk``/``ivf_assign`` consume.  See the module docstring for
    why every step is deterministic and engine-portable."""
    from kg.ops.similarity import ivf_assign

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    seeds = base.orderBy("_id").limit(k)
    centroids = seeds.select(
        (F.row_number().over(W.orderBy("_id")) - 1).cast("int").alias("cid"),
        F.col("_v").alias("cv"),
    ).localCheckpoint()
    for _ in range(iters):
        assign = ivf_assign(base, "_id", "_v", centroids, nprobe=1)
        ex = assign.join(base, "_id").select(
            "cid", F.posexplode("_v").alias("pos", "x")
        )
        sums = ex.groupBy("cid", "pos").agg(
            F.sum(F.floor(F.col("x") * FIXED_POINT)).alias("s"),
            F.count("*").alias("n"),
        )
        # exact micro-unit mean (div truncates toward zero), then one
        # int→double division — boundary-free on every engine
        means = sums.select(
            "cid",
            "pos",
            (
                F.expr("s div n").cast("double")
                / F.lit(float(FIXED_POINT))
            ).alias("m"),
        )
        new_cv = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.m,
            ).alias("cv_new")
        )
        centroids = (
            centroids.join(new_cv, "cid", "left")
            .select("cid", F.coalesce("cv_new", "cv").alias("cv"))
            .localCheckpoint()
        )
    return centroids


def kmeans_profile(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 2,
) -> DataFrame:
    """Semantic-clustering profile →
    ``(cid, n_vectors, sum_cos_fp, mean_cos_fp)``: fit ``k`` centroids
    (:func:`kmeans_fit`), assign every vector to its nearest cell, and
    report per-cluster size plus cohesion — the first diagnostic of a
    SemDeDup-style embedding clustering (are clusters balanced? which
    are tight enough to prune aggressively?).

    Cohesion is the cosine of each member to its centroid, fixed-pointed
    per ROW as ``floor(round(cos, 6)·10⁶ + ½)`` — the 6dp round is the
    cross-engine-stable value (the ANN entries' contract), and the
    +½/floor recovers its integer numerator exactly (a bare
    ``floor(10⁶·cos)`` sits on the raw double's last-ulp boundary and
    DID diverge between engines); then an exact BIGINT sum — never a
    float sum, which is association-order-sensitive — and
    ``mean_cos_fp = sum_cos_fp div n`` (exact floor).  Empty cells are
    absent (nothing assigned); zero-norm vectors are unindexable and
    excluded (the :func:`kg.ops.similarity.ivf_assign` contract — the
    assignment rule here is that operator's, with the cosine kept).

    Scale shape: the fit is :func:`kmeans_fit`'s bounded loop; the
    final assignment is ONE broadcast-NL pass (K cosines/row, codegen)
    + a per-vector top-1 window + ONE hash agg — linear in corpus size.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    centroids = kmeans_fit(df, id_col, vec_col, k, iters)
    fin = _assign_cohesion(df, id_col, vec_col, centroids)
    return (
        fin.groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum("_cfp").alias("sum_cos_fp"),
        )
        .select(
            "cid",
            "n_vectors",
            "sum_cos_fp",
            F.expr("sum_cos_fp div n_vectors").cast("long").alias("mean_cos_fp"),
        )
    )


def _assign_cohesion(
    df: DataFrame, id_col: str, vec_col: str, centroids: DataFrame
) -> DataFrame:
    """→ (_id, cid, _cfp): each vector's nearest cell (the
    :func:`kg.ops.similarity.ivf_assign` rule, cosine kept) with its
    cohesion fixed-pointed as ``floor(round(cos, 6)·10⁶ + ½)`` — the
    cross-engine-stable integer (see :func:`kmeans_profile`)."""
    from kg.hints import maybe_broadcast
    from kg.ops.similarity import _cosine

    scored = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .crossJoin(maybe_broadcast(centroids))
        .select("_id", "cid", _cosine(F.col("_v"), F.col("cv")).alias("_c"))
        .filter(~F.isnan("_c"))
    )
    w = W.partitionBy("_id").orderBy(F.desc("_c"), F.asc("cid"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "_id",
            "cid",
            F.floor(F.round(F.col("_c"), 6) * FIXED_POINT + F.lit(0.5))
            .cast("long")
            .alias("_cfp"),
        )
    )


def embedding_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 2,
    z: int = 2,
) -> DataFrame:
    """Cluster-relative embedding anomaly scoring →
    ``(id_col, cid, cos_fp, mean_cos_fp, std_fp, is_outlier)`` for
    every assignable vector: fit ``k`` centroids (:func:`kmeans_fit`),
    assign each vector, and flag members whose cohesion sits more than
    ``z`` standard deviations BELOW their cluster's mean — the
    embedding-space outlier pass a curation pipeline runs to surface
    mislabeled / off-distribution / garbage items before training.

    Exactness contract: cohesion is the stable per-row integer
    (:func:`_assign_cohesion`); per-cluster mean is ``sum div n``;
    variance is the exact integer identity
    ``(n·Σx² − (Σx)²) div n²`` in micro-unit² (decimal(38,0) — Σx² ≤
    10¹²·n fits comfortably), and ``std_fp = floor(sqrt(var))`` —
    IEEE-754 guarantees sqrt is correctly rounded, so both engines
    floor the IDENTICAL double (the reason sqrt may sit under a bare
    floor while ln/cos may not).  The flag
    ``mean_cos_fp − cos_fp > z·std_fp`` is then pure integer
    comparison.  Single-member clusters have std 0 and gap 0 → never
    flagged; a constant cluster likewise.

    Scale shape: the fit is bounded; then ONE assignment pass, ONE
    per-cluster hash agg (k rows), one broadcast-gated dim join back,
    and a map-side flag — linear in corpus size.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if z < 0:
        raise ValueError(f"z must be >= 0, got {z}")
    from kg.hints import maybe_broadcast

    dec = "decimal(38,0)"
    centroids = kmeans_fit(df, id_col, vec_col, k, iters)
    fin = _assign_cohesion(df, id_col, vec_col, centroids)
    stats = (
        fin.groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.sum("_cfp").alias("_s"),
            F.sum(
                (F.col("_cfp").cast(dec) * F.col("_cfp").cast(dec)).cast(dec)
            ).alias("_sq"),
        )
        .select(
            "cid",
            "_n",
            F.expr("_s div _n").cast("long").alias("mean_cos_fp"),
            F.floor(
                F.sqrt(
                    F.expr(
                        f"(cast(_n as {dec}) * _sq - "
                        f"cast(_s as {dec}) * cast(_s as {dec})) div "
                        f"(cast(_n as {dec}) * cast(_n as {dec}))"
                    ).cast("double")
                )
            )
            .cast("long")
            .alias("std_fp"),
        )
    )
    return fin.join(maybe_broadcast(stats), "cid").select(
        F.col("_id").alias(id_col),
        "cid",
        F.col("_cfp").alias("cos_fp"),
        "mean_cos_fp",
        "std_fp",
        (
            (F.col("mean_cos_fp") - F.col("_cfp"))
            > F.lit(z) * F.col("std_fp")
        ).alias("is_outlier"),
    )
