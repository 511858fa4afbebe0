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
  ``floor(x·10^6)`` BIGINT (exact, order-insensitive), divided back in
  one deterministic double op, and rounded to 6 dp.  Headroom: the
  int64 sum bounds |x|·rows-per-cell < 9.2e12 — at 10^12 vectors per
  cell and unit-scale components it still fits.
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
        means = sums.select(
            "cid",
            "pos",
            F.round(
                F.col("s") / F.lit(float(FIXED_POINT)) / F.col("n"), 6
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
