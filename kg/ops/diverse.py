"""Diverse subset selection: farthest-point traversal (Gonzalez 1985).

The curation dual of deduplication: instead of dropping near-identical
examples, PICK the k examples that best spread over the embedding space
(2-approximation to the k-center optimum) — the standard shape for
seeding instruction-tuning sets, picking few-shot exemplars, and
choosing k-means/IVF initializations that aren't all in one clump.

Determinism contract: similarity is the library's fixed-point cosine
``floor(round(cos,6)·10⁶ + ½)``; the first pick is the minimum id; each
later round picks the candidate with the MINIMUM max-similarity to the
already-selected set, ties broken by id asc — a total order, so the
selection (and its unrolled-CTE SQL twin) is bit-reproducible.

Plan shape (100 TB): k driver rounds; each round joins the corpus
against the ≤ k-row selected frame (broadcast — never corpus×corpus),
one max hash agg per candidate, and ONE 1-row argmin
(``min(struct(max_sim, id))``, no window).  Total cost O(n·k²) dot
products, the textbook bound; selected state is localCheckpointed per
round so the plan stays linear instead of re-inlining 2^rounds deep.

Reference parity note: §2.1 new-engine surface (SURVEY.md); the
reference (syedhassaanahmed/neo-to-cosmos) has no selection operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kg.hints import maybe_broadcast


def select_diverse(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Pick ``k`` maximally-spread vectors → ``(id_col, sel_round,
    max_sim_fp)``: ``sel_round`` is the selection order (1-based);
    ``max_sim_fp`` is the pick's max fixed-point cosine to the
    PREVIOUSLY selected set (0 for the seed row — the diversity radius
    achieved at each step, monotonically informative for choosing k).
    Zero-norm vectors are excluded (cosine undefined); if fewer than
    ``k`` usable vectors exist, all are returned.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from kg.ops.kmeans import FIXED_POINT
    from kg.ops.similarity import _cosine, _dot

    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .filter(_dot(F.col("_v"), F.col("_v")) > 0)
        .localCheckpoint()
    )
    seed = (
        base.groupBy()
        .agg(F.min("_id").alias("_id"))
        .join(base, "_id")
        .select(
            "_id",
            "_v",
            F.lit(1).alias("_round"),
            F.lit(0).cast("long").alias("_msim"),
        )
    )
    # one O(1) action up front bounds the loop; no per-round counting
    n_usable = base.count()
    if n_usable == 0:
        return base.select(
            F.col("_id").alias(id_col),
            F.lit(1).cast("int").alias("sel_round"),
            F.lit(0).cast("long").alias("max_sim_fp"),
        )
    selected = seed.localCheckpoint()
    for rnd in range(2, min(k, n_usable) + 1):
        sel_vecs = selected.select(
            F.col("_id").alias("_sid"), F.col("_v").alias("_sv")
        )
        cos_fp = (
            F.floor(
                F.round(_cosine(F.col("_v"), F.col("_sv")), 6) * FIXED_POINT
                + F.lit(0.5)
            )
            .cast("long")
        )
        cands = (
            base.join(
                selected.select("_id"), "_id", "left_anti"
            )
            .crossJoin(maybe_broadcast(sel_vecs))
            .groupBy("_id")
            .agg(F.max(cos_fp).alias("_ms"))
        )
        pick = (
            cands.groupBy()
            .agg(F.min(F.struct("_ms", "_id")).alias("_p"))
            .select(
                F.col("_p._id").alias("_id"),
                F.lit(rnd).alias("_round"),
                F.col("_p._ms").alias("_msim"),
            )
            .join(base, "_id")
            .select("_id", "_v", "_round", "_msim")
        )
        selected = selected.unionByName(pick).localCheckpoint()
    return selected.select(
        F.col("_id").alias(id_col),
        F.col("_round").cast("int").alias("sel_round"),
        F.col("_msim").alias("max_sim_fp"),
    )
