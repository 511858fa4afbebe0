"""Generic MinHash-LSH candidate generation, entirely JVM-side.

Shared by entity linking (kg.link) and document dedup (kg.ops.dedup).

Scale design: the naive formulation (explode shingles × P seed rows) blows
row count up P-fold before the shuffle.  Instead each shingle is hashed
ONCE (``xxhash64``), and the P permutations are affine maps
``(a_i * h + b_i) mod PRIME`` evaluated as P projected columns inside
whole-stage codegen — so the shuffle moves |shingle rows| records with P
small columns reduced by partial ``min`` aggregation map-side.  One
shuffle for signatures, one for band buckets, one bucket self-join.

All constants are hash-derived (deterministic across runs/executors).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

# prime > any minhash value; small enough that a*h+b stays < 2^63 (ANSI-safe)
_PRIME = 1_000_000_007


def _affine_params(i: int) -> tuple[int, int]:
    d = hashlib.sha256(f"minhash:{i}".encode()).digest()
    a = 1 + int.from_bytes(d[:8], "big") % (_PRIME - 1)
    b = int.from_bytes(d[8:16], "big") % _PRIME
    return a, b


def minhash_signature_cols(h: Column, perms: int) -> list[Column]:
    """P permuted hash columns from one base hash column."""
    out = []
    for i in range(perms):
        a, b = _affine_params(i)
        out.append(F.pmod(h * F.lit(a) + F.lit(b), F.lit(_PRIME)).alias(f"m{i}"))
    return out


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    perms: int = 64,
    bands: int = 16,
    max_bucket: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """→ (a, b) candidate pairs with a < b.

    ``group_cols``: optional blocking columns (e.g. mention kind) — pairs
    are only generated within equal group values.
    """
    group_cols = group_cols or []
    r = perms // bands

    sh = df.select(id_col, *group_cols, F.explode(shingles_col).alias("sh"))
    base = sh.withColumn("h", F.pmod(F.xxhash64("sh"), F.lit(_PRIME)))
    permuted = base.select(
        id_col, *group_cols, *minhash_signature_cols(F.col("h"), perms)
    )
    # partial aggregation: map-side combine reduces each partition to one
    # row per id before the shuffle
    sig = permuted.groupBy(id_col, *group_cols).agg(
        *[F.min(f"m{i}").alias(f"m{i}") for i in range(perms)]
    )
    # LSH banding: band key = hash of the band's signature slice
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",", *[F.col(f"m{b * r + j}").cast("string") for j in range(r)]
                )
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    bands_df = (
        sig.select(
            id_col, *group_cols, F.explode(F.array(*band_structs)).alias("bk")
        )
        .select(
            id_col,
            *group_cols,
            F.col("bk.band").alias("band"),
            F.col("bk.band_key").alias("band_key"),
        )
        # consumed 3× (bucket counts + both sides of the self-join);
        # without materialization every consumer recomputes the whole
        # signature pipeline — including the upstream corpus scan.
        # localCheckpoint (not persist): persist() entries live in the
        # CacheManager until an explicit unpersist that no caller can
        # issue (the result is lazy), so repeated invocations in a
        # long-lived session would accumulate blocks; checkpoint blocks
        # are freed by the ContextCleaner once the plan is GC'd.
        .localCheckpoint()
    )
    # web-scale guard: drop degenerate buckets before the self-join (a huge
    # bucket means a stop-surface; its quadratic pair set would dominate)
    key = [*group_cols, "band", "band_key"]
    counts = bands_df.groupBy(*key).agg(F.count("*").alias("bucket_n"))
    bands_df = bands_df.join(
        counts.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n"),
        key,
        "inner",
    )
    x, y = bands_df.alias("x"), bands_df.alias("y")
    cond = F.col(f"x.{id_col}") < F.col(f"y.{id_col}")
    for k in key:
        cond = cond & (F.col(f"x.{k}") == F.col(f"y.{k}"))
    return (
        x.join(y, cond)
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
    )
