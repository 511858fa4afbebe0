"""Similarity search over an embedding column (array<float>).

Two paths:
* ``brute_force_topk`` — exact cosine top-k, queries × corpus.  The dot
  product is pure JVM (``zip_with`` + ``aggregate``); the corpus side
  stays partitioned, the (small) query side is broadcast.  Baseline and
  oracle-checkable.
* ``lsh_ann_topk`` — approximate path: random-hyperplane signatures bucket
  the corpus; each query only scores its own bucket (and hamming-adjacent
  probes).  This is the 100 TB strategy: the self-join never goes
  all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (hash-derived, no RNG state)."""
    import struct
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.sha256(f"plane:{seed}:{j}".encode()).digest()
        (u,) = struct.unpack(">q", h[:8])
        out.append(u / float(1 << 63))
    return out


def _with_signature(
    df: DataFrame, id_col: str, vec_col: str, planes: int
) -> DataFrame:
    """Append a hyperplane-LSH signature string: sign bit per plane."""
    dim = len(df.select(vec_col).first()[0])
    bits = [
        F.when(_dot(F.col(vec_col), F.array(*[F.lit(x) for x in _plane(dim, p)])) >= 0,
               F.lit("1")).otherwise(F.lit("0"))
        for p in range(planes)
    ]
    return df.withColumn("sig", F.concat(*bits))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query. Broadcast the query side; corpus scan
    stays partitioned → one shuffle (the window top-k)."""
    from pyspark.sql import Window as W

    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")), 6).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only within the query's hyperplane bucket.
    Recall < 1 by construction; planes trades recall for bucket size."""
    from pyspark.sql import Window as W

    qs = _with_signature(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id", "qv", planes,
    )
    cs = _with_signature(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id", "cv", planes,
    )
    scored = (
        qs.join(cs, "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )
