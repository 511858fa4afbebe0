

def test_hard_negatives_excludes_same_label_and_ranks(spark):
    """Only different-label neighbors appear, ranked by cosine desc;
    the nearest SAME-label vector never shows even when closest."""
    from kg.ops.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 10),   # anchor
        (2, [0.99, 0.1], 10),  # same label, closest -> excluded
        (3, [0.9, 0.3], 20),   # hard negative (closest cross-label)
        (4, [0.0, 1.0], 20),   # easy negative
        (5, [-1.0, 0.0], 30),  # opposite
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    anchors = df.filter("vec_id = 1")
    got = hard_negatives(
        anchors, df, "vec_id", "vec_id", "embedding", "label", k=2
    ).collect()
    assert [(r["neighbor_id"], r["rk"]) for r in got] == [(3, 1), (4, 2)]
    assert all(r["query_label"] == 10 and r["neighbor_label"] != 10
               for r in got)
    assert got[0]["cosine"] > got[1]["cosine"]


def test_hard_negatives_skips_zero_norm_and_validates(spark):
    import pytest as _pt

    from kg.ops.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 1),
        (2, [0.0, 0.0], 2),   # zero norm -> NaN cosine -> excluded
        (3, [0.5, 0.5], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = hard_negatives(
        df.filter("vec_id = 1"), df, "vec_id", "vec_id",
        "embedding", "label", k=5,
    ).collect()
    assert [r["neighbor_id"] for r in got] == [3]
    with _pt.raises(ValueError, match="k must"):
        hard_negatives(df, df, "vec_id", "vec_id", "embedding", "label", k=0)


def test_cosine_rerank_engines_bit_identical(spark):
    """The three re-rank engines of embedding_near_duplicates (codegen
    unrolled, arrow numpy, HOF expr) must agree bit-for-bit on every
    candidate cosine — including ragged, null, zero-norm and NaN-bearing
    vectors, where the unrolled form must take its guarded HOF fallback."""
    import math

    from pyspark.sql import functions as F

    from kg.ops.similarity import (
        _cosine, _cosine_unrolled, _pair_cosine_arrow,
    )

    dim = 8
    rows = [
        (1, [float(j + 1) for j in range(dim)]),
        (2, [float(j + 1) * 1.001 for j in range(dim)]),
        # NB: no all-zero vector here — under ANSI mode the 0.0/0.0
        # division raises DIVIDE_BY_ZERO in the JVM _cosine itself
        # (pre-existing behavior of the expr path, unchanged by the
        # engines under test; the bench corpora contain no zero-norm
        # vectors)
        (4, [1.0, 2.0, 3.0]),                  # short: HOF fallback path
        (5, None),                             # null vector
        (6, [float("nan")] + [1.0] * (dim - 1)),
        (7, [-1.0 * (j + 1) for j in range(dim)]),
        (8, [1.0, None] + [1.0] * (dim - 2)),  # null element
        (9, [5.0, 4.0, 3.0]),                  # short pair partner for 4
    ]
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    a = emb.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    paired = a.crossJoin(b).filter(F.col("a") < F.col("b"))

    expr = {
        (r["a"], r["b"]): r["c"]
        for r in paired.select(
            "a", "b", _cosine(F.col("va"), F.col("vb")).alias("c")
        ).collect()
    }
    code = {
        (r["a"], r["b"]): r["c"]
        for r in paired.select(
            "a", "b", _cosine_unrolled(F.col("va"), F.col("vb"), dim).alias("c")
        ).collect()
    }
    arrow = {
        (r["a"], r["b"]): r["cosine"]
        for r in _pair_cosine_arrow(paired).collect()
    }
    assert set(expr) == set(code) == set(arrow)

    def same(x, y) -> bool:
        if x is None and y is None:
            return True
        if x is None or y is None:
            return False
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y and math.copysign(1, x) == math.copysign(1, y)

    for k, v in expr.items():
        assert same(v, code[k]), (k, v, code[k])
        # the arrow engine's NULL/NaN classes blur at the pandas->Arrow
        # boundary (numpy NaN comes back as Spark NULL, JVM NULL becomes
        # numpy NaN); both classes are dropped identically by the
        # operator's (>= threshold) & ~isnan filter, so only the FINITE
        # cosines must match bit-for-bit
        av = arrow[k]
        if v is None or math.isnan(v):
            assert av is None or math.isnan(av), (k, v, av)
        else:
            assert same(v, av), (k, v, av)
