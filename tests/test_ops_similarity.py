

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
