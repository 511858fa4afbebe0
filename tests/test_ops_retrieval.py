"""BM25 retrieval tests: hand-computed fixed-point scores on a tiny
corpus, query-term set semantics, ranking/tie-break, arg validation."""

from __future__ import annotations

import math

import pytest

from kg.ops import bm25_topk


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry cherry"),
        ],
        ["doc_id", "text"],
    )


def _idf_fp(n, df):
    return math.floor(1e6 * math.log((2 * n + 2) / (2 * df + 1)))


def _w_fp(idf, tf, dl, n, t):
    num = 10 * t * tf
    den = num + 3 * t + 9 * dl * n
    return (idf * num) // den


def test_bm25_hand_scores(spark):
    """N=3, T=9; query 'apple cherry' must rank d1 (rare apple) over
    d3 (high-tf cherry) over d2, with the exact micro-unit scores."""
    queries = spark.createDataFrame(
        [(10, "apple cherry")], ["query_id", "text"]
    )
    got = [
        (r["doc_id"], r["score_fp"], r["rank"])
        for r in sorted(
            bm25_topk(_corpus(spark), queries).collect(),
            key=lambda r: r["rank"],
        )
    ]
    ia, ic = _idf_fp(3, 1), _idf_fp(3, 2)
    assert ia == 980829 and ic == 470003
    exp = [
        (1, _w_fp(ia, 2, 3, 3, 9), 1),
        (3, _w_fp(ic, 4, 4, 3, 9), 2),
        (2, _w_fp(ic, 1, 2, 3, 9), 3),
    ]
    assert got == exp
    assert [s for _, s, _ in exp] == sorted(
        (s for _, s, _ in exp), reverse=True
    )


def test_bm25_repeated_query_term_scores_once(spark):
    """'cherry cherry cherry' is the set {cherry}: scores equal the
    single-term query's exactly."""
    q1 = spark.createDataFrame([(1, "cherry")], ["query_id", "text"])
    q3 = spark.createDataFrame(
        [(1, "cherry cherry cherry")], ["query_id", "text"]
    )
    s1 = {
        (r["doc_id"], r["score_fp"])
        for r in bm25_topk(_corpus(spark), q1).collect()
    }
    s3 = {
        (r["doc_id"], r["score_fp"])
        for r in bm25_topk(_corpus(spark), q3).collect()
    }
    assert s1 == s3 and len(s1) == 2


def test_bm25_k_caps_and_tie_breaks(spark):
    """k=1 keeps only the best doc; equal-score candidates order by
    doc id ascending."""
    docs = spark.createDataFrame(
        [(5, "same words here"), (2, "same words here"), (9, "other")],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([(1, "same")], ["query_id", "text"])
    full = sorted(
        (r["rank"], r["doc_id"])
        for r in bm25_topk(docs, q, k=10).collect()
    )
    assert full == [(1, 2), (2, 5)]  # tie → lower doc_id first
    top1 = bm25_topk(docs, q, k=1).collect()
    assert [(r["doc_id"], r["rank"]) for r in top1] == [(2, 1)]


def test_bm25_no_match_and_validation(spark):
    q = spark.createDataFrame([(1, "zebra")], ["query_id", "text"])
    assert bm25_topk(_corpus(spark), q).count() == 0
    with pytest.raises(ValueError):
        bm25_topk(_corpus(spark), q, k=0)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------
def _ranking(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "rank"])


def test_rrf_hand_fusion(spark):
    """Two legs, hand contributions at rrf_k=60: doc 7 (ranks 1+2)
    must beat doc 8 (rank 1 in one leg only); exact integer scores."""
    from kg.ops import rrf_fuse

    lex = _ranking(spark, [(1, 7, 1), (1, 8, 2), (1, 9, 3)])
    sem = _ranking(spark, [(1, 8, 1), (1, 7, 2)])
    got = sorted(
        (r["doc_id"], r["legs"], r["rrf_fp"], r["rank"])
        for r in rrf_fuse([lex, sem], k=10).collect()
    )
    c = lambda r: 1000000 // (60 + r)  # noqa: E731
    assert got == sorted(
        [
            (7, 2, c(1) + c(2), 1),
            (8, 2, c(2) + c(1), 2),
            (9, 1, c(3), 3),
        ]
    )
    # doc 7 and 8 tie on score (symmetric ranks) → id-asc tie-break
    assert c(1) + c(2) == c(2) + c(1)


def test_rrf_k_cap_and_single_leg(spark):
    from kg.ops import rrf_fuse

    lex = _ranking(spark, [(1, d, d) for d in range(1, 8)])
    got = rrf_fuse([lex], k=3).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        1,
        2,
        3,
    ]
    assert all(r["legs"] == 1 for r in got)


def test_rrf_queries_fuse_independently(spark):
    from kg.ops import rrf_fuse

    a = _ranking(spark, [(1, 7, 1), (2, 9, 1)])
    b = _ranking(spark, [(2, 9, 3)])
    got = {
        (r["query_id"], r["doc_id"]): (r["legs"], r["rrf_fp"])
        for r in rrf_fuse([a, b], k=5).collect()
    }
    assert got == {
        (1, 7): (1, 1000000 // 61),
        (2, 9): (2, 1000000 // 61 + 1000000 // 63),
    }


def test_rrf_validation(spark):
    from kg.ops import rrf_fuse

    lex = _ranking(spark, [(1, 7, 1)])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], k=3)
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([lex], k=0)
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([lex], rrf_k=-1)
    with pytest.raises(ValueError, match="missing columns"):
        rrf_fuse([lex.drop("rank")])


def test_rbo_weights_and_identical_lists(spark):
    """Identical depth-5 lists score exactly the fix-point image of
    1 - p^5; weights recomputed independently."""
    from kg.ops.retrieval import rank_biased_overlap, rbo_weights_fp

    w = rbo_weights_fp(0.5, 5)
    for m in range(1, 6):
        expect = round(
            sum(0.5 * 0.5 ** (d - 1) / d for d in range(m, 6)) * 1e9
        )
        assert w[m - 1] == expect
    rows = [("q", f"d{r}", r) for r in range(1, 6)]
    run = spark.createDataFrame(rows, "query_id string, doc_id string, rank int")
    got = rank_biased_overlap(run, run).collect()[0]
    assert got["n_common"] == 5
    assert got["rbo"] == round(sum(w) / 1e9, 6)  # ≈ 1 - 0.5^5


def test_rbo_partial_and_disjoint(spark):
    from kg.ops.retrieval import rank_biased_overlap, rbo_weights_fp

    w = rbo_weights_fp(0.5, 5)
    a = spark.createDataFrame(
        [("q", "x", 1), ("q", "y", 2)], "query_id string, doc_id string, rank int"
    )
    b = spark.createDataFrame(
        [("q", "x", 3), ("q", "z", 1)], "query_id string, doc_id string, rank int"
    )
    got = rank_biased_overlap(a, b).collect()[0]
    # only x shared, worse rank 3 -> W(3)
    assert (got["n_common"], got["rbo"]) == (1, round(w[2] / 1e9, 6))
    disjoint = rank_biased_overlap(
        a, b.filter("doc_id = 'z'")
    ).collect()
    assert disjoint == []
    import pytest as _pt

    with _pt.raises(ValueError, match="p must"):
        rank_biased_overlap(a, b, p=1.0)
    with _pt.raises(ValueError, match="missing"):
        rank_biased_overlap(a.drop("rank"), b)
