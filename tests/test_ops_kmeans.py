"""k-means trainer (kg/ops/kmeans.py): determinism, cell partition
integrity, and the VERDICT r3 acceptance gate — trained centroids give
IVF recall (vs exact brute force) at least as good as the r3 stand-in
(lowest-id) centroids.  The cross-engine exactness of the fit itself is
covered by the ann_ivf_trained oracle entry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg.ops import brute_force_topk, ivf_assign, ivf_topk, kmeans_fit

K, ITERS = 8, 2


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _centroid_map(cdf):
    return {r.cid: tuple(r.cv) for r in cdf.collect()}


def test_kmeans_is_deterministic(emb):
    a = _centroid_map(kmeans_fit(emb, "vec_id", "embedding", k=K, iters=ITERS))
    b = _centroid_map(kmeans_fit(emb, "vec_id", "embedding", k=K, iters=ITERS))
    assert a == b
    assert len(a) == K
    assert all(len(v) == 64 for v in a.values())


def test_kmeans_moves_centroids_off_seeds(emb):
    """After a Lloyd's round every non-empty cell's centroid is a mean,
    not the seed vector itself (the stand-in never moved)."""
    seeds = _centroid_map(kmeans_fit(emb, "vec_id", "embedding", k=K, iters=0))
    trained = _centroid_map(kmeans_fit(emb, "vec_id", "embedding", k=K, iters=ITERS))
    assert set(seeds) == set(trained)
    assert any(seeds[c] != trained[c] for c in seeds)


def test_kmeans_cells_partition_corpus(emb):
    """Every vector with a defined direction lands in exactly one cell."""
    cents = kmeans_fit(emb, "vec_id", "embedding", k=K, iters=ITERS)
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    assign = ivf_assign(base, "vec_id", "v", cents, nprobe=1)
    n_assignable = base.count()  # testdata vectors all have nonzero norm
    assert assign.count() == n_assignable
    assert assign.select("vec_id").distinct().count() == n_assignable


def _recall(topk_df, truth: set) -> float:
    got = {(r.query_id, r.neighbor_id) for r in topk_df.collect()}
    return len(got & truth) / len(truth)


def test_trained_recall_not_worse_than_standin(emb):
    """100 queries, not the oracle entry's 5: recall over 25 pairs is
    sample noise (the stand-in 'wins' 0.96 vs 0.88 on the first 5
    queries of sf0.001 but loses 0.49 vs 0.54 over 100 — measured);
    deterministic data keeps the 100-query comparison exact, no flake."""
    queries = emb.filter(F.col("vec_id") < 100)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(
            queries, emb, "vec_id", "vec_id", "embedding", k=5
        ).collect()
    }
    standin = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    trained = kmeans_fit(emb, "vec_id", "embedding", k=K, iters=ITERS)
    r_standin = _recall(
        ivf_topk(queries, emb, standin, "vec_id", "vec_id", "embedding",
                 k=5, nprobe=2),
        truth,
    )
    r_trained = _recall(
        ivf_topk(queries, emb, trained, "vec_id", "vec_id", "embedding",
                 k=5, nprobe=2),
        truth,
    )
    assert r_trained >= r_standin
    assert r_trained > 0


# ---------------------------------------------------------------------------
# kmeans_profile
# ---------------------------------------------------------------------------
def _profile_replica(vecs, k, iters):
    """Python replica of kmeans_fit + kmeans_profile on dense doubles."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    cents = [list(vecs[i][1]) for i in sorted(vecs)[:k]]
    ids = sorted(vecs)
    for _ in range(iters):
        assign = {}
        for i in ids:
            scored = sorted(
                ((-cos(vecs[i][1], c), ci) for ci, c in enumerate(cents))
            )
            assign[i] = scored[0][1]
        for ci in range(k):
            members = [vecs[i][1] for i in ids if assign[i] == ci]
            if members:
                dim = len(members[0])

                def _mean_fp(p):
                    s = sum(math.floor(m[p] * 1e6) for m in members)
                    n = len(members)
                    q = s // n if s >= 0 else -((-s) // n)
                    return q / 1e6

                cents[ci] = [_mean_fp(p) for p in range(dim)]
    prof = {}
    for i in ids:
        scored = sorted(((-cos(vecs[i][1], c), ci) for ci, c in enumerate(cents)))
        ci = scored[0][1]
        n, s = prof.get(ci, (0, 0))
        c6 = round(cos(vecs[i][1], cents[ci]), 6)
        prof[ci] = (n + 1, s + math.floor(c6 * 1e6 + 0.5))
    return {
        ci: (n, s, s // n if s >= 0 else -((-s) // n))
        for ci, (n, s) in prof.items()
    }


def test_kmeans_profile_matches_replica(spark):
    from kg.ops import kmeans_profile

    vecs = {
        0: (0, [1.0, 0.0, 0.0]),
        1: (1, [0.0, 1.0, 0.0]),
        2: (2, [0.9, 0.1, 0.0]),
        3: (3, [0.1, 0.9, 0.0]),
        4: (4, [0.8, 0.2, 0.1]),
    }
    df = spark.createDataFrame(
        [(i, v) for i, (_, v) in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["cid"]: (r["n_vectors"], r["sum_cos_fp"], r["mean_cos_fp"])
        for r in kmeans_profile(df, "vec_id", "embedding", k=2, iters=1).collect()
    }
    exp = _profile_replica({i: (i, v) for i, (_, v) in vecs.items()}, 2, 1)
    assert got == exp
    # both clusters populated, cohesion sane
    assert set(got) == {0, 1}
    assert all(m > 900_000 for _, _, m in got.values())


def test_kmeans_profile_validates_k(spark):
    import pytest

    from kg.ops import kmeans_profile

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k must be"):
        kmeans_profile(df, "vec_id", "embedding", k=0)


# ---------------------------------------------------------------------------
# embedding_outliers
# ---------------------------------------------------------------------------
def test_embedding_outliers_flags_far_member(spark):
    """One cluster of near-identical vectors plus one far member: only
    the far member is flagged; integer mean/std verified by replica."""
    import math

    from kg.ops import embedding_outliers

    rows = [(i, [1.0, 0.001 * i, 0.0]) for i in range(6)]
    rows.append((6, [0.5, 0.86, 0.0]))  # ~60 degrees off the bundle
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (
            r["cid"], r["cos_fp"], r["mean_cos_fp"], r["std_fp"],
            r["is_outlier"],
        )
        for r in embedding_outliers(
            df, "vec_id", "embedding", k=1, iters=1, z=2
        ).collect()
    }
    assert len(got) == 7
    flagged = {v for v, t in got.items() if t[4]}
    assert flagged == {6}
    # replica of the integer stats on the observed cohesions
    xs = sorted(t[1] for t in got.values())
    n, s = len(xs), sum(xs)
    sq = sum(x * x for x in xs)
    mean = s // n if s >= 0 else -((-s) // n)
    std = math.floor(math.sqrt((n * sq - s * s) // (n * n)))
    assert all(t[2] == mean and t[3] == std for t in got.values())


def test_embedding_outliers_uniform_cluster_never_flags(spark):
    from kg.ops import embedding_outliers

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    got = embedding_outliers(df, "vec_id", "embedding", k=1, iters=1).collect()
    assert len(got) == 5
    assert not any(r["is_outlier"] for r in got)
    assert all(r["std_fp"] == 0 for r in got)


def test_embedding_outliers_validates(spark):
    import pytest

    from kg.ops import embedding_outliers

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k must be"):
        embedding_outliers(df, "vec_id", "embedding", k=0)
    with pytest.raises(ValueError, match="z must be"):
        embedding_outliers(df, "vec_id", "embedding", k=1, z=-1)
