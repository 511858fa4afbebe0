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
