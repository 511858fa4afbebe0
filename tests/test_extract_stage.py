"""Spark e2e tests for the extract stage (SURVEY.md §7 step 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kg.datagen import golden_triples, source_files_df
from kg.extract import run_extract, triples_from_source

N = 120


def test_extract_matches_golden(spark):
    src = source_files_df(spark, N)
    got = {
        (r.subj, r.pred, r.obj, r.content_sha)
        for r in triples_from_source(src).collect()
    }
    gold = golden_triples(N)
    exp = set(zip(gold.subj, gold.pred, gold.obj, gold.content_sha))
    # P/R == 1.0 on the planted corpus (target: ≥0.95, BASELINE.json)
    assert got == exp


def test_extract_sha_matches_spark_sha2(spark):
    """content_sha computed in the pandas batch equals Spark's F.sha2 on the
    same content column — the lineage invariant holds across engines."""
    src = source_files_df(spark, 40).withColumn(
        "sha_spark", F.sha2(F.col("content"), 256)
    )
    sha_by_file = {
        (r.repo, r.path): r.sha_spark for r in src.select("repo", "path", "sha_spark").collect()
    }
    triples = run_extract(source_files_df(spark, 40))
    for r in triples.select("repo", "path", "content_sha").distinct().collect():
        assert r.content_sha == sha_by_file[(r.repo, r.path)]


def test_extract_is_deduped(spark):
    t = run_extract(source_files_df(spark, N))
    assert t.count() == t.dropDuplicates(["subj", "pred", "obj", "content_sha"]).count()
