"""Pipeline orchestration: extract → link → canonicalize → materialize.

The reference's lifecycle (``Migrator.MigrateAsync``: counts → bounds →
sink DDL → vertices → edges, ``Migrator.cs:31-48``) becomes four Spark
stages, each independently resumable through the lineage table.

Resume granularity:
  * extract — bucket-level (the corpus-sized stage; buckets are
    ``pmod(xxhash64(repo, path), B)`` so a rerun re-processes only missing
    buckets, mirroring the reference's page high-water-mark);
  * link / canonicalize / materialize — stage-level (inputs are
    vocabulary- or output-sized; a rerun overwrites atomically).

Skew: the hot-repo problem (one repo = ~30% of rows) is defeated *before*
the first wide transform by repartitioning on (bucket, salt) where salt is
``pmod(xxhash64(path), skew_salt)`` — SURVEY.md §4 watch list.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from kg.canonicalize import run_canonicalize
from kg.conf import PipelineConfig
from kg.extract import run_extract
from kg.lineage import LineageStore, StageTimer, bucket_col
from kg.link import run_link
from kg.materialize import run_materialize

STAGES = ("extract", "link", "canonicalize", "materialize")


def _write(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        # co-locate each output partition in one task first: without this,
        # every task writes a file into every partition dir (tasks ×
        # buckets small files — the classic partitioned-write explosion).
        # width pinned to the bucket count (not cores) so write-task size
        # — and therefore sort/commit behavior — is identical at every
        # cluster size.
        df = df.repartition(64, *[F.col(c) for c in partition_by])
        w = df.write.mode("overwrite").partitionBy(*partition_by).option(
            "partitionOverwriteMode", "dynamic"
        )
    w.parquet(path)


def run_pipeline(
    spark: SparkSession,
    source_files: DataFrame,
    cfg: PipelineConfig,
    restart: bool = False,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns the output DataFrames."""
    lineage = LineageStore(spark, cfg.table_path("lineage"))
    if restart:  # O15 + O17: truncate sink and checkpoints
        for t in ("triples", "mentions", "entity_map", "nodes", "edges"):
            shutil.rmtree(cfg.table_path(t), ignore_errors=True)
        lineage.reset()

    b = cfg.lineage_buckets
    triples_path = cfg.table_path("triples")

    # ---- extract (bucket-level resume) ------------------------------------
    done = lineage.completed_buckets("extract")
    src = source_files.withColumn(
        "bucket", bucket_col("repo", "path", n_buckets=b)
    )
    pending = src.filter(~F.col("bucket").isin(list(done))) if done else src
    # no-op short-circuit: a rerun with every bucket recorded skips the
    # whole extract job (one cheap early-terminating existence probe)
    has_pending = not done or pending.limit(1).count() > 0
    if has_pending:
        with StageTimer() as t:
            # extraction is per-row (no keyed shuffle), so hot-repo skew
            # is irrelevant here and repartitioning the full content
            # would be a wasted shuffle.  Skew handling happens where
            # keys appear: the triples write keys on bucket=
            # hash(repo,path) (uniform by construction — this IS the
            # salt: path salts the hot repo), and downstream joins key
            # on sha256 ids (uniform).
            new_triples = run_extract(pending.drop("bucket")).withColumn(
                "bucket", bucket_col("repo", "path", n_buckets=b)
            )
            # dynamic partition overwrite: only the buckets present in
            # this run's output are replaced — a crash between data write
            # and lineage append just rewrites those buckets
            # byte-identically.
            _write(new_triples, triples_path, ["bucket"])
        per_bucket = (
            spark.read.parquet(triples_path)
            .groupBy("bucket")
            .agg(
                F.countDistinct("path").alias("rows_in"),
                F.count("*").alias("rows_out"),
                F.sum(F.pmod(F.xxhash64("content_sha"), F.lit(1_000_000_007)))
                .cast("string")
                .alias("content_sha_xor"),
            )
        )
        new_buckets = (
            per_bucket.filter(~F.col("bucket").isin(list(done))) if done else per_bucket
        )
        lineage.record_buckets("extract", new_buckets, t.ms)
    triples = spark.read.parquet(triples_path).drop("bucket")

    # ---- link (stage-level resume) -----------------------------------------
    mentions_path = cfg.table_path("mentions")
    matches_path = cfg.table_path("matches")
    if not (lineage.stage_done("link") and os.path.exists(mentions_path)):
        with StageTimer() as t:
            mentions, matches = run_link(triples, cfg)
            _write(mentions.drop("shingles"), mentions_path)
            _write(matches, matches_path)
        lineage.record_stage("link", -1, -1, t.ms)
    mentions = spark.read.parquet(mentions_path)
    matches = spark.read.parquet(matches_path)

    # ---- canonicalize --------------------------------------------------------
    emap_path = cfg.table_path("entity_map")
    if not (lineage.stage_done("canonicalize") and os.path.exists(emap_path)):
        with StageTimer() as t:
            emap = run_canonicalize(mentions, matches)
            _write(emap, emap_path)
        lineage.record_stage("canonicalize", -1, -1, t.ms)
    entity_map = spark.read.parquet(emap_path)

    # ---- materialize ---------------------------------------------------------
    nodes_path = cfg.table_path("nodes")
    edges_path = cfg.table_path("edges")
    if not (lineage.stage_done("materialize") and os.path.exists(nodes_path)):
        with StageTimer() as t:
            nodes, edges = run_materialize(triples, entity_map, cfg)
            # partition the sink by a bucket of the partition key — the
            # Spark mapping of the reference's pk-partitioned container
            # (CosmosDb.cs:125-132); bucketing bounds file counts at scale.
            nodes = nodes.withColumn(
                "pk_bucket", bucket_col("partition_key", n_buckets=b)
            )
            edges = edges.withColumn(
                "pk_bucket", bucket_col("out_pk", n_buckets=b)
            )
            _write(nodes, nodes_path, ["pk_bucket"])
            _write(edges, edges_path, ["pk_bucket"])
        lineage.record_stage("materialize", -1, -1, t.ms)
    nodes = spark.read.parquet(nodes_path).drop("pk_bucket")
    edges = spark.read.parquet(edges_path).drop("pk_bucket")

    return {
        "triples": triples,
        "mentions": mentions,
        "matches": matches,
        "entity_map": entity_map,
        "nodes": nodes,
        "edges": edges,
        "lineage": lineage.read(),
    }
