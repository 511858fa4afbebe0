"""Fine-grained, load-gated profile of the bench-protocol pipeline run.

Times each stage's sub-steps separately (extract write, mention
checkpoint, candidate+score, CC, node/edge writes) at the bench scale so
fixed costs are attributable.  Waits for 1-min load < 3.5 before the
timed section (bounded), same discipline as bench.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gate(budget=300.0, thresh=3.5):
    while budget > 0 and os.getloadavg()[0] > thresh:
        time.sleep(5)
        budget -= 5
    return os.getloadavg()[0]


def main() -> None:
    n_files = int(os.environ.get("KG_PROF_FILES", "200000"))
    from kg.conf import PipelineConfig
    from kg.datagen import source_files_df
    from kg.session import get_spark

    spark = get_spark(
        "prof_pipe", cores=16, shuffle_partitions=16,
        extra_conf={"spark.local.dir": "/dev/shm/kg_prof_local"},
    )
    shm = "/dev/shm"
    src_dir = tempfile.mkdtemp(prefix="kg_prof_src_", dir=shm)
    source_files_df(spark, n_files).write.mode("overwrite").parquet(src_dir)
    wh = tempfile.mkdtemp(prefix="kg_prof_wh_", dir=shm)
    cfg = PipelineConfig(
        warehouse=wh, shuffle_partitions=16, extract_engine="arrow"
    )
    src = spark.read.parquet(src_dir)

    print("gate: load", round(gate(), 2), flush=True)
    marks = [("t0", time.monotonic())]

    def mark(label):
        marks.append((label, time.monotonic()))
        print(
            f"{label}: {marks[-1][1] - marks[-2][1]:.2f}s  (load "
            f"{os.getloadavg()[0]:.1f})",
            flush=True,
        )

    from pyspark.sql import functions as F

    from kg.extract import run_extract
    from kg.lineage import bucket_col

    b = cfg.lineage_buckets
    triples_path = cfg.table_path("triples")
    new_triples = run_extract(src, engine=cfg.extract_engine).withColumn(
        "bucket", bucket_col("repo", "path", n_buckets=b)
    )
    from kg.pipeline import _write

    _write(new_triples, triples_path, ["bucket"], buckets=b)
    mark("extract+write")

    src_per_bucket = src.withColumn(
        "bucket", bucket_col("repo", "path", n_buckets=b)
    ).groupBy("bucket").agg(F.count("*").alias("rows_in"))
    out_per_bucket = (
        spark.read.parquet(triples_path)
        .groupBy("bucket")
        .agg(F.count("*").alias("rows_out"))
    )
    src_per_bucket.join(out_per_bucket, "bucket", "left").collect()
    mark("extract lineage aggs")

    triples = spark.read.parquet(triples_path).drop("bucket")
    from kg.link.stage import candidate_pairs, mentions_from_triples, score_pairs

    mentions = mentions_from_triples(triples, cfg).localCheckpoint()
    mark("link: mentions ckpt")
    pairs = candidate_pairs(mentions, cfg)
    scored = score_pairs(pairs, mentions, cfg).filter(F.col("is_match"))
    _write(mentions.drop("shingles"), cfg.table_path("mentions"))
    mark("link: mentions write")
    _write(scored, cfg.table_path("matches"))
    mark("link: cand+score+write")

    matches = spark.read.parquet(cfg.table_path("matches"))
    from kg.canonicalize import run_canonicalize

    emap = run_canonicalize(spark.read.parquet(cfg.table_path("mentions")), matches)
    _write(emap, cfg.table_path("entity_map"))
    mark("canonicalize+write")

    entity_map = spark.read.parquet(cfg.table_path("entity_map"))
    from kg.materialize import run_materialize

    nodes, edges = run_materialize(triples, entity_map, cfg)
    nodes = nodes.withColumn("pk_bucket", bucket_col("partition_key", n_buckets=b))
    edges = edges.withColumn("pk_bucket", bucket_col("out_pk", n_buckets=b))
    _write(nodes, cfg.table_path("nodes"), ["pk_bucket"], buckets=b)
    mark("materialize: nodes write")
    _write(edges, cfg.table_path("edges"), ["pk_bucket"], buckets=b)
    mark("materialize: edges write")

    total = marks[-1][1] - marks[0][1]
    print(f"TOTAL {total:.2f}s")
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(src_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
