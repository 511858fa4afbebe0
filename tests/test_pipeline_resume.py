"""Lineage + resume tests (FIXTURES.md §5): reruns are idempotent, resume
processes only missing work, outputs byte-identical to a clean run."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kg.conf import PipelineConfig
from kg.datagen import source_files_df
from kg.lineage import LineageStore
from kg.pipeline import run_pipeline

N = 60


def _cfg(tmp_path_factory, name) -> PipelineConfig:
    return PipelineConfig(
        warehouse=str(tmp_path_factory.mktemp(name)), lineage_buckets=8
    )


def _snapshot(out):
    nodes = sorted(
        (r.id, r.label, r.partition_key, tuple(sorted((r.properties or {}).items())))
        for r in out["nodes"].collect()
    )
    edges = sorted(
        (r.id, r.label, r.out_id, r.in_id, r.out_label, r.in_label, r.out_pk, r.in_pk)
        for r in out["edges"].collect()
    )
    return nodes, edges


def test_rerun_is_idempotent(spark, tmp_path_factory):
    cfg = _cfg(tmp_path_factory, "idem")
    src = source_files_df(spark, N)
    out1 = run_pipeline(spark, src, cfg, restart=True)
    snap1 = _snapshot(out1)
    out2 = run_pipeline(spark, src, cfg)  # rerun, nothing to do
    snap2 = _snapshot(out2)
    assert snap1 == snap2
    # no duplicate ids after rerun (upsert semantics, CosmosDb.cs:144)
    assert out2["nodes"].count() == out2["nodes"].select("id").distinct().count()


def test_resume_processes_only_missing_buckets(spark, tmp_path_factory):
    cfg = _cfg(tmp_path_factory, "resume")
    src = source_files_df(spark, N)

    # clean full run → golden snapshot
    golden_cfg = _cfg(tmp_path_factory, "golden")
    golden = _snapshot(run_pipeline(spark, src, golden_cfg, restart=True))

    # simulated crash: run fully, then delete half the extract lineage AND
    # the stage outputs downstream of extract — the rerun must re-extract
    # only the missing buckets and rebuild downstream.
    run_pipeline(spark, src, cfg, restart=True)
    store = LineageStore(spark, cfg.table_path("lineage"))
    keep = store.read().filter(
        (F.col("stage") == "extract") & (F.col("bucket") < 4)
    )
    pdf = keep.toPandas()
    store.reset()
    spark.createDataFrame(pdf, schema=keep.schema).write.parquet(store.path)
    for t in ("mentions", "matches", "entity_map", "nodes", "edges"):
        shutil.rmtree(cfg.table_path(t), ignore_errors=True)

    done_before = store.completed_buckets("extract")
    assert 0 < len(done_before) < cfg.lineage_buckets

    out = run_pipeline(spark, src, cfg)
    assert _snapshot(out) == golden
    # all buckets now recorded
    assert len(store.completed_buckets("extract")) >= cfg.lineage_buckets - len(
        done_before
    )


def test_restart_truncates_everything(spark, tmp_path_factory):
    cfg = _cfg(tmp_path_factory, "restart")
    src = source_files_df(spark, 20)
    run_pipeline(spark, src, cfg, restart=True)
    out = run_pipeline(spark, src, cfg, restart=True)  # O15: truncate + redo
    n = out["nodes"].count()
    assert n == out["nodes"].select("id").distinct().count() > 0


def test_lineage_metrics_recorded(spark, tmp_path_factory):
    cfg = _cfg(tmp_path_factory, "metrics")
    out = run_pipeline(spark, source_files_df(spark, 30), cfg, restart=True)
    lin = out["lineage"]
    stages = {r.stage for r in lin.select("stage").distinct().collect()}
    assert stages == {"extract", "link", "canonicalize", "materialize"}
    ext = lin.filter("stage = 'extract'")
    assert ext.agg(F.sum("rows_out")).first()[0] == out["triples"].count()
    assert ext.filter("duration_ms >= 0").count() == ext.count()
