"""O21 structured run logging + O14 sink DDL tests."""

from __future__ import annotations

import json
import logging

from kg.conf import PipelineConfig
from kg.datagen import source_files_df
from kg.io.tables import ensure_sink, sink_ddl_statements
from kg.pipeline import run_pipeline


def _events(caplog):
    out = []
    for rec in caplog.records:
        if rec.name == "kg":
            out.append(json.loads(rec.message))
    return out


def test_pipeline_emits_structured_events(spark, tmp_path_factory, caplog):
    """O21 (Program.cs:34-40 analogue): one JSON line per stage event —
    start/done on a fresh run, skipped on an all-done rerun."""
    cfg = PipelineConfig(
        warehouse=str(tmp_path_factory.mktemp("log")), lineage_buckets=8
    )
    src = source_files_df(spark, 20)
    with caplog.at_level(logging.INFO, logger="kg"):
        run_pipeline(spark, src, cfg, restart=True)
    ev = _events(caplog)
    kinds = {(e["event"], e.get("stage")) for e in ev}
    assert ("pipeline_start", None) in kinds
    assert ("restart_truncated", None) in kinds
    for stage in ("extract", "link", "canonicalize", "materialize"):
        assert ("stage_start", stage) in kinds
        assert ("stage_done", stage) in kinds
    done = {e["stage"]: e["duration_ms"] for e in ev if e["event"] == "stage_done"}
    assert all(ms >= 0 for ms in done.values())

    caplog.clear()
    with caplog.at_level(logging.INFO, logger="kg"):
        run_pipeline(spark, src, cfg)  # rerun: everything done
    kinds2 = {(e["event"], e.get("stage")) for e in _events(caplog)}
    for stage in ("extract", "link", "canonicalize", "materialize"):
        assert ("stage_skipped", stage) in kinds2
        assert ("stage_start", stage) not in kinds2


def test_sink_ddl_statements_shape():
    """O14 (CosmosDb.cs:120-140): CREATE TABLE ... USING iceberg with a
    pk-bucketed partition spec and throughput-analogue table props."""
    stmts = sink_ddl_statements("/wh", buckets=64)
    assert len(stmts) == 4
    by_name = {s.split()[5]: s for s in stmts}
    assert set(by_name) == {"triples", "nodes", "edges", "lineage"}
    edges = by_name["edges"]
    assert edges.startswith("CREATE TABLE IF NOT EXISTS edges (")
    assert "USING iceberg" in edges
    assert "PARTITIONED BY (bucket(64, out_pk))" in edges
    assert "LOCATION '/wh/edges'" in edges
    assert "write.target-file-size-bytes" in edges
    # flat provenance columns are in the DDL (storage layout, not the map)
    assert "content_sha string" in edges
    assert "PARTITIONED BY (bucket(64, partition_key))" in by_name["nodes"]


def test_ensure_sink_falls_back_without_iceberg(spark, tmp_path_factory):
    """This container ships no Iceberg jars: ensure_sink must report the
    parquet-dir fallback instead of raising (on a jar-equipped cluster the
    same statements execute as-is)."""
    wh = str(tmp_path_factory.mktemp("ddl"))
    assert ensure_sink(spark, wh) == "parquet-dir"
