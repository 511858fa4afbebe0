"""O21 structured run logging + O14 sink DDL tests."""

from __future__ import annotations

import json
import logging

import pytest

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


def test_ensure_sink_falls_back_without_iceberg(spark, tmp_path_factory, caplog):
    """This container ships no Iceberg jars: ensure_sink must report the
    parquet-dir fallback instead of raising (on a jar-equipped cluster the
    same statements execute as-is) — and log the degradation."""
    wh = str(tmp_path_factory.mktemp("ddl"))
    with caplog.at_level(logging.INFO, logger="kg"):
        assert ensure_sink(spark, wh) == "parquet-dir"
    assert any(e["event"] == "sink_fallback" for e in _events(caplog))


def test_ensure_sink_raises_on_malformed_ddl(spark, tmp_path_factory, monkeypatch):
    """VERDICT r2 #5: only missing-data-source errors may fall back; a
    typo'd statement must FAIL — a blanket except would hide it forever
    on a jar-equipped cluster."""
    import kg.io.tables as t

    monkeypatch.setattr(
        t, "sink_ddl_statements", lambda *a, **k: ["CREATE TABL oops (x int)"]
    )
    with pytest.raises(Exception) as exc:
        ensure_sink(spark, str(tmp_path_factory.mktemp("bad")))
    assert "parquet-dir" not in str(exc.value)


def test_sink_ddl_parses(spark):
    """Parse-level gate for the generated DDL (VERDICT r2 #8): the
    container cannot EXECUTE iceberg statements, but Spark's SQL parser
    accepts or rejects them without resolving the data source — so the
    generated strings cannot silently rot into syntax errors."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    for stmt in sink_ddl_statements("/wh", buckets=64):
        parser.parsePlan(stmt)  # raises ParseException on bad syntax
