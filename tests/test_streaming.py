"""Structured Streaming tests: incremental exactly-once extract, and
watermarked windowed aggregation (batch-mode plan parity)."""

from __future__ import annotations

import pandas as pd

from kg.datagen import local_corpus
from kg.schemas import SOURCE_FILES
from kg.streaming import stream_extract, windowed_event_counts


def _write_batch(spark, pdf: pd.DataFrame, path: str) -> None:
    spark.createDataFrame(pdf, schema=SOURCE_FILES).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_extract_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus = local_corpus(40)

    # batch 1: first 20 files
    _write_batch(spark, corpus.iloc[:20], src)
    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # batch 2: next 20 files land; rerun drains ONLY the new files
    _write_batch(spark, corpus.iloc[20:], src)
    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n2 = got.count()
    assert n2 > n1
    # exactly-once: no duplicated triples across micro-batches
    assert n2 == got.dropDuplicates(["subj", "pred", "obj", "content_sha"]).count()

    # third run with no new files is a no-op
    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n2


def test_windowed_event_counts_batch_parity(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(events, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert len(rows) > 0
    total = sum(r.n_events for r in rows)
    assert total == events.count()  # batch mode: nothing dropped
    for r in rows:
        assert r.window_start < r.window_end


def test_windowed_counts_streaming_plan_is_stateful(spark, tmp_path, sf_dir):
    """The same transform compiles to a streaming stateful plan."""
    # stage the batch events as a file-stream source
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n_events) AS n FROM win_counts").first().n
    assert got == events.count()
