"""Structured Streaming surface.

The reference is explicitly batch-only ("NOT intended to synchronize a
live production database", reference README.md:9); its resume contract is
page checkpoints.  The streaming-native generalization of that contract is
Structured Streaming's checkpointed incremental execution: new
``source_files`` files are discovered, extracted, and appended exactly
once per file — the micro-batch analogue of the reference's
resume-from-high-water-mark loop (Migrator.cs:64-83).

Two operators:

* ``stream_extract`` — incremental triple extraction over a growing
  parquet directory; ``Trigger.AvailableNow`` drains the backlog and
  stops (ideal for cron-style incremental pipeline runs).
* ``windowed_event_counts`` — watermarked sliding-window aggregation
  (late data beyond the watermark is dropped), the standard stateful
  pattern for metric rollups over an event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from kg.extract import triples_from_source
from kg.schemas import SOURCE_FILES


def stream_extract(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incrementally extract triples from a growing source_files directory.

    Returns the started StreamingQuery (AvailableNow: drains then stops).
    Exactly-once per input file via the stream checkpoint — re-running
    after new files land processes only the new files.
    """
    reader = spark.readStream.schema(SOURCE_FILES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    triples = triples_from_source(src)
    return (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked (sliding) window counts per event_type.

    Works on both a streaming DataFrame (stateful, late rows beyond the
    watermark dropped) and a batch DataFrame (same plan, no state).
    """
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # watermarks require TIMESTAMP (with tz); parquet NTZ timestamps are
    # cast here so the operator works on both (session tz is pinned UTC)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            # fixed-point twin: floor per row BEFORE the sum, so the total
            # is an exact integer independent of partial-aggregation order
            # (float sums are order-sensitive near rounding boundaries and
            # flake against other engines — money-as-cents convention)
            F.sum(F.floor(F.col("value") * 10000)).cast("long").alias("sum_value_fp"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "sum_value_fp",
        )
    )
