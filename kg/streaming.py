"""Structured Streaming surface.

The reference is explicitly batch-only ("NOT intended to synchronize a
live production database", reference README.md:9); its resume contract is
page checkpoints.  The streaming-native generalization of that contract is
Structured Streaming's checkpointed incremental execution: new
``source_files`` files are discovered, extracted, and appended exactly
once per file — the micro-batch analogue of the reference's
resume-from-high-water-mark loop (Migrator.cs:64-83).

Four operators:

* ``stream_extract`` — incremental triple extraction over a growing
  parquet directory; ``Trigger.AvailableNow`` drains the backlog and
  stops (ideal for cron-style incremental pipeline runs).
* ``windowed_event_counts`` — watermarked sliding-window aggregation
  (late data beyond the watermark is dropped), the standard stateful
  pattern for metric rollups over an event stream.
* ``stream_dedup_exact`` — streaming exact dedup with BOUNDED state
  (``dropDuplicatesWithinWatermark`` keyed on content sha256): the
  training-data ingest pattern for crawler re-fetches and upstream
  retries.
* ``stateful_session_stats`` — CUSTOM stateful operator
  (``applyInPandasWithState``): running per-user totals ACROSS
  gap-based sessions.  The built-in ``session_window`` (surfaced as
  the ``event_sessions`` query) emits one row per closed session;
  cumulative per-user counters over the whole stream would need a
  second stateful aggregation over those rows — here it is one
  operator holding 3 longs of state per user.  Streaming twin of the
  batch ``user_event_windows`` query.
* ``stream_range_join`` — stream-stream interval join with
  watermark-evicted symmetric-hash state (batch-parity tested).
* ``stream_drift_monitor`` — per-micro-batch PSI drift of a column
  against a static reference snapshot via ``foreachBatch``: online
  corpus-mix monitoring with at-least-once monitor appends
  (dedupe on batch_id at read time if a replay matters).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

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


def stream_dedup_exact(
    docs: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per content key,
    drop re-arrivals within the watermark horizon.

    The batch ``exact_duplicates`` groups the whole corpus; a stream
    cannot hold all history, so state must be BOUNDED: Spark's
    ``dropDuplicatesWithinWatermark`` keeps one state row per key and
    expires it once the event-time watermark passes — re-ingested
    documents (crawler re-fetches, upstream retries) inside the horizon
    dedup exactly, older re-arrivals are an upstream contract.  The key
    is the sha256 of the content (not the raw text) so state rows are
    64 chars regardless of document size — the same trick the batch
    operator and the lineage table use.

    Works on batch DataFrames too: the fallback keeps the EARLIEST row
    per key (min event time) — a distributed ``dropDuplicates`` keeps an
    arbitrary row per key (whichever partition wins the reduction),
    which would make batch reruns non-idempotent."""
    key_cols = key_cols or ["content_key"]
    if "content_key" in key_cols and "content_key" not in docs.columns:
        docs = docs.withColumn("content_key", F.sha2(F.col("text"), 256))
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if docs.isStreaming:
        return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    from pyspark.sql import Window as W

    # tie-break equal timestamps with a hash of the whole row: without a
    # total order, two same-key rows stamped with one fetch time would
    # keep a partition-order-dependent winner — non-idempotent reruns
    w = W.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.xxhash64(*docs.columns).asc()
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


_SESSION_OUT = "user_id long, n_events long, n_sessions long"
_SESSION_STATE = "last_ts long, n_events long, n_sessions long"


def _session_merge(gap_seconds: int):
    """Per-key state-merge function for ``applyInPandasWithState``.

    State per user: (epoch-seconds of the last event seen, running event
    count, running session count).  The key's whole micro-batch is folded
    with ONE vectorized numpy pass (sort + diff + comparison) — no per-row
    Python, so a batch with millions of rows for a hot key still costs
    O(n log n) C-speed work.  A row opens a new session iff it is the
    user's first event ever or its gap from the previous event exceeds
    ``gap_seconds`` — exactly the batch `lag`-over-window rule.

    The iterator yields the key's micro-batch data as MULTIPLE Arrow
    chunks (split at arrow.maxRecordsPerBatch) in arbitrary post-shuffle
    order, so the chunks are concatenated and sorted ONCE before the
    fold: sorting each chunk independently would fold cross-chunk
    backwards gaps as "same session" and regress ``last_ts`` for exactly
    the hot keys this operator exists for (ADVICE r3).  Memory stays
    bounded by the key's micro-batch size, which the concat holds anyway.
    """
    import numpy as np

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        last_ts, n_ev, n_sess = state.get if state.exists else (None, 0, 0)
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            ts = (
                pdf["ts"].astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
            ).to_numpy()
            # prepend the carried last_ts so the first row of THIS batch is
            # gap-checked against the previous batch's tail; a never-seen
            # user gets a sentinel that forces its first row to open a
            # session (the batch query's `gap IS NULL` branch)
            prev = last_ts if last_ts is not None else ts[0] - gap_seconds - 1
            gaps = np.diff(ts, prepend=prev)
            n_sess += int((gaps > gap_seconds).sum())
            n_ev += int(len(ts))
            last_ts = int(ts[-1])
        state.update((last_ts, int(n_ev), int(n_sess)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_ev], "n_sessions": [n_sess]}
        )

    return fn


def stateful_session_stats(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful streaming sessionization via ``applyInPandasWithState``.

    Emits the running (n_events, n_sessions) per user on every micro-batch
    that touches the user (output mode ``update``; both counters are
    monotone, so the per-user max — or latest row — is the current answer).
    If micro-batches arrive in per-user time order, the final emitted row
    per user is EXACTLY the batch ``user_event_windows`` answer (tested).

    Scale posture: the only shuffle is the hash partition on ``user_id``
    that keyed state requires; per-key state is 3 longs regardless of
    history length; the batch fold is vectorized numpy (no per-row
    Python).  Late cross-batch data would need a watermark + reorder
    buffer — out of scope, as for the reference's batch-only contract.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_merge(gap_seconds),
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_range_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_s: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each left event pairs with the same
    key's right events inside the half-open window ``[ts, ts+window_s)``
    — the streaming twin of the batch ``kg.ops.events.range_join``
    (identical pair semantics, tested for parity).  Output = every left
    column + the right side's timestamp and payload columns prefixed
    ``r_``.

    Scale posture: Spark's symmetric hash join buffers BOTH sides keyed
    on ``key_col``; the watermark + the explicit time bound let it
    EVICT state once ``right.ts`` can no longer land inside any live
    left window — without the time-range conjunct the state grows
    forever, which is the classic stream-join OOM.  State is therefore
    O(events inside watermark+window horizon), not O(stream).  Late
    rows beyond the watermark are dropped (the windowed-agg contract).

    Works on batch frames too (the same plan without state) — used by
    the parity test; the bucketized ``range_join`` remains the batch
    path of choice because it never buffers.
    """
    if window_s <= 0:
        raise ValueError(f"window_s must be > 0, got {window_s}")
    for c in (key_col, ts_col):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"key/ts column {c!r} must exist on both sides")
    clash = [
        c for c in right.columns if c != key_col and f"r_{c}" in left.columns
    ]
    if clash:
        raise ValueError(f"left already has prefixed columns for {clash}")
    l = left.withColumn(ts_col, F.col(ts_col).cast("timestamp")).alias("l")
    r = right.withColumn(ts_col, F.col(ts_col).cast("timestamp")).select(
        F.col(key_col),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != key_col
        ],
    ).alias("r")
    if l.isStreaming:
        l = l.withWatermark(ts_col, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"r_{ts_col}", watermark)
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.r_{ts_col}") >= F.col(f"l.{ts_col}"))
        & (
            F.col(f"r.r_{ts_col}")
            < F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    return l.join(r, cond).select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.r_{c}") for c in right.columns if c != key_col],
    )


def stream_drift_monitor(
    stream_df: DataFrame,
    reference: DataFrame,
    col: str,
    monitor_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
):
    """Online drift monitor: for every micro-batch, compute the PSI of
    ``col``'s distribution in the batch against a STATIC reference
    snapshot (``kg.ops.stats.distribution_drift``) and append one row
    ``(batch_id, n_a, n_b, n_bins, psi_fp, psi)`` to ``monitor_dir``
    — the streaming face of the governance gate: an ingest pipeline
    alerts when an upstream crawler change shifts the language/source
    mix mid-stream rather than at the next corpus release.

    ``foreachBatch`` is the right integration (not a streaming agg):
    PSI is a whole-batch statistic against an external frame, and
    foreachBatch hands each micro-batch to the BATCH operator —
    identical semantics to the oracle-checked batch op.  Delivery is
    AT-LEAST-ONCE (ADVICE r5): a blind parquet append inside
    foreachBatch can replay its batch if the job dies between the
    write and the checkpoint commit, duplicating that batch's monitor
    row — consumers should dedupe on ``batch_id`` at read time (the
    row is deterministic per batch, so duplicates are byte-identical).
    Returns the started query (AvailableNow: drains the backlog, then
    stops).

    Scale posture: the reference frame re-aggregates per batch (≤ B
    bins shuffled); pre-aggregate the reference once and pass the
    ≤ B-row bin frame if batches are small and frequent.
    """
    from kg.ops.stats import distribution_drift

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            distribution_drift(reference, batch_df, col, n_buckets)
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "n_a",
                "n_b",
                "n_bins",
                "psi_fp",
                "psi",
            )
            .write.mode("append")
            .parquet(monitor_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
