"""Structured Streaming tests: incremental exactly-once extract,
watermarked windowed aggregation (batch-mode plan parity), and the
custom stateful sessionization operator (cross-batch state carry +
checkpoint-restart recovery, equivalence vs the batch lag-window rule)."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd

from pyspark.sql import Window as W, functions as F

from kg.datagen import local_corpus
from kg.schemas import SOURCE_FILES
from kg.streaming import (
    stateful_session_stats,
    stream_dedup_exact,
    stream_extract,
    windowed_event_counts,
)


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


def test_stream_cli_exactly_once(spark, tmp_path, capsys):
    """O22 parity: `--stream` reaches stream_extract from the deployment
    CLI.  Files landing between invocations are drained exactly once;
    a third invocation with nothing new is a no-op."""
    import json as _json

    from jobs.run_pipeline import main

    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    corpus = local_corpus(40)
    argv = ["--stream", "--source", src, "--warehouse", wh]

    _write_batch(spark, corpus.iloc[:20], src)
    main(argv, spark=spark)
    n1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "triples_total"
    ]
    assert n1 > 0

    _write_batch(spark, corpus.iloc[20:], src)
    main(argv, spark=spark)
    n2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "triples_total"
    ]
    got = spark.read.parquet(f"{wh}/triples_stream")
    assert n2 > n1 and got.count() == n2
    # exactly-once: re-invocation processed only the NEW files
    assert n2 == got.dropDuplicates(
        ["subj", "pred", "obj", "content_sha"]
    ).count()

    main(argv, spark=spark)  # nothing new → no-op
    n3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "triples_total"
    ]
    assert n3 == n2

    # --restart truncates output + checkpoint (O15 for the stream mode)
    main(argv + ["--restart"], spark=spark)
    n4 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "triples_total"
    ]
    assert n4 == n2  # full re-drain of all 40 files


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


def test_stream_dedup_exact_drops_cross_batch_rearrivals(spark, tmp_path):
    """A re-fetched document arriving in a LATER micro-batch (same
    content, new doc_id, inside the watermark) is dropped; the first
    arrival and unique contents survive.  Batch mode falls back to plain
    dropDuplicates."""
    from datetime import datetime, timedelta

    schema = "doc_id long, text string, ts timestamp"
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    batch1 = spark.createDataFrame(
        [(1, "alpha content", t0), (2, "beta content", t0 + timedelta(seconds=60))],
        schema,
    )
    batch2 = spark.createDataFrame(
        [
            (3, "alpha content", t0 + timedelta(seconds=120)),  # re-fetch of 1
            (4, "gamma content", t0 + timedelta(seconds=180)),
        ],
        schema,
    )
    src = str(tmp_path / "docs_stream")
    _stage_slice(batch1, src, "000", 1_000_000_000)
    _stage_slice(batch2, src, "001", 1_000_000_100)

    stream = spark.readStream.schema(batch1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = stream_dedup_exact(stream, watermark="1 hour")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.sql("SELECT doc_id FROM dedup_stream").collect()}
    assert kept == {1, 2, 4}

    # batch-mode fallback: deterministic first-arrival-wins dedup
    batch_all = batch1.unionByName(batch2)
    got = stream_dedup_exact(batch_all)
    assert not got.isStreaming
    assert {r.doc_id for r in got.collect()} == {1, 2, 4}
    assert got.select("content_key").distinct().count() == 3


# ---------------------------------------------------------------------------
# custom stateful operator: applyInPandasWithState sessionization
# ---------------------------------------------------------------------------
class _FakeState:
    """Minimal GroupState stand-in for direct merge-function tests."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_session_merge_sorts_across_arrow_chunks():
    """applyInPandasWithState delivers a hot key's micro-batch as MULTIPLE
    Arrow chunks in arbitrary post-shuffle order; the fold must sort the
    UNION, not each chunk (ADVICE r3: per-chunk sorting folded cross-chunk
    backwards gaps as 'same session').  Timestamps interleave across the
    two chunks: [0, 4000] and [2000, 6000] — every sorted gap is 2000 s >
    1800 s, so the batch rule says 4 sessions; the per-chunk fold said 3."""
    from datetime import datetime, timedelta

    from kg.streaming import _session_merge

    t0 = datetime(2026, 1, 1)
    mk = lambda secs, ids: pd.DataFrame(
        {"user_id": 7, "ts": [t0 + timedelta(seconds=s) for s in secs],
         "event_id": ids}
    )
    state = _FakeState()
    fn = _session_merge(1800)
    (out,) = fn((7,), iter([mk([0, 4000], [1, 2]), mk([2000, 6000], [3, 4])]), state)
    assert out.iloc[0].to_dict() == {"user_id": 7, "n_events": 4, "n_sessions": 4}
    # carried state feeds the next micro-batch exactly as a single chunk
    # would: last_ts is the epoch of t0+6000 s, not a chunk-local tail
    assert state.get == (pd.Timestamp(t0).value // 1_000_000_000 + 6000, 4, 4)
    (out2,) = fn((7,), iter([mk([6100], [5])]), state)
    assert out2.iloc[0].to_dict() == {"user_id": 7, "n_events": 5, "n_sessions": 4}


def _expected_session_stats(events) -> dict:
    """The batch lag-window sessionization rule (q_user_event_windows)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    rows = (
        events.select(
            "user_id",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("ns"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("ns").cast("long").alias("n_sessions"),
        )
        .collect()
    )
    return {r.user_id: (r.n_events, r.n_sessions) for r in rows}


def _stage_slice(df, stream_dir: str, name: str, mtime: float) -> None:
    """Write one time-slice as a single parquet file in the stream dir,
    with a controlled mtime (FileStreamSource drains oldest-first)."""
    tmp = stream_dir + f"__tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(stream_dir, exist_ok=True)
    dst = os.path.join(stream_dir, f"{name}.parquet")
    shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp)


def _latest_per_user(spark, path: str) -> dict:
    """The sink holds every per-batch emission; both counters are
    monotone per user, so max == the latest (current) answer."""
    rows = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("e"), F.max("n_sessions").alias("s"))
        .collect()
    )
    return {r.user_id: (r.e, r.s) for r in rows}


def test_stateful_session_stats_matches_batch_rule(spark, tmp_path, sf_dir):
    """State carries across micro-batches AND across a checkpoint restart:
    3 time-ordered slices drain as 3 micro-batches (maxFilesPerTrigger=1)
    and the per-user result equals the batch lag-window answer; a 4th
    slice landing later resumes from the checkpointed state and users it
    touches converge to the full-data batch answer."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ordered = events.withColumn(
        "rn", F.row_number().over(W.orderBy("ts", "event_id"))
    )
    n = events.count()
    cut = [0, n // 4, n // 2, 3 * n // 4, n]
    src = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    base = 1_000_000_000
    for i in range(4):
        _stage_slice(
            ordered.filter(
                (F.col("rn") > cut[i]) & (F.col("rn") <= cut[i + 1])
            ).drop("rn"),
            src,
            f"{i:03d}",
            base + i * 100,
        )

    def drain(sink: str, include_glob: str | None) -> None:
        reader = spark.readStream.schema(events.schema).option(
            "maxFilesPerTrigger", 1
        )
        if include_glob:
            reader = reader.option("pathGlobFilter", include_glob)
        stream = reader.parquet(src)
        out = stateful_session_stats(stream, gap_seconds=1800)
        assert out.isStreaming
        # foreachBatch → parquet: a sink that SUPPORTS checkpoint
        # recovery (the memory sink does not), so run 2 proves state
        # survives a query restart
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(sink)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    sink1 = str(tmp_path / "sink1")
    sink2 = str(tmp_path / "sink2")
    # run 1: slices 0-2 only (glob excludes 003) → 3 micro-batches
    drain(sink1, "00[0-2].parquet")
    got1 = _latest_per_user(spark, sink1)
    exp1 = _expected_session_stats(ordered.filter(F.col("rn") <= cut[3]))
    assert got1 == exp1

    # run 2: slice 003 now visible; state resumes from the checkpoint —
    # only users in the new slice are re-emitted, at full-data values
    drain(sink2, None)
    got2 = _latest_per_user(spark, sink2)
    assert len(got2) > 0
    exp_full = _expected_session_stats(events)
    for uid, stats in got2.items():
        assert stats == exp_full[uid]
    # users untouched by slice 003 were already final after run 1
    touched = set(got2)
    for uid, stats in exp_full.items():
        if uid not in touched:
            assert got1[uid] == stats


def test_stream_range_join_matches_batch_range_join(spark, tmp_path):
    """Stream-stream interval join over two file streams == the batch
    bucketized range_join pair set, exactly once across micro-batches."""
    import os
    from datetime import datetime

    from kg.ops import range_join
    from kg.streaming import stream_range_join

    def _t(m, s=0):
        return datetime(2024, 1, 1, 0, m, s)

    lrows = [(1, 10, _t(0)), (2, 10, _t(30)), (3, 11, _t(5))]
    rrows = [
        (101, 10, _t(10), 1.5),   # inside anchor 1's 30-min window
        (102, 10, _t(30), 2.5),   # at end: exclusive for 1, inside 2
        (103, 11, _t(40), 3.5),   # outside anchor 3's window
        (104, 12, _t(1), 4.5),    # other key
    ]
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    lschema = "anchor_id long, user_id long, ts timestamp"
    rschema = "rid long, user_id long, ts timestamp, val double"
    # two files per side -> multiple micro-batches
    spark.createDataFrame(lrows[:2], lschema).write.parquet(
        os.path.join(ldir, "a")
    )
    spark.createDataFrame(lrows[2:], lschema).write.parquet(
        os.path.join(ldir, "b")
    )
    spark.createDataFrame(rrows[:2], rschema).write.parquet(
        os.path.join(rdir, "a")
    )
    spark.createDataFrame(rrows[2:], rschema).write.parquet(
        os.path.join(rdir, "b")
    )

    ls = spark.readStream.schema(lschema).option(
        "recursiveFileLookup", "true"
    ).parquet(ldir)
    rs = spark.readStream.schema(rschema).option(
        "recursiveFileLookup", "true"
    ).parquet(rdir)
    joined = stream_range_join(ls, rs, window_s=1800)
    q = (
        joined.writeStream.format("memory")
        .queryName("srj")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["anchor_id"], r["r_rid"])
        for r in spark.sql("SELECT * FROM srj").collect()
    }
    assert got == {(1, 101), (2, 102)}

    # batch parity: same pairs through the bucketized batch operator
    lb = spark.createDataFrame(lrows, lschema).select(
        "anchor_id", "user_id", F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 1800 SECONDS")).alias("t1"),
    )
    rb = spark.createDataFrame(rrows, rschema)
    batch = {
        (r["anchor_id"], r["rid"])
        for r in range_join(
            lb, rb, "t0", "t1", key_col="user_id", bucket_s=600
        ).collect()
    }
    assert batch == got


def test_stream_range_join_batch_mode_and_validation(spark):
    from datetime import datetime

    from kg.streaming import stream_range_join

    L = spark.createDataFrame(
        [(1, 5, datetime(2024, 1, 1))], "aid long, user_id long, ts timestamp"
    )
    R = spark.createDataFrame(
        [(2, 5, datetime(2024, 1, 1, 0, 10), 9.0)],
        "rid long, user_id long, ts timestamp, val double",
    )
    out = stream_range_join(L, R, window_s=3600)
    assert [tuple(r) for r in out.collect()] == [
        (1, 5, datetime(2024, 1, 1), 2, datetime(2024, 1, 1, 0, 10), 9.0)
    ]
    import pytest as _pt

    with _pt.raises(ValueError, match="window_s"):
        stream_range_join(L, R, window_s=0)
    with _pt.raises(ValueError, match="must exist"):
        stream_range_join(L.drop("user_id"), R)


def test_stream_drift_monitor_matches_batch_psi(spark, tmp_path):
    """Each micro-batch's monitor row equals the batch operator run on
    the same slice; checkpoint makes re-runs exactly-once."""
    from kg.ops.stats import distribution_drift
    from kg.streaming import stream_drift_monitor

    src = str(tmp_path / "src")
    mon = str(tmp_path / "monitor")
    ckpt = str(tmp_path / "ckpt")
    ref = spark.createDataFrame(
        [(i, "en" if i % 4 else "de") for i in range(40)],
        "doc_id long, lang string",
    )

    # batch 1: same mix as the reference -> low psi
    b1 = [(100 + i, "en" if i % 4 else "de") for i in range(40)]
    spark.createDataFrame(b1, "doc_id long, lang string").write.parquet(
        src, mode="append"
    )
    q = stream_drift_monitor(
        spark.readStream.schema("doc_id long, lang string").parquet(src),
        ref, "lang", mon, ckpt,
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(mon).collect()
    assert len(rows) == 1
    expect = distribution_drift(
        ref, spark.createDataFrame(b1, "doc_id long, lang string"), "lang"
    ).collect()[0]
    assert rows[0]["psi_fp"] == expect["psi_fp"]
    assert rows[0]["psi"] < 0.05  # same mix: stable band

    # batch 2: all-fr shift -> investigate band; first batch not re-read
    b2 = [(200 + i, "fr") for i in range(40)]
    spark.createDataFrame(b2, "doc_id long, lang string").write.parquet(
        src, mode="append"
    )
    q = stream_drift_monitor(
        spark.readStream.schema("doc_id long, lang string").parquet(src),
        ref, "lang", mon, ckpt,
    )
    q.awaitTermination(120)
    rows = {r["batch_id"]: r for r in spark.read.parquet(mon).collect()}
    assert len(rows) == 2
    shifted = [r for r in rows.values() if r["psi"] > 0.25]
    assert len(shifted) == 1 and shifted[0]["n_b"] == 40
