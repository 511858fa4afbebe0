"""Lineage + resume tests (FIXTURES.md §5): reruns are idempotent, resume
processes only missing work, outputs byte-identical to a clean run."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kg.conf import PipelineConfig
from kg.datagen import source_files_df
from kg.lineage import LineageStore, bucket_col
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


def _seeded_store(spark, tmp_path_factory) -> LineageStore:
    store = LineageStore(
        spark, str(tmp_path_factory.mktemp("lineage_unit")) + "/lineage"
    )
    per_bucket = spark.createDataFrame(
        [(b, 1, 1, None) for b in range(4)],
        "bucket int, rows_in long, rows_out long, content_sha_xor string",
    )
    store.record_buckets("extract", per_bucket, 0)
    return store


def test_lineage_invalidation_survives_crash_after_durability_point(
    spark, tmp_path_factory
):
    """ADVICE r3: a crash inside the rewrite's rename window used to
    resurrect changed-fingerprint drops when the rerun didn't re-derive
    the trigger (default detect_changes=False).  The durability point is
    now tmp/_SUCCESS: simulate both post-durability crash windows and
    assert recovery rolls the drop FORWARD."""
    import os

    from kg.schemas import LINEAGE

    # window 1: tmp fully written, crash BEFORE the live table moved aside
    store = _seeded_store(spark, tmp_path_factory)
    keep = store.read().filter(F.col("bucket") < 2).toPandas()
    spark.createDataFrame(keep, schema=LINEAGE).write.parquet(store.path + ".tmp")
    assert store.completed_buckets("extract") == {0, 1}
    assert not os.path.exists(store.path + ".tmp")

    # window 2: live table moved to .old, crash before tmp→path rename
    store = _seeded_store(spark, tmp_path_factory)
    keep = store.read().filter(F.col("bucket") < 2).toPandas()
    spark.createDataFrame(keep, schema=LINEAGE).write.parquet(store.path + ".tmp")
    os.rename(store.path, store.path + ".old")
    assert store.completed_buckets("extract") == {0, 1}
    assert not os.path.exists(store.path + ".old")


def test_lineage_partial_tmp_rolls_back(spark, tmp_path_factory):
    """A crash MID-write of the new table (no _SUCCESS yet) discards the
    partial tmp and recovers the previous state — re-deriving triggers is
    then the rerun's job, and nothing recorded is lost."""
    import os

    store = _seeded_store(spark, tmp_path_factory)
    os.makedirs(store.path + ".tmp")
    with open(store.path + ".tmp/part-00000.parquet", "wb") as f:
        f.write(b"partial")
    os.rename(store.path, store.path + ".old")
    assert store.completed_buckets("extract") == {0, 1, 2, 3}
    assert not os.path.exists(store.path + ".tmp")
    assert not os.path.exists(store.path + ".old")


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
    # every bucket with source rows is now recorded done (the previous
    # `>= buckets - len(done_before)` bound was already true BEFORE the
    # resume run, so it couldn't catch a skipped-recording regression)
    all_buckets = {
        r["b"]
        for r in src.select(
            bucket_col("repo", "path", n_buckets=cfg.lineage_buckets).alias("b")
        )
        .distinct()
        .collect()
    }
    assert store.completed_buckets("extract") == all_buckets >= done_before


def _with_modified_file(spark, src, n):
    """Corpus with ONE python file's content changed (adds an import)."""
    from kg.datagen import make_file

    target = next(f for f in map(make_file, range(n)) if f["lang"] == "python")
    is_target = (F.col("repo") == target["repo"]) & (
        F.col("path") == target["path"]
    )
    new_content = target["content"] + "\nimport sentinelxyz\n"
    return (
        src.withColumn(
            "content",
            F.when(is_target, F.lit(new_content)).otherwise(F.col("content")),
        ),
        target,
    )


def test_changed_input_bucket_is_rewritten(spark, tmp_path_factory):
    """Merge-with-changed-input (reference upsert semantics for *modified*
    documents, CosmosDb.cs:144): a rerun with detect_changes re-extracts
    only the changed bucket, converges to the clean-run state, keeps ids
    deterministic and introduces no duplicates."""
    cfg = _cfg(tmp_path_factory, "merge")
    src = source_files_df(spark, N)
    # detect_changes on the FIRST run too: fingerprints are recorded only
    # when asked for (the default path skips the content-column scan), and
    # only a fingerprinted record can prove a bucket unchanged later
    run_pipeline(spark, src, cfg, restart=True, detect_changes=True)
    store = LineageStore(spark, cfg.table_path("lineage"))
    n_lineage_rows_1 = store.read().filter("stage = 'extract'").count()
    assert (
        store.read()
        .filter("stage = 'extract' AND input_fp IS NULL")
        .count()
        == 0
    )

    src2, target = _with_modified_file(spark, src, N)
    # clean-run golden on the modified corpus
    golden = _snapshot(
        run_pipeline(spark, src2, _cfg(tmp_path_factory, "merge_g"), restart=True)
    )

    out = run_pipeline(spark, src2, cfg, detect_changes=True)
    assert _snapshot(out) == golden
    # the new import reached the graph
    sent = out["triples"].filter(
        (F.col("pred") == "imports-of") & (F.col("obj") == "sentinelxyz")
    )
    assert sent.count() == 1
    # no duplicate ids (the changed bucket was overwritten, not appended)
    assert out["nodes"].count() == out["nodes"].select("id").distinct().count()
    assert out["edges"].count() == out["edges"].select("id").distinct().count()
    # exactly one bucket was invalidated + re-recorded: row count unchanged
    assert store.read().filter("stage = 'extract'").count() == n_lineage_rows_1

    # a further rerun detects nothing to do (fingerprints now match)
    before = store.read().toPandas()
    run_pipeline(spark, src2, cfg, detect_changes=True)
    after = store.read().toPandas()
    assert len(before) == len(after)


def test_changed_bucket_with_zero_output_clears_stale_rows(
    spark, tmp_path_factory
):
    """Dynamic partition overwrite only replaces partitions PRESENT in
    the new output: a changed bucket whose re-extraction now yields ZERO
    triples must still lose its stale rows (the write path clears pending
    bucket dirs first), and lineage must record rows_out for the new
    state, not the stale files'."""
    from kg.datagen import make_file
    from kg.lineage import bucket_col

    cfg = _cfg(tmp_path_factory, "zero_clear")
    target = next(f for f in map(make_file, range(N)) if f["lang"] == "python")
    is_target = (F.col("repo") == target["repo"]) & (
        F.col("path") == target["path"]
    )
    # make the target the ONLY file in its work bucket — otherwise the
    # bucket's rewrite carries other files' rows and dynamic overwrite
    # replaces the partition even without the explicit clearing
    full = source_files_df(spark, N).withColumn(
        "b", bucket_col("repo", "path", n_buckets=cfg.lineage_buckets)
    )
    tb = full.filter(is_target).select("b").first().b
    src = full.filter((F.col("b") != tb) | is_target).drop("b")
    run_pipeline(spark, src, cfg, restart=True, detect_changes=True)

    # blank the file: its bucket's re-extraction now yields ZERO rows
    src2 = src.withColumn(
        "content", F.when(is_target, F.lit("x = 1\n")).otherwise(F.col("content"))
    )
    golden = _snapshot(
        run_pipeline(
            spark, src2, _cfg(tmp_path_factory, "zero_clear_g"), restart=True
        )
    )
    out = run_pipeline(spark, src2, cfg, detect_changes=True)
    assert (
        out["triples"].filter(F.col("path") == target["path"]).count() == 0
    )
    assert _snapshot(out) == golden


def test_crash_after_extract_recorded_still_rebuilds_downstream(
    spark, tmp_path_factory, monkeypatch
):
    """Durable downstream invalidation: a run that re-extracts new input,
    records extract lineage, then CRASHES before link completes must not
    strand stale downstream outputs — the rerun (where extract itself has
    nothing pending) must still rebuild link/canonicalize/materialize and
    converge to the clean-run state.  Before the fix, the invalidation
    rode the in-process extract_ran flag and the rerun skipped every
    downstream stage against the stale 'done' lineage."""
    import kg.pipeline as P

    cfg = _cfg(tmp_path_factory, "crash_ds")
    src = source_files_df(spark, N)
    golden = _snapshot(run_pipeline(spark, src, cfg, restart=True))

    # run B: a detect_changes rerun (run A recorded no fingerprints, so
    # every bucket is conservatively re-extracted) records extract
    # lineage, then link crashes
    real_mft = P.mentions_from_triples
    monkeypatch.setattr(
        P,
        "mentions_from_triples",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(RuntimeError, match="boom"):
        run_pipeline(spark, src, cfg, detect_changes=True)
    monkeypatch.setattr(P, "mentions_from_triples", real_mft)

    # run C: extract has nothing pending (extract_ran=False), but the
    # crashed run's durable invalidation forces downstream to rebuild
    store = LineageStore(spark, cfg.table_path("lineage"))
    assert "link" not in {
        r.stage for r in store.read().select("stage").distinct().collect()
    }
    out = run_pipeline(spark, src, cfg)
    assert _snapshot(out) == golden


def test_default_run_skips_fingerprint_then_detect_changes_recovers(
    spark, tmp_path_factory
):
    """The default path records NO input fingerprint (no content-column
    re-scan of the corpus); a later detect_changes run cannot prove those
    buckets unchanged, so it conservatively re-extracts them once and
    upgrades the records with fingerprints — converging to the same
    state, after which detection is incremental again."""
    cfg = _cfg(tmp_path_factory, "fp_gate")
    src = source_files_df(spark, N)
    out1 = run_pipeline(spark, src, cfg, restart=True)
    n1 = out1["triples"].count()
    store = LineageStore(spark, cfg.table_path("lineage"))
    ext = store.read().filter("stage = 'extract'")
    assert ext.filter("input_fp IS NOT NULL").count() == 0

    out2 = run_pipeline(spark, src, cfg, detect_changes=True)
    assert out2["triples"].count() == n1
    ext = store.read().filter("stage = 'extract'")
    assert ext.filter("input_fp IS NULL").count() == 0

    # now fingerprinted: a further detect_changes rerun is a no-op
    before = store.read().toPandas()
    run_pipeline(spark, src, cfg, detect_changes=True)
    assert len(before) == len(store.read().toPandas())


def test_zero_output_bucket_is_marked_done(spark, tmp_path_factory):
    """Lineage is recorded from the source side: a bucket whose files
    yield no triples must still be marked done (else real corpora with
    unknown-language files re-extract it on every rerun)."""
    from kg.lineage import bucket_col

    cfg = PipelineConfig(
        warehouse=str(tmp_path_factory.mktemp("zero")), lineage_buckets=64
    )
    src = source_files_df(spark, 6)
    # add a file that yields zero triples (pure filler, no imports/classes)
    extra = src.sparkSession.createDataFrame(
        [("orgz/repoz", "src/empty.py", "c" * 40, "python", "x = 1\ny = x + 1\n")],
        src.schema,
    )
    src = src.unionByName(extra)
    out = run_pipeline(spark, src, cfg, restart=True)

    b0 = (
        extra.select(bucket_col("repo", "path", n_buckets=64).alias("b"))
        .first()
        .b
    )
    store = LineageStore(spark, cfg.table_path("lineage"))
    assert b0 in store.completed_buckets("extract")
    row = (
        store.read()
        .filter((F.col("stage") == "extract") & (F.col("bucket") == b0))
        .first()
    )
    assert row.rows_in >= 1
    # rerun: nothing pending, lineage unchanged (the short-circuit holds
    # even though the bucket produced no triples)
    n1 = store.read().count()
    run_pipeline(spark, src, cfg)
    assert store.read().count() == n1
    assert out["triples"].filter(F.col("path") == "src/empty.py").count() == 0


def test_materialize_resume_rewrites_only_missing_buckets(
    spark, tmp_path_factory
):
    """Kill-mid-materialize (VERDICT r2 #6): with extract fully done, a
    rerun must rewrite ONLY the node buckets whose lineage is missing —
    completed buckets' files stay untouched on disk — and converge to the
    clean-run state."""
    import os

    cfg = _cfg(tmp_path_factory, "mat_resume")
    src = source_files_df(spark, N)
    golden = _snapshot(run_pipeline(spark, src, cfg, restart=True))

    store = LineageStore(spark, cfg.table_path("lineage"))
    done = sorted(store.completed_buckets("materialize_nodes"))
    assert done == list(range(cfg.lineage_buckets))  # every bucket recorded
    # simulated crash: half the node buckets unrecorded + their data gone
    lost = set(done[: len(done) // 2])
    store.invalidate_buckets("materialize_nodes", lost)
    nodes_path = cfg.table_path("nodes")
    for bkt in lost:
        shutil.rmtree(f"{nodes_path}/pk_bucket={bkt}", ignore_errors=True)

    survivor = f"{nodes_path}/pk_bucket={done[-1]}"
    mtimes_before = {
        f: os.path.getmtime(f"{survivor}/{f}") for f in os.listdir(survivor)
    }

    out = run_pipeline(spark, src, cfg)
    assert _snapshot(out) == golden
    # completed buckets were NOT rewritten (same files, same mtimes)
    mtimes_after = {
        f: os.path.getmtime(f"{survivor}/{f}") for f in os.listdir(survivor)
    }
    assert mtimes_after == mtimes_before
    assert sorted(store.completed_buckets("materialize_nodes")) == done


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
    assert stages == {
        "extract", "link", "canonicalize",
        "materialize_nodes", "materialize_edges",
    }
    ext = lin.filter("stage = 'extract'")
    assert ext.agg(F.sum("rows_out")).first()[0] == out["triples"].count()
    assert ext.filter("duration_ms >= 0").count() == ext.count()


def test_restart_clears_rewrite_scratch_dirs(spark, tmp_path_factory):
    """A crash after the rewrite's .tmp/_SUCCESS durability point
    followed by --restart: reset() must remove .tmp/.old too, or the
    next read's _recover() rolls the PRE-restart table forward over the
    reset — every stage would then read 'done' lineage for outputs the
    restart just truncated."""
    import os

    from kg.schemas import LINEAGE

    store = _seeded_store(spark, tmp_path_factory)
    keep = store.read().toPandas()
    # simulate the post-durability crash window of _rewrite_keeping
    spark.createDataFrame(keep, schema=LINEAGE).write.parquet(
        store.path + ".tmp"
    )
    store.reset()
    assert store.completed_buckets("extract") == set()
    assert not os.path.exists(store.path + ".tmp")
    # .old alone (pre-durability window): reset clears it as well
    store2 = _seeded_store(spark, tmp_path_factory)
    os.rename(store2.path, store2.path + ".old")
    store2.reset()
    assert store2.completed_buckets("extract") == set()
    assert not os.path.exists(store2.path + ".old")
