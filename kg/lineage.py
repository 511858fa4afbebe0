"""Per-partition lineage + idempotent resume.

Generalizes the reference's checkpoint store (RocksDB KV holding one page
high-water-mark per element kind per shard, ``NeoToCosmos/Cache.cs:36-44``,
``Migrator.cs:66-68,80-81``) into a lineage *table*: one row per
(stage, bucket) with row counts, an order-insensitive content checksum and
a status — the Spark-native analogue of "simply rerun the command to
resume" (reference ``README.md:42``).

Resume protocol per stage:
  1. work is split into deterministic buckets (``pmod(xxhash64(keys), B)``);
  2. a rerun anti-joins buckets already recorded ``done`` (O16);
  3. bucket outputs are written with dynamic partition overwrite, so a
     crash between data write and lineage append just rewrites that bucket
     byte-identically on the next run (idempotent upsert semantics, the
     Spark mapping of the reference's BulkExecutor ``enableUpsert:true``,
     ``CosmosDb.cs:144``);
  4. ``--restart`` truncates outputs + lineage (O15/O17,
     ``CosmosDb.cs:101-118``, ``Cache.cs:24-34``).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from kg.schemas import LINEAGE


def bucket_col(*key_cols: str, n_buckets: int):
    """Deterministic work bucket: stable across runs and cluster sizes."""
    return F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int")


class LineageStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        self._recover()
        if os.path.exists(self.path):
            return self.spark.read.schema(LINEAGE).parquet(self.path)
        return self.spark.createDataFrame([], LINEAGE)

    def _recover(self) -> None:
        """Complete or roll back an interrupted ``_rewrite_keeping``.

        The rewrite's durability point is ``.tmp/_SUCCESS``: once the new
        table is fully written, recovery rolls FORWARD (swap the new
        table in), never backward — so an invalidation survives a crash
        in any later window regardless of the rerun's flags.  The r3
        rollback-only recovery silently resurrected changed-fingerprint
        drops when the interrupted ``detect_changes`` run was followed by
        a default rerun, which never re-derives that trigger (ADVICE r3).
        A ``.tmp`` without ``_SUCCESS`` is a partial write: discard it
        and roll back to ``.old`` if the live table is gone."""
        tmp, old = self.path + ".tmp", self.path + ".old"
        if os.path.exists(os.path.join(tmp, "_SUCCESS")):
            shutil.rmtree(self.path, ignore_errors=True)
            os.rename(tmp, self.path)
        else:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(self.path) and os.path.exists(old):
                os.rename(old, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def completed_buckets(self, stage: str) -> set[int]:
        rows = (
            self.read()
            .filter((F.col("stage") == stage) & (F.col("status") == "done"))
            .select("bucket")
            .collect()
        )
        return {r.bucket for r in rows}

    def changed_buckets(self, stage: str, cur_fp: DataFrame) -> set[int]:
        """Buckets whose recorded input fingerprint differs from the
        current one (changed-input merge; ``cur_fp``: bucket, cur_fp).
        A ``done`` record WITHOUT a fingerprint (written by a run with
        detect_changes off, which skips the content-column scan) cannot
        prove its input unchanged, so it is conservatively treated as
        changed and re-extracted once — after which it carries one.
        Both sides are bucket-count-sized — a driver-side set is fine."""
        rec = self.read().filter(
            (F.col("stage") == stage) & (F.col("status") == "done")
        ).select("bucket", "input_fp")
        rows = (
            rec.join(cur_fp, "bucket")
            .filter(
                F.col("input_fp").isNull()
                | (F.col("input_fp") != F.col("cur_fp"))
            )
            .select("bucket")
            .collect()
        )
        return {r.bucket for r in rows}

    def _rewrite_keeping(self, keep_pred) -> None:
        """Rewrite the lineage table keeping rows matching ``keep_pred``,
        CRASH-SAFELY: the new table is written next to the live one and
        swapped in with atomic renames.  The previous reset-then-write
        had a window where a crash left NO lineage at all — the next run
        would re-extract the entire corpus, a catastrophic resume
        regression in exactly the module whose contract is crash-resume.
        ``_recover`` (run by every ``read``) completes an interrupted
        swap forward once the new table is durable, else rolls back."""
        pdf = self.read().filter(keep_pred).toPandas()
        tmp, old = self.path + ".tmp", self.path + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        new = (
            self.spark.createDataFrame(pdf, schema=LINEAGE)
            if len(pdf)
            else self.spark.createDataFrame([], LINEAGE)
        )
        # the write is ALWAYS taken (an empty keep-set writes an empty
        # table): tmp/_SUCCESS is the durability point — from here
        # ``_recover`` rolls the swap FORWARD after any crash
        new.write.parquet(tmp)
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def invalidate_buckets(self, stage: str, buckets: set[int]) -> None:
        """Drop lineage rows for changed buckets so the rerun re-records
        them (the table is O(buckets) rows — a rewrite is trivial)."""
        self._rewrite_keeping(
            ~((F.col("stage") == stage) & F.col("bucket").isin(list(buckets)))
        )

    def invalidate_stages(self, *stages: str) -> None:
        """Drop ALL lineage rows for the given stages — used when a
        stage's inputs changed (e.g. extract produced new output, so
        every previously-done materialize bucket is stale).  No-op when
        nothing is recorded for them."""
        hit = self.read().filter(F.col("stage").isin(list(stages)))
        if hit.limit(1).count() == 0:
            return
        self._rewrite_keeping(~F.col("stage").isin(list(stages)))

    def stage_done(self, stage: str) -> bool:
        return bool(self.completed_buckets(stage))

    def record_buckets(
        self,
        stage: str,
        per_bucket: DataFrame,
        duration_ms: int,
    ) -> None:
        """Append one ``done`` row per bucket.

        ``per_bucket`` columns: bucket, rows_in, rows_out, content_sha_xor
        and optionally input_fp (changed-input fingerprint).
        """
        fp = (
            F.col("input_fp")
            if "input_fp" in per_bucket.columns
            else F.lit(None)
        )
        rows = per_bucket.select(
            F.lit(stage).alias("stage"),
            F.col("bucket").cast("int"),
            F.col("rows_in").cast("long"),
            F.col("rows_out").cast("long"),
            F.col("content_sha_xor").cast("string"),
            fp.cast("string").alias("input_fp"),
            F.lit("done").alias("status"),
            F.lit(duration_ms).cast("long").alias("duration_ms"),
        )
        rows.write.mode("append").parquet(self.path)

    def record_stage(
        self, stage: str, rows_in: int, rows_out: int, duration_ms: int
    ) -> None:
        self.record_buckets(
            stage,
            self.spark.createDataFrame(
                [(0, rows_in, rows_out, None)],
                "bucket int, rows_in long, rows_out long, content_sha_xor string",
            ),
            duration_ms,
        )

    def reset(self) -> None:
        """O17: truncate all checkpoints on --restart (Cache.cs:24-34)."""
        shutil.rmtree(self.path, ignore_errors=True)


class StageTimer:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.ms = int((time.monotonic() - self.t0) * 1000)
        return False
