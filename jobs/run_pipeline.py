"""spark-submit entry point.

    spark-submit --py-files dist/kg.zip jobs/run_pipeline.py \
        --source /path/to/source_files --warehouse /path/to/warehouse \
        [--restart] [--synthetic N] [--shuffle-partitions K]

CLI surface mirrors the reference's (CommandLineOptions.cs:8-26): ``-r``
restart → ``--restart``; ``-t/-i`` sharding and ``-p`` page size dissolve
into Spark parallelism (``--shuffle-partitions`` + cluster conf).
``--stream`` runs the extract stage incrementally via Structured
Streaming (AvailableNow) — cron-style: each invocation drains exactly
the source files that landed since the last one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# direct `python jobs/run_pipeline.py` puts jobs/ on sys.path, not the repo
# root; on a cluster the package ships via --py-files instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> None:
    """``spark=None`` builds and owns a session (spark-submit path);
    a caller-supplied session (tests) is reused and NOT stopped."""
    ap = argparse.ArgumentParser(description="kg pipeline")
    ap.add_argument("--source", help="path to source_files parquet/iceberg table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic files instead of --source")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--stream", action="store_true",
                    help="incremental extract via Structured Streaming "
                         "(Trigger.AvailableNow): drain files of --source "
                         "not yet in the stream checkpoint exactly once, "
                         "then stop — the streaming-native form of the "
                         "reference's resume-from-checkpoint loop")
    ap.add_argument("--restart", action="store_true",
                    help="truncate outputs + lineage before running (O15)")
    ap.add_argument("--dedup", choices=["exact", "minhash"], default=None,
                    help="clean stage between source and extract: drop "
                         "exact duplicate contents (deterministic keeper), "
                         "'minhash' additionally drops MinHash-LSH "
                         "near-duplicates")
    ap.add_argument("--dedup-threshold", type=float, default=0.7,
                    help="Jaccard threshold for --dedup minhash")
    ap.add_argument("--detect-changes", action="store_true",
                    help="fingerprint source buckets and re-run any whose "
                         "input changed since the recorded lineage — "
                         "governs extract AND the --dedup clean stage "
                         "(grown sources hash into already-done buckets; "
                         "without this flag a rerun resumes past them)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--partition-key", default="repo")
    ap.add_argument("--extract-engine", choices=["arrow", "jvm"], default=None,
                    help="extract execution path: 'arrow' (pandas/Arrow "
                         "UDF, default; required for tree-sitter-style "
                         "extractors) or 'jvm' (equivalence-tested "
                         "Catalyst regex twin — zero Python workers); "
                         "default from KG_EXTRACT_ENGINE env")
    ap.add_argument("-l", "--log-level", default="INFO",
                    help="kg logger level (reference -l, CommandLineOptions.cs:24)")
    ap.add_argument("--show-ddl", action="store_true",
                    help="print the Iceberg sink DDL (O14) and exit")
    args = ap.parse_args(argv)

    import logging

    logging.basicConfig(
        stream=sys.stderr,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    logging.getLogger("kg").setLevel(args.log_level.upper())

    if args.show_ddl:
        from kg.io.tables import sink_ddl_statements

        for stmt in sink_ddl_statements(warehouse=args.warehouse):
            print(stmt + ";")
        return

    from kg.conf import PipelineConfig
    from kg.session import get_spark

    cfg = PipelineConfig(
        warehouse=args.warehouse, partition_key=args.partition_key
    )
    if args.extract_engine:
        cfg.extract_engine = args.extract_engine
    if args.shuffle_partitions:
        cfg.shuffle_partitions = args.shuffle_partitions
    owns_session = spark is None
    if owns_session:
        spark = get_spark(
            "kg-pipeline", shuffle_partitions=cfg.shuffle_partitions
        )

    if args.stream:
        _run_stream(spark, args, cfg)
        if owns_session:
            spark.stop()
        return

    if args.synthetic:
        from kg.datagen import source_files_df

        source = source_files_df(spark, args.synthetic)
    elif args.source:
        source = spark.read.parquet(args.source)
    else:
        ap.error("one of --source / --synthetic is required")

    from kg.pipeline import run_pipeline

    t0 = time.monotonic()
    out = run_pipeline(
        spark, source, cfg, restart=args.restart,
        detect_changes=args.detect_changes,
        dedup=args.dedup, dedup_threshold=args.dedup_threshold,
    )
    n_triples = out["triples"].count()
    n_nodes = out["nodes"].count()
    n_edges = out["edges"].count()
    sec = time.monotonic() - t0
    print(
        json.dumps(
            {
                "triples": n_triples,
                "nodes": n_nodes,
                "edges": n_edges,
                "sec": round(sec, 3),
                "triples_per_sec": round(n_triples / sec, 1),
            }
        )
    )
    if owns_session:
        spark.stop()


def _run_stream(spark, args, cfg) -> None:
    """O22 parity for the streaming surface (VERDICT r3 next #4): the
    incremental-extract operator was tested but unreachable from the
    deployment CLI.  Re-invoking after new source files land processes
    ONLY the new files (exactly-once per file via the stream checkpoint)
    — the streaming-native mapping of the reference's rerun-to-resume
    contract; ``--restart`` truncates output + checkpoint like O15."""
    import shutil

    from kg.log import log_event
    from kg.streaming import stream_extract

    if not args.source:
        raise SystemExit("--stream requires --source")
    out_dir = cfg.table_path("triples_stream")
    ckpt = cfg.table_path("stream_checkpoint")
    if args.restart:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        log_event("restart_truncated", warehouse=cfg.warehouse, mode="stream")
    log_event("stream_start", source=args.source, out=out_dir)
    t0 = time.monotonic()
    q = stream_extract(spark, args.source, out_dir, ckpt)
    q.awaitTermination()
    sec = time.monotonic() - t0
    n = (
        spark.read.parquet(out_dir).count()
        if os.path.exists(out_dir)
        else 0
    )
    log_event("stream_done", rows_total=n, duration_ms=int(sec * 1000))
    print(
        json.dumps(
            {"mode": "stream", "triples_total": n, "sec": round(sec, 3)}
        )
    )


if __name__ == "__main__":
    sys.exit(main())
