"""spark-submit entry point.

    spark-submit --py-files dist/kg.zip jobs/run_pipeline.py \
        --source /path/to/source_files --warehouse /path/to/warehouse \
        [--restart] [--synthetic N] [--shuffle-partitions K]

CLI surface mirrors the reference's (CommandLineOptions.cs:8-26): ``-r``
restart → ``--restart``; ``-t/-i`` sharding and ``-p`` page size dissolve
into Spark parallelism (``--shuffle-partitions`` + cluster conf).
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


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="kg pipeline")
    ap.add_argument("--source", help="path to source_files parquet/iceberg table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic files instead of --source")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--restart", action="store_true",
                    help="truncate outputs + lineage before running (O15)")
    ap.add_argument("--detect-changes", action="store_true",
                    help="fingerprint source buckets and re-extract any "
                         "whose input changed since the recorded lineage")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--partition-key", default="repo")
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
    if args.shuffle_partitions:
        cfg.shuffle_partitions = args.shuffle_partitions
    spark = get_spark("kg-pipeline", shuffle_partitions=cfg.shuffle_partitions)

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
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
