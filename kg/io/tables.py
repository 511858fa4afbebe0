"""Managed-table DDL (O14): the Spark mapping of the reference's sink DDL.

The reference creates its sink container with a user-chosen partition-key
path and a throughput setting (``CosmosDb.cs:120-140``
``CreateCollectionIfNotExistsAsync``: pk at ``:128-132``, RU throughput at
``:137``).  The Spark-native equivalents:

* partition-key path  → ``PARTITIONED BY (bucket(B, <pk column>))`` —
  bucketing the pk bounds file counts at 10^12-doc scale exactly as the
  bucketed ``pk_bucket`` parquet layout in ``kg.pipeline`` does;
* RU throughput       → write-parallelism/file-size table properties
  (``write.target-file-size-bytes``, ``write.distribution-mode``).

This container ships no Iceberg/Delta jars, so ``ensure_sink`` attempts
the DDL and falls back to the parquet-directory layout the pipeline uses
(identical partitioning semantics via dynamic partition overwrite); on an
Iceberg-enabled cluster the same statements execute as-is.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from kg.schemas import EDGES, LINEAGE, NODES, TRIPLES

_TARGET_FILE_BYTES = 512 * 1024 * 1024  # 512 MB — large-scan-friendly


def _columns_ddl(schema: T.StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema)


def sink_ddl(
    name: str,
    schema: T.StructType,
    partition_expr: str,
    location: str | None = None,
    using: str = "iceberg",
) -> str:
    """One CREATE TABLE IF NOT EXISTS statement (O14)."""
    loc = f" LOCATION '{location}'" if location else ""
    return (
        f"CREATE TABLE IF NOT EXISTS {name} ({_columns_ddl(schema)}) "
        f"USING {using} PARTITIONED BY ({partition_expr}){loc} "
        f"TBLPROPERTIES ("
        f"'write.target-file-size-bytes'='{_TARGET_FILE_BYTES}', "
        f"'write.distribution-mode'='hash')"
    )


def sink_ddl_statements(
    warehouse: str, buckets: int = 64, using: str = "iceberg"
) -> list[str]:
    """DDL for every pipeline-managed table, pk-bucketed like the sink
    container (reference: one container, one pk path; here: one table per
    element kind per SURVEY §1.2, each bucketed on its partition key)."""
    spec = [
        ("triples", TRIPLES, "bucket({b}, repo)"),
        ("nodes", NODES, "bucket({b}, partition_key)"),
        ("edges", EDGES, "bucket({b}, out_pk)"),
        ("lineage", LINEAGE, "stage"),
    ]
    return [
        sink_ddl(
            name,
            schema,
            part.format(b=buckets),
            location=f"{warehouse}/{name}",
            using=using,
        )
        for name, schema, part in spec
    ]


# error signatures meaning "the data source isn't on the classpath" — the
# ONLY condition under which falling back to parquet is correct.  A typo'd
# statement, a permission failure, or a catalog error must surface: on a
# jar-equipped cluster a blanket except would silently degrade the sink
# forever (VERDICT r2 #5).
_MISSING_SOURCE_MARKERS = (
    "DATA_SOURCE_NOT_FOUND",
    "Failed to find the data source",
    "Failed to find data source",
    "ClassNotFoundException",
    "NoClassDefFoundError",
)


def ensure_sink(
    spark: SparkSession, warehouse: str, buckets: int = 64
) -> str:
    """Execute the sink DDL; returns the mode actually in effect.

    ``"iceberg"`` when the catalog accepts the statements (real cluster);
    ``"parquet-dir"`` when — and ONLY when — the Iceberg data source is
    absent from the classpath (this container): the pipeline's bucketed,
    dynamically-overwritten parquet layout provides the same partitioning
    + idempotent-upsert semantics (``kg.pipeline._write``).  Any other
    DDL failure re-raises.
    """
    from kg.log import log_event

    try:
        for stmt in sink_ddl_statements(warehouse, buckets):
            spark.sql(stmt)
        return "iceberg"
    except Exception as e:
        msg = str(e)
        if any(m in msg for m in _MISSING_SOURCE_MARKERS):
            log_event(
                "sink_fallback",
                mode="parquet-dir",
                reason=msg.splitlines()[0][:200],
            )
            return "parquet-dir"
        raise
