"""SparkSession factory.

One JVM, ``local[N]`` in this sandbox; the conf profile is written for a
multi-executor cluster (AQE on, skew-join on, Arrow on) so the same code
ships unchanged via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this workload.

    ``cores`` controls local parallelism (``local[cores]``); defaults to
    ``$SPARK_GRAFT_CPUS`` or ``*``.  On a real cluster the master is set by
    spark-submit and this falls through untouched.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # same empty-string-is-unset contract as the master line above
        # (and kg.conf._env_int): `SPARK_GRAFT_CPUS= cmd` must not raise
        raw = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(raw) if raw else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # CPU-heavy Python stages sit right on top of file scans; the
        # default 128 MB split would give far fewer tasks than cores on
        # medium tables. Splits are sized on COMPRESSED bytes and Spark
        # bin-packs small files up to this limit, so with zstd's ~10x
        # ratio on text a 16 MB split already carries ~160 MB of raw
        # content — an 800k-file corpus collapsed to ~8 splits and
        # starved local[16] (measured: extract 2x slower, materialize
        # flat across core counts). 4 MB keeps every core fed at bench
        # scale; on a 100 TB cluster raise KG_SPLIT_BYTES — the knob
        # trades scheduler overhead vs per-task Python work.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("KG_SPLIT_BYTES", "4m"))
        .config("spark.sql.session.timeZone", "UTC")
        # partition discovery of the 64-bucket warehouse tables: the
        # default threshold (32 dirs) pushes listing into a distributed
        # Spark job — four ~0.4 s jobs per pipeline run just to list 64
        # LOCAL directories the driver stats in microseconds.  Raised so
        # local-FS listing stays driver-side; on a real object store
        # (where parallel listing earns its cost) deployments lower it
        # back via extra_conf.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
        # zstd for shuffle/spill blocks and parquet output: more CPU per
        # byte but far fewer bytes — compression CPU parallelizes across
        # cores while memory/disk bandwidth does not, so trading bandwidth
        # for compute is exactly what a bandwidth-bound stage needs to
        # scale (and on a real cluster it cuts network shuffle too)
        .config("spark.io.compression.codec", os.environ.get("KG_IO_CODEC", "zstd"))
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("KG_PARQUET_CODEC", "zstd"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("KG_DRIVER_MEM", "48g"))
    )
    # Only pin the master when none is set (spark-submit / cluster launch
    # defines spark.master as a system property → visible in SparkConf).
    # NB: checking SPARK_SUBMIT_OPTS is WRONG — this container exports it
    # globally for ivy config, which silently turned every local[N]
    # request into local[*].
    from pyspark import SparkConf

    if not SparkConf().contains("spark.master") and not os.environ.get("SPARK_MASTER"):
        builder = builder.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # plan-shape guard for every HOF-array explode in the library
    # (see the helper's docstring for the measured O(L²) failure mode)
    from kg.hints import exclude_generate_filter_inference

    exclude_generate_filter_inference(spark)
    return spark
