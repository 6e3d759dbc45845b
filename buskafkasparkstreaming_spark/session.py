"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N] (single JVM), but every config here is chosen
so the same plans hold on a 1000-executor cluster: AQE for runtime re-plan /
skew-join handling, partition-size-targeted shuffles, Arrow for the few
Python-side operators, UTC session time so event-time semantics are
deployment-independent (the reference had a schema-drift bug here —
01-setup-ec-vm.md:309 types epoch-millis as `date`; we normalize in one
place instead, see functions.epoch_millis_to_ts).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "buskafkasparkstreaming-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Defaults are env-overridable so the bench driver can pin cores:
    ``SPARK_GRAFT_CPUS`` → ``local[N]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("BSS_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism / correctness ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- shuffle & adaptivity (scale levers) ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.files.maxPartitionBytes", "128MB")
        # --- python boundary: always Arrow-batched, never row-at-a-time ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- memory: generous driver for local[N] single-JVM testing ---
        .config("spark.driver.memory", os.environ.get("BSS_DRIVER_MEMORY", "12g"))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata stores events.ts as TIMESTAMP(NANOS) which Spark
        # cannot read natively; read as long and normalize (sources.files)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timezone-naive parquet timestamps (current events.ts encoding)
        # must read as TIMESTAMP, not TIMESTAMP_NTZ — event-time ops
        # (withWatermark, window) reject NTZ; UTC session makes it exact
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        # managed-table warehouse (bucketed tables) outside the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("BSS_WAREHOUSE_DIR", "/tmp/bss-warehouse"),
        )
    )
    # vendored JDBC driver jars (jars/duckdb_jdbc-*.jar): put them on the
    # session classpath unconditionally so the LIVE jdbc path works inside
    # any session built through this factory — classpath must be set at
    # JVM launch, it cannot be added to a running shared session later
    import glob as _glob

    jar_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "jars")
    jars = sorted(_glob.glob(os.path.join(jar_dir, "*.jar")))
    if jars:
        jar_csv = ",".join(jars)
        cp = os.pathsep.join(jars)
        builder = (
            builder.config("spark.jars", jar_csv)
            .config("spark.driver.extraClassPath", cp)
            .config("spark.executor.extraClassPath", cp)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
