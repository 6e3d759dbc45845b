"""JDBC source/sink wrappers — reference S2 (NiFi PutSQL → MySQL) and the
snapshot half of S3 (Debezium initial snapshot).

Parity: nifi-project.xml:1131 (PutSQL), :1098-1099 (batch 100),
:312-317 (jdbc:mysql pool); 01-setup-ec-vm.md:320-333 (DDL). The wrappers
are LIVE-tested against a DuckDB database file through the real JVM JDBC
path (tests/test_jdbc_live.py) — batched INSERT sink, plain scan, and the
partitioned parallel scan; no MySQL exists in the container, but the code
path is identical up to the driver class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def execute_statement(
    spark: SparkSession, url: str, sql: str, driver: str | None = None
) -> None:
    """Run one DDL/DML statement through the JVM's JDBC DriverManager —
    the engine-side analog of the reference's MySQL DDL step
    (01-setup-ec-vm.md:320-333). Needed before an append into engines
    whose CREATE-TABLE-on-append doesn't become visible across the
    writer's separate insert connections (observed with DuckDB JDBC)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()
    finally:
        conn.close()


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC snapshot scan. For scale, always pass a numeric
    partition_column + bounds — an unpartitioned JDBC read is a single-task
    scan, useless at 100 TB."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_append(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = 100,
    properties: dict[str, str] | None = None,
) -> None:
    """Append rows — the PutSQL analog; default batch size mirrors the
    reference's 100 (nifi-project.xml:1098-1099)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
