"""Bucketed managed tables — the shuffle-elimination lever for repeated
big-big joins (SURVEY §2.3 scale notes).

Two 100 TB facts joined on the same key every day should not shuffle every
day: bucket both by the join key once at write time; Spark's bucketed scan
then feeds sort-merge join with NO Exchange on either side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a parquet table bucketed (and optionally sorted) by the
    join key. Sorting within buckets additionally removes the per-task
    Sort under sort-merge join. `saveAsTable` is required either way —
    bucket metadata lives in the catalog, not the parquet footer.

    With `path` the table is EXTERNAL: data lands at the caller's
    (PID-namespaced) location, so concurrent processes sharing a
    warehouse dir never clobber each other — the variant the driver-facing
    lake_bucketed_join entry uses. Without it the table is managed in the
    session warehouse."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if path is None:
        # the default session catalog is in-memory, so a leftover location
        # from a previous process is invisible to DROP TABLE — clear it
        # explicitly
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:") :]
        if warehouse:
            import shutil

            shutil.rmtree(
                os.path.join(warehouse, table_name.lower()), ignore_errors=True
            )

    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cojoin_bucketed(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    force_sort_merge: bool = True,
) -> DataFrame:
    """Join two identically-bucketed tables — an exchange-free sort-merge
    join when both sides were written with write_bucketed on the same keys
    and bucket count.

    `force_sort_merge` hints MERGE so the planner doesn't fall back to a
    broadcast join on small inputs (which disables the bucketed scan): the
    point of bucketing is the big-big case where broadcast is impossible.
    """
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
