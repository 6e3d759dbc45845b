"""Event-time windowed aggregation over streams (SURVEY §2.3 "Streaming"
row): watermarks, tumbling/sliding/session windows, streaming dedup.

These helpers build the streaming plans; `run_to_memory` drains a stream
into an in-memory table for tests/oracles (update mode + availableNow ⇒ one
batch, every group emitted once with its final value — so results equal the
batch aggregation, which is what the DuckDB oracle checks).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The driver's `events` parquet as an unbounded source (FIXTURES.md F4:
    treat as append-only ordered by `ts`)."""
    from buskafkasparkstreaming_spark.sources.files import (
        ensure_session_confs,
        normalize_nanos_ts,
    )

    ensure_session_confs(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source wants a directory (or glob) path, and the
    # driver's table is a single parquet file — glob it
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_nanos_ts(reader.load(f"{sf_dir}/events.parque[t]"))


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window count+sum with a watermark bounding state."""
    # value is a 2-decimal money column: sum exact integer cents so the
    # result is independent of partial-aggregation order (oracle-stable)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("win"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents).cast("double") / 100.0).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len, slide).alias("win"))
        .agg(
            (F.sum(cents).cast("double") / 100.0 / F.count(F.lit(1))).alias(
                "avg_value"
            )
        )
        .select(F.col("win.start").alias("window_start"), "avg_value")
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session windows (gap-based) — streaming analog of
    operators.windows_fn.sessionize."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming dedup: state-bounded via watermark
    (`dropDuplicatesWithinWatermark`, the scalable form — state expires)."""
    wm = events.withWatermark(ts_col, watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(key_cols)
    return wm.dropDuplicates(key_cols)


def run_to_memory(
    df: DataFrame,
    spark: SparkSession,
    output_mode: str = "update",
    name: str | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain a streaming DataFrame (availableNow) into a memory sink and
    return the materialized result as a batch DataFrame.

    `state_partitions` sizes the stateful-operator partitioning for THIS
    query (streaming state-store count = shuffle partitions at first
    checkpoint). This is a deliberate sizing decision, not a default to
    inherit: every state partition pays per-micro-batch store
    open/snapshot/commit I/O, so it should track the state volume (distinct
    keys × state per key), not the session's batch-shuffle width —
    measured at sf0.1: 32 stores ≈ 5.8 s/drain, 8 ≈ 3.0 s, 4 ≈ 1.7 s for
    a few hundred groups. A production job with millions of keys raises
    it; results are identical at any setting (hash partitioning over
    groups). None = inherit the session conf."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    try:
        if state_partitions is not None:
            spark.conf.set(conf_key, str(state_partitions))
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prev)
    return spark.table(name)


def allen_point_monitor(
    stream_points: DataFrame,
    windows: DataFrame,
    bucket_ms: int,
    label_col: str = "label",
    ms_col: str = "ms",
) -> DataFrame:
    """Allen-relation HISTOGRAM as a streaming monitor (SURVEY round-11
    fresh-surface list): classify each streamed POINT event (a
    degenerate [ms, ms] interval) against a STATIC set of incident
    windows and maintain running counts per (label, relation) — the
    live "how is traffic interacting with the incident?" board.

    stream_points: streaming (label_col string, ms_col bigint).
    windows:       static (window_id long, s_b bigint, e_b bigint).

    Plan: a point lives in exactly ONE `bucket_ms` bucket, so the
    stream side needs NO explode and no dedup (unlike the batch
    allen_join_bucketed, whose multi-bucket intervals join a window
    once per shared bucket); the static windows explode to their bucket
    range once at plan time and ride a broadcast into a stream-static
    equi-join on the bucket. The relation CASE is row-local
    (operators/joins.py::allen_relation — the same cascade the batch
    entries and the DuckDB oracles share), disjoint-in-bucket pairs are
    filtered, and the groupBy(label, relation) count runs in update
    mode. Counts only grow, so a drained memory sink recovers the FINAL
    histogram as max(n) per key regardless of how the source paced its
    batches — the monotone-clock discipline of skyline_per_key, here
    for free because COUNT is itself monotone.

    State is |labels| × 13 rows — constant, no watermark needed (the
    monitor never expires; a production deploy bounding label
    cardinality would add one)."""
    from buskafkasparkstreaming_spark.operators.joins import allen_relation

    lo = F.expr(f"(s_b - pmod(s_b, {bucket_ms})) DIV {bucket_ms}")
    hi = F.expr(f"(e_b - pmod(e_b, {bucket_ms})) DIV {bucket_ms}")
    wb = (
        windows.filter(F.col("s_b").isNotNull() & F.col("e_b").isNotNull())
        .withColumn("__b", F.explode(F.sequence(lo, hi)))
    )
    pts = stream_points.filter(F.col(ms_col).isNotNull()).withColumn(
        "__b", F.expr(f"({ms_col} - pmod({ms_col}, {bucket_ms})) DIV {bucket_ms}")
    )
    joined = pts.join(F.broadcast(wb), "__b").withColumn(
        "relation",
        allen_relation(
            F.col(ms_col), F.col(ms_col), F.col("s_b"), F.col("e_b")
        ),
    ).filter(~F.col("relation").isin("precedes", "preceded_by"))
    return joined.groupBy(F.col(label_col), F.col("relation")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
