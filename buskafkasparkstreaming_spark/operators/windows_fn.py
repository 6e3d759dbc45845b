"""Window-function operators (SURVEY §2.3 "Window functions" row) and the
batch sessionizer.

All of these are single-shuffle plans (hash partition on the key, per-key
sort); none collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.functions import ts_millis


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number — the precombine primitive
    generalized (k=1 with order by precombine desc IS Hudi's precombine,
    reference 01-setup-ec-vm.md:269)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def running_agg(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    agg_col: str,
    agg: str = "sum",
    out_col: str = "running",
) -> DataFrame:
    """Running aggregate over an ordered per-key frame (rows unbounded
    preceding → current)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, getattr(F, agg)(F.col(agg_col)).over(w))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key (batch analog of
    `session_window`): a new session starts when the time since the previous
    event exceeds `gap_seconds`.

    session_id = cumulative count of gap-breaks in (key, ts) order — two
    window passes over ONE shuffle (same partitioning, Catalyst reuses the
    exchange). Rows with a NULL timestamp are dropped — a timeless event
    belongs to no session (and engines disagree on where NULLs sort, so
    keeping them cannot be made deterministic cross-engine).
    """
    df = df.filter(F.col(ts_col).isNotNull())
    w_order = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w_order)
    is_break = (
        F.when(prev_ts.isNull(), F.lit(1))
        .when(
            ts_millis(F.col(ts_col)) - ts_millis(prev_ts) > gap_seconds * 1000,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_break).over(w_cum))
