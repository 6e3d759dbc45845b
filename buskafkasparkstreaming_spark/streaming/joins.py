"""Stream-stream joins with event-time bounds (SURVEY §2.3 streaming row).

The watermark + time-range condition bounds join state on BOTH sides: each
side only buffers rows younger than (watermark − range), so state is
O(rate × window), independent of stream length — the property that keeps a
stream-stream join alive at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.functions import ts_millis


def purchases_then_errors(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream self-join: each purchase paired with the errors
    of the same user occurring within `max_gap` AFTER it.

    Output: purchase_event_id, error_event_id, user_id, gap_ms.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_event_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", watermark)
    )
    joined = purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    )
    return joined.select(
        "purchase_event_id",
        "error_event_id",
        F.col("p_user").alias("user_id"),
        (ts_millis("e_ts") - ts_millis("p_ts")).alias("gap_ms"),
    )
