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


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static equi-join: enrich each streamed fact row with columns
    from a bounded dimension table (the classic lookup-join of a CDC
    pipeline — the reference's Athena layer joins `routes` facts to route
    metadata the same way, 01-setup-ec-vm.md:305-318).

    Scale design: the dimension is BROADCAST, so the streaming side stays a
    stateless narrow pipeline — no watermark, no state store, no shuffle of
    the unbounded side, and the micro-batch plan is a BroadcastHashJoin per
    batch. That is the only formulation that survives an unbounded fact
    stream: shuffling the stream on the join key would re-partition every
    micro-batch, and a stateful join would buffer facts forever. Spark
    re-resolves the static side per micro-batch, so a dimension refresh
    (e.g. overwritten parquet) is picked up without restarting the query.
    Dimension must fit the broadcast budget (~8 GB hard Spark limit); a
    bigger dim means pre-bucketing both sides instead.
    """
    dupes = (set(stream.columns) & set(dim.columns)) - {right_on}
    if dupes:
        raise ValueError(f"ambiguous enrichment columns: {sorted(dupes)}")
    joined = stream.join(
        F.broadcast(dim), stream[left_on] == dim[right_on], how
    )
    return joined.drop(dim[right_on])


def purchases_then_errors(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream self-join: each purchase paired with the errors of
    the same user occurring within `max_gap` AFTER it.

    `how='left_outer'` additionally emits every purchase that saw NO
    error in its window, null-extended — but only once the watermark
    passes the end of that purchase's match window (state eviction is
    what proves no match can still arrive; an outer result cannot be
    emitted speculatively). Purchases whose window is still open when
    the stream ends stay unemitted — the price of correctness on an
    unbounded stream, pinned by the oracle's watermark-cutoff replay.

    Output: purchase_event_id, error_event_id, user_id, gap_ms
    (error_event_id/gap_ms NULL on unmatched rows under left_outer).
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
        how,
    )
    return joined.select(
        "purchase_event_id",
        "error_event_id",
        # full_outer emits error-only rows whose p_user is NULL — the key
        # is whichever side exists (inner/left always have p_user)
        F.coalesce(F.col("p_user"), F.col("e_user")).alias("user_id"),
        (ts_millis("e_ts") - ts_millis("p_ts")).alias("gap_ms"),
    )
