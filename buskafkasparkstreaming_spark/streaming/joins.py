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


def enrich_asof_static(
    stream: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    dim_ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Stream-static AS-OF enrichment: each streamed fact row joined to
    the dimension row IN EFFECT at its event time — the
    slowly-changing-dimension lookup a CDC pipeline needs when the
    dimension itself is a change log (a plain equi-join would enrich
    old facts with future dimension versions).

    Formulation: the dimension change log becomes SCD2-style validity
    intervals with ONE lead window ([dim_ts, next dim_ts) per key,
    open-ended for the current version), then a stream-static LEFT join
    whose condition is key equality + half-open interval containment.
    Exactly one interval contains any event time, so the join is
    1-row-per-fact by construction. The interval table is BROADCAST:
    the unbounded side stays a stateless narrow pipeline — no
    watermark, no state store, no stream-side shuffle (the same scale
    argument as `enrich_with_dimension`); Spark re-resolves the static
    side per micro-batch, so dimension updates are picked up live.
    NULL-key or NULL-ts dimension rows are dropped (they can be in
    effect at no time).
    """
    from pyspark.sql import Window

    # every dim column except the key is copied into the output verbatim
    # (dim_ts_col included): a name shared with a stream column would make
    # the joined output ambiguous — fail loudly instead (the
    # enrich_with_dimension contract)
    dupes = (set(stream.columns) & set(dim.columns)) - {key_col}
    if dupes:
        raise ValueError(f"ambiguous enrichment columns: {sorted(dupes)}")
    dimc = dim.filter(
        F.col(key_col).isNotNull() & F.col(dim_ts_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(dim_ts_col).asc(), F.col(tiebreak_col).asc()
    )
    intervals = dimc.select(
        F.col(key_col).alias("__dk"),
        F.col(dim_ts_col).alias("__valid_from"),
        F.lead(dim_ts_col).over(w).alias("__valid_to"),
        *[c for c in dimc.columns if c not in (key_col,)],
    )
    cond = (
        (stream[key_col] == intervals["__dk"])
        & (stream[ts_col] >= intervals["__valid_from"])
        & (
            intervals["__valid_to"].isNull()
            | (stream[ts_col] < intervals["__valid_to"])
        )
    )
    return stream.join(F.broadcast(intervals), cond, "left").drop(
        "__dk", "__valid_from", "__valid_to"
    )


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
