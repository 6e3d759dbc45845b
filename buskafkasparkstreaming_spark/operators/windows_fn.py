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


def _ranked_in_range_partitions(
    df: DataFrame,
    order_cols: list[Column],
    num_partitions: int,
    checkpoint: bool = True,
) -> tuple[DataFrame, list[tuple[int, int]], int]:
    """Shared core of global_rank / global_ntile: range-repartition on
    the order columns, assign per-partition local row numbers WITHOUT a
    second exchange, and return (local-ranked df, per-partition prefix
    offsets, total row count).

    The trick: after repartitionByRange + sortWithinPartitions the rows
    of partition i all precede partition i+1 in the global order
    (RangePartitioner boundaries are value tuples — the sample only
    affects balance, never correctness), and monotonically_increasing_id
    evaluated in that narrow stage encodes (partition id << 33 | local
    row index), so local rank needs no Window (a Window.partitionBy(pid)
    would re-shuffle by pid on top of the range exchange). Offsets are
    prefix sums of the per-partition counts — at most `num_partitions`
    rows collected to the driver (the cap-bounded idiom; bounded by
    config, not by data size).
    """
    local = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright(F.col("__mid"), 33).cast("int"))
        .withColumn(
            "__lrn", (F.col("__mid") % F.lit(1 << 33) + F.lit(1)).cast("long")
        )
        .drop("__mid")
    )
    if checkpoint:
        # pin partition ids across the two jobs below (offset count + the
        # caller's read); checkpoint=False is for plan-gate tests that
        # need the pre-checkpoint lineage visible
        local = local.localCheckpoint(eager=False)
    cnt_rows = sorted(
        (r["__pid"], r["cnt"])
        for r in local.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in cnt_rows:
        offsets.append((pid, acc))
        acc += cnt
    return local, offsets, acc


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "global_rn",
    num_partitions: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """EXACT global row_number under `order_cols` without collapsing to a
    single ordered partition — the scalable replacement for
    Window.orderBy(...) with no partitionBy (a single-task global sort,
    the classic 100 TB killer). One range shuffle, parallel per-partition
    sorts, offsets via a broadcast of ≤ num_partitions rows.

    `order_cols` must define a UNIQUE ordering (add a key tiebreak) for
    the rank to be deterministic.
    """
    local, offsets, _n = _ranked_in_range_partitions(
        df, order_cols, num_partitions, checkpoint
    )
    offdf = local.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    return (
        local.join(F.broadcast(offdf), "__pid")
        .withColumn(rank_col, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    out_col: str,
    num_partitions: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """EXACT ntile(k) over a global ordering without a single-task sort:
    global_rank's distributed ranking + the ntile bucket formula applied
    row-locally with driver-computed (q, r) literals. Bit-identical to
    `ntile(k) OVER (ORDER BY ...)` for a unique ordering: the first
    n%k buckets get floor(n/k)+1 rows, the rest floor(n/k).
    """
    local, offsets, n = _ranked_in_range_partitions(
        df, order_cols, num_partitions, checkpoint
    )
    offdf = local.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    q, r = divmod(n, k)
    head = (q + 1) * r  # rows covered by the (q+1)-sized leading buckets
    rn = F.col("__lrn") + F.col("__off")
    if q == 0:  # fewer rows than buckets: bucket i holds row i alone
        bucket = rn
    else:
        # ceil(a/b) = floor((a+b-1)/b); operands stay exact in double
        # below 2^53, far past any realistic global rank
        ceil_div = lambda a, b: F.floor((a + F.lit(b - 1)) / F.lit(b))  # noqa: E731
        bucket = F.when(rn <= F.lit(head), ceil_div(rn, q + 1)).otherwise(
            F.lit(r) + ceil_div(rn - F.lit(head), q)
        )
    return (
        local.join(F.broadcast(offdf), "__pid")
        .withColumn(out_col, bucket.cast("int"))
        .drop("__pid", "__lrn", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    sum_cols: list[str],
    num_partitions: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """EXACT running sums of `sum_cols` under a global ordering without a
    single-task sort — the scalable replacement for
    `sum(x) OVER (ORDER BY ...)` with no partitionBy (the same 100 TB
    killer global_rank exists for; the CDF/KS building block).

    Plan: ONE range shuffle + parallel per-partition sorts (the
    global_rank core), then an intra-partition running sum keyed on the
    physical partition id — that window adds one hash exchange on
    `__pid`, which is balanced by construction (RangePartitioner split
    the data), never a single task. Per-partition TOTALS (at most
    `num_partitions` rows) come to the driver for prefix offsets, one
    broadcast per sum column.

    Each output column `x` is replaced by its running sum under
    `order_cols` (rows where `x` is NULL contribute 0). `order_cols`
    must define a unique ordering for determinism.
    """
    local, _offsets, _n = _ranked_in_range_partitions(
        df, order_cols, num_partitions, checkpoint
    )
    totals = sorted(
        (r["__pid"], tuple(r[f"__t_{c}"] for c in sum_cols))
        for r in local.groupBy("__pid")
        .agg(
            *[
                F.coalesce(F.sum(c), F.lit(0)).cast("long").alias(f"__t_{c}")
                for c in sum_cols
            ]
        )
        .collect()
    )
    offsets, acc = [], [0] * len(sum_cols)
    for pid, tots in totals:
        offsets.append((pid, *acc))
        acc = [a + t for a, t in zip(acc, tots)]
    schema = "__pid int, " + ", ".join(f"__off_{c} long" for c in sum_cols)
    offdf = local.sparkSession.createDataFrame(
        offsets or [(0,) + (0,) * len(sum_cols)], schema
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = local.join(F.broadcast(offdf), "__pid")
    for c in sum_cols:
        running = F.sum(F.coalesce(F.col(c), F.lit(0))).over(w)
        out = out.withColumn(c, (running + F.col(f"__off_{c}")).cast("long"))
    return out.drop("__pid", "__lrn", *[f"__off_{c}" for c in sum_cols])


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
