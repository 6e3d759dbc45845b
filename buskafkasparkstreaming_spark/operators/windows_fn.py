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


def grouped_ntile(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    out_col: str,
    num_partitions: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """EXACT `ntile(k) OVER (PARTITION BY group ORDER BY ...)` without a
    single-task-per-group sort — the grouped sibling of global_ntile.

    Why not Window.partitionBy(group): with a handful of large groups
    (market segments, languages, domains) each group's full sort lands
    in ONE task — at 100 TB that is five straggler tasks doing all the
    work. Here the sort is a RANGE repartition on the COMPOSITE ordering
    (group asc, then order_cols), so every partition sorts in parallel
    regardless of group sizes, and group boundaries fall out of the
    global rank itself:

    1. global_rank over (group asc ..., order_cols) — groups are
       contiguous in the composite order, one range exchange.
    2. per-group (start, count) = (min(global_rn), count) — a hash agg
       to |groups| rows, broadcast back. Rank within group
       r = global_rn - start + 1 needs NO second sort.
    3. the SQL-standard ntile bucket formula applied row-locally with
       the group's own (q, rem) derived from its count column — all
       integer arithmetic (ceil_div via (a+b-1) div b), never float.

    Bit-identical to SQL ntile for a UNIQUE composite ordering (caller
    adds a key tiebreak in order_cols). NULLs in group_cols sort first
    (Spark asc) and form their OWN group — exactly SQL's NULL window
    partition — which is why the join back to the group stats is
    NULL-SAFE (a plain equi-join would silently drop NULL-group rows;
    offsets come from Spark's own ordering, so there is no
    Python-vs-JVM collation seam either way). The broadcast side is
    |groups| rows: intended for domain-bounded group columns
    (segments, priorities, languages), not high-cardinality keys — for
    those, plain Window.partitionBy is already scalable.
    """
    composite = [F.col(g).asc() for g in group_cols] + order_cols
    ranked = global_rank(
        df, composite, "__grn", num_partitions, checkpoint
    )
    gstats = ranked.groupBy(*group_cols).agg(
        F.min("__grn").alias("__gstart"),
        F.count(F.lit(1)).cast("long").alias("__gn"),
    )
    gs = F.broadcast(
        gstats.select(
            *[F.col(g).alias(f"__g_{g}") for g in group_cols],
            "__gstart",
            "__gn",
        )
    )
    cond = None
    for g in group_cols:
        c = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
        cond = c if cond is None else (cond & c)
    out = ranked.join(gs, cond).drop(*[f"__g_{g}" for g in group_cols])
    r = (F.col("__grn") - F.col("__gstart") + F.lit(1)).cast("long")
    q = F.expr(f"__gn div {k}")
    rem = F.col("__gn") % F.lit(k)
    head = (q + F.lit(1)) * rem  # rows covered by the (q+1)-sized buckets
    ceil_div = lambda a, b: F.expr(  # noqa: E731
        f"(({a}) + ({b}) - 1) div ({b})"
    )
    out = out.withColumn("__r", r)
    bucket = (
        F.when(q == F.lit(0), F.col("__r"))
        .when(
            F.col("__r") <= head,
            ceil_div("__r", f"(__gn div {k}) + 1"),
        )
        .otherwise(
            rem
            + ceil_div(
                f"__r - (((__gn div {k}) + 1) * (__gn % {k}))",
                f"__gn div {k}",
            )
        )
    )
    return (
        out.withColumn(out_col, bucket.cast("int"))
        .drop("__grn", "__gstart", "__gn", "__r")
    )


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    sum_cols: list[str],
    num_partitions: int = 32,
    checkpoint: bool = True,
    max_offset_rows: int = 1_000_000,
) -> DataFrame:
    """EXACT `sum(x) OVER (PARTITION BY group ORDER BY ...)` running sums
    without a single-task-per-group sort — the grouped sibling of
    global_running_sum, completing the grouped-ranking family
    grouped_ntile opened (SURVEY round-12 candidate list: per-group KS
    needs a per-group running CDF, and Window.partitionBy(segment) puts
    each segment's whole value axis in ONE task).

    Plan (round-14 single-collect form):

    1. ONE range repartition on the COMPOSITE ordering (group asc, then
       order_cols) — groups are contiguous in the composite order, and
       every partition sorts in parallel regardless of group sizes.
    2. ONE bounded driver collect of per-(pid, GROUP) sums — at most
       `num_partitions` × |groups| rows (groups are contiguous in the
       composite order, so in practice |groups| + num_partitions rows:
       at most two partitions per group hold a split). The per-group
       prefix offset of a partition is the sum of the SAME group's
       totals in all earlier range partitions, accumulated pid-ascending
       on the driver.
    3. the offset frame broadcasts back NULL-SAFELY on (pid, group) —
       NULL group cols form their own SQL window partition,
       grouped_ntile's contract — and the running sum is a window keyed
       (__pid, group): the balanced __pid hash leads, so a giant group
       never lands in one task.

    Each output column `x` is replaced by its PER-GROUP running sum
    under `order_cols` (NULL x contributes 0). `group_cols` + the
    caller's order_cols must define a unique composite ordering.

    CONTRACT: the broadcast offset frame is num_partitions × |groups|
    rows — intended for DOMAIN-BOUNDED group columns (segments,
    priorities, languages), not high-cardinality keys (for those, plain
    Window.partitionBy is already scalable). The bound is ENFORCED:
    the collect raises once it exceeds `max_offset_rows` rather than
    silently materializing an unbounded frame on the driver. Group
    values round-trip driver-side as dict keys / createDataFrame
    literals, so group columns must be ATOMIC types (no array/map/
    struct) — checked at entry.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    for g in group_cols:
        dt = df.schema[g].dataType
        if isinstance(dt, (ArrayType, MapType, StructType)):
            raise TypeError(
                f"grouped_running_sum group column {g!r} has non-atomic "
                f"type {dt.simpleString()}: group values are driver-side "
                "dict keys and createDataFrame literals, which requires "
                "hashable, round-trippable atomics"
            )
    composite = [F.col(g).asc() for g in group_cols] + order_cols
    local = (
        df.repartitionByRange(num_partitions, *composite)
        .sortWithinPartitions(*composite)
        .withColumn("__pid", F.spark_partition_id())
    )
    if checkpoint:
        # pin partition ids across the offset job and the caller's read
        # (the _ranked_in_range_partitions contract); checkpoint=False is
        # for plan-gate tests that need the pre-checkpoint lineage visible
        local = local.localCheckpoint(eager=False)
    # ONE bounded collect (round-14 optimization): per-(pid, GROUP) totals
    # — at most num_partitions x |groups| rows, config x domain bounded —
    # replace the old three-step derivation (global running sum + per-group
    # start scan + two broadcast joins back). The per-group offset of a
    # partition is the sum of the SAME group's totals in all earlier
    # range partitions; groups are contiguous in the composite order, so
    # at most two partitions per group carry a split — the frame stays
    # |groups| + num_partitions rows in practice. Values are bit-identical
    # to the old plan: exact long sums over the same rows in the same
    # composite order, grouped the same way.
    agg_exprs = [
        F.coalesce(F.sum(c), F.lit(0)).cast("long").alias(f"__t_{c}")
        for c in sum_cols
    ]
    rows = sorted(
        (
            (
                r["__pid"],
                tuple(r[g] for g in group_cols),
                tuple(r[f"__t_{c}"] for c in sum_cols),
            )
            for r in local.groupBy("__pid", *group_cols)
            .agg(*agg_exprs)
            .collect()
        ),
        # pid order alone drives the per-group accumulation (each group
        # accumulates independently); group tuples may hold NULLs, which
        # do not compare, so they must not participate in the sort
        key=lambda t: t[0],
    )
    if len(rows) > max_offset_rows:
        raise ValueError(
            f"grouped_running_sum offset frame has {len(rows)} "
            f"(pid, group) rows > max_offset_rows={max_offset_rows}: the "
            "group columns are not domain-bounded (the machinery's "
            "contract). Use Window.partitionBy for high-cardinality "
            "groups, or raise max_offset_rows deliberately."
        )
    acc: dict[tuple, list[int]] = {}
    offs = []
    for pid, gvals, tots in rows:
        prev = acc.setdefault(gvals, [0] * len(sum_cols))
        offs.append((pid, *gvals, *prev))
        acc[gvals] = [a + t for a, t in zip(prev, tots)]
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema = StructType(
        [StructField("__pid", IntegerType(), False)]
        + [
            StructField(f"__g_{g}", local.schema[g].dataType, True)
            for g in group_cols
        ]
        + [StructField(f"__off_{c}", LongType(), False) for c in sum_cols]
    )
    offdf = local.sparkSession.createDataFrame(offs, schema)
    cond = F.col("__pid").eqNullSafe(F.col("__opid"))
    for g in group_cols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__g_{g}"))
    out = local.join(
        F.broadcast(offdf.withColumnRenamed("__pid", "__opid")), cond
    )
    # intra-partition PER-GROUP running sums: the window keys on the
    # balanced __pid hash first (RangePartitioner split the data — never
    # a single task), group columns only subdivide within a partition
    w = Window.partitionBy("__pid", *group_cols).orderBy(*order_cols)
    for c in sum_cols:
        running = F.sum(F.coalesce(F.col(c), F.lit(0))).over(w)
        out = out.withColumn(c, (running + F.col(f"__off_{c}")).cast("long"))
    drop = (
        ["__pid", "__opid"]
        + [f"__off_{c}" for c in sum_cols]
        + [f"__g_{g}" for g in group_cols]
    )
    return out.drop(*drop)


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


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """Exact 2-D skyline (Pareto frontier): rows not DOMINATED by any
    other row, where b dominates a iff b.minimize <= a.minimize AND
    b.maximize >= a.maximize with at least one strict. Ties on both
    dimensions survive together (neither dominates).

    The naive formulation is an all-pairs NOT EXISTS anti-join — O(n^2)
    and a scale-killer. In 2-D the frontier is a STAIRCASE, which makes
    the operator expressible as one hash aggregation plus a window over
    the aggregate:

      1. best(m) = min(minimize) per maximize-value — a map-side-partial
         hash agg; the result frame has |distinct maximize| rows, a
         DOMAIN-bounded cardinality (e.g. 50 part sizes), not a
         data-bounded one.
      2. prev_best(m) = running min of best over strictly larger
         maximize values — a window over that tiny frame (its
         SinglePartition sort is bounded by the domain, never by rows).
      3. a row survives iff its minimize == best(own m) — anything
         pricier at the same m is dominated (same m, lower minimize,
         one strict) — AND minimize < prev_best (any larger m at <=
         minimize dominates via the strict maximize).

    The join back to the base data broadcasts the staircase (AQE sizes
    it; it is domain-bounded), so the full-data path is scan + partial
    agg + broadcast-join — no base-data shuffle, no global sort, no
    pair expansion. NULL in either dimension is excluded: NULL never
    dominates and is never on the frontier (mirrors SQL three-valued
    comparison semantics).

    Output: the input columns of surviving rows.
    """
    base = df.filter(
        F.col(minimize_col).isNotNull() & F.col(maximize_col).isNotNull()
    )
    best = base.groupBy(maximize_col).agg(
        F.min(minimize_col).alias("__best")
    )
    w = (
        Window.orderBy(F.col(maximize_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stairs = best.withColumn("__prev_best", F.min("__best").over(w))
    return (
        base.join(F.broadcast(stairs), maximize_col)
        .filter(
            (F.col(minimize_col) == F.col("__best"))
            & (
                F.col("__prev_best").isNull()
                | (F.col(minimize_col) < F.col("__prev_best"))
            )
        )
        .drop("__best", "__prev_best")
    )


def skyline_nd(
    df: DataFrame,
    minimize_cols: list[str],
    maximize_cols: list[str],
) -> DataFrame:
    """Exact N-dimensional skyline (Pareto frontier) of DISTINCT points —
    the dimensional generalization skyline_2d's staircase cannot
    express (a 3-D frontier is not a running min over one axis).

    b dominates a iff b <= a on every minimize dim and b >= a on every
    maximize dim with at least one strict; duplicate points survive
    together and collapse to ONE output row (the output is the DISTINCT
    frontier tuple set — the streaming skyline_per_key convention).

    Plan: ZERO exchanges. The classic two-phase distributed skyline:

      1. local frontier per input partition via mapInPandas (Arrow
         batches, vectorized numpy dominance sweep) — no shuffle; a
         globally-undominated point is undominated in its own
         partition, so the global frontier is a subset of the union of
         local frontiers.
      2. the union is frontier-bounded (O(P · log^(d-1) n) expected for
         exchangeable points, P = partitions), so ONE coalesce(1) task
         runs the same sweep over it for the exact global frontier —
         the constant-size-final-stage idiom (q_allen_incidents' island
         window), bounded by frontier geometry, not data volume. A
         pathological all-frontier dataset (strictly anti-correlated
         dims) degrades phase 2 to the input size; callers with such
         domains should pre-dedup or bucket — same discipline as
         skyline_2d's domain-cardinality note: know your frontier.

    NULL in any dimension is excluded (NULL never dominates, never on
    the frontier — SQL three-valued semantics). Sweep: one upfront
    row-lexicographic sort (all-minimize normalization — a dominator
    always sorts before its victim, so the current lexicographic
    MINIMUM is always on the frontier), then f fully-vectorized passes:
    extract the minimum, numpy-remove every point it weakly dominates
    (>= on every dim; the minimum itself included, duplicates
    pre-collapsed), repeat — O(f·n·d) with no per-row Python loop
    (f = frontier size; the naive kept-vs-each-row walk measured
    ~7.5 µs/row, this runs the same 6M-point probe in a few vector ops
    per frontier point).

    Memory contract (round-12 ADVICE fix): Arrow batches are folded
    INCREMENTALLY — the running frontier merges with one batch at a
    time (frontier(A ∪ B) == frontier(frontier(A) ∪ B), dominance is
    transitive), so peak executor memory tracks frontier + one Arrow
    batch, never the whole partition materialized in pandas.

    Output: one row per distinct frontier point (minimize_cols +
    maximize_cols, original names/types preserved as int64).
    """
    import pandas as pd

    all_cols = list(minimize_cols) + list(maximize_cols)
    n_min = len(minimize_cols)
    base = df.select(*all_cols)
    for c in all_cols:
        base = base.filter(F.col(c).isNotNull())
    base = base.select(*[F.col(c).cast("long").alias(c) for c in all_cols])
    schema = ", ".join(f"{c} long" for c in all_cols)

    def local_frontier(batches):
        import numpy as np

        def sweep(m):
            # m: all-minimize-normalized, row-lex-sorted, deduped
            frontier = []
            while m.shape[0]:
                p = m[0]  # lexicographic minimum: provably undominated
                frontier.append(p)
                # drop p and everything it dominates (distinct q >= p
                # on every dim is dominated: p <= q with >=1 strict)
                m = m[~(m >= p).all(axis=1)]
            return np.array(frontier, dtype="int64")

        front = None  # running frontier, normalized all-minimize
        for pdf in batches:
            if not len(pdf):
                continue
            m = pdf.to_numpy(dtype="int64", copy=True)
            m[:, n_min:] = -m[:, n_min:]
            if front is not None:
                m = np.concatenate([front, m])
            # np.unique(axis=0) dedups AND row-lex-sorts in one step
            front = sweep(np.unique(m, axis=0))
        if front is None:
            return
        front[:, n_min:] = -front[:, n_min:]
        yield pd.DataFrame({c: front[:, i] for i, c in enumerate(all_cols)})

    cand = base.mapInPandas(local_frontier, schema)
    return cand.coalesce(1).mapInPandas(local_frontier, schema)


def attribute_touches(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    conversion_type: str,
    window_ms: int,
) -> DataFrame:
    """Multi-touch attribution: credit each conversion's preceding touch
    events (same user, within `window_ms` before the conversion, and not
    already past a nearer conversion) and split the credit exactly.

    Every event is attributed to its user's NEXT conversion in strict
    (ts, id) order — the (ts, id) tie-break keeps the assignment
    deterministic on both engines even under colliding timestamps, with
    a NULL id ordering as LONG_MIN so the tie-break itself never leans
    on engine-specific NULL placement. The assignment is pure window
    arithmetic on ONE user-key shuffle and ONE scan — there is NO
    self-join: walking the user's events in DESC (ms, id) order, a
    running `last(..., ignorenulls)` carries the nearest following
    conversion's (ms, key) onto every touch, and a DESC running count
    of conversions yields `conv_idx = n_conv - remaining + 1`, the
    per-user conversion ordinal that keys the credit frame. Every
    later window and the final aggregation cluster on (u, ...) —
    hashpartitioning(u) already satisfies them, so the plan holds ONE
    Exchange total (gated). No global sort, no driver collect;
    parallel across users at any scale.

    Credit is kept EXACT: one output row per (conversion, touch type)
    with integer counts and a single float division
    `credit = n_type / n_touches` (linear attribution) — never a float
    sum across conversions, so the result is bit-replayable in SQL.
    First/last-touch attribution falls out of the same frame: the
    booleans mark whether this type owns the first / the last touch in
    the conversion's window, under the (ts_ms, id) tuple order computed
    as two sequential integer window mins/maxes (min ms, then min id at
    that ms) — pure BIGINT comparisons, no struct ordering, identical
    in any engine. A NULL id orders as LONG_MIN (before every real id
    at the same millisecond) on both sides; if several touches tie on
    the full (ms, id) key, every tied type gets the flag — equality
    against the extreme key, not row_number, so ties stay
    deterministic. At a full (ms, id) tie between a conversion and a
    touch, `is_conv` breaks the tie (the conversion sorts as the later
    event, so the touch attributes to it), keeping the walk order total
    wherever the output depends on it.

    OUT OF CONTRACT: a legitimate id of exactly LONG_MIN (-2^63) is
    indistinguishable from a NULL id — its conversion reports conv_id
    NULL and it shares first/last tie-flags with NULL-id peers at the
    same millisecond. Ids are assumed to come from sequences /
    snowflakes / hashes into [-2^63+1, 2^63); pre-shift ids that can
    take LONG_MIN.

    Output: (user, conv_idx, conv_id, conv_ts_ms, touch_type, n_type,
    n_touches, linear_credit, is_first_touch, is_last_touch) — conv_idx
    is the per-user conversion ordinal, the grouping key that stays
    unique even if the conversion's id is NULL.
    """
    long_min = -(2**63)
    # NULL user rows are excluded: an anonymous event can't be credited
    # to anyone's conversion. This must be EXPLICIT — the join-free
    # window formulation would otherwise happily attribute inside a
    # NULL-user partition, where any SQL-join replay drops the rows
    # (NULL never equi-joins); caught by the NULL-user drift sweep.
    base = df.filter(
        F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("etype"),
        ts_millis(F.col(ts_col)).alias("ms"),
        F.col(id_col).alias("eid"),
        F.coalesce(F.col(id_col), F.lit(long_min)).alias("ck"),
        (F.col(type_col) == conversion_type).cast("int").alias("is_conv"),
    )
    w_desc = (
        Window.partitionBy("u")
        # is_conv desc makes the walk order TOTAL where the output
        # depends on it: at a full (ms, ck) tie the conversion sorts as
        # the LATER event, so a touch sharing the key attributes to it
        # — without this key, two NULL-id events (conversion + touch)
        # at the same millisecond order arbitrarily and the engine and
        # a SQL replay can disagree. Ties among touches only are
        # output-invariant (their remaining/conv_* are identical).
        .orderBy(F.col("ms").desc(), F.col("ck").desc(), F.col("is_conv").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_user = Window.partitionBy("u")
    is_conv1 = F.col("is_conv") == 1
    seq = (
        base.withColumn("remaining", F.sum("is_conv").over(w_desc))
        .withColumn("n_conv", F.sum("is_conv").over(w_user))
        .withColumn(
            "conv_ms",
            F.last(F.when(is_conv1, F.col("ms")), ignorenulls=True).over(
                w_desc
            ),
        )
        # the conversion's tie-break key, never NULL (LONG_MIN stands in
        # for a NULL id) — carrying eid directly would make
        # last(ignorenulls) skip a NULL-id conversion and mis-attribute
        # to an older one
        .withColumn(
            "conv_ck",
            F.last(F.when(is_conv1, F.col("ck")), ignorenulls=True).over(
                w_desc
            ),
        )
    )
    long_min_lit = F.lit(long_min)
    attributed = seq.filter(
        (F.col("is_conv") == 0)
        & (F.col("remaining") >= 1)
        & (F.col("conv_ms") - F.col("ms") <= window_ms)
    ).select(
        "u",
        (F.col("n_conv") - F.col("remaining") + 1).alias("conv_idx"),
        F.when(F.col("conv_ck") != long_min_lit, F.col("conv_ck")).alias(
            "conv_id"
        ),
        "conv_ms",
        "etype",
        "ms",
        "ck",
    )
    # conv_idx (not conv_id) keys the per-conversion frame: it is unique
    # per user BY CONSTRUCTION, where a NULL conversion id would merge
    # distinct conversions under NULL-equal grouping
    w_conv = Window.partitionBy("u", "conv_idx")
    per_touch = (
        attributed
        .withColumn("n_touches", F.count(F.lit(1)).over(w_conv))
        .withColumn("min_ms", F.min("ms").over(w_conv))
        .withColumn("max_ms", F.max("ms").over(w_conv))
        .withColumn(
            "min_ck",
            F.min(
                F.when(F.col("ms") == F.col("min_ms"), F.col("ck"))
            ).over(w_conv),
        )
        .withColumn(
            "max_ck",
            F.max(
                F.when(F.col("ms") == F.col("max_ms"), F.col("ck"))
            ).over(w_conv),
        )
    )
    is_first = (F.col("ms") == F.col("min_ms")) & (
        F.col("ck") == F.col("min_ck")
    )
    is_last = (F.col("ms") == F.col("max_ms")) & (
        F.col("ck") == F.col("max_ck")
    )
    return (
        per_touch.groupBy(
            F.col("u").alias("user_id"),
            "conv_idx",
            "conv_id",
            F.col("conv_ms").alias("conv_ts_ms"),
            F.col("etype").alias("touch_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_type"),
            F.max("n_touches").cast("long").alias("n_touches"),
            F.max(is_first.cast("int")).alias("__first"),
            F.max(is_last.cast("int")).alias("__last"),
        )
        .select(
            "user_id",
            "conv_idx",
            "conv_id",
            "conv_ts_ms",
            "touch_type",
            "n_type",
            "n_touches",
            (
                F.col("n_type").cast("double")
                / F.col("n_touches").cast("double")
            ).alias("linear_credit"),
            (F.col("__first") == 1).alias("is_first_touch"),
            (F.col("__last") == 1).alias("is_last_touch"),
        )
    )
