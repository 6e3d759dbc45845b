"""Grouped statistical operators via applyInPandas (Arrow grouped-map).

The z-score operator demonstrates the pattern for per-group Python compute
at scale: one shuffle on the group key, each group processed as a pandas
frame, output schema declared so downstream stays Catalyst-planned.

Numeric contract: the value column arrives as pre-computed integer cents
(JVM-side `round(x*100)`), the group sums are exact int64, and the final
z-score formula is evaluated in doubles in the exact same operation order
as the SQL oracle — bit-identical results.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ZSCORE_SCHEMA = "event_id bigint, event_type string, zscore double"


def zscore_by_group(
    df: DataFrame,
    group_col: str = "event_type",
    cents_col: str = "cents",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group z-score of a cents-valued column:
    z = (c - s/n) / sqrt((ss - s*s/n)/(n-1)).

    Rows with a NULL group or NULL value are excluded — a null can neither
    be standardized nor define a group, and leaving them in diverges
    between engines (pandas int64 coercion of NaN vs SQL inner-join
    dropping NULL keys; caught by the events drift probe).

    Exactness at extreme magnitudes (round-10 sweep): the sum of squares
    wraps numpy int64 at |cents| > ~3e9, so the moments are computed as
    arbitrary-precision Python ints (the object-dtype sum is the price
    of the applyInPandas showcase staying correct at any magnitude). The
    float `ss` is then built from BIGINT-halves — double(ssq DIV 2^62) *
    2^62 + double(ssq MOD 2^62) — because int128→double conversion
    mis-rounds exact ties in some engines while BIGINT→double is
    correctly rounded everywhere; the oracle replays the identical
    construction. Degenerate groups (n == 1, or zero/negative variance
    term after float cancellation) yield NULL on BOTH sides — DuckDB
    raises on sqrt of a negative where numpy yields NaN, so the guard
    must run before the sqrt."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf[cents_col].to_numpy(dtype=np.int64)
        n_i = len(c)
        obj = c.astype(object)
        s_i = int(obj.sum())
        ssq_i = int((obj * obj).sum())
        hi, lo = divmod(ssq_i, 1 << 62)
        n = float(n_i)
        s = float(s_i)
        ss = float(hi) * float(1 << 62) + float(lo)
        term = (ss - s * s / n) / (n - 1.0) if n_i > 1 else float("nan")
        denom = np.sqrt(term) if term > 0 else np.nan
        z = (c.astype(np.float64) - s / n) / denom
        return pd.DataFrame(
            {
                "event_id": pdf[id_col].to_numpy(dtype=np.int64),
                "event_type": pdf[group_col].to_numpy(),
                "zscore": z,
            }
        )

    from pyspark.sql import functions as F

    clean = df.filter(
        F.col(group_col).isNotNull() & F.col(cents_col).isNotNull()
    )
    return clean.select(id_col, group_col, cents_col).groupBy(group_col).applyInPandas(
        fn, ZSCORE_SCHEMA
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Deequ-style one-pass column profile — the data-validation step a
    training pipeline runs before trusting a new corpus drop (null bursts,
    cardinality collapses, and range drift are the classic silent killers
    of a refreshed ingest). Public analog: AWS Deequ / Great Expectations
    column profiles.

    One aggregation over one scan computes, per requested column:
    row count, null count, exact distinct count, and min/max rendered as
    strings. The multiple COUNT(DISTINCT)s plan as Spark's Expand (input
    rows × len(cols) before partial aggregation) — the standard
    multi-distinct strategy; profile a bounded column list, not SELECT *.
    Min/max stringification is only deterministic across engines for
    integer and string columns — profile doubles via a pre-computed
    fixed-point column.

    Output: one row per column — (column, n_rows, n_null, n_distinct,
    min_str, max_str).
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(F.lit(1)).cast("long").alias(f"__rows_{c}"),
                F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"__null_{c}"),
                F.count_distinct(F.col(c)).cast("long").alias(f"__dist_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
        )
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __rows_{c}, __null_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_rows, n_null, n_distinct, min_str, max_str)"
    )


def _cms_bucket(col: "Column", j: int, width: int) -> "Column":
    """Row j's bucket for an item: int(md5(f"{item}:{j}")[:4], 16) % width.
    Keyed md5 per row keeps the d hash functions independent AND exactly
    replayable in the DuckDB oracle (the same hex-digit arithmetic idiom as
    the shard/stratified operators)."""
    from pyspark.sql import functions as F

    hx = F.substring(F.md5(F.concat_ws(":", col, F.lit(str(j)))), 1, 4)
    return F.conv(hx, 16, 10).cast("long") % width


def count_min_sketch(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) over the
    occurrences of `item_col`: a (depth × width) counter grid as a
    DataFrame (row, bucket, cnt).

    Why this shape survives 100 TB: the counter space is FIXED (d×w rows
    regardless of corpus size), the count is a partial-aggregable groupBy
    — each task emits at most d×w partial rows, so shuffle volume is
    O(tasks × d × w), independent of row count — and two sketches merge by
    adding counters (the same groupBy-sum), which is what makes the sketch
    incrementally maintainable per ingest tick. Point-query error is the
    standard CMS bound: est ∈ [true, true + e·N/w] with prob 1−(1/2)^d.
    """
    from pyspark.sql import functions as F

    buckets = F.array(
        *[_cms_bucket(F.col(item_col), j, width) for j in range(depth)]
    )
    ex = df.select(F.posexplode(buckets).alias("row", "bucket"))
    return ex.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_point_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate each item's occurrence count from a prebuilt sketch:
    est = min over rows j of counter[j, hash_j(item)]. The sketch is d×w
    rows — metadata-sized — so the probe join broadcasts it; the query set
    never shuffles."""
    from pyspark.sql import functions as F

    buckets = F.array(
        *[_cms_bucket(F.col(item_col), j, width) for j in range(depth)]
    )
    probes = items.select(
        *items.columns, F.posexplode(buckets).alias("row", "bucket")
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(*items.columns).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )


def _hll_bucket_rank(col: "Column", b: int = 8):
    """(bucket, rank) for one item: bucket = first `b` bits of md5, rank =
    1 + leading zeros of the next 52 bits (Flajolet et al. 2007). md5 is
    bit-identical in Spark and DuckDB, the 52-bit slice is always a
    POSITIVE long (no sign-bit pitfalls), and rank comes from the binary
    string length — integer-exact in both engines."""
    from pyspark.sql import functions as F

    if b != 8:
        raise ValueError("b=8 (256 registers) is the calibrated variant")
    hx = F.md5(col.cast("string"))
    bucket = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int")
    val = F.conv(F.substring(hx, 3, 13), 16, 10).cast("long")
    rank = F.when(val == 0, F.lit(53)).otherwise(53 - F.length(F.bin(val)))
    return bucket, rank.cast("int")


def hll_sketch(
    df: DataFrame, item_col: str, group_cols: list[str] | None = None, b: int = 8
) -> DataFrame:
    """HyperLogLog register table per group: (group..., bucket, max rank).

    Why this shape survives 100 TB: register space is FIXED (≤ 2^b rows
    per group, sparse — empty registers are implicit), the groupBy(max)
    partial-aggregates map-side so shuffle volume is O(tasks × m)
    regardless of row count, and two sketches MERGE by the same
    groupBy(max) over their union — the property that makes distinct
    counting incrementally maintainable per ingest tick (the cardinality
    analog of `count_min_sketch`; a COUNT(DISTINCT) over raw rows can
    never merge across ticks without reshuffling history).
    NULL items are excluded (COUNT(DISTINCT) semantics)."""
    from pyspark.sql import functions as F

    groups = group_cols or []
    bucket, rank = _hll_bucket_rank(F.col(item_col), b)
    rows = df.filter(F.col(item_col).isNotNull()).select(
        *groups, bucket.alias("bucket"), rank.alias("rank")
    )
    return rows.groupBy(*groups, "bucket").agg(F.max("rank").alias("rank"))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables (same grouping): elementwise max."""
    from functools import reduce

    from pyspark.sql import functions as F

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in u.columns if c != "rank"]
    return u.groupBy(*keys).agg(F.max("rank").alias("rank"))


def hll_stats(sketch: DataFrame, group_cols: list[str] | None = None, b: int = 8) -> DataFrame:
    """Per-group estimator inputs in EXACT integer arithmetic: the
    harmonic-mean denominator as fixed-point BIGINT (each register
    contributes 2^(53-rank), an exact power of two, so the sum is
    order-independent — a float Σ2^-rank would round order-dependently)
    plus the empty-register count. The float estimate itself
    (`hll_estimate_col`) is a deterministic scalar function of these two
    integers."""
    from pyspark.sql import functions as F

    groups = group_cols or []
    m = 1 << b
    # the Python shiftleft() helper wants a literal shift; the SQL form
    # accepts a column expression
    term = F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rank)")
    return sketch.groupBy(*groups).agg(
        (
            F.sum(term)
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << 53).cast("long")
        ).cast("long").alias("sum_fp"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("empty_buckets"),
    )


def hll_linear_counting_table(b: int = 8) -> list[float]:
    """The linear-counting correction m*ln(m/empty) takes only m possible
    values (empty in 1..m) — precompute them ONCE in Python and inline the
    same doubles into every engine. JVM Math.log and DuckDB ln disagree by
    1 ulp on some of these arguments (observed at sf0.01 on
    sketch_hll_rolling), so computing ln at query time is not replayable
    bit-for-bit; a shared table is."""
    import math

    m = float(1 << b)
    return [m * math.log(m / e) for e in range(1, (1 << b) + 1)]


def hll_estimate_col(sum_fp: "Column", empty_buckets: "Column", b: int = 8) -> "Column":
    """Cardinality estimate from the exact integer stats: raw HLL with the
    small-range linear-counting correction (Flajolet et al. 2007). All
    float ops are a fixed scalar expression over two integers — identical
    operation order in any engine; the only transcendental (ln) comes from
    the shared `hll_linear_counting_table` lookup, never engine libm."""
    from pyspark.sql import functions as F

    m = float(1 << b)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (
        F.lit(alpha * m * m * float(1 << 53)) / sum_fp.cast("double")
    )
    # greatest(empty,1): keeps the 1-indexed lookup in bounds under ANSI
    # even though the branch is only taken when empty > 0
    lc = F.element_at(
        F.lit(hll_linear_counting_table(b)),
        F.greatest(empty_buckets.cast("int"), F.lit(1)),
    )
    return F.when((raw <= 2.5 * m) & (empty_buckets > 0), lc).otherwise(raw)


def hll_sparse_hash(col: "Column") -> "Column":
    """52-bit uniform item hash for the SPARSE representation: first 13
    hex chars of md5(item || ':sparse') — salted independently of both the
    HLL register hash and the theta hash, and exactly replayable in DuckDB
    via the hex-digit fold idiom (same shape as `theta_item_hash`)."""
    from pyspark.sql import functions as F

    hx = F.md5(F.concat(col.cast("string"), F.lit(":sparse")))
    return F.conv(F.substring(hx, 1, 13), 16, 10).cast("long")


def hll_adaptive_stats(
    df: DataFrame,
    item_col: str,
    group_cols: list[str],
    b: int = 8,
    sparse_cap: int = 32,
) -> DataFrame:
    """HLL++-style SPARSE/DENSE adaptive distinct-count state per group
    (Heule et al. 2013, "HyperLogLog in Practice" §5: small cardinalities
    keep an exact sparse set, large ones the dense register array).

    Sparse representation: the ≤ sparse_cap+1 SMALLEST distinct item
    hashes per group — bounded per-group state (the theta-sketch trim,
    applied per group with one ranked window over the distinct hashes).
    A group that never overflows the cap reports its distinct count
    EXACTLY (the sparse set is lossless below the cap); an overflowed
    group falls back to the dense `hll_sketch` register estimate.

    Why this shape survives 100 TB: both representations are fixed-size
    per group (cap+1 hashes / 2^b registers), both partial-aggregate
    map-side (distinct and groupBy(max) combine before the shuffle), and
    both MERGE across ingest ticks — sparse sets by distinct-union +
    re-trim, registers by elementwise max; promotion to dense is the
    merge crossing the cap, exactly the HLL++ rule.

    Returns one row per group: (group..., mode, n_kept, hll_sum_fp,
    empty_buckets) — all exact integers/strings; estimator floats are a
    deterministic scalar function of these (`hll_estimate_col`)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = df.filter(F.col(item_col).isNotNull())
    hashes = rows.select(
        *group_cols, hll_sparse_hash(F.col(item_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    kept = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= sparse_cap + 1
    )
    sparse = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    dense = hll_stats(hll_sketch(rows, item_col, group_cols, b), group_cols, b)
    return (
        sparse.join(dense, group_cols)
        .select(
            *group_cols,
            F.when(F.col("n_kept") <= sparse_cap, F.lit("sparse"))
            .otherwise(F.lit("dense"))
            .alias("mode"),
            "n_kept",
            F.col("sum_fp").alias("hll_sum_fp"),
            "empty_buckets",
        )
    )


def log_histogram_sketch(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """HDR-histogram-style mergeable quantile sketch: per group, counts in
    power-of-two value bins (bin = bit length of the integer value; bin 0
    holds zero/negatives). The third mergeable-sketch family next to
    count-min (frequencies) and HyperLogLog (cardinality): bins are fixed
    a priori, so per-tick sketches MERGE by adding counts — the property
    a latency/size-percentile monitor needs across ingest ticks, where an
    exact percentile would rescan history. Shuffle volume is
    O(tasks × 64) after partial aggregation, corpus-size-independent.

    `value_col` must be integer-valued (cents; the fixed-point contract).
    Entirely integer arithmetic — bit-exact in any engine.
    """
    from pyspark.sql import functions as F

    groups = group_cols or []
    v = F.col(value_col)
    bin_col = F.when(v <= 0, F.lit(0)).otherwise(
        F.length(F.bin(v.cast("long")))
    )
    rows = df.filter(v.isNotNull()).select(
        *groups, bin_col.cast("int").alias("bin")
    )
    return rows.groupBy(*groups, "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def log_histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Merge log-histogram sketches (same grouping): add bin counts —
    the per-tick maintenance op (the hll_merge analog)."""
    from functools import reduce

    from pyspark.sql import functions as F

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in u.columns if c != "cnt"]
    return u.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def log_histogram_quantile(
    sketch: DataFrame,
    q: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile UPPER BOUND from the histogram: the smallest bin whose
    cumulative count reaches ceil(q × n); the estimate is that bin's
    inclusive upper edge 2^bin − 1 (relative error bounded by the bin
    width, ~2×). Window cumsum over ≤ 64 bins per group — sketch-sized,
    never data-sized."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    groups = group_cols or []
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.col("bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*groups)
    cum = sketch.select(
        *groups,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(tot).alias("n"),
    )
    # smallest bin with cum >= ceil(q * n): integer threshold avoids
    # engine-specific float rounding at the boundary
    thresh = F.ceil(F.lit(q) * F.col("n").cast("double")).cast("long")
    hit = cum.filter(F.col("cum") >= thresh)
    rk = Window.partitionBy(*groups).orderBy(F.col("bin").asc())
    return (
        hit.withColumn("__rn", F.row_number().over(rk))
        .filter(F.col("__rn") == 1)
        .select(
            *groups,
            F.col("bin").cast("long").alias("q_bin"),
            (
                F.expr("shiftleft(CAST(1 AS BIGINT), bin)") - 1
            ).alias("q_upper_bound"),
            F.col("n").cast("long").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Theta sketch (KMV): the fourth mergeable-sketch family — SET ALGEBRA over
# cardinalities. HLL supports only union natively, so intersections go
# through inclusion–exclusion whose error blows up when |A∩B| << |A∪B|;
# a theta sketch keeps a bounded SAMPLE of hash space (the k smallest
# 52-bit hashes) and supports union / intersect / difference directly with
# relative error ~1/sqrt(k) on the RESULT set (Dasgupta et al. 2016, the
# Apache DataSketches theta family).
#
# Canonical form used here: entries = retained hashes STRICTLY below theta;
# estimate = |entries| * 2^52 / theta_fp — one float expression over two
# exact integers, so a SQL oracle replays it bit-identically. A base sketch
# over fewer than k distinct items has theta = 2^52 (exact mode, estimate
# == exact distinct count).
#
# Why this shape survives 100 TB: a sketch is ≤ k rows (k is a config
# constant), built by distinct + TakeOrdered (per-partition partial top-k,
# shuffle volume O(tasks × k)); sketches for different ticks/partitions
# merge by union + re-trim, so cross-tick set algebra never reshuffles raw
# ids — the same per-tick merge property as count_min / HLL / log-histogram.
# ---------------------------------------------------------------------------

THETA_MAX_FP = 1 << 52  # fixed-point 1.0 on the 52-bit hash scale


class ThetaSketch(NamedTuple):
    """entries: ≤ k rows, column `h` (long), all strictly below theta;
    theta: ONE row, column `theta_fp` (long)."""

    entries: DataFrame
    theta: DataFrame


def theta_item_hash(col: "Column") -> "Column":
    """52-bit uniform item hash: first 13 hex chars of md5(item || ':theta')
    — salted so it is independent of the HLL register hash, and exactly
    replayable in DuckDB via the hex-digit fold idiom."""
    from pyspark.sql import functions as F

    hx = F.md5(F.concat(col.cast("string"), F.lit(":theta")))
    return F.conv(F.substring(hx, 1, 13), 16, 10).cast("long")


def _theta_trim(candidates: DataFrame, k: int) -> ThetaSketch:
    """Canonicalize a candidate hash set (distinct longs `h`): keep the
    k smallest; theta = the k-th smallest if ≥ k candidates else 2^52;
    entries = candidates strictly below theta. The sort-limit is a
    TakeOrdered (per-partition top-k), never a global sort."""
    from pyspark.sql import functions as F

    topk = candidates.orderBy("h").limit(k)
    th = topk.agg(
        F.count(F.lit(1)).alias("__cnt"), F.max("h").alias("__mx")
    ).select(
        F.when(F.col("__cnt") >= k, F.col("__mx"))
        .otherwise(F.lit(THETA_MAX_FP))
        .cast("long")
        .alias("theta_fp")
    )
    # 1-row broadcast-scalar join (the repo-wide idiom), never a shuffle
    entries = topk.crossJoin(F.broadcast(th)).filter(
        F.col("h") < F.col("theta_fp")
    ).select("h")
    return ThetaSketch(entries=entries, theta=th)


def theta_sketch(df: DataFrame, item_col: str, k: int = 64) -> ThetaSketch:
    """Build a theta sketch of the distinct non-NULL values of `item_col`."""
    from pyspark.sql import functions as F

    # localCheckpoint (round-15, guide §5): a sketch's entries/theta
    # frames are consumed by several downstream ops (own estimate, union,
    # intersect, diff), and each consumer re-evaluated the full scan +
    # hash + distinct lineage — ~4 base-table scans per side in the
    # intersection entry. Pinning the distinct hash frame caps that at
    # ONE scan per sketch at any data scale; the k-row TakeOrdered that
    # re-runs per consumer reads the cached hash RDD, never storage.
    # (Two rejected alternatives, both MEASURED worse at sf0.1: pinning
    # the k-row topk frame — limit()-checkpoint materialization runs an
    # executeTake job ladder per trim, 23→41 jobs; and folding the ≤k
    # rows into createDataFrame literals — parallelize()-backed frames
    # carry defaultParallelism partitions, turning every tiny set op and
    # broadcast build into a 32-task job, 2.7→7.1 s.)
    hashes = (
        df.filter(F.col(item_col).isNotNull())
        .select(theta_item_hash(F.col(item_col)).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    return _theta_trim(hashes, k)


def _theta_min(a: ThetaSketch, b: ThetaSketch) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        a.theta.crossJoin(
            F.broadcast(b.theta.withColumnRenamed("theta_fp", "__tb"))
        )
        .select(F.least("theta_fp", "__tb").alias("theta_fp"))
    )


def theta_union(a: ThetaSketch, b: ThetaSketch, k: int = 64) -> ThetaSketch:
    """A ∪ B: pooled entries cut to min(θa, θb), then re-trimmed to k."""
    from pyspark.sql import functions as F

    th = _theta_min(a, b)
    pooled = (
        a.entries.unionByName(b.entries)
        .distinct()
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta_fp"))
        .select("h")
    )
    trimmed = _theta_trim(pooled, k)
    # trimming can only lower theta further; combine both cuts
    final_th = _theta_min(trimmed, ThetaSketch(entries=pooled, theta=th))
    entries = trimmed.entries.crossJoin(F.broadcast(final_th)).filter(
        F.col("h") < F.col("theta_fp")
    ).select("h")
    return ThetaSketch(entries=entries, theta=final_th)


def _theta_setop(a: ThetaSketch, b: ThetaSketch, how: str) -> ThetaSketch:
    from pyspark.sql import functions as F

    th = _theta_min(a, b)
    if how == "intersect":
        ent = a.entries.join(b.entries, "h")
    elif how == "diff":
        ent = a.entries.join(b.entries, "h", "left_anti")
    else:  # pragma: no cover
        raise ValueError(how)
    ent = ent.crossJoin(F.broadcast(th)).filter(
        F.col("h") < F.col("theta_fp")
    ).select("h")
    return ThetaSketch(entries=ent, theta=th)


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """A ∩ B: entries present in both, below min(θa, θb) — the op HLL
    cannot express without inclusion–exclusion error blow-up."""
    return _theta_setop(a, b, "intersect")


def theta_diff(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """A \\ B: A's entries absent from B, below min(θa, θb)."""
    return _theta_setop(a, b, "diff")


def theta_estimate(sk: ThetaSketch) -> DataFrame:
    """ONE row: (n_retained, theta_fp, estimate). estimate =
    n_retained * 2^52 / theta_fp — a single fixed-order float division
    over two exact integers (exact mode falls out: theta = 2^52 ⇒
    estimate == n_retained)."""
    from pyspark.sql import functions as F

    n = sk.entries.agg(F.count(F.lit(1)).cast("long").alias("n_retained"))
    return n.crossJoin(F.broadcast(sk.theta)).select(
        "n_retained",
        "theta_fp",
        (
            F.col("n_retained").cast("double")
            * F.lit(float(THETA_MAX_FP))
            / F.col("theta_fp").cast("double")
        ).alias("estimate"),
    )


# --- KLL-style quantile sketch under PINNED deterministic compaction -------
#
# The classic KLL sketch (Karnin, Lang, Liberty 2016) keeps a hierarchy of
# level buffers; when level l fills to capacity it sorts the buffer and
# promotes a RANDOM half to level l+1 with doubled weight. Randomized
# compaction makes the sketch merge-order sensitive — the same blocker the
# t-digest had (SURVEY round-9 notes) until `sketch_tdigest_pinned` pinned
# the build over the GLOBAL rank. The same pinning works here: feed the
# items in global sorted order and make every compaction keep the items at
# EVEN local positions. The whole final sketch then has a closed form in
# the item's global rank r (1-based, unique tiebreak):
#
#   n_0 = n,  C_l = floor(n_l / kcap),  n_{l+1} = (kcap/2) * C_l
#
#   an item reaches level l      iff  2^l | r  and  r <= R_l,
#       where R_l = min_{m<l} kcap * C_m * 2^m   (R_0 = +inf)
#   it is RETAINED at level l    iff  it reaches l and r > kcap * C_l * 2^l
#       (it arrived after level l's last compaction), with weight 2^l.
#
# Weight is conserved (each compaction turns kcap rows of weight w into
# kcap/2 rows of weight 2w), so the sketch's total weight is exactly n, and
# the sketch size is < kcap rows per level, <= kcap * ceil(log2(n/kcap))
# overall — bounded by CONFIG, not by data. "Mergeable" here is rank-pinned
# like the t-digest: building over (A union B) IS the merge, and the result
# is independent of partitioning and arrival order by construction.
#
# Everything is integer arithmetic on the rank — no RNG, no floats — so a
# SQL engine replays the identical sketch from the identical closed form
# (the oracle's WITH RECURSIVE level plan mirrors kll_level_plan).


def kll_level_plan(n: int, kcap: int = 64) -> list[tuple[int, int, int]]:
    """(level, n_l, C_l) rows of the pinned-compaction recursion; empty
    for n == 0. kcap must be even."""
    if kcap < 2 or kcap % 2:
        raise ValueError("kcap must be an even integer >= 2")
    plan, l, nl = [], 0, int(n)
    while nl > 0:
        cl = nl // kcap
        plan.append((l, nl, cl))
        nl = (kcap // 2) * cl
        l += 1
    return plan


def kll_sketch(
    ranked: DataFrame,
    rank_col: str,
    n: int,
    kcap: int = 64,
    level_col: str = "level",
    weight_col: str = "weight",
) -> DataFrame:
    """Assign each globally-ranked row its retained level (or drop it)
    under the pinned-compaction closed form above. Row-local: the level
    plan is a handful of Python-computed constants folded into one
    chained CASE — no join, no extra shuffle on top of the rank."""
    from pyspark.sql import functions as F

    plan = kll_level_plan(n, kcap)
    r = F.col(rank_col)
    lvl = None
    rmax: int | None = None  # R_l as a running min; None = +inf (l = 0)
    for l, _nl, cl in plan:
        lo = cl * kcap * (1 << l)
        cond = (r % F.lit(1 << l) == 0) & (r > F.lit(lo))
        if rmax is not None:
            cond = cond & (r <= F.lit(rmax))
        lvl = F.when(cond, F.lit(l)) if lvl is None else lvl.when(cond, F.lit(l))
        rmax = lo if rmax is None else min(rmax, lo)
    if lvl is None:  # empty input: keep the full output schema
        return (
            ranked.withColumn(level_col, F.lit(None).cast("int"))
            .withColumn(weight_col, F.lit(None).cast("long"))
            .filter(F.lit(False))
        )
    return (
        ranked.withColumn(level_col, lvl)
        .filter(F.col(level_col).isNotNull())
        .withColumn(
            weight_col,
            F.expr(f"shiftleft(cast(1 as bigint), {level_col})"),
        )
    )


# --- Holt linear-trend smoothing (pinned dyadic fixed point) --------------

HOLT_SCHEMA = (
    "event_type string, h timestamp, i bigint, x bigint, "
    "level_fp bigint, trend_fp bigint"
)


def holt_linear_by_group(
    hourly: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "h",
    x_col: str = "x",
    scale_bits: int = 20,
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) per group
    with PINNED dyadic coefficients alpha=1/2, beta=1/4 in scaled-integer
    arithmetic (fixed point at 2^scale_bits, FLOOR division), so two
    engines replay the recursion bit-identically:

        Xs_i = x_i * S                         (S = 2^scale_bits)
        L_1  = Xs_1,  B_1 = 0
        L_i  = floor((Xs_i + L_{i-1} + B_{i-1}) / 2)
        B_i  = floor((L_i - L_{i-1}) / 4) + floor(3*B_{i-1} / 4)

    The input is an already-aggregated per-group SERIES frame (one row
    per group x tick) — bounded by the time axis, not the event count —
    so the per-group pandas recursion is scale-safe: one shuffle on the
    group key, each group's series fits one worker by construction.
    Python ints carry the state (no silent int64 wrap); floor division
    is pinned (numpy and Python `//` floor; SQL oracles must use the
    nonneg-remainder identity because e.g. DuckDB's `//` truncates)."""
    S = 1 << scale_bits

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        xs = [int(v) for v in pdf[x_col]]
        levels: list[int] = []
        trends: list[int] = []
        lvl = trd = 0
        for idx, x in enumerate(xs):
            if idx == 0:
                lvl, trd = x * S, 0
            else:
                prev = lvl
                lvl = (x * S + lvl + trd) // 2
                trd = (lvl - prev) // 4 + (3 * trd) // 4
            levels.append(lvl)
            trends.append(trd)
        return pd.DataFrame(
            {
                "event_type": pdf[group_col].to_numpy(),
                "h": pdf[ts_col].to_numpy(),
                "i": np.arange(1, len(xs) + 1, dtype=np.int64),
                "x": np.asarray(xs, dtype=np.int64),
                "level_fp": np.asarray(levels, dtype=np.int64),
                "trend_fp": np.asarray(trends, dtype=np.int64),
            }
        )

    from pyspark.sql import functions as F

    clean = hourly.filter(
        F.col(group_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    return clean.groupBy(group_col).applyInPandas(fn, HOLT_SCHEMA)


# --- market-basket association (support + lift) ----------------------------


def basket_lift_pairs(
    df: DataFrame,
    order_col: str,
    item_col: str,
    min_support: int = 3,
) -> DataFrame:
    """Item pairs co-occurring in >= min_support baskets, with
    exact-integer support counts and lift = (c_ab * n_orders) /
    (c_a * c_b) as the ONE float expression (an IEEE-exact division of
    two exact BIGINT products).

    Plan: the pair stream is a self-equi-join on the basket key —
    fan-out bounded by basket size, so the join is linear in item rows
    at any scale; the min-support filter bounds the output; per-item
    counts are a Zipf-small frame AQE joins back (no static hint), and
    the basket total is the bounded 1-row broadcast-scalar cross.
    Output: (part_a, part_b, c_ab, c_a, c_b, n_orders, lift).

    NULL basket keys and NULL items are dropped up front (review
    catch): a NULL-key row would inflate the per-item counts c_a/c_b
    while never reaching n_orders (count_distinct skips NULL) or the
    pair join (equi-join drops NULL) — silently deflating lift."""
    from pyspark.sql import functions as F

    items = (
        df.select(F.col(order_col).alias("o"), F.col(item_col).alias("p"))
        .filter(F.col("o").isNotNull() & F.col("p").isNotNull())
        .distinct()
    )
    total = items.agg(F.count_distinct("o").cast("long").alias("n_orders"))
    cnt = items.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pairs = (
        items.alias("a")
        .join(items.alias("b"), on="o")
        .filter(F.col("a.p") < F.col("b.p"))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= min_support)
    )
    return (
        pairs.join(cnt.withColumnRenamed("p", "part_a"), "part_a")
        .withColumnRenamed("c", "c_a")
        .join(cnt.withColumnRenamed("p", "part_b"), "part_b")
        .withColumnRenamed("c", "c_b")
        .crossJoin(F.broadcast(total))  # bounded: 1-row scalar
        .select(
            "part_a",
            "part_b",
            "c_ab",
            "c_a",
            "c_b",
            "n_orders",
            (
                (F.col("c_ab") * F.col("n_orders")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
    )


def isotonic_fit_blocks(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Isotonic regression (PAV — pool-adjacent-violators) per group,
    in EXACT RATIONAL arithmetic (round-12 seed shipped early): the
    monotone-nondecreasing least-squares fit of y on the (x, tiebreak)
    order, returned as its maximal constant BLOCKS (block_id, n, sum_y,
    x_lo, x_hi) — fitted value = sum_y/n, never materialized as a
    float, so block identity is bit-exact in any engine. The
    calibration-curve primitive (is my score monotone in outcome?)
    every model-eval pipeline runs next to the lift table.

    PAV is inherently SEQUENTIAL in the x order (each pool depends on
    every earlier point), so the per-group fit runs in applyInPandas —
    one hash shuffle on the group key, stack-based O(n) per group,
    integer sums only (pool means compared by cross-multiplication
    s1·n2 ≥ s2·n1). Weak-inequality pooling: adjacent equal-mean blocks
    MERGE, so the first block is the LONGEST prefix attaining the
    minimal prefix mean and the last block the longest suffix attaining
    the maximal suffix mean — the two closed-form facts a SQL oracle
    can verify exactly (the minimax characterization fitted_i =
    max_{j<=i} min_{k>=i} mean(y[j..k]) is O(n^3) and stays in the
    property test).

    Input columns must be integer-valued (y is typically a 0/1
    response; x an exact cents/count score). Groups are bounded by the
    caller's domain (segments, priorities) — the q_segment_lift
    contract, not millions of keys.

    The group column keeps its OWN Spark type in the output (round-12
    ADVICE fix: the schema previously hardcoded `g string`, silently
    coercing or Arrow-failing a non-string group). NULL tiebreaks are
    filtered like NULL x/y — pandas sorts NaN last, an ordering no SQL
    oracle reproduces, so rows without a total (x, tiebreak) order are
    out of contract.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    gtype = df.select(F.col(group_col).alias("g")).schema["g"].dataType.simpleString()
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.col(tiebreak_col).cast("long").alias("tb"),
    ).filter(
        F.col("x").isNotNull() & F.col("y").isNotNull() & F.col("tb").isNotNull()
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["x", "tb"], kind="mergesort")
        xs = pdf["x"].tolist()
        ys = pdf["y"].tolist()
        # stack of blocks [n, sum_y, x_lo, x_hi]
        stack: list[list[int]] = []
        for x, y in zip(xs, ys):
            n, s, lo, hi = 1, int(y), int(x), int(x)
            # pool while the previous mean >= current mean (weak:
            # equal means merge), compared exactly by cross-mult
            while stack and stack[-1][1] * n >= s * stack[-1][0]:
                pn, ps, plo, _phi = stack.pop()
                n, s, lo = n + pn, s + ps, plo
            stack.append([n, s, lo, hi])
        g = pdf["g"].iloc[0]
        return pd.DataFrame(
            [
                {
                    "g": g,
                    "block_id": i + 1,
                    "n": n,
                    "sum_y": s,
                    "x_lo": lo,
                    "x_hi": hi,
                }
                for i, (n, s, lo, hi) in enumerate(stack)
            ]
        )

    out = base.groupBy("g").applyInPandas(
        fit,
        schema=(
            f"g {gtype}, block_id long, n long, sum_y long, "
            "x_lo long, x_hi long"
        ),
    )
    return out.select(
        F.col("g").alias(group_col),
        "block_id",
        "n",
        "sum_y",
        "x_lo",
        "x_hi",
    )
