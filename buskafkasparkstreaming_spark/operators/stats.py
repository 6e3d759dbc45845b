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
    dropping NULL keys; caught by the events drift probe)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf[cents_col].to_numpy(dtype=np.int64)
        n = float(len(c))
        s = float(c.sum())
        ss = float((c * c).sum())
        cd = c.astype(np.float64)
        denom = np.sqrt((ss - s * s / n) / (n - 1.0)) if n > 1 else np.nan
        z = (cd - s / n) / denom
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
