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
    z = (c - s/n) / sqrt((ss - s*s/n)/(n-1))."""

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

    return df.select(id_col, group_col, cents_col).groupBy(group_col).applyInPandas(
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
