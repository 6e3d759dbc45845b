"""Incremental time-bucket rollups (continuous aggregates).

The hypertable pattern: a base event stream is folded into a coarse
time-bucketed summary table that is maintained INCREMENTALLY — each new
batch of events is aggregated to mergeable partials and merged into the
existing rollup state, so refresh cost is O(batch), never O(base table).
At 100 TB of history this is the difference between a dashboard query
touching the whole lake and one touching a summary table 10^6× smaller.

Mergeability contract: every column in the partial state must be a
semigroup under the merge (count→sum, sum→sum, min→min, max→max; avg is
DERIVED as sum/count at read time, never stored). Sums use exact integer
cents (see `__spark_entry__` money helpers) so merge order never changes
the result — the algebraic property the DuckDB oracle verifies by
recomputing the rollup from scratch in one GROUP BY.

Reference parity: the reference maintains only a latest-state table
(Hudi upsert, 01-setup-ec-vm.md:262-273) and defers aggregation to
Athena/Superset dashboards downstream (README.md:5). This module is the
engine-native version of that downstream aggregation, maintained with the
same micro-batch cadence as the upsert.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_partial(
    batch: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    cents_col: Column | str,
    bucket: str = "hour",
) -> DataFrame:
    """Aggregate one batch to mergeable per-(bucket, keys) partials:
    (bucket_ts, *keys, n_rows, sum_cents, min_cents, max_cents).
    One partial-aggregated shuffle on the rollup key — the map-side
    combine means network cost is O(distinct buckets per partition),
    not O(rows)."""
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    return batch.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"), *key_cols
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(c).alias("sum_cents"),
        F.min(c).alias("min_cents"),
        F.max(c).alias("max_cents"),
    )


def merge_rollups(states: Sequence[DataFrame]) -> DataFrame:
    """Merge rollup states produced by `rollup_partial` (or by a previous
    merge — the operation is associative and commutative). Plan: union of
    the (small) summary tables + one re-aggregation; with B batches folded
    the plan is still ONE exchange over summary rows, never a rescan of
    base data."""
    unioned = functools.reduce(DataFrame.unionByName, states)
    keys = [c for c in unioned.columns
            if c not in ("n_rows", "sum_cents", "min_cents", "max_cents")]
    return unioned.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_cents").alias("min_cents"),
        F.max("max_cents").alias("max_cents"),
    )


def rollup_read(state: DataFrame, scale: float = 100.0) -> DataFrame:
    """Read-time projection of a rollup state: derive the non-mergeable
    aggregates (total, avg) from the exact integer partials. Division
    happens HERE, once, in a fixed operation order — so results are
    bit-identical however many merges produced the state."""
    return state.select(
        *[c for c in state.columns
          if c not in ("sum_cents", "min_cents", "max_cents")],
        (F.col("sum_cents").cast("double") / scale).alias("sum_value"),
        (
            F.col("sum_cents").cast("double") / scale / F.col("n_rows")
        ).alias("avg_value"),
        (F.col("min_cents").cast("double") / scale).alias("min_value"),
        (F.col("max_cents").cast("double") / scale).alias("max_value"),
    )
