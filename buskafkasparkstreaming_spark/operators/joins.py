"""Join operators beyond the plain `df.join` (SURVEY §2.3 "Joins" row).

Scale notes baked into each implementation:
* broadcast_join — explicit broadcast of small dims; at 100 TB the fact side
  never shuffles.
* asof_join — the union-sort trick: ONE shuffle on the key (no per-row range
  probe, no cross product). This is the standard scalable as-of pattern
  (e.g. what kdb/QuestDB/Flink temporal joins do physically): tag build and
  probe rows, sort within key by (time, is_build), and carry the last build
  payload forward with `last(..., ignorenulls=True)`.
* range_join — bucketized equi-pre-join so Catalyst gets an equi-condition
  to hash on instead of a BroadcastNestedLoop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | str | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join with the dim side broadcast — no shuffle of the fact side."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str | Column) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str | Column) -> DataFrame:
    return left.join(right, on, "left_anti")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    build_cols: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """As-of join: for each probe row, attach the build row with the greatest
    `build_time` ≤ `probe_time` within the same `key`.

    Implementation: union probe and build rows with a side marker, window
    over (key) ordered by (time, side, tiebreak), and take
    `last(build payload, ignorenulls=True)` up to the current row. Build
    rows at exactly probe_time win (inclusive ≤). Among equal-time build
    rows the greatest `tiebreak` wins.

    Cost: one hash shuffle on `key` + per-key sort — linear, no range
    explosion; survives 100× scale-up as long as per-key cardinality fits a
    sort spill (it does: UnsafeExternalSorter spills to disk).

    NULL times: a build row without a time can never be "the latest as of
    t" and is dropped; a probe row without a time matches nothing (kept
    unmatched under how='left'). Without the guard, NULL build times sort
    NULLS-FIRST into the union and silently act as since-forever matches.
    """
    build = build.filter(F.col(build_time).isNotNull())
    probe_cols = probe.columns
    pay = F.struct(*[F.col(c) for c in build_cols]).alias("__pay")
    probe_struct = F.struct(*[F.col(c) for c in probe_cols]).alias("__probe")
    tb = F.col(tiebreak) if tiebreak else F.lit(0)

    pay_t = build.select(pay).schema["__pay"].dataType
    probe_t = probe.select(probe_struct).schema["__probe"].dataType
    tb_t = build.select(tb.alias("__tb")).schema["__tb"].dataType

    p = probe.select(
        F.col(key).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),  # probe sorts after build at equal time
        F.lit(None).cast(pay_t).alias("__pay"),
        probe_struct,
        F.lit(None).cast(tb_t).alias("__tb"),
    )
    b = build.select(
        F.col(key).alias("__k"),
        F.col(build_time).alias("__t"),
        F.lit(0).alias("__side"),
        pay,
        F.lit(None).cast(probe_t).alias("__probe"),
        tb.alias("__tb"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(
            # nulls FIRST (explicit): a null-time probe must see no build
            F.col("__t").asc_nulls_first(),
            F.col("__side").asc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        p.unionByName(b)
        .withColumn("__matched", F.last("__pay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        merged = merged.filter(F.col("__matched").isNotNull())
    return merged.select(
        *[F.col("__probe")[c].alias(c) for c in probe_cols],
        *[F.col("__matched")[c].alias(c) for c in build_cols],
    )


def salted_join(
    big: DataFrame,
    skewed_dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe equi-join: spread each hot key of `big` across
    `salt_buckets` sub-keys and replicate the (small) `skewed_dim` side per
    bucket. Turns one straggler partition into `salt_buckets` even ones.

    AQE's skew-join handles sort-merge skew automatically; salting is the
    explicit fallback for aggregations-after-join and for pre-AQE plans.

    `how` is restricted to inner/left: the result then equals the plain
    join (the salt is internal). For right/full outer, an unmatched dim row
    would surface once PER SALT REPLICA (salt_buckets duplicate
    null-extended rows) — so those modes are rejected rather than silently
    wrong.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "outer-dim modes would emit one row per salt replica for "
            "unmatched dim keys"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    salted_dim = skewed_dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(salted_dim, [on, "__salt"], how).drop("__salt")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Column | None = None,
) -> DataFrame:
    """Interval join `right_lo <= left_val < right_hi` without a nested-loop:
    explode each right interval into the integer buckets it spans, equi-join
    on bucket, then apply the exact range predicate. Bucket width should
    approximate the median interval length."""
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    cond = (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) < F.col(right_hi))
    if extra_on is not None:
        cond = cond & extra_on
    return lb.join(rb, on=["__bucket"], how="inner").filter(cond).drop("__bucket")
