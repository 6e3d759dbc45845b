"""Storage-layout operators: Z-order (Morton) clustering for
multi-dimensional data-skipping.

A table queried by BOTH `user_id` and `value` ranges can only prune
row-groups on whichever column it is sorted by. Interleaving the bits of
the two keys (Morton order) makes rows close in EITHER dimension close in
the file order, so min/max row-group statistics prune on both — the
technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Public references:
Morton (1966); Databricks' Delta Lake OPTIMIZE docs; Apache Iceberg
sort-order spec.

Everything here is integer bit arithmetic on scaled keys — exact,
engine-independent, and row-local. Only the optional rewrite shuffles
(one range partitioning — the layout job's inherent cost, paid to make
every later scan cheaper).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a BIGINT column into [0, 2^bits) by min/max scaling. The
    division runs in double on purpose: IEEE division is correctly
    rounded, so floor(exact_product / exact_range) is bit-identical in
    every engine given the same operands (the products stay < 2^53 for
    32-bit key ranges × 16 bits)."""
    span = F.greatest(cmax - cmin, F.lit(1)).cast("double")
    return F.floor(
        ((col - cmin) * F.lit((1 << bits) - 1)).cast("double") / span
    ).cast("long")


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative BIGINT columns
    into a Morton key: bit j of `a` lands at position 2j, bit j of `b` at
    2j+1. Pure bitwise expression (JVM codegen, no UDF), exact in any
    engine with `>>`/`&`/`<<`."""
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)), 2 * j)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    return z


def zorder_layout(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 16,
    num_files: int = 64,
) -> DataFrame:
    """Attach (zkey, file_id) for a Z-order rewrite of `df` over the two
    BIGINT dimension columns. Keys are min/max-scaled to `bits` bits (the
    min/max pair is a broadcast 1-row aggregate — no driver action), then
    bit-interleaved; `file_id` buckets the Z-space uniformly
    (`zkey * num_files >> (2*bits)` — row-local integer arithmetic).

    Uniform Z-space buckets are deterministic and replayable, which is
    what the correctness oracle checks; a production rewrite wanting
    size-balanced files instead uses `write_zordered` (range partitioning
    with sampled boundaries — balanced but not bit-replayable, since
    boundaries depend on sampling). At 100 TB either variant is one
    shuffle; scans afterward prune row-groups on both dimensions.

    Output: input columns + (zkey, file_id).
    """
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    bounds = df.agg(
        F.min(a).alias("__amin"),
        F.max(a).alias("__amax"),
        F.min(b).alias("__bmin"),
        F.max(b).alias("__bmax"),
    )
    scaled = df.crossJoin(F.broadcast(bounds))  # scalar-broadcast idiom
    za = _scale_to_bits(a, F.col("__amin"), F.col("__amax"), bits)
    zb = _scale_to_bits(b, F.col("__bmin"), F.col("__bmax"), bits)
    out = scaled.withColumn("zkey", zorder_key(za, zb, bits))
    return out.withColumn(
        "file_id",
        F.shiftrightunsigned(F.col("zkey") * num_files, 2 * bits).cast("long"),
    ).drop("__amin", "__amax", "__bmin", "__bmax")


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    num_files: int = 64,
) -> None:
    """Production rewrite: range-partition on the Morton key into
    size-balanced files and sort within each, then write parquet — the
    layout every later multi-dimension range scan benefits from. One
    shuffle (the range exchange samples boundaries), one local sort."""
    laid = zorder_layout(df, a_col, b_col, bits=bits, num_files=num_files)
    (
        laid.drop("file_id")
        .repartitionByRange(num_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )

