"""Scalar column builders shared across operators.

All JVM-side (pyspark.sql.functions compositions) — no Python UDFs here, so
every expression stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_millis(col: Column | str) -> Column:
    """Epoch milliseconds (long) from any timestamp-like column.

    Casts to TIMESTAMP first so the expression is total over every encoding
    the engine's tables have shipped with — TIMESTAMP, TIMESTAMP_NTZ (cast is
    value-preserving under the pinned UTC session), or a string. The ONE
    idiom for timestamp→millis; bare F.unix_millis on an un-cast column is
    the schema-drift bug class this engine exists to prevent (SURVEY §1.2).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp")).cast("long")


def epoch_millis_to_ts(col: Column | str) -> Column:
    """Normalize io.debezium.time.Timestamp (epoch millis, reference
    bus_status_schema.json:1) to a TimestampType column.

    The single place the engine does this conversion — the reference had the
    same value typed three different ways (MySQL DATETIME, Debezium int64
    millis, Athena `date`; SURVEY §1.2).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) points.

    For bus-distance queries over the GPS ping columns (reference F1
    lat/lon, 01-setup-ec-vm.md:329-330). Pure built-in trig → codegen.
    """
    r = 6371.0088
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, computed in double.

    Sequential left-to-right accumulation (F.aggregate over zip_with) so the
    result is deterministic and matches a scalar-loop oracle bit-for-bit.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity = dot(a,b) / sqrt(dot(a,a) * dot(b,b))."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return dot_product(ca, cb) / F.sqrt(dot_product(ca, ca) * dot_product(cb, cb))


def l2_norm_sq(a: Column | str) -> Column:
    """Squared L2 norm of an array<numeric> column (double)."""
    return dot_product(a, a)


#: 2^62 — the BIGINT-halves radix for cross-engine exact->double builds
FP62 = 4611686018427387904


def fp_from_decimal(col: Column) -> Column:
    """Deterministic cross-engine DOUBLE from an exact DECIMAL(38,0).

    A decimal (int128-backed) cast straight to double is NOT portable:
    engines that compose the conversion from two 64-bit halves mis-round
    exact ties above 2^53 (measured in DuckDB on -53560554100741004,
    round-10 extreme-magnitude sweep), while int64->double is correctly
    rounded everywhere. So: floor-divmod the value by 2^62 into BIGINT
    halves, convert each through the correct int64 path, and recombine
    with one exact power-of-two multiply and one IEEE addition —
    identical bits in any IEEE-754 engine. The divmod is TRUNCATED
    (dividend-signed remainder, the engines' native %), not floored: a
    floored split represents -9 as (-1)*2^62 + (2^62 - 9), and the low
    half's own double rounding then cancels the value to 0.0 — with a
    dividend-signed remainder the halves never straddle zero, so the
    result is within ~1 ulp of the true value (not necessarily the
    correctly-rounded one — portability is the contract, the SQL twin
    replays the identical construction).

    CALLER CONTRACT: |value| < 2^125 (~4.3e37), strictly narrower than
    DECIMAL(38,0)'s ~1e38 range — the hi half must fit BIGINT. Inputs
    in (2^125, 10^38) raise under ANSI mode and silently NULL with ANSI
    off; there is no runtime guard (a Column can't assert). Current
    callers are cent/value totals bounded far below 2^125 even under
    the 1e9/1e7 magnitude sweeps; a new caller that can exceed it needs
    a two-level split (divmod by 2^62 twice) instead.
    """
    p = F.lit(FP62).cast("decimal(38,0)")
    lo = col % p
    hi = ((col - lo) / p).cast("decimal(38,0)")
    return (
        hi.cast("long").cast("double") * float(FP62)
        + lo.cast("long").cast("double")
    )
