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
