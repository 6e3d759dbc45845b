"""Differential comparison utilities: Spark result vs DuckDB oracle.

Mirrors the driver's check (CORRECTNESS_r{N}.json): row count, schema
(column names), and order-insensitive value equality (columns sorted by
name, rows sorted by all columns). Floats must match to tight tolerance —
the query set is designed so both engines compute identical arithmetic.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # NaT stringifies as 'NaT' but an object-dtype null from the
            # other engine stringifies as 'None' — unify nulls first
            df[c] = s.astype("datetime64[us]").astype(str).mask(s.isna(), "None")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            # unify int WIDTHS only — an int column must stay int. The
            # driver's value hash is dtype-faithful (int64 13 != float64
            # 13.0), so coercing ints to float here masked exactly the
            # failure class that made q_attribution_credit's r10 driver
            # row red while the local parity run stayed green (DuckDB
            # HUGEINT window arithmetic -> pandas float64).
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str, float_tol: float = 0.0
) -> None:
    """float_tol defaults to 0: the query set arranges all float arithmetic
    to be bit-identical between engines (exact integer aggregation +
    identical sequential expression order), so any drift is a real bug."""
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for c in a.columns:
        a_num = pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_integer_dtype(a[c])
        b_num = pd.api.types.is_float_dtype(b[c]) or pd.api.types.is_integer_dtype(b[c])
        if a_num and b_num and a[c].dtype != b[c].dtype:
            # int-vs-float is a driver-hash mismatch even when the
            # values are numerically equal — fail loudly with the class
            raise AssertionError(
                f"{name}: column {c} dtype drift: spark={a[c].dtype} "
                f"oracle={b[c].dtype} (the driver's hash is "
                f"dtype-faithful; CAST the oracle/engine side so both "
                f"agree — usually a DuckDB sum()/window HUGEINT "
                f"materializing as float64)"
            )
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            sa, sb = a[c], b[c]
            both_nan = sa.isna() & sb.isna()
            diff = (sa - sb).abs()
            scale = sb.abs().clip(lower=1.0)
            bad = ~both_nan & ~(diff <= float_tol * scale)
            if bad.any():
                i = bad.idxmax()
                raise AssertionError(
                    f"{name}: column {c} mismatch at sorted row {i}: "
                    f"spark={sa[i]!r} oracle={sb[i]!r} "
                    f"(maxdiff={float(diff[~both_nan].max())})"
                )
        else:
            eq = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
            if not eq.all():
                i = (~eq).idxmax()
                raise AssertionError(
                    f"{name}: column {c} mismatch at sorted row {i}: "
                    f"spark={a[c][i]!r} oracle={b[c][i]!r}"
                )


def run_pair(spark, con, spark_fn, sql: str, sf_dir: str, name: str) -> None:
    sdf = spark_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = con.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def _isclose(x: float, y: float, tol: float = 1e-9) -> bool:
    return math.isclose(x, y, rel_tol=tol, abs_tol=tol)
