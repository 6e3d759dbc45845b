"""The correctness gate, run locally: every queries() entry with an
oracle_sql() twin must match DuckDB on the smoke-scale tables — exactly what
the driver does at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.compare import duckdb_conn, run_pair

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(name, spark, con, sf_dir):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    run_pair(spark, con, QUERIES[name], ORACLES[name], sf_dir, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    """No-oracle ops must still execute and return a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert set(df.columns) == {"user_id", "event_id", "event_type", "value", "ts"}
