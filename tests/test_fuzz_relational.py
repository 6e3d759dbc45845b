"""Differential fuzzing: generate random (filter, group, agg) query specs
and execute the SAME spec as a DataFrame plan and as DuckDB SQL. Any
mismatch is an engine-semantics bug in how we express plans — exactly the
class of error the oracle gate punishes."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.sources.files import read_table
from tests.compare import assert_frames_match, duckdb_conn

SF = "/root/testdata/sf0.001"

# (column, kind) pools per table — numeric cols are exact 2-decimal money or
# integral, so cents-sums compare bitwise (see __spark_entry__ header)
TABLES = {
    "orders": {
        "group": ["o_orderstatus", "o_orderpriority", "o_custkey"],
        "money": ["o_totalprice"],
        "key": "o_orderkey",
    },
    "customer": {
        "group": ["c_mktsegment", "c_nationkey"],
        "money": ["c_acctbal"],
        "key": "c_custkey",
    },
    "lineitem": {
        "group": ["l_returnflag", "l_linestatus", "l_suppkey"],
        "money": ["l_extendedprice"],
        "key": "l_orderkey",
    },
}

spec = st.builds(
    dict,
    table=st.sampled_from(sorted(TABLES)),
    group_idx=st.integers(min_value=0, max_value=2),
    cmp=st.sampled_from([">", "<", ">=", "<="]),
    threshold=st.integers(min_value=-1000, max_value=500_000),
    agg=st.sampled_from(["count", "sum_cents", "min", "max", "count_distinct_key"]),
)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@settings(
    max_examples=40, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(q=spec)
def test_fuzz_group_agg(spark, con, q):
    t = TABLES[q["table"]]
    group = t["group"][q["group_idx"] % len(t["group"])]
    money, key = t["money"][0], t["key"]
    thr, cmp = q["threshold"], q["cmp"]

    df = read_table(spark, SF, q["table"])
    cond = {
        ">": F.col(money) > thr,
        "<": F.col(money) < thr,
        ">=": F.col(money) >= thr,
        "<=": F.col(money) <= thr,
    }[cmp]
    cents = F.round(F.col(money) * 100, 0).cast("long")
    aggs = {
        "count": F.count(F.lit(1)).alias("v"),
        "sum_cents": F.sum(cents).alias("v"),
        "min": F.min(cents).alias("v"),
        "max": F.max(cents).alias("v"),
        "count_distinct_key": F.countDistinct(key).alias("v"),
    }
    sdf = df.filter(cond).groupBy(group).agg(aggs[q["agg"]])

    sql_cents = f"CAST(round({money} * 100) AS BIGINT)"
    sql_agg = {
        "count": "count(*)",
        "sum_cents": f"CAST(sum({sql_cents}) AS BIGINT)",
        "min": f"min({sql_cents})",
        "max": f"max({sql_cents})",
        "count_distinct_key": f"count(DISTINCT {key})",
    }[q["agg"]]
    sql = (
        f"SELECT {group}, {sql_agg} AS v FROM {q['table']} "
        f"WHERE {money} {cmp} {thr} GROUP BY {group}"
    )
    assert_frames_match(sdf.toPandas(), con.execute(sql).df(), f"fuzz:{q}")
