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


# ---- round-7 operator fuzz: random small inputs vs reference semantics ----

edge_sets = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=18,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_sets)
def test_fuzz_triangle_counts_vs_bruteforce(spark, edges):
    """Degree-oriented triangle counting == brute-force enumeration on
    random small graphs (dupes collapsed, orientation-independent)."""
    from itertools import combinations

    from buskafkasparkstreaming_spark.operators.graph import triangle_counts

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    if not und:
        return
    eset = set(und)
    nodes = sorted({x for e in und for x in e})
    brute = {v: 0 for v in nodes}
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in eset and (b, c) in eset and (a, c) in eset):
            brute[a] += 1
            brute[b] += 1
            brute[c] += 1
    df = spark.createDataFrame(und, "id_a long, id_b long")
    got = {r.id: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == brute


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_sets, hops=st.integers(1, 3))
def test_fuzz_bfs_vs_python(spark, edges, hops):
    """Frontier-join BFS == textbook Python BFS on random digraphs."""
    from collections import deque

    from buskafkasparkstreaming_spark.operators.graph import bfs_levels

    if not edges:
        return
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    seeds = sorted({e[0] for e in edges})[:2]
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if dist[u] >= hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    e_df = spark.createDataFrame(edges, "src long, dst long")
    s_df = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {r.id: r.hop for r in bfs_levels(e_df, s_df, max_hops=hops).collect()}
    assert got == dist


interval_specs = st.lists(
    st.tuples(
        st.integers(0, 2),        # key
        st.integers(0, 96),       # start hour
        st.integers(0, 30),       # duration hours
    ),
    min_size=0,
    max_size=8,
)
point_specs = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 130)),  # (key, hour)
    min_size=0,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ivs=interval_specs, pts=point_specs)
def test_fuzz_interval_join_vs_theta(spark, ivs, pts):
    """Bucketed point-in-interval join == the reference theta join for
    random keys/intervals/points (incl. bucket-boundary and overlapping
    intervals — a point may match several)."""
    import datetime

    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators.joins import (
        point_in_interval_join,
    )

    base = datetime.datetime(2024, 1, 1)
    h = lambda x: base + datetime.timedelta(hours=x)  # noqa: E731
    i_rows = [
        (i, k, h(s), h(s + d)) for i, (k, s, d) in enumerate(ivs)
    ]
    p_rows = [(j, k, h(t)) for j, (k, t) in enumerate(pts)]
    if not i_rows or not p_rows:
        return
    intervals = spark.createDataFrame(
        i_rows, "iv_id long, key long, s timestamp, e timestamp"
    )
    points = spark.createDataFrame(p_rows, "p_id long, key long, t timestamp")
    got = {
        (r.p_id, r.iv_id)
        for r in point_in_interval_join(
            points, intervals, "key", "t", "s", "e", bucket_seconds=86_400
        ).collect()
    }
    want = {
        (r.p_id, r.iv_id)
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.key") == F.col("i.key"))
            & (F.col("p.t") >= F.col("i.s"))
            & (F.col("p.t") <= F.col("i.e")),
        )
        .collect()
    }
    assert got == want
