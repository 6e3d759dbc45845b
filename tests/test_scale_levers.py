"""Scale-lever tests: bucketed co-located joins (no Exchange) and salted
skew joins (same result as plain join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark import tables as T
from buskafkasparkstreaming_spark.operators.joins import salted_join
from buskafkasparkstreaming_spark.plans import physical_plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    T.write_bucketed(orders, "bss_orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    T.write_bucketed(lineitem, "bss_lineitem_b", ["o_orderkey"], 8, ["o_orderkey"])
    joined = T.cojoin_bucketed(spark, "bss_orders_b", "bss_lineitem_b", ["o_orderkey"])
    plan = physical_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan  # co-located: neither side shuffles
    # and it still answers correctly
    plain = orders.join(lineitem, "o_orderkey").count()
    assert joined.count() == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation_of = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    )
    plain = (
        orders.join(nation_of, "o_custkey")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, nation_of, "o_custkey", salt_buckets=4)
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    assert sorted((r["c_nationkey"], r["count"]) for r in plain) == sorted(
        (r["c_nationkey"], r["count"]) for r in salted
    )
