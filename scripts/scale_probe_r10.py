"""Round-10 operator scale probes:

1. Skyline staircase (`skyline_2d`) at 1x / 10x parts — the claim is
   that the frontier work is DOMAIN-bounded (|distinct p_size| stays
   ~50 no matter how many rows exist), so cost is the scan + one
   partial agg and the 1x->10x curve must be ~linear. The contrast
   with the oracle's brute-force NOT EXISTS is a PLAN-SHAPE argument,
   not a wall-clock race: the brute plan is a BroadcastNestedLoopJoin
   whose broadcast side is the ENTIRE dataset (at 100 TB that is the
   job that cannot start), where the staircase broadcasts |distinct
   size| rows. Wall-clock alone understates this — the left-semi
   short-circuits on random data (most rows find a dominator fast),
   so the probe prints the broadcast-side cardinalities instead.
2. Attribution (`attribute_touches`) at 1x / 10x events under the two
   growth modes that matter at fleet scale:
   * user-stride replication (10x users, same history length) — the
     production shape; per-user windows stay constant, partitions
     multiply, cost must be ~linear;
   * same-user replication (same users, 10x history) — the skew
     shape; still linear work per partition (window + equi-join), but
     parallelism is bounded by the user count, so wall-clock grows
     ~linearly too on 32 cores with 150 users.

Methodology of scale_probe.py: steady-state second run per shape.
Run SOLO: `python scripts/scale_probe_r10.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.operators.windows_fn import (
    attribute_touches,
    skyline_2d,
)
from buskafkasparkstreaming_spark.sources.files import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("BSS_SCALE_COPIES", "10"))


def timed(label, fn, runs=2):
    t = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        t = time.perf_counter() - t0
    print(f"{label}: {t:.2f} s")
    return t


def replicate(df, copies, id_col, id_stride):
    return df.crossJoin(
        F.broadcast(
            df.sparkSession.range(copies).select(F.col("id").alias("__copy"))
        )
    ).withColumn(id_col, F.col(id_col) + F.col("__copy") * F.lit(id_stride))


def probe_skyline(spark):
    part = read_table(spark, SF_DIR, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
    )
    n1 = part.count()
    part10 = replicate(part, COPIES, "p_partkey", 100_000_000)
    t1 = timed(
        f"skyline staircase 1x ({n1:,} parts)",
        lambda: skyline_2d(part, "price_cents", "p_size").count(),
    )
    t10 = timed(
        f"skyline staircase {COPIES}x ({n1 * COPIES:,} parts)",
        lambda: skyline_2d(part10, "price_cents", "p_size").count(),
    )
    print(f"staircase {COPIES}x/1x wall ratio: {t10 / t1:.1f} (linear ~<{COPIES})")

    # the naive plan the staircase replaces: what must each plan
    # BROADCAST? (the 100 TB constraint — a broadcast side must fit in
    # every executor)
    from buskafkasparkstreaming_spark.plans import physical_plan

    a, b = part10.alias("a"), part10.alias("b")
    brute = a.join(
        b,
        (F.col("b.price_cents") <= F.col("a.price_cents"))
        & (F.col("b.p_size") >= F.col("a.p_size"))
        & (
            (F.col("b.price_cents") < F.col("a.price_cents"))
            | (F.col("b.p_size") > F.col("a.p_size"))
        ),
        "left_semi",
    )
    brute_plan = physical_plan(brute)
    assert "BroadcastNestedLoopJoin" in brute_plan, brute_plan
    n_sizes = part10.select("p_size").distinct().count()
    timed("brute-force BNL at 10x (short-circuiting semi)", lambda: brute.count())
    print(
        f"brute plan broadcasts the FULL table ({n1 * COPIES:,} rows) "
        f"into a nested loop; the staircase broadcasts {n_sizes} rows "
        f"(|distinct p_size|) — the former is the job that cannot start "
        f"at 100 TB"
    )


def probe_attribution(spark):
    WEEK = 7 * 24 * 3600 * 1000
    ev = read_table(spark, SF_DIR, "events")
    n1 = ev.count()

    def run(d):
        return attribute_touches(
            d, "user_id", "event_type", "ts", "event_id", "purchase", WEEK
        ).count()

    t1 = timed(f"attribution 1x ({n1:,} events)", lambda: run(ev))

    # production growth: more users, same history per user
    ev10_users = replicate(
        ev, COPIES, "event_id", 100_000_000
    ).withColumn(
        "user_id", F.col("user_id") + F.col("__copy") * F.lit(10_000_000)
    )
    t10u = timed(
        f"attribution {COPIES}x users", lambda: run(ev10_users)
    )
    print(f"user-stride {COPIES}x/1x wall ratio: {t10u / t1:.1f} (linear ~<{COPIES})")

    # skew growth: same users, 10x history each (timestamps offset per
    # copy so the windows see one long interleaved history)
    ev10_hist = replicate(ev, COPIES, "event_id", 100_000_000).withColumn(
        "ts",
        F.timestamp_millis(
            F.unix_millis(F.col("ts").cast("timestamp"))
            + F.col("__copy") * F.lit(40 * 24 * 3600 * 1000)
        ),
    )
    t10h = timed(
        f"attribution {COPIES}x history per user", lambda: run(ev10_hist)
    )
    print(
        f"same-user {COPIES}x/1x wall ratio: {t10h / t1:.1f} "
        f"(linear per partition; parallelism bounded by user count)"
    )


def main():
    spark = get_spark()
    print(f"probe at {SF_DIR}, copies={COPIES}")
    probe_skyline(spark)
    probe_attribution(spark)


if __name__ == "__main__":
    main()
