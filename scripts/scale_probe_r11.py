"""Round-11 operator scale probes:

1. Decile lift (`q_decile_lift` composition) at 1x / 10x customers —
   the ranking must ride global_ntile (range repartition + broadcast
   offsets), so the curve is scan + one per-customer hash agg + one
   range shuffle of the CUSTOMER-level frame: ~linear in customers;
   everything after the decile assignment is a constant 10-row frame.
2. Allen span join (`allen_join` over per-(user,type) spans) at 1x /
   10x users — one (user,type) hash agg + one keyed equi-join with
   <=2x2 per-key fanout: ~linear; no time cross-join exists anywhere
   in the plan at any scale.
3. Streaming skyline state boundedness — the 100 TB claim for
   `skyline_per_key` is not wall-clock, it is STATE SIZE: the frontier
   of n exchangeable random points has expected size O(log n), and
   dominated points can never rejoin, so per-key state stays tiny
   while input grows without bound. The probe drains 1x and 10x point
   streams and prints final frontier size vs points consumed per key.

Methodology of scale_probe.py: steady-state second run per shape.
Run SOLO: `python scripts/scale_probe_r11.py`.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.operators.joins import allen_join
from buskafkasparkstreaming_spark.operators.windows_fn import global_ntile
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


def decile_lift(orders):
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("spend_cents"),
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias(
            "resp"
        ),
    )
    ranked = global_ntile(
        per_cust,
        [F.col("spend_cents").desc(), F.col("custkey").asc()],
        10,
        "decile",
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("resp").alias("r")
    )


def probe_decile(spark):
    orders = read_table(spark, SF_DIR, "orders")
    n1 = orders.count()
    t1 = timed(
        f"decile lift 1x ({n1:,} orders)", lambda: decile_lift(orders).count()
    )
    o10 = replicate(
        orders, COPIES, "o_orderkey", 1_000_000_000
    ).withColumn(
        "o_custkey", F.col("o_custkey") + F.col("__copy") * F.lit(100_000_000)
    )
    t10 = timed(
        f"decile lift {COPIES}x customers ({n1 * COPIES:,} orders)",
        lambda: decile_lift(o10).count(),
    )
    print(f"decile {COPIES}x/1x wall ratio: {t10 / t1:.1f} (linear ~<{COPIES})")


def spans_join(events):
    base = events.filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
    )
    spans = base.groupBy("user_id", "event_type").agg(
        F.min(F.unix_millis(F.col("ts"))).alias("s"),
        F.max(F.unix_millis(F.col("ts"))).alias("e"),
    )
    left = spans.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
    )
    right = spans.filter(
        F.col("event_type").isin("purchase", "error")
    ).select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
    )
    return allen_join(left, right, "user_id")


def probe_allen(spark):
    ev = read_table(spark, SF_DIR, "events")
    n1 = ev.count()
    t1 = timed(
        f"allen spans 1x ({n1:,} events)", lambda: spans_join(ev).count()
    )
    ev10 = replicate(ev, COPIES, "event_id", 1_000_000_000).withColumn(
        "user_id", F.col("user_id") + F.col("__copy") * F.lit(10_000_000)
    )
    t10 = timed(
        f"allen spans {COPIES}x users", lambda: spans_join(ev10).count()
    )
    print(f"allen {COPIES}x/1x wall ratio: {t10 / t1:.1f} (linear ~<{COPIES})")


def probe_skyline_state(spark):
    from buskafkasparkstreaming_spark.streaming.state import skyline_per_key
    from buskafkasparkstreaming_spark.streaming.windows import run_to_memory

    ev = read_table(spark, SF_DIR, "events")

    def points(d):
        return d.filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("event_type").isNotNull()
        ).select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("x"),
            F.unix_millis(F.col("ts")).alias("y"),
        )

    ev10 = replicate(ev, COPIES, "event_id", 1_000_000_000).withColumn(
        "value", F.col("value") + F.col("__copy") * F.lit(0.07)
    )

    for label, d in (("1x", ev), (f"{COPIES}x", ev10)):
        with tempfile.TemporaryDirectory() as tmp:
            points(d).coalesce(4).write.parquet(f"{tmp}/pts")
            schema = spark.read.parquet(f"{tmp}/pts").schema
            stream = (
                spark.readStream.schema(schema)
                .format("parquet")
                .load(f"{tmp}/pts")
            )
            t0 = time.perf_counter()
            res = run_to_memory(
                skyline_per_key(stream, key_col="event_type"),
                spark,
                output_mode="update",
            )
            w = Window.partitionBy("event_type")
            final = (
                res.withColumn("__m", F.max("n_seen").over(w))
                .filter(F.col("n_seen") == F.col("__m"))
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("frontier_size"),
                    F.max("n_seen").alias("points_seen"),
                )
                .collect()
            )
            dt = time.perf_counter() - t0
            tot_pts = sum(r["points_seen"] for r in final)
            max_front = max(r["frontier_size"] for r in final)
            print(
                f"streaming skyline {label}: {dt:.2f} s drain, "
                f"{tot_pts:,} points consumed, max per-key frontier "
                f"= {max_front} rows (state stays ~log n)"
            )


def main():
    spark = get_spark(app_name="scale-probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    probe_decile(spark)
    probe_allen(spark)
    probe_skyline_state(spark)
    spark.stop()


if __name__ == "__main__":
    main()
