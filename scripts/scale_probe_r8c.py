"""Round-8 THIRD-WAVE operator scale probe:

1. Sliding-cohort funnel at slide widths 1h / 2h / 3h (explode factors
   6 / 3 / 2) and at 1x / 10x events — the claim behind
   `q_funnel_sliding_windows` is that cost is the explode factor times
   the event scan (plus three (window, user) aggs), so halving the
   explode factor must show up ~linearly and 10x events must scale in
   the scan, never quadratically.
2. Exact two-sample KS at 1x / 10x rows with a 10x-wider DISTINCT value
   axis — `global_running_sum`'s running CDF must scale with the number
   of distinct values (range repartition + bounded collects), with no
   single-task sort to bend the curve.
3. temperature_mix at 1x / 10x docs — membership is row-local
   (md5-prefix vs a broadcast per-domain threshold), so 10x docs must
   scale as one scan; the rate computation stays domain-cardinality-
   sized.

Methodology of scale_probe.py: steady-state second run per shape.
Run SOLO: `python scripts/scale_probe_r8c.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.operators.sampling import temperature_mix
from buskafkasparkstreaming_spark.operators.windows_fn import global_running_sum
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


def sliding_funnel(ev, duration_h, slide_h):
    w = ev.select(
        F.window("ts", f"{duration_h} hours", f"{slide_h} hours")
        .getField("start")
        .alias("ws"),
        "user_id",
        "event_type",
        "ts",
    )
    tv = (
        w.filter(F.col("event_type") == "view")
        .groupBy("ws", "user_id")
        .agg(F.min("ts").alias("tv"))
    )
    tc = (
        w.filter(F.col("event_type") == "click")
        .join(tv, ["ws", "user_id"])
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("ws", "user_id")
        .agg(F.min("ts").alias("tc"))
    )
    tp = (
        w.filter(F.col("event_type") == "purchase")
        .join(tc, ["ws", "user_id"])
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("ws", "user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        tv.groupBy("ws").count()
        .join(tc.groupBy("ws").count().withColumnRenamed("count", "c2"), "ws", "left")
        .join(tp.groupBy("ws").count().withColumnRenamed("count", "c3"), "ws", "left")
    )


def main():
    spark = get_spark(app_name="scale-probe-r8c")
    spark.sparkContext.setLogLevel("ERROR")

    ev = read_table(spark, SF_DIR, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    ev.cache().count()
    ev10 = replicate(ev, COPIES, "event_id", 10_000_000).withColumn(
        "ts", F.col("ts") + (F.col("__copy") * F.lit(3600)).cast("int").cast("interval second")
    )
    ev10.cache().count()

    for slide in (1, 2, 3):
        timed(
            f"sliding funnel 6h/{slide}h (explode {6 // slide}x), 1x events",
            lambda s=slide: sliding_funnel(ev, 6, s).count(),
        )
    timed(
        "sliding funnel 6h/1h, 10x events",
        lambda: sliding_funnel(ev10, 6, 1).count(),
    )

    orders = read_table(spark, SF_DIR, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    o = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.year("o_orderdate") % 2 == 0, 1).otherwise(0).alias("g1"),
        F.when(F.year("o_orderdate") % 2 == 1, 1).otherwise(0).alias("g2"),
    )
    o.cache().count()
    # 10x rows AND a 10x-wider distinct axis (perturbed cents per copy)
    o10 = replicate(
        o.withColumn("oid", F.monotonically_increasing_id()), COPIES, "oid", 1 << 40
    ).withColumn("cents", F.col("cents") * 10 + F.col("__copy")).drop("oid")
    o10.cache().count()

    def ks(frame):
        per_value = frame.groupBy("cents").agg(
            F.sum("g1").cast("long").alias("d1"),
            F.sum("g2").cast("long").alias("d2"),
        )
        running = global_running_sum(per_value, [F.col("cents").asc()], ["d1", "d2"])
        return running.agg(F.max(F.abs(F.col("d1") - F.col("d2")))).count()

    timed("KS running CDF, 1x rows/axis", lambda: ks(o))
    timed("KS running CDF, 10x rows + 10x distinct axis", lambda: ks(o10))

    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    )
    docs.cache().count()
    docs10 = replicate(docs, COPIES, "doc_id", 1 << 40)
    docs10.cache().count()
    timed(
        "temperature_mix, 1x docs",
        lambda: temperature_mix(docs, "doc_id", "source", "n_chars").count(),
    )
    timed(
        "temperature_mix, 10x docs",
        lambda: temperature_mix(docs10, "doc_id", "source", "n_chars").count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
