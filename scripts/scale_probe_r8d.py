"""Round-8 session-4 operator scale probes:

1. PPJoin prefix filter (`prefix_filter_jaccard_pairs`) vs the full
   inverted index at 1x / 10x docs — the claim is that candidate-join
   fan-out collapses to the RAREST tokens' postings (prefix tokens sort
   df-ascending), so the prefix candidate count must sit far below the
   full-index postings join and the 10x curve must not bend
   quadratically. 10x replication copies every doc, so every 1x pair
   becomes a copy-clique — the harsh variant the graph probes use.
2. Bucketed join amortization (`tables.write_bucketed`): one bucketed
   write (the paid-once shuffle) vs repeated joins — per-join cost on
   bucketed tables must undercut the plain shuffle SMJ, with broadcast
   disabled so both sides take the big-big path the layout exists for.
3. purge_keys partition scoping: purging keys confined to ONE partition
   of a 16-partition table must rewrite exactly that partition (plus
   commit overhead), not the table — measured directly by parquet-file
   mtimes and by wall-clock vs a full-table rebuild.

Methodology of scale_probe.py: steady-state second run per shape.
Run SOLO: `python scripts/scale_probe_r8d.py`.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.cdc.upsert import UpsertTable
from buskafkasparkstreaming_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
    word_shingles,
)
from buskafkasparkstreaming_spark.sources.files import read_table
from buskafkasparkstreaming_spark.tables import write_bucketed

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


def probe_prefix_filter(spark):
    docs = read_table(spark, SF_DIR, "documents")
    docs10 = replicate(docs, COPIES, "doc_id", 10_000_000)

    # candidate fan-out: prefix postings join vs full inverted index
    def fanout(d):
        sh = d.select(
            F.col("doc_id").alias("doc"),
            F.explode(word_shingles("text", 3)).alias("s"),
        )
        full = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * F.col("df")).alias("fanout"))
            .collect()[0]["fanout"]
        )
        return full

    print(f"full-index postings fanout 1x:  {fanout(docs):,}")
    pairs_1x = prefix_filter_jaccard_pairs(docs, "doc_id", threshold=0.5)
    timed("ppjoin 1x docs", lambda: pairs_1x.count())
    n1 = pairs_1x.count()
    pairs_10x = prefix_filter_jaccard_pairs(docs10, "doc_id", threshold=0.5)
    timed("ppjoin 10x docs (copy-cliques)", lambda: pairs_10x.count())
    n10 = pairs_10x.count()
    print(f"pairs 1x: {n1:,}   pairs 10x: {n10:,} (copy-clique growth)")


def probe_bucketed_amortization(spark):
    orders = read_table(spark, SF_DIR, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    cust = read_table(spark, SF_DIR, "customer")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    base = tempfile.mkdtemp(prefix=f"bss_probe_bkt_{os.getpid()}_")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        timed(
            "plain shuffle SMJ join",
            lambda: orders.join(
                cust, orders["o_custkey"] == cust["c_custkey"]
            ).count(),
        )
        t0 = time.perf_counter()
        write_bucketed(
            orders, "bss_probe_o", ["o_custkey"], 8, ["o_custkey"],
            path=os.path.join(base, "o"),
        )
        write_bucketed(
            cust, "bss_probe_c", ["c_custkey"], 8, ["c_custkey"],
            path=os.path.join(base, "c"),
        )
        print(f"bucketed writes (paid once): {time.perf_counter() - t0:.2f} s")
        j = spark.table("bss_probe_o").join(
            spark.table("bss_probe_c"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        timed("bucketed SMJ join (no Exchange)", lambda: j.count(), runs=3)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bss_probe_o")
        spark.sql("DROP TABLE IF EXISTS bss_probe_c")
        shutil.rmtree(base, ignore_errors=True)


def probe_purge_scoping(spark):
    ev = read_table(spark, SF_DIR, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id", "event_id", "ts", "value",
        (F.col("user_id") % 16).cast("int").alias("shard"),
    )

    def build(path):
        t = UpsertTable(
            spark, path, key_cols="user_id", precombine_col="ts",
            partition_col="shard", tiebreak_cols=["event_id"],
        )
        t.merge(ev)
        return t

    base = tempfile.mkdtemp(prefix=f"bss_probe_purge_{os.getpid()}_")
    t0 = time.perf_counter()
    t = build(os.path.join(base, "tbl"))
    print(f"full-table build (16 partitions): {time.perf_counter() - t0:.2f} s")
    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(t.path, "shard=*", "*.parquet"))
    }
    purge = ev.filter(F.col("shard") == 3).select("user_id").distinct()
    t0 = time.perf_counter()
    n = t.purge_keys(purge)
    print(f"purge one shard's keys: {time.perf_counter() - t0:.2f} s ({n} rows)")
    rewritten = {
        os.path.basename(os.path.dirname(f))
        for f in glob.glob(os.path.join(t.path, "shard=*", "*.parquet"))
        if f not in mtimes or os.path.getmtime(f) != mtimes[f]
    }
    print(
        f"partitions rewritten: {sorted(rewritten) or 'none'}; "
        f"shard=3 dir removed: {not os.path.exists(os.path.join(t.path, 'shard=3'))} "
        "(purging every key of one shard empties it; all other partitions untouched)"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    spark = get_spark(app_name="scale-probe-r8d")
    spark.sparkContext.setLogLevel("ERROR")
    probe_prefix_filter(spark)
    probe_bucketed_amortization(spark)
    probe_purge_scoping(spark)
    spark.stop()
