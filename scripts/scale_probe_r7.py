"""Round-7 operator scale probe: 10× replication ratios for the graph,
PMI, SAX, and interval-join operators (methodology of scale_probe.py —
steady-state second run, AQE-compiled per shape). Prints a markdown row
per op; results are folded into SCALE.md by hand.

Run SOLO (no concurrent Spark): `python scripts/scale_probe_r7.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.operators.dedup import ngram_jaccard_pairs
from buskafkasparkstreaming_spark.operators.graph import bfs_levels, triangle_counts
from buskafkasparkstreaming_spark.operators.joins import point_in_interval_join
from buskafkasparkstreaming_spark.operators.text import bigram_pmi
from buskafkasparkstreaming_spark.operators.timeseries import sax_words
from buskafkasparkstreaming_spark.operators.windows_fn import sessionize
from buskafkasparkstreaming_spark.sources.files import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("BSS_SCALE_COPIES", "10"))


def replicate(df, id_col, copies):
    c = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__c")
    return (
        df.select("*", c)
        .withColumn(id_col, F.col(id_col) * copies + F.col("__c"))
        .drop("__c")
    )


def timed(label, fn):
    fn()
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {n} rows in {dt:.2f}s (steady)", flush=True)
    return dt


def graph_edges(docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.3)
    return pairs.select("id_a", "id_b")


def main() -> None:
    spark = get_spark(app_name="bss-scale-probe-r7")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = read_table(spark, SF_DIR, "documents")
    ev1 = read_table(spark, SF_DIR, "events")
    docs10 = replicate(docs1, "doc_id", COPIES).persist()
    ev10 = replicate(ev1, "event_id", COPIES).persist()
    docs10.count(), ev10.count()

    # materialize edge lists ONCE so the probe measures the graph ops,
    # not the pair derivation (the entries' localCheckpoint already
    # amortizes it there)
    e1 = graph_edges(docs1).persist()
    e10 = graph_edges(docs10).persist()
    print(f"edges 1x={e1.count()} 10x={e10.count()}", flush=True)

    def bfs(edges, docs):
        und = edges.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionByName(
            edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        seeds = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
        return bfs_levels(und, seeds, max_hops=3).count()

    ratios = {}
    for name, f1, f10 in (
        ("triangles", lambda: triangle_counts(e1).count(), lambda: triangle_counts(e10).count()),
        ("bfs", lambda: bfs(e1, docs1), lambda: bfs(e10, docs10)),
        ("pmi", lambda: bigram_pmi(docs1, "doc_id").count(), lambda: bigram_pmi(docs10, "doc_id").count()),
        (
            "sax",
            lambda: sax_words(
                ev1.withColumn("c", F.round(F.col("value") * 100).cast("long")),
                "user_id", "ts", "c", tiebreak_col="event_id",
            ).count(),
            lambda: sax_words(
                ev10.withColumn("c", F.round(F.col("value") * 100).cast("long")),
                # replicated ids keep user series distinct via event_id join key
                "user_id", "ts", "c", tiebreak_col="event_id",
            ).count(),
        ),
    ):
        t1 = timed(f"{name} 1x", f1)
        t10 = timed(f"{name} 10x", f10)
        ratios[name] = t10 / t1

    def interval(ev):
        sess = (
            sessionize(ev, "user_id", "ts", gap_seconds=6 * 3600)
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        )
        pts = ev.filter(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        )
        return point_in_interval_join(pts, sess, "user_id", "ts", "s", "e").count()

    t1 = timed("interval_join 1x", lambda: interval(ev1))
    t10 = timed("interval_join 10x", lambda: interval(ev10))
    ratios["interval_join"] = t10 / t1

    print("| op | ratio at 10x |")
    for k, v in ratios.items():
        print(f"| {k} | {v:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
