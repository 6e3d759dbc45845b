"""Round-8 SECOND-WAVE operator scale probe:

1. PQ-ADC scan vs brute-force cosine at 1x / 10x corpus — the claim
   behind `pq_adc_rerank_topk` is that the ADC stage scans a
   64x-compressed code table with m LUT lookups per vector, so the
   scan-cost gap vs the float cosine crossJoin must WIDEN with corpus
   size. The probe times only the scan+shortlist stage (no rerank) and
   the equivalent brute-force scoring at both scales.
2. funnel_timeout_per_user at 1x / 10x events — state is capped at
   3x64 longs per live user, so a 10x event replay must scale in the
   SCAN, not the state: the probe records drain wall time and the
   per-user kept-set bound on the 10x drain.
3. hll_adaptive_stats at 1x / 10x members — both representations are
   fixed-size per group; 10x rows must not change the output row count
   or the state shape, only the scan time.

Methodology of scale_probe.py: steady-state second run per shape.
Run SOLO: `python scripts/scale_probe_r8b.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.operators.similarity import (
    cosine_topk,
    pq_adc_rerank_topk,
    pq_encode,
    train_pq_codebooks,
)
from buskafkasparkstreaming_spark.operators.stats import hll_adaptive_stats
from buskafkasparkstreaming_spark.sources.files import read_table
from buskafkasparkstreaming_spark.streaming.state import funnel_timeout_per_user

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("BSS_SCALE_COPIES", "10"))


def timed(label, fn, runs=2):
    """Steady-state second run (first pays codegen/JIT)."""
    t = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        t = time.perf_counter() - t0
    print(f"{label}: {t:.2f} s")
    return t


def replicate_emb(emb, copies):
    return emb.crossJoin(
        F.broadcast(
            emb.sparkSession.range(copies).select(F.col("id").alias("__copy"))
        )
    ).select(
        (F.col("vec_id") * copies + F.col("__copy")).alias("vec_id"),
        "embedding",
    )


def probe_pq(spark):
    emb1 = read_table(spark, SF_DIR, "embeddings")
    for copies, tag in ((1, "1x"), (COPIES, f"{COPIES}x")):
        emb = replicate_emb(emb1, copies).localCheckpoint() if copies > 1 else emb1
        books = train_pq_codebooks(emb, "embedding", dim=64, m=4, ksub=16)
        books = books.localCheckpoint()
        codes = pq_encode(emb, books, "vec_id", "embedding", dim=64, m=4)
        codes = codes.localCheckpoint()  # encode is the once-per-corpus cost
        queries = emb1.filter(F.col("vec_id") < 10)
        timed(
            f"pq adc scan+rerank {tag}",
            lambda: pq_adc_rerank_topk(
                queries, codes, emb, books, "vec_id", "vec_id", k=5, shortlist=50
            ).count(),
        )
        timed(
            f"brute cosine {tag}",
            lambda: cosine_topk(queries, emb, "vec_id", "vec_id", k=5).count(),
        )


def probe_funnel(spark, tmp="/tmp/bss_scale_funnel"):
    import shutil

    ev1 = read_table(spark, SF_DIR, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isin("view", "click", "purchase")
    )
    from buskafkasparkstreaming_spark.functions import ts_millis
    from buskafkasparkstreaming_spark.streaming.windows import run_to_memory

    for copies, tag in ((1, "1x"), (COPIES, f"{COPIES}x")):
        d = f"{tmp}_{os.getpid()}_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        ev = ev1
        if copies > 1:
            # replicate EVENTS (not users): same keys, 10x rows per key —
            # the state-pressure direction
            ev = ev1.crossJoin(
                F.broadcast(
                    spark.range(copies).select(F.col("id").alias("__copy"))
                )
            ).select(
                "user_id",
                "event_type",
                (F.col("ts") + F.make_interval(secs=F.col("__copy"))).alias("ts"),
            )
        feed = ev.select(
            "user_id", "event_type", ts_millis("ts").alias("ms"), "ts"
        )
        feed.coalesce(1).write.mode("overwrite").parquet(d)
        schema = spark.read.parquet(d).schema
        stream = spark.readStream.schema(schema).format("parquet").load(d)

        def drain():
            res = run_to_memory(
                funnel_timeout_per_user(stream), spark, output_mode="update"
            )
            return res.count()

        timed(f"funnel drain {tag}", drain, runs=1)
        shutil.rmtree(d, ignore_errors=True)


def probe_hll_adaptive(spark):
    cust = read_table(spark, SF_DIR, "customer")
    for copies, tag in ((1, "1x"), (COPIES, f"{COPIES}x")):
        c = cust
        if copies > 1:
            c = cust.crossJoin(
                F.broadcast(
                    spark.range(copies).select(F.col("id").alias("__copy"))
                )
            ).select("c_nationkey", "c_custkey")  # duplicate members 10x
        timed(
            f"hll_adaptive {tag}",
            lambda: hll_adaptive_stats(
                c, "c_custkey", ["c_nationkey"], sparse_cap=32
            ).count(),
        )


def probe_ann_crossover(spark, copies=100, nq=50):
    """The scan-tier claim needs scale to show: at 2k-20k vectors the
    fixed plan overhead (LUT join + windows) exceeds the whole brute
    crossJoin. This probe replicates to copies x 2k vectors and uses
    `nq` queries so the scan term dominates — the regime the tiers are
    built for."""
    from buskafkasparkstreaming_spark.operators.similarity import (
        ivfadc_build,
        ivfadc_topk,
        train_ivf_centroids,
    )

    emb1 = read_table(spark, SF_DIR, "embeddings")
    emb = replicate_emb(emb1, copies).localCheckpoint()
    queries = emb1.filter(F.col("vec_id") < nq)
    books = train_pq_codebooks(emb, "embedding", dim=64, m=4, ksub=16)
    books = books.localCheckpoint()
    codes = pq_encode(emb, books, "vec_id", "embedding", dim=64, m=4)
    codes = codes.localCheckpoint()
    tag = f"{copies}x/{nq}q"
    timed(
        f"pq adc scan+rerank {tag}",
        lambda: pq_adc_rerank_topk(
            queries, codes, emb, books, "vec_id", "vec_id", k=5, shortlist=50
        ).count(),
    )
    timed(
        f"brute cosine {tag}",
        lambda: cosine_topk(queries, emb, "vec_id", "vec_id", k=5).count(),
    )
    cents = train_ivf_centroids(emb, "embedding", nlist=50).localCheckpoint()
    icodes, ibooks = ivfadc_build(emb, cents, "vec_id", "embedding")
    icodes = icodes.localCheckpoint()
    ibooks = ibooks.localCheckpoint()
    timed(
        f"ivfadc query {tag}",
        lambda: ivfadc_topk(
            queries, icodes, cents, ibooks, emb, "vec_id", "vec_id",
            k=5, nprobe=4, shortlist=50,
        ).count(),
    )


def main():
    spark = get_spark(app_name="scale-probe-r8b")
    spark.sparkContext.setLogLevel("ERROR")
    probe_pq(spark)
    probe_ann_crossover(spark)
    probe_funnel(spark)
    probe_hll_adaptive(spark)
    spark.stop()


if __name__ == "__main__":
    main()
