"""Round-15 scaling probe (VERDICT r14 item 6): the sf0.1 suite is
overhead-bound — every 8-vs-32-core ratio sits at ≈1 and the 100 TB
story rests on plan shapes alone. This probe builds a 10x dataset
("sf1", ~170 MB parquet) by replicating sf0.1 with key-shifted ids
(documents get per-replica word suffixes so the near-dup pair structure
stays LINEAR — naive replication would pair every replica cluster
quadratically; embeddings get per-replica scaling so vector geometry
stays non-degenerate), then times the heaviest bench rows at
SPARK_GRAFT_CPUS=32 vs 8 in separate processes (min of 2 reps after a
warm-up rep, same protocol as bench.py's min-of-3 minus one rep for
wall-time budget).

Usage:
  python scripts/scale_probe_r15.py gen          # build /tmp/bss_sf1
  SPARK_GRAFT_CPUS=32 python scripts/scale_probe_r15.py run out32.json
  SPARK_GRAFT_CPUS=8  python scripts/scale_probe_r15.py run out8.json
  python scripts/scale_probe_r15.py report out32.json out8.json \
      > SCALING_r15.json
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG_DIR = os.environ.get("BSS_SCALE_DIR", "/tmp/bss_sf1")
REPLICAS = 10

QUERIES = [
    "text_ngram_novelty",
    "dedup_prefix_filter",
    "dedup_semantic",
    "q_spearman_corr",
    "q_group_ks",
    "q_rfm_segments",
    "streaming_group_spearman",
    "streaming_funnel_timeout",
    "manifest_compact_execute",
    "manifest_compact_cluster",
    "manifest_bloom_lookup",
    "ann_ivfadc_topk",
]


def _one_file(spark, df, path: str) -> None:
    """Write df as a SINGLE parquet file at `path` (the sf-dir layout
    read_table and the file-stream source expect)."""
    tmp = path + ".dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    if os.path.exists(path):
        os.remove(path)
    os.rename(part, path)
    shutil.rmtree(tmp, ignore_errors=True)


def gen() -> None:
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark import get_spark
    from buskafkasparkstreaming_spark.sources.files import read_table

    spark = get_spark(app_name="r15-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    src = "/root/testdata/sf0.1"
    os.makedirs(BIG_DIR, exist_ok=True)

    def reps(df, build):
        out = None
        for i in range(REPLICAS):
            part = build(df, i)
            out = part if out is None else out.unionByName(part)
        return out

    ev = read_table(spark, src, "events")
    _one_file(
        spark,
        reps(
            ev,
            lambda d, i: d.select(
                (F.col("event_id") + i * 10**9).alias("event_id"),
                (F.col("user_id") + i * 10**6).alias("user_id"),
                "event_type",
                "value",
                "ts",
            ),
        ),
        os.path.join(BIG_DIR, "events.parquet"),
    )
    docs = spark.read.parquet(f"{src}/documents.parquet")
    _one_file(
        spark,
        reps(
            docs,
            lambda d, i: d.select(
                (F.col("doc_id") + i * 10**7).alias("doc_id"),
                *[c for c in d.columns if c not in ("doc_id", "text")],
                # per-replica word suffix: replica shingle sets are
                # disjoint across replicas, so near-dup pairs stay
                # linear in the replica count
                F.regexp_replace(
                    "text", r"(\S+)", r"$1~" + str(i)
                ).alias("text"),
            ),
        ),
        os.path.join(BIG_DIR, "documents.parquet"),
    )
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    _one_file(
        spark,
        reps(
            emb,
            lambda d, i: d.select(
                (F.col("vec_id") + i * 10**6).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x * (1.0 + F.lit(float(i)) * 0.01),
                ).alias("embedding"),
                *[c for c in d.columns if c not in ("vec_id", "embedding")],
            ),
        ),
        os.path.join(BIG_DIR, "embeddings.parquet"),
    )
    orders = spark.read.parquet(f"{src}/orders.parquet")
    _one_file(
        spark,
        reps(
            orders,
            lambda d, i: d.select(
                (F.col("o_orderkey") + i * 10**8).alias("o_orderkey"),
                (F.col("o_custkey") + i * 10**6).alias("o_custkey"),
                *[
                    c
                    for c in d.columns
                    if c not in ("o_orderkey", "o_custkey")
                ],
            ),
        ),
        os.path.join(BIG_DIR, "orders.parquet"),
    )
    for t in ("lineitem", "customer", "part", "supplier", "nation", "region"):
        shutil.copyfile(
            f"{src}/{t}.parquet", os.path.join(BIG_DIR, f"{t}.parquet")
        )
    print("generated", BIG_DIR)
    spark.stop()


def run(out_path: str) -> None:
    import __spark_entry__ as entrymod
    from buskafkasparkstreaming_spark import get_spark

    spark = get_spark(app_name="r15-scale-run")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    res: dict[str, float] = {}
    for name in QUERIES:
        fn = qs[name]
        best = float("inf")
        for rep in range(3):  # rep 0 = warm-up (codegen/JIT), min of 2
            t0 = time.perf_counter()
            fn(spark, BIG_DIR).count()
            dt = time.perf_counter() - t0
            if rep > 0:
                best = min(best, dt)
            print(f"{name} rep{rep} {dt:.2f}s", flush=True)
        res[name] = round(best, 3)
    with open(out_path, "w") as fh:
        json.dump(
            {"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "queries": res}, fh
        )
    spark.stop()


def report(p32: str, p8: str) -> None:
    a, b = json.load(open(p32)), json.load(open(p8))
    out = {
        "sf": "sf0.1 x 10 replicas (/tmp/bss_sf1)",
        "cpus_main": 32,
        "cpus_low": 8,
        "per_query": {
            n: {
                "c32_sec": a["queries"][n],
                "c8_sec": b["queries"][n],
                "ratio_c8_over_c32": round(
                    b["queries"][n] / a["queries"][n], 2
                ),
            }
            for n in a["queries"]
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "gen":
        gen()
    elif cmd == "run":
        run(sys.argv[2])
    else:
        report(sys.argv[2], sys.argv[3])
