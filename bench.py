"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with a count() so the full plan executes; the timing
includes plan + execution but not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from buskafkasparkstreaming_spark import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_topk_orders_per_customer",
    "q_asof_purchase_before_error",
    "q_sessionize_events",
    "q_hourly_events",
    "cdc_latest_state",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality",
    "text_token_count",
    "q_median_price_by_priority",
    "streaming_tumbling_counts",
    # round-3 additions: training-pipeline ops added to the suite the
    # round they land, so regressions are visible from their first round
    "sample_stratified_lang",
    "text_pii_redact",
    "pack_token_budget",
    "corpus_curation",
    "ann_quantize_int8",
    # round-5 additions
    "streaming_enrich_static",
    "cdc_scd2_history",
    "dedup_chunk_boilerplate",
    "sketch_count_min",
    "export_shard_stats",
    "text_vocab_coverage",
    "text_bm25_search",
    "text_hybrid_search",
    "dedup_substring_spans",
    "sample_token_budget_mix",
    "dedup_semantic",
    "sample_prototype_prune",
    "pack_chunk_documents",
    "layout_zorder_events",
    "stats_profile_documents",
    "text_lm_score",
    "text_lm_bigram_score",
    "sample_curriculum_stages",
    "text_quality_classifier",
    "sample_leakage_safe_split",
    "graph_pagerank_neardup",
    # round-6 additions (own BASELINE.md budget family)
    "q_asof_next_purchase",
    "q_asof_nearest_purchase",
    "manifest_read_where",
    "text_gopher_rules",
    "text_c4_rules",
    "sketch_hll_distinct",
    "sketch_hll_incremental",
    "sample_weighted_priority",
    "sample_dsir_importance",
    "streaming_purchase_error_left_join",
    "q_corr_price_items",
    "q_gapfill_hourly",
    "q_locf_fill",
    "q_funnel_conversion",
    "q_cohort_retention",
    "sketch_quantile_histogram",
    # round-7 additions (own BASELINE.md budget family)
    "q_percentile_disc",
    "q_mode_deterministic",
    "q_not_in_null_aware",
    "q_window_ignore_nulls",
    "q_two_phase_skew_agg",
    "q_histogram_equi_width",
    "q_mad_outliers",
    "q_regr_slope_exact",
    "q_ewma_dyadic",
    "q_rfm_segments",
    "ts_sax_words",
    "text_bigram_pmi",
    # graph_bfs_reachability / graph_triangle_count / dedup_keep_best are
    # benched via bench_graph_family: one shared pair-table derivation
    # (its own timed row) so each row measures the operator, not the
    # ~1.6 s upstream n-gram join repeated three times
    "manifest_time_travel",
    "streaming_topk_per_window",
    "q6_forecast_revenue",
    "q18_large_orders",
    "q_variant_props",
    "streaming_hourly_daily_rollup",
    "cdc_diff_versions",
    "q_interval_contain_join",
    "ann_int8_rerank",
    "q_cusum_changepoint",
    "q_event_type_affinity",
    "q_unpivot_metrics",
    "q_percentile_bands",
    "ts_sax_blocking_pairs",
    "q_spearman_corr",
    "q_cube_grouping_id",
    "q_benford_digits",
    "q_weighted_median",
    "q_running_distinct_types",
    "streaming_purchase_error_full_join",
    "sketch_hll_intersection",
    "q_chi2_independence",
    "q_top_percent_orders",
    "q_scalar_subquery_select",
    # round-8 additions (own BASELINE.md budget family)
    "sketch_theta_intersection",
    "pack_ffd_bins",
    "streaming_session_topk",
    "q10_returned_revenue",
    "q14_promo_share",
    "q_longest_streak",
    "q7_nation_trade",
    "cdc_merge_into",
    "streaming_enrich_asof_static",
    "q_cheapest_supplier_per_part",
    "q4_late_ship_priority",
    "q_mom_growth",
    "q_event_transitions",
    "q_percentile_cont",
    "dedup_editdist_rerank",
    "q13_customer_distribution",
    "q21_sole_late_supplier",
    "q22_idle_rich_customers",
    "q_funnel_timeout",
    "sketch_hll_sparse",
    # ann_pq_adc_rerank / ann_ivfadc_topk are benched via bench_ann_family:
    # per-index build rows (ann_pq_build, ann_ivfadc_build) + query-only
    # rows, so per-query deltas reflect the query plan, not the
    # once-per-corpus training/encoding repeated inline (VERDICT r8 item 5,
    # the graph_pairs_derivation precedent)
    "streaming_funnel_timeout",
    # round-8 third wave: TPC-H shape closure + sliding-cohort funnel
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_late_ship_classes",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q19_or_predicate_revenue",
    "q20_promo_heavy_suppliers",
    "q_funnel_sliding_windows",
    "q_ks_two_sample",
    "q_psi_drift",
    "sample_temperature_mix",
    "q_ks_rolling_hourly",
    "sketch_tdigest_pinned",
    # round-8 session-4 additions
    "dedup_prefix_filter",
    "lake_bucketed_join",
    "cdc_purge_keys",
    "q_entropy_mi",
    "q_acf_hourly",
    "q_seasonal_anomaly",
    "text_rouge_overlap",
    "streaming_psi_drift",
    "q_ccf_types",
    "q_histogram_equi_depth",
    # round-8 session-5 additions
    "sample_reservoir_stratum",
    "sketch_kll_quantiles",
    "q_record_linkage_fs",
    "text_bpe_merges",
    "q_winsorized_stats",
    "text_ngram_novelty",
    "q_theilsen_hourly",
    "streaming_hll_hourly",
    "streaming_cusum_hourly",
    "q_gini_revenue",
    "q_herfindahl_segments",
    "text_zipf_slope",
    "q_bootstrap_ci_mean",
    "dedup_containment",
    "sketch_hll_rolling",
    "streaming_quantile_hourly",
    "q_fd_violations",
    "q_ref_integrity",
    "q_anova_f",
    "q_mannwhitney_u",
    "q_hellinger_types",
    "q_holt_dyadic",
    # round-9 additions (own BASELINE.md budget family);
    # dedup_weighted_minhash is benched via bench_weighted_minhash — the
    # PRODUCTION sketch path only, the dedup_minhash_lsh precedent (the
    # queries() entry additionally computes the exhaustive weighted-
    # Jaccard verification join, which is oracle-side work)
    "layout_hilbert_events",
    "q_ecdf_transform",
    "q_cramers_v",
    "sketch_ks_approx",
    "dedup_tfidf_cosine",
    "q_market_basket_lift",
    "q_twap_hourly",
    # round-10 additions (own BASELINE.md budget family)
    "q_skyline_parts",
    "q_attribution_credit",
    # round-11 additions (own BASELINE.md budget family); pack_ffd_bins
    # above now times the invariant-summary formulation (the FFD pack
    # itself plus two bounded aggregations)
    "q_decile_lift",
    "q_allen_spans",
    "q_allen_incidents",
    "streaming_skyline",
    "q_segment_lift",
    "streaming_allen_monitor",
    "q_skyline3_lineitems",
    "streaming_reservoir_sample",
    "streaming_pagerank_monitor",
    "text_unicode_clean",
    # round-12 head candidates (benched from day one, driver-verified
    # next round)
    "q_group_equidepth",
    "streaming_skyline3",
    "q_isotonic_calibration",
    # round-12 additions (own BASELINE.md budget family)
    "q_group_ks",
    "streaming_weighted_reservoir",
    "streaming_allen_sessions",
    "manifest_compaction_plan",
    # round-13 head candidates (benched from day one, driver-verified
    # next round)
    "manifest_compact_execute",
    "streaming_group_ks",
    "streaming_allen_live_spans",
    "q_group_ecdf",
    # round-13 additions (own BASELINE.md budget family)
    "sample_weighted_reservoir",
    "q_cohort_retention_daily",
    "q_group_mannwhitney",
    "streaming_cohort_retention",
    # round-14 head candidates (benched from day one, driver-verified
    # next round)
    "q_group_spearman_trend",
    # round-14 additions (the round-15 head candidates)
    "streaming_group_spearman",
    "streaming_group_mannwhitney",
    "manifest_compact_cluster",
    "manifest_bloom_lookup",
]


def bench_calibration(spark, timings: dict) -> None:
    """Fixed plan-trivial CPU row (VERDICT r10 item 4): a 50M-row
    whole-stage-codegen range sum — no IO, no Python boundary, no data
    dependence, one 32-slice scan + final agg. Its runtime tracks BOX
    state (CPU clock, GC/code-cache pressure, co-tenancy), not the
    engine, so cross-round per-query ratios can be divided by this
    row's ratio to separate box drift from plan regressions — rounds
    8-10 each claimed 'uniform box drift' without a way to prove it.
    Excluded from the suite total so the headline stays comparable with
    the pre-r11 roofs; compare it only against its own history in
    BASELINE.md."""
    t0 = time.perf_counter()
    spark.range(0, 50_000_000, 1, 32).selectExpr(
        "sum(id * 2 + 1) AS s"
    ).collect()
    timings["calibration_fixed"] = round(time.perf_counter() - t0, 3)


def bench_minhash_pipeline(spark, sf_dir: str, timings: dict) -> None:
    """Bench the PRODUCTION MinHash+LSH path only: signatures + banded
    candidate join. The `dedup_minhash_lsh` queries() entry additionally
    computes the exhaustive ngram-Jaccard verification join — that is
    oracle-side work (19 of the 19.07 s measured in r3 was mostly the exact
    join, VERDICT r4 §wrong 4) and belongs in the correctness gate, not the
    bench."""
    from buskafkasparkstreaming_spark.operators import dedup as D
    from buskafkasparkstreaming_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    sigs = D.minhash_signatures(docs, "doc_id", k=3, num_hashes=32)
    D.lsh_candidate_pairs(sigs, bands=8, rows_per_band=4).count()
    timings["dedup_minhash_lsh"] = round(time.perf_counter() - t0, 3)


def bench_incremental_lsh(spark, sf_dir: str, timings: dict) -> None:
    """Bench the PRODUCTION incremental path only: batch sketch + banded
    join against the corpus index. The `dedup_incremental_lsh` queries()
    entry additionally computes the exact crossing-pair verification join
    — oracle-side work that belongs in the correctness gate, not the
    bench (the dedup_minhash_lsh precedent, VERDICT r4 §wrong 4)."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators import dedup as D
    from buskafkasparkstreaming_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    t0 = time.perf_counter()
    D.lsh_candidate_pairs_incremental(
        D.minhash_signatures(batch, "doc_id", k=3, num_hashes=32),
        D.minhash_signatures(corpus, "doc_id", k=3, num_hashes=32),
    ).count()
    timings["dedup_incremental_lsh"] = round(time.perf_counter() - t0, 3)


def bench_ivf_split(spark, sf_dir: str, timings: dict) -> None:
    """IVF benched as its two real phases: index BUILD (train centroids +
    assign every corpus row to its bucket — amortized once per corpus) and
    QUERY (probed-bucket top-k against the prebuilt index; the corpus is
    never rescanned per query batch — VERDICT r2 §wrong 1)."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators import similarity as S
    from buskafkasparkstreaming_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    centroids = S.train_ivf_centroids(emb, "embedding", nlist=50)
    cent_rows = centroids.collect()
    cent = spark.createDataFrame(cent_rows, centroids.schema)
    index = S.build_ivf_index(emb, cent, "vec_id", "embedding").persist()
    index.count()  # materialize centroids + corpus assignment = build cost
    timings["ann_ivf_build"] = round(time.perf_counter() - t0, 3)

    qs = emb.filter(F.col("vec_id") < 10)
    t0 = time.perf_counter()
    S.ivf_query_topk(qs, index, cent, "vec_id", k=5, nprobe=2).count()
    timings["ann_ivf_query"] = round(time.perf_counter() - t0, 3)
    index.unpersist()



def bench_weighted_minhash(spark, sf_dir: str, timings: dict) -> None:
    """Bench the PRODUCTION weighted-MinHash path only: IDF-weighted
    shingles + replicated signatures + banded candidate join. The
    `dedup_weighted_minhash` queries() entry additionally computes the
    exhaustive weighted-Jaccard verification join — oracle-side work
    that belongs in the correctness gate, not the bench (the
    dedup_minhash_lsh precedent, VERDICT r4 §wrong 4)."""
    from buskafkasparkstreaming_spark.operators import dedup as D
    from buskafkasparkstreaming_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    wt = D.weighted_shingles(docs, "doc_id", k=3, max_df=1000)
    sigs = D.weighted_minhash_signatures(wt, num_hashes=32)
    D.lsh_candidate_pairs(sigs, bands=8, rows_per_band=4).count()
    timings["dedup_weighted_minhash"] = round(time.perf_counter() - t0, 3)


def bench_ann_family(spark, sf_dir: str, timings: dict) -> None:
    """The two PQ-family rows re-trained and re-encoded the corpus inline
    (5.8 s of the 6.0 s row was index build — amortized once per corpus in
    any real deployment). Build each index once per round as its own timed
    row, persist, and time the query-only entry against the prebuilt index
    (VERDICT r8 item 5; the graph_pairs_derivation precedent)."""
    from buskafkasparkstreaming_spark.operators import similarity as S
    from buskafkasparkstreaming_spark.sources.files import read_table

    emb = read_table(spark, sf_dir, "embeddings")

    t0 = time.perf_counter()
    books = S.train_pq_codebooks(emb, "embedding", dim=64, m=4, ksub=16)
    books = books.persist()
    codes = S.pq_encode(emb, books, "vec_id", "embedding", dim=64, m=4)
    codes = codes.persist()
    codes.count()
    timings["ann_pq_build"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    entrymod.ann_pq_adc_rerank(spark, sf_dir, index=(books, codes)).count()
    timings["ann_pq_adc_rerank"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cents = S.train_ivf_centroids(emb, "embedding", nlist=50).persist()
    icodes, ibooks = S.ivfadc_build(emb, cents, "vec_id", "embedding")
    icodes, ibooks = icodes.persist(), ibooks.persist()
    icodes.count()
    ibooks.count()
    timings["ann_ivfadc_build"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    entrymod.ann_ivfadc_topk(
        spark, sf_dir, index=(cents, icodes, ibooks)
    ).count()
    timings["ann_ivfadc_topk"] = round(time.perf_counter() - t0, 3)
    for df in (books, codes, cents, icodes, ibooks):
        df.unpersist()


def bench_graph_family(spark, sf_dir: str, timings: dict) -> None:
    """The three graph-family rows all consume the SAME near-dup pair
    table; a real pipeline materializes it once (exactly what
    localCheckpoint does *within* each queries() call). Derive it once
    per round (its own timed row, threshold 0.05 — the superset; the BFS
    / triangle entries' 0.3 table is a filter of it), persist, and time
    each operator on the materialized pairs so per-query deltas reflect
    the operator (VERDICT r7 §wrong 3)."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.operators import dedup as D
    from buskafkasparkstreaming_spark.sources.files import read_table

    docs = read_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.05).persist()
    pairs.count()
    timings["graph_pairs_derivation"] = round(time.perf_counter() - t0, 3)

    graph_pairs = pairs.filter(F.col("jaccard") >= 0.3)
    for name, prebuilt in (
        ("graph_bfs_reachability", graph_pairs),
        ("graph_triangle_count", graph_pairs),
        ("graph_pagerank_weighted", graph_pairs),
        ("dedup_keep_best", pairs),
        ("graph_kcore", pairs),
    ):
        fn = getattr(entrymod, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir, pairs=prebuilt).count()
        timings[name] = round(time.perf_counter() - t0, 3)
    pairs.unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bss-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Measurement protocol: THREE timed rounds per query, reporting the
    # MINIMUM. Round 1 doubles as the warm-up — it pays whole-stage-codegen
    # compile (measured up to ~9 s for the widest aggregate pipelines) and
    # AQE strategy choice at the target SF, so it is never the minimum and
    # min-of-3 discards it. C2 JIT keeps improving over the first few
    # executions (dedup_simhash: 3.5 → 2.9 → 2.1 → 1.8 s in isolation),
    # and an 80-plan session adds GC/code-cache jitter on top — the r3→r4
    # 'regression' on dedup_simhash was exactly this warm-up noise, not
    # the operator. The minimum is the standard noise-robust steady-state
    # statistic; rounds are interleaved across queries so session-level
    # noise lands on every query equally. Compile is a one-time cost
    # amortized over a production session.
    timings: dict[str, float] = {}
    for _ in range(3):
        round_t: dict[str, float] = {}
        bench_calibration(spark, round_t)
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            round_t[name] = round(time.perf_counter() - t0, 3)
        bench_minhash_pipeline(spark, sf_dir, round_t)
        bench_incremental_lsh(spark, sf_dir, round_t)
        bench_weighted_minhash(spark, sf_dir, round_t)
        bench_ivf_split(spark, sf_dir, round_t)
        bench_ann_family(spark, sf_dir, round_t)
        bench_graph_family(spark, sf_dir, round_t)
        for name, t in round_t.items():
            timings[name] = min(timings.get(name, float("inf")), t)

    # calibration_fixed measures the box, not the engine — reported per
    # query for drift normalization but excluded from the headline total
    total = round(
        sum(t for n, t in timings.items() if n != "calibration_fixed"), 3
    )
    payload = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    print(payload)
    # ALSO persist the full per-query map next to bench.py (VERDICT r13
    # item 5): the driver's stdout capture truncates the tail (68 of 211
    # rows survived into BENCH_r13.json), which loses cross-round
    # per-query history — the on-disk copy keeps every row. Override the
    # filename with SPARK_GRAFT_BENCH_OUT (e.g. BENCH_LOCAL_r14.json).
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", out), "w") as fh:
            fh.write(payload + "\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench
    spark.stop()


if __name__ == "__main__":
    main()
