"""Regenerate EXPLAIN.md: formatted physical plans for the queries whose
plan shape IS the scale story. Run: python scripts/gen_explain.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as mod
from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.plans import explain_str

SHOWN = {
    "q3_shipping_priority": "dims broadcast, filters pushed to every scan, one agg shuffle",
    "q_asof_purchase_before_error": "as-of join = union + window: ONE hash exchange, no range probe",
    "dedup_ngram_jaccard": "inverted-index equi-join on hashed shingles (no cartesian), df-capped via anti-join",
    "ann_cosine_topk": "queries broadcast; corpus never shuffles for scoring",
    "q1_pricing_summary": "partial+final hash agg, date filter pushed to parquet",
    "dedup_simhash": "single-pass sketch: one explode + 64 partial-aggregable bit sums, pigeonhole chunk equi-join (exchange reused across the self-join)",
    "corpus_curation": "quality/lang/fingerprint as column exprs, ONE dedup aggregation, split as a row-local hash — the whole nightly pipeline in one plan",
    "pack_token_budget": "token-budget packing: one window cumsum partitioned by pack group — parallel, no global sort",
    "dedup_substring_spans": "substring dedup by COUNTING, not pairing: windowed md5 fingerprints -> distinct-doc agg -> join back -> per-doc overlap-merge window; no suffix array, no quadratic expansion",
    "sample_token_budget_mix": "per-source token quota: ONE hash exchange on the source + running-sum window (domain_cap's shape in token units)",
    "dedup_chunk_boilerplate": "CCNet chunk removal: row-local chunking (transform over sequence), ONE chunk-keyed distinct-doc agg, broadcast boiler set back, ONE per-doc ordered-reassembly shuffle — the corpus is never paired with itself",
    "export_shard_stats": "deterministic shard assignment is a pure Project (no Exchange before the rollup); md5-mod is stable under retries and repartitioning",
    "text_bm25_search": "BM25: token stream filtered to query terms BEFORE any aggregation — tf/df shuffles carry only matching occurrences; 1-row corpus stats broadcast; fixed-point per-term floor then integer sum",
    "text_vocab_coverage": "top-V vocab via TakeOrdered over the distinct-word frame (vocab-sized, never data-sized), broadcast back against the token stream",
    "sketch_count_min": "CMS build: posexplode to d rows/occurrence, partial-agg into the fixed d x w grid; probe joins the broadcast grid",
    "cdc_scd2_history": "SCD2 intervals: ONE lead window per key over the change log — no self-join",
    "text_hybrid_search": "RRF fusion: two independent rankings full-outer joined on id; global row_number windows are single-partition by nature (top-k scoring), bounded by ranked-set size",
    "graph_pagerank_neardup": "power iteration as joins: per round ONE edge-rank join + ONE dst-keyed partial agg + ONE node re-join; integer fixed-point keeps ranks bit-exact under any partitioning",
    "q_asof_nearest_purchase": "nearest as-of: ONE hash exchange on the key; the forward pass is a second sort over the same partitioning, never a second shuffle",
    "sketch_hll_distinct": "HLL build: row-local bucket/rank from md5, groupBy(max) partial-aggregates into <= 256 registers per group; fixed-point harmonic sum is a register-sized agg",
    "text_gopher_rules": "Gopher rules: ZERO exchanges — every signal a higher-order fold over the doc's own word array, one codegen stage over the scan",
    "sample_weighted_priority": "A-ES weighted sample: row-local priority + TakeOrderedAndProject top-k; no full sort materialization",
    "text_bigram_pmi": "PMI collocations: row-local adjacent zip (no self-join), token-keyed count aggs, 1-row totals broadcast, TakeOrdered top-k (never a global sort)",
    "graph_triangle_count": "degree-oriented triangles: wedge + closure as hash equi-joins rooted at the LOW-degree corner — O(m^1.5) work, no hub blow-up",
    "ts_sax_words": "SAX words: one ordering window + segment/moment aggs all keyed on the series id; z-symbols from exact integer moments in one codegen stage",
    "q_two_phase_skew_agg": "salted two-phase agg: hot keys spread over 16 reducers in the partial exchange, 16-row final merge",
    "q_histogram_equi_width": "equi-width histogram: 1-row min/max broadcast, integer bin math row-local, one bin-keyed agg",
    "q_interval_contain_join": "point-in-interval containment as (key, epoch-bucket) hash equi-joins + exact filter — no nested-loop BETWEEN",
    "ann_int8_rerank": "two-stage ANN: int8 integer-dot prefilter (queries broadcast) -> exact cosine on 20 survivors/query",
    "q_rfm_segments": "distributed exact ntile x3: range repartition + parallel local ranks + broadcast prefix offsets — no single-task sort (the plan prints post-checkpoint; the range exchange is gated in test_plans.py)",
    "q_cheapest_supplier_per_part": "correlated argmin decorrelated: per-(part,supplier) agg then per-part window — two key shuffles, no subquery re-scan",
    "q7_nation_trade": "two-arm star join: all four dimension joins broadcast; the only exchange is the final (nation, nation) agg",
    "q_event_transitions": "Markov transitions: ONE key shuffle for the lead window; counts/totals are type-cardinality-sized; totals broadcast back",
    "dedup_editdist_rerank": "two-stage fuzzy match: n-gram blocked candidates, Levenshtein only on pairs (100-char prefixes) — never all-pairs",
    "q_longest_streak": "gaps-and-islands: two windows over ONE user-key exchange (island id + run argmax), no self-join",
    "q13_customer_distribution": "Q13 shape: the heavy per-customer count reuses the left-join exchange; second agg is count-of-counts-sized",
    "q21_sole_late_supplier": "Q21 shape: order-level n_supp/n_late agg + distinct late pairs — two orderkey shuffles replacing the double correlated EXISTS self-join",
    "q22_idle_rich_customers": "Q22 shape: 1-row threshold broadcast (exact integer cross-multiply), buyer anti-join, broadcast nation rollup",
    "q_funnel_timeout": "timed funnel: three conditional min-aggs on the user key; the timeout is a pushed join predicate, no pattern engine",
    "sketch_hll_sparse": "HLL++ adaptive: bounded sparse top-(cap+1) window + fixed register agg, both partial-aggregating on the group key",
    "ann_pq_adc_rerank": "PQ-ADC: LUT side broadcast, code table scored row-locally (higher-order fns), shortlist window, rerank join",
    "ann_ivfadc_topk": "IVFADC: probe table (LUT + bucket constant) broadcast into a bucket equi-join — codes pruned to nprobe/nlist before any scoring",
    "q8_market_share": "Q8 shape: five dimension arms all broadcast into the lineitem->orders join; one orderkey exchange + tiny per-year agg",
    "q9_product_profit": "Q9 shape: LIKE-filtered part + supplier + nation broadcast; profit in exact 1e-4 fixed point; one fact-fact exchange",
    "q11_important_parts": "Q11 shape: HAVING-vs-total decorrelated to a 1-row broadcast (BNL on a single row); exact integer threshold",
    "q12_late_ship_classes": "Q12 shape: one orderkey exchange, dual CASE-agg partial-aggregated map-side into 2 rows",
    "q15_top_supplier": "Q15 shape: supplier agg -> 1-row max broadcast -> exact fixed-point equality; no float tie fragility",
    "q16_supplier_part_counts": "Q16 shape: filtered part broadcast, negative-balance suppliers broadcast anti-join, exact distinct on the attribute shuffle",
    "q17_small_qty_revenue": "Q17 shape: per-part avg decorrelated to a broadcast agg; 20%-cut in exact integer algebra (5*qty*cnt < sum)",
    "q19_or_predicate_revenue": "Q19 shape: disjunctive part arms pushed to the part scan BEFORE the broadcast join; residual OR-of-ANDs in one codegen stage",
    "q20_promo_heavy_suppliers": "Q20 shape: grouped-HAVING subquery as a 1-row global broadcast + relative integer threshold, semi-join into the nation dim",
    "q_funnel_sliding_windows": "sliding-cohort funnel: 6x window explode is a narrow map; three stage aggs + counts reuse one (window, user) partitioning",
    "q_ks_two_sample": "exact two-sample KS: per-value counts -> distributed running CDF (range repartition + broadcast prefix offsets) -> DECIMAL(38,0) numerator; prints post-checkpoint, range exchange gated in test_plans.py",
    "q_psi_drift": "PSI: 1-row bin-bounds broadcast, row-local integer binning, 10-bin literal frame join, fixed-point ln terms summed as integers",
    "sample_temperature_mix": "temperature mixing: domain-cardinality rate table broadcast back into a row-local md5-threshold filter; one domain agg + one audit agg",
    "dedup_prefix_filter": "PPJoin: df-ranked per-doc prefix window (partitioned BY DOC), prefix x prefix equi-join over the RAREST tokens + length filter, then ROW-LOCAL size(array_intersect) verification over per-doc distinct shingle arrays (round-15: the two token-keyed verify shuffles of the full stream are gone) — no all-pairs path",
    "lake_bucketed_join": "bucketed co-located join: both scans read pre-bucketed files; at smoke scale AQE picks broadcast (shown), at cluster scale the same tables feed SMJ with NO Exchange on either side (plan-gated with broadcast disabled); the only shuffle is the final non-bucket-key aggregate",
    "q_entropy_mi": "entropy/MI: one data-sized groupBy(type,hour); marginals/total derive from the tiny cell frame; fixed-point ln terms summed as integers",
    "q_acf_hourly": "ACF: one data-sized groupBy(hour); dense spine + lag joins run over the bounded hour axis; DECIMAL moments, one division per lag",
    "q_seasonal_anomaly": "seasonal 2-sigma: one groupBy(day,hour); 24-row hour baseline broadcast back; pure-integer variance test, zero floats",
    "text_rouge_overlap": "ROUGE-2: range-partitioned global rank (no per-source window skew) -> rank+1 self-join pair stream -> ROW-LOCAL size(array_intersect) on the (n-1)-pair frame (round-14: the exploded token join and its three bigram shuffles are gone); prints post-checkpoint, range exchange gated in test_plans.py",
    "q_ccf_types": "CCF: one data-sized (hour, type) groupBy; both series on ONE shared dense spine; per-lag joins over the bounded hour axis, DECIMAL moments, one float expression per lag",
    "sketch_ks_approx": "approximate KS: per-group KLL sketch over global_rank (range exchange + row-local level CASE — no single-task sort); the CDF-gap stage runs over sketch rows only (config-bounded), DECIMAL numerator",
    "q_ecdf_transform": "ECDF transform: per-distinct-value counts, distributed running count via global_running_sum (range repartition + broadcast prefix offsets), one float division per surviving row",
    "dedup_weighted_minhash": "weighted Jaccard: the ngram inverted-index equi-join with integer IDF weights riding the index rows (df-capped fan-out); sketch side replicates shingles <=4x into the standard MinHash banding",
    "dedup_tfidf_cosine": "sparse tf-idf cosine: single-WORD inverted-index equi-join (relative df/N cap), BIGINT dot/norm partial aggs map-side; the one float expression (dot / sqrt(n2_a*n2_b)) is IEEE-exact in any engine",
    "q_market_basket_lift": "basket lift: pair self-join on the order key (fan-out bounded by basket size), BIGINT support counts with map-side partials, Zipf-small item-count joins, 1-row total broadcast cross",
    "q_twap_hourly": "hourly LOCF TWAP: one window shuffle on the group key, bounded hour-span Generate, one (group,hour) hash agg; DECIMAL(38,0) numerator emitted as exact BIGINT divmod halves (int128->double mis-rounds ties above 2^53), float built from BIGINT->double only",
    "layout_hilbert_events": "Hilbert layout: min/max bounds broadcast, the 16-level xy2d walk is ONE row-local projection chain (no shuffle until the optional file bucketing)",
    "q_skyline_parts": "2-D skyline: staircase decomposition — ONE partial+final hash agg to per-size mins (domain-bounded frame), running min over that tiny frame, broadcast join back; no base-data shuffle, no O(n^2) dominance pairing",
    "q_attribution_credit": "multi-touch attribution: join-free — the nearest following conversion rides a last(ignorenulls) window over the DESC (ms,id,is_conv) walk; every later window + the final agg cluster on (u,...), satisfied by the ONE hashpartitioning(u) exchange; exact integer credit inputs, one division per output row",
    "q_decile_lift": "decile lift/gains: distributed exact ntile(10) (range repartition + broadcast offsets — prints post-checkpoint), ONE per-customer hash agg of the orders scan; the only SinglePartition stage is the constant 10-row decile frame (totals/cumsum post-aggregation)",
    "q_allen_spans": "Allen interval join: one (user,type) hash agg to spans, one keyed equi-join (AQE broadcasts the small side), the 13-relation classification a row-local CASE projection — never a time cross-join",
    "q_allen_incidents": "UN-keyed Allen join: session spans and data-derived incident windows explode to hour buckets and hash-join the bucket (AQE broadcasts the tiny incident side); disjoint relations are excluded by contract; the only SinglePartition stage is the hour-axis incident frame",
    "pack_ffd_bins": "FFD invariant summary: the per-group applyInPandas pack (ONE pack_group shuffle), then two bounded aggregations (per-bin, per-group) joined on pack_group — the invariant booleans are row-local comparisons over the tiny per-group frame",
    "q_segment_lift": "per-segment lift: grouped_ntile = range repartition on the composite (segment, spend, custkey) order (prints post-checkpoint, range exchange gated in test_plans.py) + null-safe broadcast of the per-group (start, count) stats; NO SinglePartition anywhere — the lift/gain windows partition by segment",
    "q_skyline3_lineitems": "3-D skyline: ZERO exchanges — per-partition local frontiers in MapInPandas (lexicographic-min extraction, vectorized dominance passes), frontier-bounded coalesce(1) merge; the oracle runs the O(n^2) NOT-EXISTS the engine never does",
    "q_group_ks": "per-group exact KS: grouped_running_sum = range repartition on the composite (segment, cents) order (prints post-checkpoint, range exchange gated in test_plans.py) + Spark-derived per-group start offsets broadcast null-safely; numerator max and at-value argmin aggregate BY SEGMENT — zero SinglePartition stages",
    "manifest_compaction_plan": "FFD compaction planner: the (type, hour) inventory is one hash agg; the plan is ONE applyInPandas keyed on the partition value (metadata-sized input); invariant summary = two bounded aggregations joined on part",
    "q_group_ecdf": "per-group ECDF: the reference running count rides grouped_running_sum's composite-order range exchange; current-year filter + one broadcast totals join; one division per row",
    "sample_weighted_reservoir": "batch A-ES reservoir: row-local codegen priority (sequence->transform->array_max of md5s), two-phase top-k — (lang, hash-bucket) local dense_rank then exact rank on the k-bounded survivors; dedup only on the tiny final frame",
    "q_cohort_retention_daily": "daily cohort retention: ONE wide user_id hash agg (min day + collect_set days together), narrow explode, calendar-bounded cell/size aggs, sizes broadcast back — never two passes over events",
    "q_group_mannwhitney": "per-type Mann-Whitney U: per-(type, cents) counts, running C2 via grouped_running_sum's composite-order range exchange, per-type DECIMAL(38,0) reduction — no type ever funnels through one task",
    "q_group_spearman_trend": "per-type Spearman trend: BOTH rank axes from grouped_running_sum (range exchanges, prints post-checkpoint), cell-frame hash joins onto the rank maps, per-type cell-weighted DECIMAL moments — no per-group rank window anywhere",
    "q_spearman_corr": "round-14 retrofit: the per-priority ranks ride the SAME grouped_running_sum machinery (windows keyed on __pid only) — the last one-task-per-group value-axis Window is gone",
    "streaming_group_spearman": "the trend's LIVE twin: domain-bounded (hour, type, value) cells drained append-mode, then the identical cell core — state tracks the value DOMAIN, the post-drain plan is the batch trend's",
}

# Everything below this marker in EXPLAIN.md is hand-written (sub-stage
# plans and iterative operators whose lineage can't print as one tree) and
# is preserved verbatim across regeneration.
MANUAL_MARKER = "<!-- MANUAL SECTIONS: preserved by scripts/gen_explain.py -->"


def main() -> None:
    spark = get_spark(app_name="gen-explain", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    out = [
        "# EXPLAIN — physical plans of the headline operators",
        "",
        "Regenerate with `python scripts/gen_explain.py`. These are the plan",
        "shapes the engine commits to (enforced by tests/test_plans.py); at",
        "cluster scale the same shapes hold — only partition counts change.",
        "",
    ]
    for name, why in SHOWN.items():
        df = mod.queries()[name](spark, sf)
        plan = explain_str(df, "formatted")
        # keep the numbered tree, drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"*{why}*", "", "```", tree, "```", ""]
    path = os.path.join(os.path.dirname(__file__), "..", "EXPLAIN.md")
    manual = ""
    if os.path.exists(path):
        prev = open(path).read()
        if MANUAL_MARKER in prev:
            manual = prev[prev.index(MANUAL_MARKER):]
    with open(path, "w") as fh:
        fh.write("\n".join(out))
        if manual:
            fh.write("\n" + manual)
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
