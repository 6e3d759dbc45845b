"""Guard the round-8 driver-window composition: the correctness sweep
checks the FIRST 50 queries() entries, so an accidental dict reorder
(a refactor, a merge) silently swaps which entries get driver-verified.
This pins the committed rotation: all 46 never-driver-seen round-8
entries plus the 4 changed entries, exactly 50. Update DELIBERATELY
when the round-9 rotation is computed (staleness-first from the
CORRECTNESS_r0*.json artifacts)."""

from __future__ import annotations

import __spark_entry__ as entrymod

FIRST_WAVE = {
    "dedup_prefix_filter", "lake_bucketed_join", "cdc_purge_keys",
    "q_entropy_mi", "q_acf_hourly", "q_seasonal_anomaly",
    "text_rouge_overlap",
    "sketch_theta_intersection", "pack_ffd_bins", "streaming_session_topk",
    "q10_returned_revenue", "q14_promo_share", "graph_pagerank_weighted",
    "q_longest_streak", "q7_nation_trade", "cdc_merge_into",
    "streaming_enrich_asof_static", "q_cheapest_supplier_per_part",
    "q4_late_ship_priority", "q_mom_growth", "q_event_transitions",
    "q_percentile_cont", "dedup_editdist_rerank", "sketch_hll_sparse",
    "ann_pq_adc_rerank", "streaming_funnel_timeout", "ann_ivfadc_topk",
    "q13_customer_distribution", "q21_sole_late_supplier",
    "q22_idle_rich_customers", "q_funnel_timeout",
}
THIRD_WAVE = {
    "q8_market_share", "q9_product_profit", "q11_important_parts",
    "q12_late_ship_classes", "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_qty_revenue", "q19_or_predicate_revenue",
    "q20_promo_heavy_suppliers", "q_funnel_sliding_windows",
    "q_ks_two_sample", "q_psi_drift", "sample_temperature_mix",
    "q_ks_rolling_hourly", "sketch_tdigest_pinned",
}
CHANGED = {
    "q_regr_slope_exact", "q_rfm_segments", "q_chi2_independence",
    "dedup_ngram_jaccard",
}


def test_round8_window_composition():
    qs = list(entrymod.queries().keys())
    window = set(qs[:50])
    want = FIRST_WAVE | THIRD_WAVE | CHANGED
    assert len(want) == 50, len(want)
    assert window == want, (
        sorted(window - want), sorted(want - window)
    )


def test_session4_tail_leads_below_cut():
    """The never-driver-seen session-4/5 tail entries sit immediately
    below the cut, so they lead the round-9 window."""
    qs = list(entrymod.queries().keys())
    assert qs[50:76] == [
        "streaming_psi_drift", "q_ccf_types", "q_histogram_equi_depth",
        "sample_reservoir_stratum", "sketch_kll_quantiles",
        "q_record_linkage_fs", "text_bpe_merges",
        "q_winsorized_stats", "text_ngram_novelty", "q_theilsen_hourly",
        "streaming_hll_hourly",
        "streaming_cusum_hourly", "q_gini_revenue",
        "q_herfindahl_segments", "text_zipf_slope",
        "q_bootstrap_ci_mean", "graph_kcore", "dedup_containment",
        "sketch_hll_rolling", "streaming_quantile_hourly",
        "q_fd_violations", "q_ref_integrity",
        "q_anova_f", "q_mannwhitney_u", "q_hellinger_types",
        "q_holt_dyadic",
    ], qs[50:76]


def test_every_query_has_oracle_or_is_known_rows_only():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"pack_ffd_bins"}, rows_only
    assert set(oracles) <= set(qs)
