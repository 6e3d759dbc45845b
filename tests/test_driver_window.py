"""Guard the round-13 driver-window composition: the correctness sweep
checks the FIRST 50 queries() entries, so an accidental dict reorder
(a refactor, a merge) silently swaps which entries get driver-verified.
This pins the committed rotation (VERDICT r12 item 1, exactly as the
r12 NOTE precomputed): 5 never-driver-seen entries lead (the 4 round-12
below-cut head candidates, then the 1 new round-13 operator), then the
19-entry r7 tail displaced in round 12, then 26 of the 49-entry r8
cohort — exactly 50. No `changed` block: every round-13 code change is
implementation-only (outputs bit-identical, re-proven locally). The
23-entry r8 tail sits first below the cut and leads round 14 (then the
r9 cohort; round-14 additions displace r9 slots). Update DELIBERATELY
when the round-14 rotation is computed (staleness-first from the
CORRECTNESS_r*.json artifacts)."""

from __future__ import annotations

import __spark_entry__ as entrymod

R12_HEAD_CANDIDATES = [
    "manifest_compact_execute", "streaming_group_ks",
    "streaming_allen_live_spans", "q_group_ecdf",
]
NEW_R13 = [
    "sample_weighted_reservoir", "q_cohort_retention_daily",
    "q_group_mannwhitney", "streaming_cohort_retention",
]
R7_TAIL_19 = [
    "q_percentile_disc", "q_mode_deterministic", "q_not_in_null_aware",
    "q_window_ignore_nulls", "q_two_phase_skew_agg",
    "q_histogram_equi_width", "q_mad_outliers", "q_ewma_dyadic",
    "q_approx_quantile_bound", "q_ntile_percent_rank",
    "q_offset_pagination", "sample_split_labels", "ann_cosine_topk",
    "text_quality", "q_full_outer_counts", "q_parts_above_avg_price",
    "q_topk_orders_per_customer", "q_exists_correlated",
    "q_customers_without_orders",
]
R8_HEAD_23 = [
    "dedup_prefix_filter", "lake_bucketed_join", "cdc_purge_keys",
    "q_entropy_mi", "q_acf_hourly", "q_seasonal_anomaly",
    "text_rouge_overlap", "sketch_theta_intersection",
    "streaming_session_topk", "q10_returned_revenue", "q14_promo_share",
    "graph_pagerank_weighted", "q_longest_streak", "q7_nation_trade",
    "cdc_merge_into", "streaming_enrich_asof_static",
    "q_cheapest_supplier_per_part", "q4_late_ship_priority",
    "q_mom_growth", "q_event_transitions", "q_percentile_cont",
    "dedup_editdist_rerank", "sketch_hll_sparse",
]


def test_round13_window_composition():
    qs = list(entrymod.queries().keys())
    want = R12_HEAD_CANDIDATES + NEW_R13 + R7_TAIL_19 + R8_HEAD_23
    assert len(want) == 50, len(want)
    assert qs[:50] == want, (qs[:50], want)


def test_round14_lead_is_r8_tail():
    """Below the cut: the 26-entry r8 tail leads round 14 (nothing is
    never-driver-seen after a green round 13 except entries round 14
    itself adds), then the r9 cohort."""
    qs = list(entrymod.queries().keys())
    # the round-14 head candidate sits FIRST below the cut (never-seen
    # outranks everything), then the r8 tail in artifact order
    assert qs[50] == "q_group_spearman_trend", qs[50]
    assert qs[51] == "ann_pq_adc_rerank", qs[51]
    assert qs[52] == "streaming_funnel_timeout", qs[52]
    assert qs[53] == "ann_ivfadc_topk", qs[53]
    # the round-12 window sits at the very bottom (freshest last)
    assert qs[-1] == "streaming_topk_per_window", qs[-1]
    assert qs[-50] == "q_group_equidepth", qs[-50]


def test_every_query_has_oracle():
    """Since round 11 EVERY queries() entry has an oracle_sql() twin
    (pack_ffd_bins, the last rows-only entry, emits an invariant
    summary its oracle recomputes; all round-12 and round-13 entries
    shipped full-oracle)."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    assert set(oracles) <= set(qs)
