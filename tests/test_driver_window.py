"""Guard the round-9 driver-window composition: the correctness sweep
checks the FIRST 50 queries() entries, so an accidental dict reorder
(a refactor, a merge) silently swaps which entries get driver-verified.
This pins the committed rotation (VERDICT r8, Next-round item 1): the 26
never-driver-seen round-8 session-4/5 tail entries, the 16 artifact-less
round-6 entries, and the first 8 of the 14 r2-stale entries — exactly
50. Update DELIBERATELY when the round-10 rotation is computed
(staleness-first from the CORRECTNESS_r0*.json artifacts)."""

from __future__ import annotations

import __spark_entry__ as entrymod

TAIL_26 = [
    "streaming_psi_drift", "q_ccf_types", "q_histogram_equi_depth",
    "sample_reservoir_stratum", "sketch_kll_quantiles",
    "q_record_linkage_fs", "text_bpe_merges", "q_winsorized_stats",
    "text_ngram_novelty", "q_theilsen_hourly", "streaming_hll_hourly",
    "streaming_cusum_hourly", "q_gini_revenue", "q_herfindahl_segments",
    "text_zipf_slope", "q_bootstrap_ci_mean", "graph_kcore",
    "dedup_containment", "sketch_hll_rolling", "streaming_quantile_hourly",
    "q_fd_violations", "q_ref_integrity", "q_anova_f", "q_mannwhitney_u",
    "q_hellinger_types", "q_holt_dyadic",
]
R6_16 = [
    "manifest_read_where", "q_asof_next_purchase",
    "q_asof_nearest_purchase", "text_gopher_rules", "text_c4_rules",
    "sketch_hll_distinct", "sample_weighted_priority",
    "streaming_purchase_error_left_join", "sample_dsir_importance",
    "sketch_hll_incremental", "sketch_quantile_histogram",
    "q_corr_price_items", "q_gapfill_hourly", "q_locf_fill",
    "q_funnel_conversion", "q_cohort_retention",
]
R2_FIRST8 = [
    "q_hourly_events", "q_sliding_window_avg", "q_pivot_event_types",
    "q_pivot_native", "q_grouping_sets", "q_rollup_status_priority",
    "q_cube_status_priority", "q_string_agg_suppliers",
]


def test_round9_window_composition():
    qs = list(entrymod.queries().keys())
    want = TAIL_26 + R6_16 + R2_FIRST8
    assert len(want) == 50, len(want)
    assert qs[:50] == want, (qs[:50], want)


def test_never_seen_registrations_lead_below_cut():
    """The trio registered this round (previously unregistered dead code,
    VERDICT r8 item 2) plus any round-9 additions are never driver-seen
    and sit immediately below the cut, so they lead the round-10
    window."""
    qs = list(entrymod.queries().keys())
    assert qs[50:53] == [
        "layout_hilbert_events", "q_ecdf_transform", "q_cramers_v",
    ], qs[50:53]


def test_every_query_has_oracle_or_is_known_rows_only():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"pack_ffd_bins"}, rows_only
    assert set(oracles) <= set(qs)
