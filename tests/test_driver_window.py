"""Guard the round-15 driver-window composition: the correctness sweep
checks the FIRST 50 queries() entries, so an accidental dict reorder
(a refactor, a merge) silently swaps which entries get driver-verified.
This pins the committed round-15 rotation (staleness-first from the
CORRECTNESS_r*.json artifacts): the FOUR never-driver-seen r14
additions lead (streaming_group_spearman — the r14 NOTE's precomputed
r15 head candidate — then the live Mann-Whitney and the two r14
manifest entries), then the 19 entries whose PLAN changed in the
round-15 optimization sessions (each proven bit-identical by two-SF
output snapshots + local oracle parity, so they re-earn their driver
rows), then the 5 entries the round-14 OPTIMIZATION session changed
after the r14 window was sampled, then 22 of the round-9-stale cohort
= exactly 50. Below the cut the 4 r9-stale leftovers lead round 16.
Update DELIBERATELY when a future rotation is computed."""

from __future__ import annotations

import __spark_entry__ as entrymod

NEVER_SEEN_4 = [
    "streaming_group_spearman", "streaming_group_mannwhitney",
    "manifest_compact_cluster", "manifest_bloom_lookup",
]
CHANGED_R15_19 = [
    "text_ngram_novelty", "dedup_prefix_filter", "dedup_semantic",
    "q_ks_two_sample", "sketch_ks_approx", "sketch_theta_intersection",
    "q_spearman_corr", "q_group_spearman_trend", "q_rfm_segments",
    "q_decile_lift", "q_segment_lift", "q_ecdf_transform",
    "q_mannwhitney_u", "q_theilsen_hourly", "ann_ivfadc_topk",
    "manifest_read_where", "manifest_time_travel",
    "manifest_compact_execute", "manifest_compaction_plan",
]
CHANGED_R14_UNVERIFIED_5 = [
    "q_group_ks", "q_group_ecdf", "q_group_mannwhitney",
    "text_rouge_overlap", "sample_prototype_prune",
]
R9_FILL_22 = [
    "q_anova_f", "q_hellinger_types", "q_holt_dyadic",
    "q_asof_next_purchase", "q_asof_nearest_purchase",
    "text_gopher_rules", "text_c4_rules", "sketch_hll_distinct",
    "sample_weighted_priority", "streaming_purchase_error_left_join",
    "sample_dsir_importance", "sketch_hll_incremental",
    "sketch_quantile_histogram", "q_corr_price_items",
    "q_gapfill_hourly", "q_locf_fill", "q_funnel_conversion",
    "q_cohort_retention", "q_hourly_events", "q_sliding_window_avg",
    "q_pivot_event_types", "q_pivot_native",
]


def test_round15_window_composition():
    qs = list(entrymod.queries().keys())
    want = NEVER_SEEN_4 + CHANGED_R15_19 + CHANGED_R14_UNVERIFIED_5 + R9_FILL_22
    assert len(want) == 50, len(want)
    assert qs[:50] == want, (qs[:50], want)


def test_round16_lead_is_r9_remainder():
    """Below the cut: the four r9-stale leftovers lead round 16, then
    the prior order (the former r14 window, cohorts, the r13 window at
    the very bottom — freshest last)."""
    qs = list(entrymod.queries().keys())
    assert qs[50:54] == [
        "q_grouping_sets", "q_rollup_status_priority",
        "q_cube_status_priority", "q_string_agg_suppliers",
    ], qs[50:54]
    assert qs[-1] == "sketch_hll_sparse", qs[-1]


def test_every_query_has_oracle():
    """Since round 11 EVERY queries() entry has an oracle_sql() twin
    (pack_ffd_bins, the last rows-only entry, emits an invariant
    summary its oracle recomputes; every round-12/13/14 entry shipped
    full-oracle)."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    assert set(oracles) <= set(qs)
