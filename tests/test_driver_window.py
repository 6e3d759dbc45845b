"""Guard the round-12 driver-window composition: the correctness sweep
checks the FIRST 50 queries() entries, so an accidental dict reorder
(a refactor, a merge) silently swaps which entries get driver-verified.
This pins the committed rotation: 7 never-driver-seen entries lead (the
3 round-11 below-cut head candidates, then the 4 new round-12
operators), then the 1 entry whose SEMANTICS changed this round
(text_unicode_clean — the C1 control strip widened in both engines,
ADVICE r11 item 1), then the 14 r5-stale entries displaced in round 11,
then 28 of the 47-entry r7 cohort — exactly 50. The 19-entry r7 tail
sits first below the cut and leads round 13 (then the r8 cohort: 19 +
31 fill that window; round-13 additions displace r8 slots). Update
DELIBERATELY when the round-13 rotation is computed (staleness-first
from the CORRECTNESS_r*.json artifacts)."""

from __future__ import annotations

import __spark_entry__ as entrymod

R11_HEAD_CANDIDATES = [
    "q_group_equidepth", "streaming_skyline3", "q_isotonic_calibration",
]
NEW_R12 = [
    "q_group_ks", "streaming_weighted_reservoir",
    "streaming_allen_sessions", "manifest_compaction_plan",
]
CHANGED_R12 = ["text_unicode_clean"]
R5_DISPLACED_14 = [
    "doc_fingerprint",
    "multimodal_bytes_meta", "multimodal_features", "multimodal_frames",
    "q_approx_distinct_users", "q_median_price_by_priority",
    "q_asof_purchase_before_error", "q_range_join_value_tiers",
    "text_tfidf_top_terms", "text_langid", "text_token_count",
    "text_quality_classifier", "text_lm_bigram_score",
    "sample_curriculum_stages",
]
R7_HEAD_28 = [
    "q6_forecast_revenue", "q18_large_orders", "q_variant_props",
    "q_weighted_median", "q_running_distinct_types",
    "q_top_percent_orders", "q_scalar_subquery_select",
    "sketch_hll_intersection", "q_spearman_corr", "q_cube_grouping_id",
    "q_benford_digits", "q_unpivot_metrics", "q_percentile_bands",
    "ts_sax_blocking_pairs", "q_cusum_changepoint",
    "q_event_type_affinity", "ann_int8_rerank",
    "q_interval_contain_join", "cdc_diff_versions",
    "streaming_purchase_error_full_join", "streaming_hourly_daily_rollup",
    "graph_bfs_reachability", "graph_triangle_count", "ts_sax_words",
    "text_bigram_pmi", "dedup_keep_best", "manifest_time_travel",
    "streaming_topk_per_window",
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


def test_round12_window_composition():
    qs = list(entrymod.queries().keys())
    want = (
        R11_HEAD_CANDIDATES + NEW_R12 + CHANGED_R12
        + R5_DISPLACED_14 + R7_HEAD_28
    )
    assert len(want) == 50, len(want)
    assert qs[:50] == want, (qs[:50], want)


R13_HEAD_CANDIDATES = [
    "manifest_compact_execute", "streaming_group_ks",
    "streaming_allen_live_spans", "q_group_ecdf",
]


def test_round13_lead_is_candidates_then_r7_tail_then_r8():
    """Below the cut: the never-driver-seen round-13 head candidates
    first (the rotation policy puts never-seen ahead of everything),
    then the 19 displaced r7 entries, then the r8 cohort."""
    qs = list(entrymod.queries().keys())
    n = len(R13_HEAD_CANDIDATES)
    assert qs[50:50 + n] == R13_HEAD_CANDIDATES, qs[50:50 + n]
    assert qs[50 + n:69 + n] == R7_TAIL_19, qs[50 + n:69 + n]
    assert qs[69 + n] == "dedup_prefix_filter", qs[69 + n]


def test_every_query_has_oracle():
    """Since round 11 EVERY queries() entry has an oracle_sql() twin
    (pack_ffd_bins, the last rows-only entry, emits an invariant
    summary its oracle recomputes; the four round-12 entries all
    shipped full-oracle)."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    assert set(oracles) <= set(qs)
