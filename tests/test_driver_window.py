"""Guard the round-11 driver-window composition: the correctness sweep
checks the FIRST 50 queries() entries, so an accidental dict reorder
(a refactor, a merge) silently swaps which entries get driver-verified.
This pins the committed rotation: 10 new round-11 entries (never
driver-seen lead; q_segment_lift, streaming_allen_monitor,
q_skyline3_lineitems, streaming_reservoir_sample,
streaming_pagerank_monitor, and text_unicode_clean are the second
wave), 5 changed this
round (window-head hygiene — the r10 red attribution row, the FFD
rows-only→invariant-oracle rewrite, the two NULL-id ts-collision
ordering fixes, the cents-idiom alignment), then 35 of the 49-entry
r5-stale cohort — exactly 50. The 14 displaced r5 entries sit first
below the cut and lead round 12 (then the r7 cohort). Update
DELIBERATELY when the round-12 rotation is computed (staleness-first
from the CORRECTNESS_r*.json artifacts)."""

from __future__ import annotations

import __spark_entry__ as entrymod

NEW_R11 = [
    "q_decile_lift", "q_allen_spans", "q_allen_incidents",
    "streaming_skyline", "q_segment_lift", "streaming_allen_monitor",
    "q_skyline3_lineitems", "streaming_reservoir_sample",
    "streaming_pagerank_monitor", "text_unicode_clean",
]
CHANGED_5 = [
    "q_attribution_credit", "pack_ffd_bins", "q_twap_hourly",
    "q_event_gaps", "q_decimal_and_date",
]
R5_HEAD_35 = [
    "q_argmax_events", "streaming_stateful_running", "streaming_tumbling_counts",
    "streaming_sliding_avg", "streaming_session_windows", "streaming_dedup_keys",
    "streaming_dedup_within_watermark", "streaming_purchase_error_join",
    "q_sessionize_events", "q_range_frame_events", "text_repetition",
    "dedup_contamination_bloom", "rollup_incremental", "sample_domain_cap",
    "streaming_enrich_static", "dedup_chunk_boilerplate", "export_shard_stats",
    "sketch_count_min", "text_vocab_coverage", "text_bm25_search",
    "text_hybrid_search", "q_cume_dist_nth_value", "q_null_semantics",
    "cdc_scd2_history", "sample_leakage_safe_split", "graph_pagerank_neardup",
    "dedup_substring_spans", "sample_token_budget_mix", "text_duplicate_fraction",
    "dedup_semantic", "text_lm_score", "sample_prototype_prune",
    "pack_chunk_documents", "layout_zorder_events", "stats_profile_documents",
]
R5_DISPLACED_14 = [
    "doc_fingerprint",
    "multimodal_bytes_meta", "multimodal_features", "multimodal_frames",
    "q_approx_distinct_users", "q_median_price_by_priority",
    "q_asof_purchase_before_error", "q_range_join_value_tiers",
    "text_tfidf_top_terms", "text_langid", "text_token_count",
    "text_quality_classifier", "text_lm_bigram_score",
    "sample_curriculum_stages",
]


def test_round11_window_composition():
    qs = list(entrymod.queries().keys())
    want = NEW_R11 + CHANGED_5 + R5_HEAD_35
    assert len(want) == 50, len(want)
    assert qs[:50] == want, (qs[:50], want)


R12_HEAD_CANDIDATES = [
    "q_group_equidepth", "streaming_skyline3", "q_isotonic_calibration",
]


def test_round12_lead_is_candidates_then_displaced_r5_then_r7():
    """Below the cut: the never-driver-seen round-12 head candidates
    first (the rotation policy puts never-seen ahead of everything),
    then the 14 displaced r5 entries, then the r7 cohort."""
    qs = list(entrymod.queries().keys())
    n = len(R12_HEAD_CANDIDATES)
    assert qs[50:50 + n] == R12_HEAD_CANDIDATES, qs[50:50 + n]
    assert qs[50 + n:64 + n] == R5_DISPLACED_14, qs[50 + n:64 + n]
    assert qs[64 + n] == "q6_forecast_revenue", qs[64 + n]


def test_every_query_has_oracle():
    """Round 11 closed the last gap: pack_ffd_bins now returns an
    invariant summary with a full DuckDB oracle (VERDICT r10 item 5),
    so EVERY queries() entry has an oracle_sql() twin."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    assert set(oracles) <= set(qs)
