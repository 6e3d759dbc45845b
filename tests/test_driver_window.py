"""Guard the round-10 driver-window composition: the correctness sweep
checks the FIRST 50 queries() entries, so an accidental dict reorder
(a refactor, a merge) silently swaps which entries get driver-verified.
This pins the committed rotation (the arithmetic precomputed in the
round-9 queries() NOTE): the 8 never-driver-seen entries (3 operators
registered in round 9 + 5 new round-9 entries), 1 contract-changed
entry (dedup_incremental_lsh — the advisor's LSH detectability gate),
2 new round-10 entries (== the spare slots, VERDICT r8 item 4), the 6
remaining r2-stale, and all 33 r4-stale — exactly 50. After this round
no entry's artifact is older than round 5. Update DELIBERATELY when the
round-11 rotation is computed (staleness-first from the
CORRECTNESS_r*.json artifacts; the r5 cohort alone fills round 11)."""

from __future__ import annotations

import __spark_entry__ as entrymod

NEVER_SEEN_8 = [
    "layout_hilbert_events", "q_ecdf_transform", "q_cramers_v", "sketch_ks_approx",
    "dedup_weighted_minhash", "dedup_tfidf_cosine", "q_market_basket_lift",
    "q_twap_hourly",
]
CHANGED_1 = ["dedup_incremental_lsh"]
NEW_R10_2 = ["q_skyline_parts", "q_attribution_credit"]
R2_REMAINDER_6 = [
    "q_map_explode_props", "q_array_ops_embeddings", "q_decimal_and_date",
    "q_pandas_udf_score", "q_zscore_by_type", "udtf_split_words",
]
R4_ALL_33 = [
    "q_orders_of_rich_customers", "q_running_total", "q_event_gaps",
    "q_setops_high_value", "q_distinct_counts", "q_string_funcs", "q_monthly_orders",
    "q_json_extract", "q_explode_words", "q_intersect_segments", "q_right_join_customers",
    "q_dense_rank_first_last", "q_union_by_name", "q_multiset_setops",
    "q_date_parts", "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "cdc_latest_state", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_clusters", "dedup_embedding_blocked", "dedup_rp_lsh_embeddings",
    "dedup_contamination", "ann_ivf_topk", "doc_winnow_sketch", "sample_stratified_lang",
    "text_pii_redact", "pack_token_budget", "corpus_curation", "ann_quantize_int8",
]


def test_round10_window_composition():
    qs = list(entrymod.queries().keys())
    want = NEVER_SEEN_8 + CHANGED_1 + NEW_R10_2 + R2_REMAINDER_6 + R4_ALL_33
    assert len(want) == 50, len(want)
    assert qs[:50] == want, (qs[:50], want)


def test_round11_lead_is_r5_cohort():
    """Below the cut the r5-stale cohort leads (oldest artifact first),
    so the round-11 rotation is a pure block move."""
    qs = list(entrymod.queries().keys())
    assert qs[50] == "q_argmax_events", qs[50]


def test_every_query_has_oracle_or_is_known_rows_only():
    """Round 11 closed the last gap: pack_ffd_bins now returns an
    invariant summary with a full DuckDB oracle (VERDICT r10 item 5),
    so EVERY queries() entry has an oracle_sql() twin."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    assert set(oracles) <= set(qs)
