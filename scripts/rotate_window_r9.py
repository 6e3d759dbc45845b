"""One-shot round-9 driver-window rotation for __spark_entry__.py.

Rewrites the queries() return dict in the staleness-first order computed
from the CORRECTNESS_r0*.json artifacts (VERDICT r8, Next-round item 1):
26 never-driver-seen r8 session-4/5 tail entries, then the 16
artifact-less r6 entries, then the first 8 r2-stale entries = exactly 50
above the cut. Below the cut: the newly-registered trio (never-seen,
leads round 10), the 6 remaining r2-stale, 33 r4-stale, r5, r7, then the
round-8 window (freshest last).
"""

from __future__ import annotations

import re

PATH = "/root/repo/__spark_entry__.py"

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
NEW_TRIO = ["layout_hilbert_events", "q_ecdf_transform", "q_cramers_v"]
R2_REST6 = [
    "q_map_explode_props", "q_array_ops_embeddings", "q_decimal_and_date",
    "q_pandas_udf_score", "q_zscore_by_type", "udtf_split_words",
]

src = open(PATH).read()

# Extract the current dict entries (order-preserving) from the queries()
# return block.
m = re.search(
    r"(def queries\(\).*?\n    return \{\n)(.*?)(\n    \}\n)", src, re.S
)
assert m, "queries() return dict not found"
body = m.group(2)
entries = re.findall(r'"(\w+)": \w+,', body)
assert len(entries) == len(set(entries)), "dup entries"
print(f"current entries: {len(entries)}")

known = set(entries) | set(NEW_TRIO)
placed = TAIL_26 + R6_16 + R2_FIRST8 + NEW_TRIO + R2_REST6
assert len(placed) == len(set(placed))
for name in placed:
    assert name in known, name

# Everything else keeps its current relative order, split into the
# documented staleness cohorts for the below-cut comments.
rest = [e for e in entries if e not in set(placed)]

# Cohort boundaries in the CURRENT dict (by first entry of each block).
idx = {e: i for i, e in enumerate(entries)}
r8_window = set(entries[:50])
r4_start, r5_start, r7_start = (
    idx["q_orders_of_rich_customers"],
    idx["q_argmax_events"],
    idx["q6_forecast_revenue"],
)
r4 = [e for e in rest if r4_start <= idx[e] < r5_start]
r5 = [e for e in rest if r5_start <= idx[e] < r7_start]
r7 = [e for e in rest if idx[e] >= r7_start and e not in r8_window]
r8 = [e for e in rest if e in r8_window]
assert len(r4) == 33 and len(r5) == 50 and len(r7) == 47 and len(r8) == 50, (
    len(r4), len(r5), len(r7), len(r8),
)

def block(names: list[str], comment: str) -> str:
    lines = [f"        # {c}" for c in comment.split("\n")]
    lines += [f'        "{n}": {n},' for n in names]
    return "\n".join(lines)

new_body = "\n".join(
    [
        block(
            TAIL_26,
            "--- round-8 session-4/5 tail: never driver-seen -- lead the\n"
            "round-9 window (VERDICT r8 item 1) --------------------------",
        ),
        block(
            R6_16,
            "--- artifact-less round-6 cohort (the r6 CORRECTNESS file was\n"
            "never preserved) -- inside the round-9 window ---------------",
        ),
        block(
            R2_FIRST8,
            "--- r2-stale, first 8 of 14 (oldest-artifact-first) ---------",
        ),
        "        # ===== DRIVER WINDOW CUT: the 50 entries above are the"
        "\n        # round-9 sweep (26 never-seen + 16 artifact-less r6 + 8"
        "\n        # r2-stale). Below: locally green via"
        "\n        # tests/test_oracle_parity.py; ordered for the ROUND-10"
        "\n        # window (never-seen first, then oldest artifact)."
        "\n        # Round-10 arithmetic (VERDICT r8 item 4): carried debt ="
        "\n        # 3 newly-registered never-seen + 6 r2-stale + 33 r4-stale"
        "\n        # = 42, leaving at most 8 slots for new round-9 entries"
        "\n        # before r5-stale rotation slips another round. =========",
        block(
            NEW_TRIO,
            "--- registered this round (previously unregistered dead code,\n"
            "VERDICT r8 item 2): never driver-seen -- lead round 10 ------",
        ),
        block(R2_REST6, "--- r2-stale remainder (6) --------------------------"),
        block(r4, "--- last on-disk driver-green: round 4 ------------------"),
        block(r5, "--- driver-green round 5 --------------------------------"),
        block(r7, "--- driver-green round 7 --------------------------------"),
        block(r8, "--- driver-green round 8 (freshest) ---------------------"),
    ]
)

note = '''def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's correctness sweep checks the FIRST 50
    # entries (an exact prefix of this dict). The ordering ROTATES each
    # round so every entry gets a driver-verified row regularly, computed
    # STALENESS-FIRST from the on-disk CORRECTNESS_r0*.json artifacts
    # (never-driver-seen outranks everything, then entries whose
    # semantics/plan changed this round, then artifact-less, then
    # oldest-artifact-first).
    # Round-9 rotation (VERDICT r8 item 1, verbatim): the 26 never-seen
    # r8 session-4/5 tail entries + the 16 artifact-less r6 entries + the
    # first 8 of the 14 r2-stale = exactly 50. After this round the
    # never-checked backlog is the newly-registered trio (+ any round-9
    # additions); round 10 leads with those, then the 6 remaining
    # r2-stale, then the 33 r4-stale.
    return {
'''

new_src = src[: m.start()] + note + new_body + m.group(3) + src[m.end():]
open(PATH, "w").write(new_src)

# sanity: re-extract
entries2 = re.findall(r'"(\w+)": \w+,', re.search(
    r"def queries\(\).*?\n    return \{\n(.*?)\n    \}\n", new_src, re.S
).group(1))
assert entries2[:50] == TAIL_26 + R6_16 + R2_FIRST8
assert len(entries2) == len(entries) + 3, (len(entries2), len(entries))
assert len(set(entries2)) == len(entries2)
print(f"rewritten: {len(entries2)} entries, window head = {entries2[0]}")
