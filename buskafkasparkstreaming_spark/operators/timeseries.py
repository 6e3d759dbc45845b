"""Time-series similarity primitives (SURVEY §2.3 extension surface;
public background: Lin et al. 2003 "A Symbolic Representation of Time
Series" — SAX; the EDBT 2019 streaming time-series-similarity line in
PAPERS.md motivates the blocking formulation).

SAX turns each key's ordered value series into a short SYMBOL WORD:
PAA-segment the series, z-normalize the segment means, and map them to
letters via fixed normal-quantile breakpoints. Equal words = candidate
similar series — the blocking step that makes all-pairs time-series
similarity tractable at scale (group by word, compare within blocks),
exactly the inverted-index/banding idea the dedup family uses for text.

Scale shape: every stage is keyed on the series id — one hash shuffle
for the ordering window, then co-partitioned aggregations; the word is
bounded (`segments` chars) so the blocking groupBy shuffles only
(id, word) rows. Arithmetic follows the engine's exactness contract:
segment sums/counts and the per-key moments are exact BIGINT; the
z-scores divide those integers in ONE fixed-order float formula, so the
oracle reproduces the symbols bit-identically. Constant series (zero
variance) get the sentinel word 'flat' via the exact integer test
min(c) == max(c) — no float division by zero reaches any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: standard SAX breakpoints for a 4-symbol alphabet (N(0,1) quartiles)
BREAKPOINTS_4 = (-0.6745, 0.0, 0.6745)


def sax_words(
    df: DataFrame,
    key_col: str,
    time_col: str,
    cents_col: str,
    segments: int = 4,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One SAX word per key: (key, n_points, sax_word).

    Rows with NULL key/time/value are excluded (they have no position in
    the series). Keys with fewer points than `segments` still produce a
    word (trailing segments empty -> skipped in the word)."""
    clean = df.filter(
        F.col(key_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(cents_col).isNotNull()
    )
    order = [F.col(time_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    n_w = Window.partitionBy(key_col)
    rows = clean.select(
        F.col(key_col).alias("key"),
        F.col(cents_col).cast("long").alias("c"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    ).withColumn(
        # segment index 0..segments-1: floor((rn-1)*segments/n), exact ints
        "seg",
        ((F.col("rn") - 1) * segments / F.col("n")).cast("long"),
    )
    segs = rows.groupBy("key", "seg").agg(
        F.sum("c").cast("long").alias("s_sum"),
        F.count(F.lit(1)).cast("long").alias("s_n"),
    )
    moments = rows.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sx"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.min("c").alias("cmin"),
        F.max("c").alias("cmax"),
    )
    j = segs.join(moments, "key")
    n = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / n
    var = F.col("sxx").cast("double") / n - mean * mean
    seg_mean = F.col("s_sum").cast("double") / F.col("s_n").cast("double")
    z = (seg_mean - mean) / F.sqrt(var)
    # exact zero-variance test: every value equal
    flat = F.col("cmin") == F.col("cmax")
    b1, b2, b3 = BREAKPOINTS_4
    sym = (
        F.when(z < b1, F.lit("a"))
        .when(z < b2, F.lit("b"))
        .when(z < b3, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    per_seg = j.select(
        "key", "seg", "n", sym.alias("sym"), flat.alias("flat")
    )
    return per_seg.groupBy("key").agg(
        F.max("n").cast("long").alias("n_points"),
        F.when(
            F.max(F.col("flat").cast("int")) == 1, F.lit("flat")
        )
        .otherwise(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("seg", "sym"))).sym
            )
        )
        .alias("sax_word"),
    )


def twap_hourly(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """TIME-weighted average value per (group, clock hour) — the
    TimescaleDB `time_weight` / LOCF-integral analog: each report's
    value holds until the group's next report (LOCF step function), so
    the hourly mean weights each value by how LONG it held, not by how
    often it was sampled.

    Exactness contract: weights are exact BIGINT millisecond overlaps,
    the numerator an exact DECIMAL(38,0) sum (cents x ms summed
    fleet-wide overflows int64 — and the per-term product is
    decimal-cast BEFORE the multiply, since a BIGINT product silently
    wraps in Spark and raises in DuckDB). The numerator leaves the
    operator as the exact integer pair
    (num_div, num_mod) = divmod(numerator, w_ms) under FLOOR division:
    both halves fit BIGINT for any int64 cents (num_div is a weighted
    MEAN of cents, so |num_div| <= max|cents|; 0 <= num_mod < w_ms),
    and twap_cents = toDouble(num_div) + toDouble(num_mod)/toDouble(
    w_ms) touches floats only through BIGINT→DOUBLE conversions —
    which ARE correctly rounded in both engines, where
    DECIMAL(38,0)/int128→DOUBLE is NOT (DuckDB composes the halves
    and mis-rounds exact ties above 2^53; measured on
    -53560554100741004, round-10 extreme-magnitude sweep). Zero-length
    segments (duplicate timestamps) drop deterministically under the
    (ms, id) order; each group's last report defines no segment.

    Scale shape: one window shuffle keyed on the group (a fleet has
    many groups — partition-parallel), then an hour-span explode
    bounded by segment length (~1 row for telemetry cadences; a
    fully-idle group costs corpus-duration/1h rows), then one
    (group, hour) hash aggregation with map-side partials.
    Output: (group, h, w_ms, num_div, num_mod, twap_cents).

    Hour bucketing is FLOOR division (ms - pmod(ms, 1h)) DIV 1h, not
    the engines' truncate-toward-zero DIV: a pre-1970 (negative-epoch)
    timestamp under truncation lands in the wrong hour and emits
    NEGATIVE overlap weights that corrupt the aggregate (review catch).
    The id tie-break is asc_nulls_last to match SQL's default NULLS
    LAST — Spark's bare asc() is NULLS FIRST, which would pick a
    different surviving segment than the oracle on a NULL id. cents is
    the FINAL tie key: two NULL-id reports tied on ms still need a
    total order wherever the output depends on it (the zero-length
    segment drop keeps exactly one survivor per ms — which VALUE
    survives must not be an engine coin flip; caught by the round-11
    NULL-id ts-collision sweep). Rows identical in (ms, id, cents) are
    interchangeable — same value, same integral."""
    from buskafkasparkstreaming_spark.functions import ts_millis

    w = Window.partitionBy(group_col).orderBy(
        F.col("ms").asc(),
        F.col(id_col).asc_nulls_last(),
        F.col("cents").asc(),
    )
    dec = "decimal(38,0)"
    seg = (
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            group_col,
            id_col,
            ts_millis(F.col(ts_col)).alias("ms"),
            F.round(F.col(value_col) * 100, 0).cast("long").alias("cents"),
        )
        .withColumn("next_ms", F.lead("ms").over(w))
        .filter(F.col("next_ms") > F.col("ms"))
    )
    hours = seg.select(
        group_col,
        "cents",
        "ms",
        "next_ms",
        F.explode(
            F.sequence(
                F.expr("(ms - pmod(ms, 3600000)) DIV 3600000"),
                F.expr(
                    "((next_ms - 1) - pmod(next_ms - 1, 3600000))"
                    " DIV 3600000"
                ),
            )
        ).alias("h"),
    )
    overlap = F.least(
        F.col("next_ms"), (F.col("h") + 1) * F.lit(3600000)
    ) - F.greatest(F.col("ms"), F.col("h") * F.lit(3600000))
    return (
        hours.withColumn("w_ms", overlap.cast("long"))
        .groupBy(group_col, "h")
        .agg(
            F.sum("w_ms").cast("long").alias("w_ms"),
            # cents is cast to DECIMAL *before* the multiply: a BIGINT
            # product cents*w_ms silently wraps in Spark above
            # |value| ~ $2.6e10 (|cents|*3.6e6 > int64 max) while DuckDB
            # raises, so the whole numerator — per-term product AND sum —
            # must be decimal-exact. DECIMAL(20,0)*DECIMAL(18,0) →
            # DECIMAL(38,0) in both engines (advisor catch, round 9).
            F.sum(
                F.col("cents").cast("decimal(20,0)")
                * F.col("w_ms").cast("decimal(18,0)")
            )
            .cast(dec)
            .alias("__num"),
        )
        .withColumn(
            "__r",
            F.expr(
                "CAST(pmod(__num, CAST(w_ms AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ),
        )
        .withColumn(
            "__q",
            F.expr(
                "CAST((__num - __r) / CAST(w_ms AS DECIMAL(38,0))"
                " AS BIGINT)"
            ),
        )
        .select(
            group_col,
            "h",
            "w_ms",
            F.col("__q").alias("num_div"),
            F.col("__r").alias("num_mod"),
            (
                F.col("__q").cast("double")
                + F.col("__r").cast("double") / F.col("w_ms").cast("double")
            ).alias("twap_cents"),
        )
    )
