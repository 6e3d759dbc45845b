"""Join operators beyond the plain `df.join` (SURVEY §2.3 "Joins" row).

Scale notes baked into each implementation:
* broadcast_join — explicit broadcast of small dims; at 100 TB the fact side
  never shuffles.
* asof_join — the union-sort trick: ONE shuffle on the key (no per-row range
  probe, no cross product). This is the standard scalable as-of pattern
  (e.g. what kdb/QuestDB/Flink temporal joins do physically): tag build and
  probe rows, sort within key by (time, is_build), and carry the last build
  payload forward with `last(..., ignorenulls=True)`.
* range_join — bucketized equi-pre-join so Catalyst gets an equi-condition
  to hash on instead of a BroadcastNestedLoop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | str | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join with the dim side broadcast — no shuffle of the fact side."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str | Column) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str | Column) -> DataFrame:
    return left.join(right, on, "left_anti")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    build_cols: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join (pandas `merge_asof` parity): for each probe row, attach
    one build row within the same `key` chosen by `direction`:

    * ``backward`` (default) — greatest `build_time` ≤ `probe_time`;
    * ``forward`` — smallest `build_time` ≥ `probe_time`;
    * ``nearest`` — whichever of the two is closer in time; an exact tie
      prefers the backward match (deterministic).

    `tolerance` (optional) drops a match farther than this from the probe
    time — same units as the time columns, which must be NUMERIC when
    `tolerance` or `direction='nearest'` is used (interval arithmetic on
    raw timestamps is engine-specific; convert via `functions.ts_millis`).

    Implementation: union probe and build rows with a side marker, window
    over (key) ordered by (time, side, tiebreak), and take
    `last(build payload, ignorenulls=True)` up to the current row — the
    forward direction is the same pass under a descending order. Build
    rows at exactly probe_time win (inclusive). Among equal-time build
    rows the greatest `tiebreak` wins.

    Cost: one hash shuffle on `key` + per-key sort(s) — linear, no range
    explosion; survives 100× scale-up as long as per-key cardinality fits a
    sort spill (it does: UnsafeExternalSorter spills to disk). `nearest`
    adds a second sort over the SAME partitioning, not a second shuffle.

    NULL times: a build row without a time can never be "the latest as of
    t" and is dropped; a probe row without a time matches nothing (kept
    unmatched under how='left'). Without the guard, NULL build times sort
    NULLS-FIRST into the union and silently act as since-forever matches.

    NULL keys: SQL equi-join semantics — a NULL key matches NOTHING.
    Window.partitionBy groups NULLs into one partition, so without the
    build-side guard a NULL-key probe would silently "match" NULL-key
    build rows (caught by the null-user drift probe, r6).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    build = build.filter(
        F.col(build_time).isNotNull() & F.col(key).isNotNull()
    )
    probe_cols = probe.columns
    # __bt (the matched build's time) rides inside the payload so the
    # tolerance / nearest-distance checks can see it after the window
    pay = F.struct(
        F.col(build_time).alias("__bt"), *[F.col(c) for c in build_cols]
    ).alias("__pay")
    probe_struct = F.struct(*[F.col(c) for c in probe_cols]).alias("__probe")
    tb = F.col(tiebreak) if tiebreak else F.lit(0)

    pay_t = build.select(pay).schema["__pay"].dataType
    probe_t = probe.select(probe_struct).schema["__probe"].dataType
    tb_t = build.select(tb.alias("__tb")).schema["__tb"].dataType

    p = probe.select(
        F.col(key).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__side"),  # probe sorts after build at equal time
        F.lit(None).cast(pay_t).alias("__pay"),
        probe_struct,
        F.lit(None).cast(tb_t).alias("__tb"),
    )
    b = build.select(
        F.col(key).alias("__k"),
        F.col(build_time).alias("__t"),
        F.lit(0).alias("__side"),
        pay,
        F.lit(None).cast(probe_t).alias("__probe"),
        tb.alias("__tb"),
    )

    def _w(desc: bool):
        # nulls FIRST in both orders: a null-time probe must see no build
        t_ord = (
            F.col("__t").desc_nulls_first()
            if desc
            else F.col("__t").asc_nulls_first()
        )
        return (
            Window.partitionBy("__k")
            .orderBy(t_ord, F.col("__side").asc(), F.col("__tb").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    merged = p.unionByName(b)
    if direction in ("backward", "nearest"):
        merged = merged.withColumn(
            "__m_b", F.last("__pay", ignorenulls=True).over(_w(desc=False))
        )
    if direction in ("forward", "nearest"):
        merged = merged.withColumn(
            "__m_f", F.last("__pay", ignorenulls=True).over(_w(desc=True))
        )
    merged = merged.filter(F.col("__side") == 1)

    def _within(m: Column, dist: Column) -> Column:
        if tolerance is None:
            return m
        return F.when(dist <= F.lit(tolerance), m)

    if direction == "backward":
        matched = _within(F.col("__m_b"), F.col("__t") - F.col("__m_b")["__bt"])
    elif direction == "forward":
        matched = _within(F.col("__m_f"), F.col("__m_f")["__bt"] - F.col("__t"))
    else:
        mb = _within(F.col("__m_b"), F.col("__t") - F.col("__m_b")["__bt"])
        mf = _within(F.col("__m_f"), F.col("__m_f")["__bt"] - F.col("__t"))
        d_b = F.col("__t") - mb["__bt"]
        d_f = mf["__bt"] - F.col("__t")
        matched = F.when(
            mb.isNotNull() & (mf.isNull() | (d_b <= d_f)), mb
        ).otherwise(mf)
    merged = merged.withColumn("__matched", matched)
    if how == "inner":
        merged = merged.filter(F.col("__matched").isNotNull())
    return merged.select(
        *[F.col("__probe")[c].alias(c) for c in probe_cols],
        *[F.col("__matched")[c].alias(c) for c in build_cols],
    )


def salted_join(
    big: DataFrame,
    skewed_dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe equi-join: spread each hot key of `big` across
    `salt_buckets` sub-keys and replicate the (small) `skewed_dim` side per
    bucket. Turns one straggler partition into `salt_buckets` even ones.

    AQE's skew-join handles sort-merge skew automatically; salting is the
    explicit fallback for aggregations-after-join and for pre-AQE plans.

    `how` is restricted to inner/left: the result then equals the plain
    join (the salt is internal). For right/full outer, an unmatched dim row
    would surface once PER SALT REPLICA (salt_buckets duplicate
    null-extended rows) — so those modes are rejected rather than silently
    wrong.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "outer-dim modes would emit one row per salt replica for "
            "unmatched dim keys"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    salted_dim = skewed_dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(salted_dim, [on, "__salt"], how).drop("__salt")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Column | None = None,
) -> DataFrame:
    """Interval join `right_lo <= left_val < right_hi` without a nested-loop:
    explode each right interval into the integer buckets it spans, equi-join
    on bucket, then apply the exact range predicate. Bucket width should
    approximate the median interval length."""
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / bucket_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    cond = (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) < F.col(right_hi))
    if extra_on is not None:
        cond = cond & extra_on
    return lb.join(rb, on=["__bucket"], how="inner").filter(cond).drop("__bucket")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Keyed point-in-interval containment join — 'which session/incident
    window contains this event' — as HASH equi-joins, never the
    BroadcastNestedLoopJoin Spark plans for a raw BETWEEN theta join.

    Each interval explodes to the epoch buckets it touches
    (floor(start/b)..floor(end/b)); each point computes its single
    bucket; the join runs on (key, bucket) and the exact containment
    predicate filters the co-bucketed candidates. Per-bucket work is
    |points in bucket| x |intervals touching bucket| for the SAME key —
    the banding idea (range_join_bucketed above) specialized to
    timestamped intervals with key equality.

    `bucket_seconds` should match interval-length scale: day buckets for
    session-like intervals; a pathological months-long interval explodes
    to ~length/bucket rows (documented tradeoff — for mostly-open-ended
    intervals use the as-of join instead). NULL keys/times match nothing
    (the engine-wide as-of contract).
    """
    bs = int(bucket_seconds)
    pb = points.filter(
        F.col(key_col).isNotNull() & F.col(time_col).isNotNull()
    ).withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(time_col)) / bs).cast("long")
    )
    ib = (
        intervals.filter(
            F.col(key_col).isNotNull()
            & F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
        )
        .withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start_col)) / bs).cast("long"),
                    F.floor(F.unix_timestamp(F.col(end_col)) / bs).cast("long"),
                )
            ),
        )
    )
    return (
        pb.join(ib, on=[key_col, "__b"], how="inner")
        .filter(
            (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) <= F.col(end_col))
        )
        .drop("__b")
    )


#: Allen's 13 interval relations, in the CASE-cascade order both the
#: engine and the SQL oracle evaluate them (first match wins — the order
#: only matters for DEGENERATE point intervals s == e, where several
#: relations can hold simultaneously; for proper intervals the 13 are
#: mutually exclusive and exhaustive, Allen 1983).
ALLEN_RELATIONS = (
    ("equals", "sa = sb AND ea = eb"),
    ("starts", "sa = sb AND ea < eb"),
    ("started_by", "sa = sb AND ea > eb"),
    ("finishes", "ea = eb AND sa > sb"),
    ("finished_by", "ea = eb AND sa < sb"),
    ("meets", "ea = sb"),
    ("met_by", "sa = eb"),
    ("precedes", "ea < sb"),
    ("preceded_by", "sa > eb"),
    ("during", "sa > sb AND ea < eb"),
    ("contains", "sa < sb AND ea > eb"),
    ("overlaps", "sa < sb AND sb < ea AND ea < eb"),
    ("overlapped_by", "sb < sa AND sa < eb AND eb < ea"),
)


def allen_relation(sa: Column, ea: Column, sb: Column, eb: Column) -> Column:
    """Classify interval a = [sa, ea] against b = [sb, eb] into one of
    Allen's 13 relations (Allen 1983, "Maintaining Knowledge about
    Temporal Intervals"). Pure integer comparisons in a FIXED cascade —
    identical in any engine; the SQL twin is built from the same
    ALLEN_RELATIONS table, so engine and oracle agree even on degenerate
    point intervals, where the cascade order is the tie-break."""
    cols = {"sa": sa, "ea": ea, "sb": sb, "eb": eb}

    def cond(expr: str) -> Column:
        out = None
        for clause in expr.split(" AND "):
            lhs, op, rhs = clause.split(" ")
            a, b = cols[lhs], cols[rhs]
            c = {"=": a == b, "<": a < b, ">": a > b}[op]
            out = c if out is None else (out & c)
        return out

    out = None
    for name, e in ALLEN_RELATIONS:
        c = F.when(cond(e), F.lit(name))
        out = c if out is None else out.when(cond(e), F.lit(name))
    return out


def allen_relation_sql(sa: str, ea: str, sb: str, eb: str) -> str:
    """The DuckDB twin of allen_relation: a CASE built from the SAME
    ALLEN_RELATIONS cascade, so both engines classify identically."""
    import re

    subst = {"sa": sa, "ea": ea, "sb": sb, "eb": eb}
    arms = []
    for name, e in ALLEN_RELATIONS:
        # one-pass word-boundary substitution: a caller's column name may
        # itself contain 'sa'/'ea' etc., so sequential str.replace could
        # corrupt already-substituted text
        cond = re.sub(r"\b(sa|ea|sb|eb)\b", lambda m: subst[m.group(1)], e)
        arms.append(f"WHEN {cond} THEN '{name}'")
    return "CASE " + " ".join(arms) + " END"


def allen_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    start_a: str = "s_a",
    end_a: str = "e_a",
    start_b: str = "s_b",
    end_b: str = "e_b",
) -> DataFrame:
    """Allen interval-algebra join: keyed equi-join of two interval sets,
    each output pair labeled with its Allen relation
    (`allen_relation`). Both inputs carry (key_col, start, end) with the
    column names given; NULL keys/bounds are dropped on both sides (an
    unbounded interval has no Allen class; NULL keys never equi-join in
    SQL and must not pair here either — the attribution lesson).

    Scale shape: ONE hash equi-join on key_col (AQE may broadcast a
    small side) — never a time cross-join; the per-key pair fanout is
    the caller's contract (bounded key groups, e.g. activity-type spans
    per user). For UN-keyed interval sets, bucketize time first
    (range_join's machinery) and feed the bucket as key_col — only
    intersecting relations survive bucket-local pairing then.
    """
    lf = left.filter(
        F.col(key_col).isNotNull()
        & F.col(start_a).isNotNull()
        & F.col(end_a).isNotNull()
    )
    rf = right.filter(
        F.col(key_col).isNotNull()
        & F.col(start_b).isNotNull()
        & F.col(end_b).isNotNull()
    )
    return lf.join(rf, key_col).withColumn(
        "relation",
        allen_relation(
            F.col(start_a), F.col(end_a), F.col(start_b), F.col(end_b)
        ),
    )


def allen_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    bucket_ms: int,
    start_a: str = "s_a",
    end_a: str = "e_a",
    start_b: str = "s_b",
    end_b: str = "e_b",
) -> DataFrame:
    """Allen interval-algebra join for UN-keyed interval sets — the
    bucketized generalization `allen_join`'s docstring promises. Two
    disjoint intervals are unbounded in number (every session precedes
    every later incident), so only INTERSECTING-OR-TOUCHING pairs are
    classifiable output: s_a <= e_b AND s_b <= e_a, i.e. every Allen
    relation except precedes/preceded_by. Every such pair shares at
    least one `bucket_ms` time bucket, so the plan is: explode each
    interval to its bucket range (fan-out = interval length / bucket),
    ONE hash equi-join on the bucket, dropDuplicates for multi-bucket
    matches, then the row-local relation CASE and the disjoint-label
    filter (a same-bucket pair can still be disjoint inside the
    bucket). Never a cross-join or nested loop.

    Scale: pick bucket_ms near the typical interval length — larger
    buckets cut explode fan-out but grow per-bucket pair counts (a hot
    bucket is a skew key; AQE skew-join splits it). Bucket indices use
    the FLOOR-division pmod identity so negative epochs bucket
    correctly (the twap_hourly lesson)."""

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        lo = F.expr(f"({s} - pmod({s}, {bucket_ms})) DIV {bucket_ms}")
        hi = F.expr(f"({e} - pmod({e}, {bucket_ms})) DIV {bucket_ms}")
        return df.filter(
            F.col(s).isNotNull() & F.col(e).isNotNull()
        ).withColumn("__b", F.explode(F.sequence(lo, hi)))

    pairs = (
        bucketed(left, start_a, end_a)
        .join(bucketed(right, start_b, end_b), "__b")
        .drop("__b")
        .dropDuplicates()
    )
    return pairs.withColumn(
        "relation",
        allen_relation(
            F.col(start_a), F.col(end_a), F.col(start_b), F.col(end_b)
        ),
    ).filter(~F.col("relation").isin("precedes", "preceded_by"))
