"""Deduplication operators for the 100 TB training-data pipeline
(BASELINE.json north_star): exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup, and exact substring-span dedup.

Scale design notes
------------------
* exact        — md5-groupBy: one shuffle keyed on the fingerprint; skew-safe
                 (identical docs hash to one key — bounded by dup-group size).
* n-gram       — inverted-index self-join on shingles. Cost is
                 Σ_shingle df(shingle)², so shingles must be selective:
                 word-k-grams (default k=5), never char-3-grams over a small
                 vocabulary. At 100 TB add the MinHash prefilter first.
* MinHash+LSH  — signatures via xxhash64 (Spark-native, deterministic) and
                 universal hashing h_i(x) = (a_i*x + b_i) mod p; banding →
                 candidate pairs only within equal band-buckets. This is the
                 scale path: join fan-out is per-bucket, not per-corpus.
* SimHash      — 64-bit sign-sketch of word-hash vectors; pairs within
                 Hamming ≤ r found by pigeonhole banding over bit-chunks.
* embedding    — blocked cosine: candidate pairs restricted to equal blocks
                 (caller-supplied blocking key, e.g. LSH bucket or cluster
                 label); exact cosine computed JVM-side in double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.functions import cosine_similarity
from buskafkasparkstreaming_spark.operators.text import normalize, words

MERSENNE_P = (1 << 61) - 1


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition on the doc id before per-row-heavy expressions.

    A small corpus often arrives as ONE file split (a single task would do
    all the shingling/hashing); on a real cluster the input has many splits
    but may still be skewed. One cheap row-shuffle buys full parallelism
    for the expensive expression stage that follows. The partition count is
    explicit — AQE coalesces un-numbered repartitions of small inputs right
    back to one partition, defeating the point."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(id_col))


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Group identical (normalized) texts; keep the smallest id as canonical.

    Returns one row per distinct fingerprint: (fingerprint, keep_id, n_dups).
    """
    # no _spread here: md5 is cheap and the groupBy shuffles anyway
    return (
        df.select(F.md5(normalize(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dups"),
        )
    )


def word_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct word-k-gram shingles of a text column (array<string>).

    NULL/empty/whitespace text yields an EMPTY array — contentless docs
    have no shingles, so they never enter any pair computation. Without
    the guard the engines diverge on drifted data: Spark's concat_ws
    swallows the NULL into a '' shingle that then pairs every contentless
    doc with every other, while the SQL oracle's unnest drops NULL rows
    (caught by tests/test_driver_robustness.py::test_null_text_drift)."""
    c = F.col(col) if isinstance(col, str) else col
    ws = words(c)
    n = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    sh = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, k)))
    )
    return F.when(
        F.coalesce(F.trim(c), F.lit("")) == "", F.array().cast("array<string>")
    ).otherwise(sh)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) >= threshold.

    Inverted-index plan: explode distinct shingles -> self-equi-join on
    the shingle (hash shuffle, NOT a cross join; both sides are the same
    subtree, so exchange reuse shuffles it once) -> count common shingles
    per pair (map-side partial agg, fully pipelined in whole-stage
    codegen) -> Jaccard from per-doc shingle counts (broadcast).
    Output: (id_a, id_b, jaccard).

    Scale control (`max_df`): the self-join's cost is Sum_shingle df^2 — a
    stop-word-like shingle appearing in 1% of a 10^9-doc corpus alone
    produces 10^14 join rows, so the raw index cannot survive corpus
    growth (measured 8.6x time at 10x docs in SCALE.md round 1). With
    `max_df` set, shingles above the cap are treated as stop-shingles and
    DROPPED from the index — the standard near-dup practice (their
    discriminative value is ~0: sharing boilerplate is not evidence of
    duplication) — via an anti-join against the high-df shingle set (Zipf
    guarantees that set is small — AQE converts the anti-join to a
    broadcast at runtime from its measured size; a static broadcast hint
    here measurably DEFEATS exchange reuse across the self-join sides,
    quadrupling the explode/shuffle pipeline).
    Per-shingle join fan-out is then bounded at max_df^2 (<=10^6 rows for
    the default cap: one task pipelines that straight into the partial
    aggregate; AQE skew-split covers uneven shingle buckets), and BOTH the
    common-shingle count and the per-doc sizes count only sub-cap
    shingles, so the reported value is the exact Jaccard over the
    discriminative (IDF-filtered) vocabulary. On a corpus where no
    shingle exceeds the cap this is bit-identical to the exhaustive
    result; `max_df=None` disables the filter.
    """
    sh = _spread(df, id_col).select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, k)).alias("__s")
    ).select("doc", F.xxhash64("__s").alias("sh"))  # 8-byte key, not the string

    if max_df is not None:
        high_sh = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("sh")
        )
        low = sh.join(high_sh, "sh", "left_anti")
        # per-doc sizes over the SAME filtered stream (docs whose every
        # shingle is boilerplate drop out here — they can produce no pairs
        # anyway), keeping the plan a narrow DAG over `low`: one explode
        # subtree feeding three exchanges, nothing recomputed inside
        # broadcast builds
        sizes = low.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    else:
        low = sh
        # per-doc distinct-shingle counts straight off the scan — no
        # explode, no shuffle; broadcast into the final Jaccard join
        sizes = _spread(df, id_col).select(
            F.col(id_col).alias("doc"),
            F.size(word_shingles(text_col, k)).alias("n_sh"),
        )

    common = (
        low.alias("a")
        .join(low.alias("b"), on="sh")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # no static broadcast hint on `sizes`: it is one row PER DOCUMENT, so
    # at 10⁹ docs a forced broadcast OOMs the driver/executors — AQE
    # picks broadcast when the runtime size fits and shuffle-join on the
    # doc id otherwise (the same static-hints-backfire rationale as the
    # max_df anti-join above)
    return (
        common.join(sizes.withColumnRenamed("doc", "id_a"), "id_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc", "id_b"), "id_b")
        .withColumnRenamed("n_sh", "n_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    (a_i * xxhash64(shingle) + b_i) mod p. Deterministic (fixed seed → fixed
    a_i/b_i; xxhash64 is stable), fully JVM-side via nested array transforms.
    Output: (id, sig: array<bigint>)."""
    import random

    rnd = random.Random(seed)
    # a, b and the shingle hash all live below 2^31 so a*x+b stays < 2^63
    # (no long overflow inside the JVM expression).
    m31 = (1 << 31) - 1
    coeffs = [(rnd.randrange(1, m31), rnd.randrange(0, m31)) for _ in range(num_hashes)]

    # explode shingles once, hash once, then take the num_hashes mins as a
    # partial-aggregable groupBy — each shingle is hashed exactly once and
    # the min-combine happens map-side, so the shuffle carries only
    # (id, 32 longs) per doc. (A nested array-expression formulation gets
    # re-inlined by Catalyst's project collapse and recomputes the shingle
    # hashes num_hashes times — measured 100+ s vs ~2 s at 5k docs.)
    # SQL-string aggs (one parse) instead of nested Column builders — the
    # 32-expression Column form cost ~1 s of py4j round-trips per build
    # (see simhash_sketch); identical analyzed plan either way
    sh = _spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("s")
    ).select("id", F.pmod(F.xxhash64("s"), F.lit(m31)).alias("x"))
    aggs = [
        F.expr(f"min(pmod({a}L * x + {b}L, {m31}L))").alias(f"__h{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        sh.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("sig"))
    )


def _banded(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Explode a signature frame into (id, sig, band, bucket) rows — the
    LSH index representation. Banding runs as one SQL-string expr (single
    parse; see simhash_sketch on why — the Column form paid ~1 band ×
    struct py4j build cost)."""
    band_structs = ", ".join(
        f"named_struct('band', {i}, 'bucket', "
        f"xxhash64(concat_ws(',', transform("
        f"slice(sig, {i * rows_per_band + 1}, {rows_per_band}), "
        f"x -> cast(x as string)))))"
        for i in range(bands)
    )
    return signatures.selectExpr(
        "id", "sig", f"explode(array({band_structs})) as bb"
    ).select("id", "sig", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing ≥1 band bucket.

    Join key is (band_index, hash(band slice)) — shuffle fan-out bounded by
    bucket occupancy, never all-pairs. Output: (id_a, id_b, est_jaccard)
    where est_jaccard = fraction of matching signature positions.
    """
    banded = _banded(signatures, bands, rows_per_band)
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    n = F.size("sig_a")
    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    return pairs.select(
        "id_a", "id_b", (matches.cast("double") / n.cast("double")).alias("est_jaccard")
    )


_HEXCHARS = "0123456789abcdef"


def simhash_sketch(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc as a 16-char lowercase hex string: bit j of
    the sketch = 1 iff more word-hashes have bit j set than not, where the
    word hash is the first 64 bits of md5(word). Output: (id, simhex).

    Single-pass plan (VERDICT r2 §wrong 2 — the old form re-traversed the
    word array once per bit, 64 interpreted higher-order evals per row):
    explode words once → 16 hex-digit ints per word → ONE groupBy with 64
    partial-aggregable bit-count sums (map-side combine; the shuffle
    carries 65 longs per doc) → majority vote folds back into hex.

    md5 (not xxhash64) on purpose: md5 hex is bit-identical in every
    engine, so the whole sketch — and the pair set derived from it — is
    replayable by the DuckDB oracle as a full hash check instead of a
    rows-only sketch entry."""
    # The wide expressions below are built as SQL strings (one F.expr parse
    # each) rather than nested Column operators: the Column form issued
    # ~400 py4j round-trips per build — measured 1.5-3 s of DRIVER-side
    # DataFrame construction per query, more than the 1.3 s the whole
    # cluster-side execution takes. String-built SQL is parsed once JVM-side
    # and produces the IDENTICAL analyzed plan (same functions, same order),
    # so the oracle's full-hash replay is unaffected.
    ex = _spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("__w")
    )
    # two string parses per word, not 16: the 64 hash bits as two unsigned
    # 32-bit halves (each fits a long), bit extraction is then pure integer
    # shift/mask inside the partial aggregate
    halves = ex.selectExpr(
        "id",
        "cast(conv(substring(md5(__w), 1, 8), 16, 10) as bigint) as __hi",
        "cast(conv(substring(md5(__w), 9, 8), 16, 10) as bigint) as __lo",
    )

    def word_bit(j: int) -> str:
        # bit j (0 = LSB of the 64-bit hash): bits 63..32 live in __hi
        src, off = ("__hi", j - 32) if j >= 32 else ("__lo", j)
        return f"(shiftright({src}, {off}) & 1)"

    sums = halves.groupBy("id").agg(
        F.expr("count(1)").alias("__n"),
        *[F.expr(f"sum{word_bit(j)}").alias(f"__s{j}") for j in range(64)],
    )

    def bit(j: int) -> str:
        return f"(case when __s{j} * 2 > __n then 1 else 0 end)"

    digits = [
        f"substring('{_HEXCHARS}', "
        f"{bit(4 * (16 - p) + 3)} * 8 + {bit(4 * (16 - p) + 2)} * 4 + "
        f"{bit(4 * (16 - p) + 1)} * 2 + {bit(4 * (16 - p))} + 1, 1)"
        for p in range(1, 17)
    ]
    return sums.selectExpr("id", f"concat({', '.join(digits)}) as simhex")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via pigeonhole
    banding: split the 64-bit sketch into `chunks` equal chunks; any pair
    within Hamming ≤ chunks-1 shares ≥1 exact chunk → equi-join on
    (chunk_index, chunk_value), then exact Hamming filter.
    Output: (id_a, id_b, hamming).

    Recall guarantee: FULL only for max_hamming ≤ chunks − 1 (pigeonhole);
    beyond that, pairs are found only if they happen to share a chunk.
    Raises unless the threshold is inside the guarantee or the caller
    explicitly opts into partial recall."""
    if max_hamming > chunks - 1 and not allow_partial_recall:
        raise ValueError(
            f"banding with chunks={chunks} guarantees recall only for "
            f"Hamming <= {chunks - 1}, but max_hamming={max_hamming}; raise "
            "chunks, lower max_hamming, or pass allow_partial_recall=True"
        )
    if 16 % chunks != 0:
        raise ValueError(
            f"chunks={chunks} must divide the 16 hex digits of the sketch "
            "(use 1, 2, 4, 8, or 16)"
        )
    sh = simhash_sketch(df, id_col, text_col)
    width_hex = 16 // chunks
    # parse the hex sketch back to two 32-bit halves ONCE PER DOC: the
    # candidate join can fan out quadratically inside dup clusters, and
    # per-PAIR hex parsing (32 string convs) would dominate there — with
    # halves carried through the join, Hamming is two bit_count(xor) long
    # ops per pair
    chunk_structs = ", ".join(
        f"named_struct('chunk', {i}, 'val', "
        f"substring(simhex, {i * width_hex + 1}, {width_hex}))"
        for i in range(chunks)
    )
    chunked = sh.selectExpr(
        "id",
        "cast(conv(substring(simhex, 1, 8), 16, 10) as bigint) as hi",
        "cast(conv(substring(simhex, 9, 8), 16, 10) as bigint) as lo",
        f"explode(array({chunk_structs})) as cc",
    ).select("id", "hi", "lo", "cc.chunk", "cc.val")
    # explicit shuffle on the join key BEFORE the self-join: both join
    # sides become the identical exchange, which ReuseExchange dedupes —
    # without it the (expensive) sketch subtree is computed once per side
    # (measured ~30% of the query; AQE's broadcast choice defeats reuse,
    # and an un-numbered repartition lets AQE re-plan each side
    # independently, which ALSO breaks reuse — verified: the sketch ran
    # twice and the query slowed ~2×)
    n = df.sparkSession.sparkContext.defaultParallelism
    chunked = chunked.repartition(n, F.col("chunk"), F.col("val"))
    ham = (
        F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
        + F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
    ).cast("long")
    # the Hamming filter runs BEFORE the pair-dedup exchange: it is
    # map-side-pipelined off the join, so only actual near-dup pairs
    # shuffle for dedup (a pair colliding in several chunks has the same
    # Hamming everywhere — dropping duplicates after filtering is
    # equivalent, and the candidate fan-out inside dup clusters never
    # reaches the wire)
    return (
        chunked.alias("a")
        .join(chunked.alias("b"), on=["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
    unique_blocks: bool = False,
) -> DataFrame:
    """Cosine near-dup pairs within blocks: equi-join on `block_col` (an LSH
    bucket / cluster label / shard key), exact double-precision cosine on
    survivors. Output: (id_a, id_b, cos_sim).

    Set `unique_blocks=True` when each row carries exactly ONE block (a
    partition-style label, e.g. nprobe=1 cluster assignment): a pair can
    then meet in at most one block, and the pair-dedup — an exchange that
    drags both embedding vectors through a sort-aggregate — is skipped
    entirely (~40% of the stage cost measured at sf0.1). Leave False for
    multi-table LSH, where a pair colliding in several tables must be
    deduped BEFORE the cosine so the expensive part runs once per pair."""
    from buskafkasparkstreaming_spark.functions import dot_product

    # self-dots precomputed ONCE PER DOC on each join side: the higher-
    # order-function fold is interpreted (not codegen), and computing
    # dot(v,v) per PAIR made the cosine stage ~3x more expensive. The
    # value is the identical fold over the identical array, so results
    # are bit-unchanged.
    lhs = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        dot_product(vec_col, vec_col).alias("__na"),
    )
    rhs = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        dot_product(vec_col, vec_col).alias("__nb"),
    )
    joined = lhs.join(rhs, on="blk").filter(F.col("id_a") < F.col("id_b"))
    if unique_blocks:
        # no dedup needed — but DO spread the pairs before the CPU-bound
        # cosine: the block join keys on few distinct blocks and AQE
        # coalesces its output by BYTES, leaving the arithmetic on a
        # couple of cores (measured 2/32 busy at sf0.1). A plain exchange
        # on the pair key is strictly cheaper than the sort-aggregate the
        # dedup would pay, and restores full parallelism.
        n = df.sparkSession.sparkContext.defaultParallelism
        joined = joined.repartition(n, F.col("id_a"), F.col("id_b"))
    else:
        # a pair can collide in several blocks (multi-table LSH): dedup
        # BEFORE the cosine so the expensive part runs once per pair
        joined = joined.dropDuplicates(["id_a", "id_b"])
    cos = dot_product("v_a", "v_b") / F.sqrt(F.col("__na") * F.col("__nb"))
    return (
        joined.withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Near-dup PAIRS → dedup CLUSTERS: (node, comp) where `comp` is the
    minimum node id reachable from `node` — the union-find step every
    dedup pipeline needs between "found similar pairs" and "kept one
    canonical doc per group".

    Two-tier execution, switched on the MEASURED edge count (one count()
    on the persisted edge frame — no extra scan):

    * ≤ `driver_max_edges` (default 10⁶ ≈ 16 MB of id pairs — the same
      metadata-sized-collect class as a broadcast-side build): collect
      once and run path-compressed union-find on the driver. The
      distributed loop pays per-round scheduling for several micro-stage
      jobs; on a thousand-edge graph that is ~10 s of pure overhead vs
      ~milliseconds of actual work (measured at sf0.1 — SCALE.md). Near-
      dup pair sets are usually tiny relative to the corpus, so this is
      the common path even at 100 TB.
    * above the cap: distributed min-label propagation with pointer
      jumping (path halving) — each round a node adopts the smallest
      label in its closed neighborhood, then labels chase their own
      label's label, so label paths halve every round and convergence is
      O(log diameter) rounds, not O(diameter). Driver-side loop (the
      MLlib/GraphX pattern) with an eager localCheckpoint per round to
      keep lineage flat (see below), early-stopping at the fixpoint.

    Both tiers reach the same unique fixpoint (component-wide min), so
    the result is deterministic and oracle-checkable regardless of tier.
    Nodes that appear in no pair are absent — callers left-join and
    coalesce to the node's own id.

    Each distributed round ends in an EAGER `localCheckpoint`: the label frame is
    bounded (one row per node) but its un-truncated lineage QUADRUPLES
    per round (the pointer-jump self-joins `labels` twice), and by ~10
    rounds merely rendering the plan string OOMs the driver —
    AdaptiveSparkPlanExec builds the explain string eagerly on every plan
    update, so a persist alone (which dedups execution but not the
    logical plan) does not survive. Checkpointing materializes the rows
    and resets the plan to a leaf, keeping every round's plan O(1). The
    returned frame is therefore checkpoint-backed; its blocks are freed
    by the ContextCleaner when the frame is garbage collected. If the
    loop exhausts `max_iter` before the fixpoint, labels may be
    partially merged — a UserWarning is raised (with path halving,
    25 rounds cover components of diameter ~2^25; hitting the warning
    means the edge set is pathological, so raise `max_iter`).
    """
    import warnings
    # persist the projected pair list FIRST: the two union branches below
    # are column-swapped copies of the same subtree, which Catalyst cannot
    # exchange-reuse — without this cache an expensive candidate-pair
    # pipeline upstream is computed twice in one job (measured 2x the
    # whole stage cost at sf0.1)
    p = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).persist()
    edges = (
        p.unionByName(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    n_edges = edges.count()  # materializes both caches
    if n_edges <= driver_max_edges:
        try:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for row in edges.collect():  # bounded by the cap (~16 MB); one
                # fetch — toLocalIterator would pay per-partition RPCs
                s, d = row[0], row[1]
                if s not in parent:
                    parent[s] = s
                if d not in parent:
                    parent[d] = d
                rs, rd = find(s), find(d)
                if rs != rd:
                    parent[rd] = rs
            comp_min: dict = {}
            for node in parent:
                r = find(node)
                m = comp_min.get(r)
                if m is None or node < m:
                    comp_min[r] = node
            out_schema = (
                f"node {dict(p.dtypes)['src']}, comp {dict(p.dtypes)['src']}"
            )
            return pairs.sparkSession.createDataFrame(
                [(n, comp_min[find(n)]) for n in parent], out_schema
            )
        finally:
            edges.unpersist()
            p.unpersist()
    try:
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
            .localCheckpoint()  # eager: flat-plan leaf for the loop below
        )
        converged = False
        for _ in range(max_iter):
            nbr_min = (
                edges.join(labels.withColumnRenamed("node", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("comp").alias("__nc"))
                .withColumnRenamed("src", "node")
            )
            prop = labels.join(nbr_min, "node", "left").select(
                "node", F.least("comp", F.coalesce("__nc", "comp")).alias("comp")
            )
            hop = prop.select(F.col("node").alias("__cn"), F.col("comp").alias("__cc"))
            jumped = (
                prop.join(hop, prop["comp"] == hop["__cn"], "left")
                .select("node", F.coalesce("__cc", "comp").alias("comp"))
                .localCheckpoint()  # eager: truncate this round's lineage
            )
            changed = (
                jumped.withColumnRenamed("comp", "__new")
                .join(labels, "node")
                .filter(F.col("__new") != F.col("comp"))
                .limit(1)
                .count()
            )
            # the superseded round's checkpoint blocks are released by the
            # ContextCleaner once `labels` drops the reference (persist
            # bookkeeping is gone — checkpoints expose no unpersist)
            labels = jumped
            if changed == 0:
                converged = True
                break
        if not converged:
            warnings.warn(
                f"connected_components exhausted max_iter={max_iter} before "
                "the fixpoint — returned components may be partially merged; "
                "raise max_iter",
                stacklevel=2,
            )
        return labels
    finally:
        edges.unpersist()
        p.unpersist()


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 5,
    min_containment: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination check: corpus docs that CONTAIN a large
    fraction of some benchmark/eval doc's shingles. The leakage gate an
    LLM training pipeline runs before training: containment(A, B) =
    |shingles(A) ∩ shingles(B)| / |shingles(B)| with B the benchmark doc,
    so a short eval prompt embedded verbatim in a long crawl doc still
    scores 1.0 (plain Jaccard would dilute it to ~0).

    Plan shape for a 100 TB corpus vs a ~MB benchmark set: the benchmark
    side (exploded shingles + per-doc sizes) is BROADCAST; the corpus is
    scanned once, shingled in place, hash-joined map-side, and only the
    (tiny) matching pair stream shuffles for the per-pair overlap count.
    Output: (corpus_id, bench_id, n_overlap, containment).
    """
    c_sh = _spread(corpus, corpus_id).select(
        F.col(corpus_id).alias("__cid"),
        F.explode(word_shingles(text_col, k)).alias("__s"),
    )
    b_sh = benchmark.select(
        F.col(bench_id).alias("__bid"),
        F.explode(word_shingles(bench_text_col, k)).alias("__s"),
    )
    b_sizes = benchmark.select(
        F.col(bench_id).alias("__bid"),
        F.size(word_shingles(bench_text_col, k)).alias("__bn"),
    )
    overlap = (
        c_sh.join(F.broadcast(b_sh), "__s")
        .groupBy("__cid", "__bid")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        overlap.join(F.broadcast(b_sizes), "__bid")
        .withColumn(
            "containment",
            F.col("n_overlap").cast("double") / F.col("__bn").cast("double"),
        )
        .filter(F.col("containment") >= min_containment)
        .select(
            F.col("__cid").alias(corpus_id),
            F.col("__bid").alias(bench_id),
            "n_overlap",
            "containment",
        )
    )


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k_hashes: int = 5
) -> list[int]:
    """Distributed Bloom-filter BUILD over a key column: each key sets
    `k_hashes` bit positions `pmod(xxhash64(key, j), m_bits)`; the bitmap
    is assembled as int64 words with a `bit_or` aggregate (map-side
    combinable — the shuffle carries at most `m_bits/64` partial words per
    input partition, independent of key count). The finished bitmap —
    `m_bits/64` longs, e.g. 8 KiB for m=2^16 — is collected to the driver
    for literal embedding into probe plans; its size is a CONSTANT of the
    filter, not of the data, so this is a bounded driver transfer like a
    centroid set, not a `.collect()` of data rows.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits))
                    for j in range(k_hashes)
                ]
            )
        ).alias("__p")
    )
    words_df = pos.select(
        (F.col("__p") / 64).cast("long").alias("__w"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("__p") % 64).cast("int")
        ).alias("__m"),
    ).groupBy("__w").agg(F.bit_or("__m").alias("__bits"))
    bitmap = [0] * (m_bits // 64)
    for row in words_df.collect():
        bitmap[row["__w"]] = row["__bits"]
    return bitmap


def bloom_probe(
    col: Column | str,
    bitmap: list[int],
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> Column:
    """Row-local Bloom membership test (maybe-present ⇒ true; definitely
    absent ⇒ false — NO false negatives). The bitmap rides into the plan as
    a literal array, so the probe is a pure JVM bit test per row: no join,
    no shuffle, no Python. This is the 100 TB pattern for `big stream ∩
    small-ish set`: the stream is filtered in place at scan parallelism and
    only survivors reach any downstream join."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(w) for w in bitmap])
    checks = []
    for j in range(k_hashes):
        p = F.pmod(F.xxhash64(c, F.lit(j)), F.lit(m_bits))
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for chk in checks[1:]:
        out = out & chk
    return out


def contamination_pairs_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 5,
    min_containment: float = 0.5,
    m_bits: int = 1 << 16,
    k_hashes: int = 5,
) -> DataFrame:
    """`contamination_pairs` with a Bloom pre-filter on the corpus shingle
    stream. Semantically IDENTICAL output (same oracle SQL): the Bloom
    filter has no false negatives, so every truly-overlapping shingle
    survives the pre-filter, and false positives are removed by the exact
    equi-join that follows — the filter only prunes join INPUT, never
    changes join OUTPUT.

    Why this matters at 100 TB: in `contamination_pairs` every corpus
    shingle is hashed against the broadcast benchmark table; with the Bloom
    gate, the overwhelmingly-common case (shingle not in any benchmark doc)
    is rejected by a few bit tests inside the scan stage — the hash join
    only sees the ~0.01% of shingles that might match. The bitmap is ~8 KiB
    vs a broadcast hash table of every benchmark shingle string.
    """
    bitmap = bloom_bitmap(
        benchmark.select(
            F.explode(word_shingles(bench_text_col, k)).alias("__s")
        ).distinct(),
        "__s",
        m_bits,
        k_hashes,
    )
    c_sh = _spread(corpus, corpus_id).select(
        F.col(corpus_id).alias("__cid"),
        F.explode(word_shingles(text_col, k)).alias("__s"),
    ).filter(bloom_probe("__s", bitmap, m_bits, k_hashes))
    b_sh = benchmark.select(
        F.col(bench_id).alias("__bid"),
        F.explode(word_shingles(bench_text_col, k)).alias("__s"),
    )
    b_sizes = benchmark.select(
        F.col(bench_id).alias("__bid"),
        F.size(word_shingles(bench_text_col, k)).alias("__bn"),
    )
    overlap = (
        c_sh.join(F.broadcast(b_sh), "__s")
        .groupBy("__cid", "__bid")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        overlap.join(F.broadcast(b_sizes), "__bid")
        .withColumn(
            "containment",
            F.col("n_overlap").cast("double") / F.col("__bn").cast("double"),
        )
        .filter(F.col("containment") >= min_containment)
        .select(
            F.col("__cid").alias(corpus_id),
            F.col("__bid").alias(bench_id),
            "n_overlap",
            "containment",
        )
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring-level duplication: maximal word spans that occur
    verbatim in >= `min_docs` distinct documents — the substring-granular
    dedup of an LLM training pipeline (doc-level dedup misses boilerplate
    headers/footers and quoted passages; removing duplicated SPANS is the
    Lee et al. 2022 'Deduplicating Training Data' operation, re-expressed
    relationally instead of via a suffix array, which has no distributed
    form).

    Plan: slide a `window`-word fingerprint over each doc (posexplode —
    row-local), md5 the window text, count DISTINCT docs per fingerprint
    (one partial-agg shuffle keyed by the hash — uniform, skew-free by
    construction), keep windows duplicated across >= min_docs docs, then
    merge OVERLAPPING duplicated windows per doc into maximal spans with
    the sessionize gap-break pattern (two window passes over ONE per-doc
    shuffle). No step is quadratic: cost is O(total words) + the
    duplicated-window subset; the all-pairs expansion of ngram_jaccard
    never happens because counting replaces pairing.

    md5 (not xxhash64) so the DuckDB oracle replays the fingerprints
    bit-identically. Output: (id, span_start, span_end, n_windows) with
    1-based inclusive word positions.

    Short docs (< window words) contribute their whole text as one
    window, mirroring `word_shingles`. NULL/empty/whitespace docs have no
    windows (same contract as `word_shingles` — contentless docs never
    pair; engines otherwise diverge on NULL propagation).
    """
    ws = words(text_col)
    df = df.filter(F.coalesce(F.trim(F.col(text_col)), F.lit("")) != "")
    grams = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(ws) - window + 1, F.lit(1))),
                lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i, window))),
            )
        ).alias("pos0", "fp"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), "fp")
    dup_fp = (
        grams.groupBy("fp")
        .agg(F.count_distinct("id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("fp")
    )
    dup_windows = grams.join(dup_fp, "fp").select("id", "pos")
    # overlap merge: windows [i, i+w-1] and [j, j+w-1] (i < j) overlap iff
    # j - i <= w - 1; a larger gap starts a new maximal span
    w_order = Window.partitionBy("id").orderBy(F.col("pos").asc())
    prev = F.lag("pos").over(w_order)
    brk = F.when(
        prev.isNull() | (F.col("pos") - prev > window - 1), F.lit(1)
    ).otherwise(F.lit(0))
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = dup_windows.withColumn("__span", F.sum(brk).over(w_cum))
    return spans.groupBy("id", "__span").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + window - 1).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select("id", "span_start", "span_end", "n_windows")


def remove_boilerplate_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_words: int = 3,
    min_docs: int = 3,
    broadcast_boiler: bool = True,
) -> DataFrame:
    """CCNet-style sub-document boilerplate REMOVAL (Wenzek et al. 2020,
    arXiv:1911.00359 §4.1 dedups corpora at paragraph-hash granularity):
    split each doc into fixed-size non-overlapping word chunks, count how
    many distinct docs each chunk occurs in, drop chunks occurring in >=
    `min_docs` docs, and REASSEMBLE the surviving chunks in original order.

    This is the production complement of `duplicated_spans`: spans REPORTS
    duplicated regions, this op emits the cleaned corpus a training
    pipeline actually feeds downstream (headers/footers/cookie banners
    recur across millions of pages; doc-level dedup never fires on them).

    Plan shape (scale notes): chunking is row-local (`transform` over a
    `sequence`, JVM codegen — no explode-then-regroup for the split);
    the distinct-doc count is ONE partial-agg shuffle keyed by chunk text
    (uniform by construction — md5-free because the chunk string itself is
    the key and the oracle must replay it); the boilerplate set is
    typically tiny relative to the corpus (it's the chunks shared by many
    docs), so it is broadcast back against the exploded chunks —
    `broadcast_boiler=False` for a pathological corpus whose boilerplate
    set exceeds the broadcast budget; reassembly is one per-doc shuffle
    (groupBy id) with an `array_sort(collect_list(struct))` ordered merge.

    Output: (id, clean_text, n_chunks, n_dropped) — one row per input doc,
    clean_text = '' when every chunk was boilerplate. NULL text is
    normalized to '' first: engines disagree on NULL propagation through
    the chunk pipeline (Spark concat_ws swallows the NULL into '', DuckDB
    array_to_string yields NULL), so the operator pins one semantic.
    """
    ws = words(F.coalesce(F.col(text_col), F.lit("")))
    n_chunks = F.greatest(
        F.ceil(F.size(ws) / F.lit(float(chunk_words))).cast("int"), F.lit(1)
    )
    chunks = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(ws, i * chunk_words + 1, chunk_words)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    boiler = (
        chunks.groupBy("chunk")
        .agg(F.count_distinct("id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("chunk", F.lit(True).alias("__boiler"))
    )
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    flagged = chunks.join(boiler, "chunk", "left").withColumn(
        "__boiler", F.coalesce(F.col("__boiler"), F.lit(False))
    )
    kept = F.when(~F.col("__boiler"), F.struct("chunk_idx", "chunk"))
    return flagged.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["chunk"]),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("__boiler").cast("long")).alias("n_dropped"),
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.9,
    centroid_id: str = "centroid_id",
    centroid_vec: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding space, then find
    cosine near-duplicates WITHIN each cluster only, and keep one
    canonical doc per near-dup group. The all-pairs cosine matrix is
    never materialized — pair candidates are bounded by cluster sizes,
    so at 100 TB you scale `nlist` with the corpus (FAISS sizing:
    ~sqrt(N) clusters) and each cluster join stays executor-sized.

    `centroids` is any (centroid_id, centroid_vec) frame: seeded random
    centroids make the result exactly replayable (the oracle path);
    production uses `similarity.train_ivf_centroids` for data-adaptive
    clusters — the plan shape is identical either way (one broadcast
    assignment pass, one within-cluster equi-join, distributed
    union-find; no collects, no cartesian).

    Keep rule: within a cluster, near-dup groups are connected components
    of the cos >= threshold pair graph; the representative is the MINIMUM
    id in the group (deterministic). Returns one row per input doc:
    (id_col, cluster, rep_id, is_dup) — filter `~is_dup` for the kept
    corpus.

    The returned frame joins against the checkpoint-backed
    `connected_components` result (see its docstring for block lifetime).
    """
    from buskafkasparkstreaming_spark.operators.similarity import assign_buckets

    assigned = assign_buckets(
        corpus.select(F.col(id_col), F.col(vec_col)),
        centroids,
        id_col=id_col,
        corpus_vec=vec_col,
        centroid_id=centroid_id,
        centroid_vec=centroid_vec,
        nprobe=1,
    )
    # localCheckpoint (round-15, guide §5): the assignment frame feeds
    # BOTH sides of the within-cluster pair join AND the final
    # representative join — without the pin the corpus × centroid
    # assignment (crossJoin + per-id top-1 window, the expensive pass)
    # ran up to three times per call. One row per corpus vector; values
    # untouched (deterministic ties). The ivfadc_build residual-pin
    # precedent.
    assigned = assigned.localCheckpoint(eager=False)
    pairs = embedding_neardup_pairs(
        assigned, id_col, vec_col, "bucket", threshold=threshold,
        unique_blocks=True,  # nprobe=1: each doc sits in exactly one cluster
    )
    comp = connected_components(pairs, "id_a", "id_b")
    rep = F.coalesce(F.col("comp"), F.col(id_col))
    return (
        assigned.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.col("bucket").alias("cluster"),
            rep.alias("rep_id"),
            (rep != F.col(id_col)).alias("is_dup"),
        )
    )


def lsh_candidate_pairs_incremental(
    new_sigs: DataFrame,
    corpus_sigs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Incremental-ingest LSH: candidate pairs between a NEW batch and the
    EXISTING corpus only — the shape every production dedup actually runs
    per ingest tick. Only the batch is sketched per tick; the corpus side
    is its PRECOMPUTED banded index (at scale, store `_banded(corpus)`
    bucket-partitioned so this join prunes to touched buckets at file
    level). The corpus is never self-joined and never re-sketched: cost is
    |batch| × bucket occupancy, independent of |corpus|².

    Ids on the two sides must be disjoint (they identify the pair's
    orientation). Output: (new_id, corpus_id, est_jaccard).
    """
    bn = _banded(new_sigs, bands, rows_per_band).withColumnsRenamed(
        {"id": "new_id", "sig": "sig_n"}
    )
    bc = _banded(corpus_sigs, bands, rows_per_band).withColumnsRenamed(
        {"id": "corpus_id", "sig": "sig_c"}
    )
    pairs = (
        bn.join(bc, on=["band", "bucket"])
        .select("new_id", "corpus_id", "sig_n", "sig_c")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    n = F.size("sig_n")
    matches = F.size(
        F.filter(F.zip_with("sig_n", "sig_c", lambda x, y: x == y), lambda m: m)
    )
    return pairs.select(
        "new_id",
        "corpus_id",
        (matches.cast("double") / n.cast("double")).alias("est_jaccard"),
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """PPJoin-style prefix-filtered set-similarity self-join: all pairs
    (a < b) with Jaccard(shingles_a, shingles_b) >= threshold, found by
    joining only each document's PREFIX tokens instead of its full
    inverted-index postings.

    The classic prefix-filter principle (Chaudhuri et al. SSJoin /
    Xiao et al. PPJoin): order the token universe globally by ascending
    document frequency (rarest first, ties on the token string), sort each
    doc's tokens in that order, and keep only the first
    ``n - ceil(threshold * n) + 1`` tokens as the doc's prefix. Any pair
    with Jaccard >= threshold MUST share at least one prefix token, so the
    candidate join runs prefix x prefix — and because prefixes are by
    construction the RAREST tokens, per-token join fan-out collapses
    versus the full inverted index (the boilerplate/stop-shingle problem
    that `ngram_jaccard_pairs` needs `max_df` for simply never enters the
    index here: high-df tokens sort to the END of each doc and fall
    outside every prefix for any doc with more than a handful of tokens).
    A length filter (threshold * n_b <= n_a <= n_b / threshold) prunes
    size-incompatible candidates before verification.

    Verification is exact: candidates re-join both docs' FULL token sets,
    count the intersection, and compute true Jaccard — so the output is
    bit-identical to the exhaustive all-pairs result (no false negatives
    by the prefix lemma, false positives removed by the exact check).

    Scale shape: one explode + df-count (two shuffles over the token
    stream — an `over (PARTITION BY token)` window was tried in round
    15 and measured 1.7x SLOWER: it forces a full sort of the token
    stream where the aggregate is hash-based and its join side rides
    AQE); a per-doc window to rank tokens (partitioned BY DOC — each
    partition is one doc's token list, never a global sort); a
    prefix-only self-join whose fan-out is Sum_{rare tokens} df^2
    (small by Zipf: rare-first ordering caps df at the low end); and a
    row-local verification (round-15, guide §2.3) — the per-doc shingle
    sets are already DISTINCT arrays, so the intersection count is
    `size(array_intersect(...))` after one doc-id join per side (the
    text_rouge_overlap precedent), never a token-keyed shuffle of the
    full stream. Every candidate pair shares its prefix token, so
    n_common >= 1 exactly as under the old inner-join aggregation.
    No all-pairs path exists.

    Output: (id_a, id_b, jaccard).
    """
    spread = _spread(df, id_col)
    sh = spread.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, k)).alias("__s"),
    )
    dfreq = sh.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    ranked = (
        sh.join(dfreq, "__s")
        .withColumn(
            "__pos",
            F.row_number().over(
                Window.partitionBy("doc").orderBy(
                    F.col("__df").asc(), F.col("__s").asc()
                )
            ),
        )
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    )
    prefix = ranked.filter(
        F.col("__pos")
        <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + F.lit(1)
    ).select("doc", "__s", "__n")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="__s")
        .filter(F.col("a.doc") < F.col("b.doc"))
        # length filter: Jaccard >= t forces t*n_b <= n_a and t*n_a <= n_b
        .filter(
            (F.lit(threshold) * F.col("b.__n") <= F.col("a.__n"))
            & (F.lit(threshold) * F.col("a.__n") <= F.col("b.__n"))
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.__n").alias("n_a"),
            F.col("b.__n").alias("n_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification, row-locally: the per-doc shingle arrays are
    # DISTINCT by construction (word_shingles), so |A ∩ B| is a single
    # array_intersect over the pair row — one doc-id join per side of
    # the (small) candidate frame instead of two token-keyed shuffles of
    # the full stream. A candidate pair shares >= 1 prefix token, so
    # n_common >= 1 — the old inner-join aggregation emitted exactly the
    # same pair set.
    arrs = spread.select(
        F.col(id_col).alias("doc"), word_shingles(text_col, k).alias("__arr")
    )
    common = (
        cand.join(
            arrs.select(
                F.col("doc").alias("id_a"), F.col("__arr").alias("__aa")
            ),
            "id_a",
        )
        .join(
            arrs.select(
                F.col("doc").alias("id_b"), F.col("__arr").alias("__ab")
            ),
            "id_b",
        )
        .withColumn(
            "n_common",
            F.size(F.array_intersect(F.col("__aa"), F.col("__ab"))).cast(
                "long"
            ),
        )
    )
    return (
        common.withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- Fellegi–Sunter record linkage ----------------------------------------


def fs_weights_fp(m: float, u: float, scale: int = 1000) -> tuple[int, int]:
    """Fellegi–Sunter agreement/disagreement weights as fixed-point
    integers: (round(scale*log2(m/u)), round(scale*log2((1-m)/(1-u)))).
    Computed ONCE in Python and embedded as literals in both the engine
    plan and the SQL oracle, so the per-pair score is an exact integer
    sum — no float accumulation anywhere."""
    from math import log2

    return (round(scale * log2(m / u)), round(scale * log2((1 - m) / (1 - u))))


def fellegi_sunter_patterns(
    a: DataFrame,
    b: DataFrame,
    block_on: list[tuple[Column, Column]],
    gammas: dict[str, Column],
    weights_fp: dict[str, tuple[int, int]],
    t_link_fp: int,
    t_nonlink_fp: int,
) -> DataFrame:
    """Fellegi & Sunter (1969) probabilistic record linkage over BLOCKED
    candidate pairs: every pair agreeing on all `block_on` key pairs gets
    an agreement vector γ (one boolean per comparison field), a
    log-likelihood-ratio score Σ_i (γ_i ? w_agree_i : w_disagree_i), and
    a three-way decision (link / possible / non_link) against the two
    thresholds. Returns the canonical FS artifact — the γ-PATTERN TABLE:
    one row per observed agreement pattern with its pair count and score
    (2^|γ| rows max, driver-scale by construction).

    The m/u probabilities behind `weights_fp` are supplied (pinned
    literals via fs_weights_fp) — the production path estimates them by
    EM over the same pattern table; the table this returns IS the EM
    sufficient statistic, so the iteration loop composes directly.

    Plan shape: candidate generation is a hash EQUI-join on the block
    keys (never all-pairs — the blocking discipline every linkage
    pipeline at scale lives by); γ bits and the score are row-local; the
    pattern rollup is one bounded aggregation. Skew: block-key design is
    the caller's lever (band continuous attributes, compound keys); at
    extreme skew the salted-join lever (operators/joins.py) applies
    unchanged because the join is an equi-join.
    """
    names = list(gammas)
    aj, bj = a.alias("a"), b.alias("b")
    cond = None
    for ka, kb in block_on:
        # plain equality, not eqNullSafe: a NULL block key matches
        # nothing — SQL equi-join semantics, and what a linkage pipeline
        # wants (records with an unusable blocking key are not candidates)
        c = ka == kb
        cond = c if cond is None else cond & c
    pairs = aj.join(bj, cond, "inner")
    for n in names:
        pairs = pairs.withColumn(
            f"g_{n}", F.when(gammas[n], F.lit(1)).otherwise(F.lit(0)).cast("int")
        )
    score = None
    for n in names:
        wa, wd = weights_fp[n]
        t = F.when(F.col(f"g_{n}") == 1, F.lit(wa)).otherwise(F.lit(wd))
        score = t if score is None else score + t
    pairs = pairs.withColumn("score_fp", score.cast("long"))
    return (
        pairs.groupBy(*[f"g_{n}" for n in names], "score_fp")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .withColumn(
            "decision",
            F.when(F.col("score_fp") >= t_link_fp, F.lit("link"))
            .when(F.col("score_fp") <= t_nonlink_fp, F.lit("non_link"))
            .otherwise(F.lit("possible")),
        )
        .select(*[f"g_{n}" for n in names], "pair_count", "score_fp", "decision")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.6,
    max_df: int | None = 1000,
) -> DataFrame:
    """DIRECTED containment near-dup: all ordered pairs (a, b), a ≠ b,
    with C(a→b) = |shingles_a ∩ shingles_b| / |shingles_a| ≥ threshold —
    "most of a appears in b". This catches what symmetric Jaccard
    structurally misses: a short document contained in a long one
    (quotes, truncated copies, boilerplate supersets) has low Jaccard
    (the union is dominated by b) but high containment.

    Same inverted-index discipline as `ngram_jaccard_pairs` (xxhash64
    shingle keys, `max_df` stop-shingle anti-join with the AQE
    rationale, exchange-reused self-join, no static broadcast on the
    per-doc sizes): the only differences are the a ≠ b pair stream (each
    unordered pair appears in both directions — the asymmetry is the
    point) and the n_a denominator. Output: (id_a, id_b, n_a, n_common,
    containment) meaning "a is contained in b at `containment`"."""
    sh = _spread(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, k)).alias("__s"),
    ).select("doc", F.xxhash64("__s").alias("sh"))

    if max_df is not None:
        high_sh = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("sh")
        )
        low = sh.join(high_sh, "sh", "left_anti")
        sizes = low.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    else:
        low = sh
        sizes = _spread(df, id_col).select(
            F.col(id_col).alias("doc"),
            F.size(word_shingles(text_col, k)).alias("n_sh"),
        )

    common = (
        low.alias("a")
        .join(low.alias("b"), on="sh")
        .filter(F.col("a.doc") != F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc", "id_a"), "id_a")
        .withColumnRenamed("n_sh", "n_a")
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.col("n_a").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_common").cast("long").alias("n_common"),
            "containment",
        )
    )


# --- IDF-weighted Jaccard + weighted MinHash ------------------------------
#
# Weighted Jaccard with GLOBAL integer shingle weights: J_w(A, B) =
# sum_{s in A∩B} w(s) / sum_{s in A∪B} w(s). Weights are IDF buckets —
# rare shingles count 4x, mid-frequency 2x, common 1x — so overlap on
# discriminative content outweighs shared boilerplate (the weighted-
# Jaccard rationale of Ioffe 2010 / Chum et al. 2008, with integer
# weights so the exact value has a SQL twin). Integer weights admit the
# classic replication reduction: duplicate each shingle into w copies
# and run PLAIN MinHash over the replicated set — the Jaccard of the
# replicated sets IS the weighted Jaccard, so the existing banding /
# estimation machinery applies unchanged (replication factor bounded by
# the max bucket weight, 4).

#: (rare_divisor, weight) IDF buckets, rarest first: df*256 <= N -> 4,
#: df*16 <= N -> 2, else 1. Pure integer comparisons — both engines exact.
IDF_WEIGHT_BUCKETS = ((256, 4), (16, 2))


def _idf_weight(
    df_col: Column,
    n_col: Column,
    buckets: tuple[tuple[int, int], ...] = IDF_WEIGHT_BUCKETS,
) -> Column:
    w = F.lit(1)
    for divisor, weight in reversed(buckets):
        w = F.when(df_col * divisor <= n_col, F.lit(weight)).otherwise(w)
    return w


def weighted_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    max_df: int | None = 1000,
    buckets: tuple[tuple[int, int], ...] = IDF_WEIGHT_BUCKETS,
) -> DataFrame:
    """Per-doc distinct word-k-gram shingles with their global IDF-bucket
    weight: (doc, s, sh, w) — s the shingle string (the weighted-MinHash
    replication needs it), sh its 8-byte hash (the pair join key), w the
    integer weight. N = docs with >= 1 shingle; shingles with df > max_df
    are stop-shingles and DROPPED (the ngram_jaccard_pairs scale
    rationale: their weight would be the minimum anyway and their df^2
    join fan-out is what kills corpus growth)."""
    sh = _spread(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, k)).alias("s"),
    )
    dfc = sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    if max_df is not None:
        dfc = dfc.filter(F.col("__df") <= max_df)
    # N read once as a bounded 1-row driver job and folded into the weight
    # CASE as a literal (the kll_sketch level-plan pattern) — a broadcast
    # 1-row frame here would put a SinglePartition scalar agg inside
    # every instantiation of this subtree and defeat plan-gating
    n_docs = int(sh.agg(F.count_distinct("doc")).first()[0])
    # dfc is Zipf-small after the cap; AQE broadcasts it at runtime (the
    # static-hint-defeats-exchange-reuse rationale of ngram_jaccard_pairs)
    return sh.join(dfc, "s").select(
        "doc",
        "s",
        F.xxhash64("s").alias("sh"),
        _idf_weight(F.col("__df"), F.lit(n_docs), buckets)
        .cast("long")
        .alias("w"),
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.3,
    max_df: int | None = 1000,
    buckets: tuple[tuple[int, int], ...] = IDF_WEIGHT_BUCKETS,
) -> DataFrame:
    """All pairs (a < b) with IDF-weighted Jaccard >= threshold — the
    inverted-index plan of ngram_jaccard_pairs (equi-join on the shingle,
    never all-pairs; per-shingle fan-out bounded at max_df^2) with
    weighted intersection/union: inter_w = sum of shared-shingle weights
    (a.w == b.w by construction — the weight is a global function of the
    shingle), union_w = W_a + W_b - inter_w. One float division per
    surviving pair. Output: (id_a, id_b, w_jaccard).

    The EXACT path joins on the shingle STRING `s`, not its 64-bit
    xxhash64 `sh`: at the 1e9-doc design point the corpus holds ~1e9
    distinct capped shingles, where the birthday bound puts 64-bit
    collision probability at percent level — a collision would create a
    phantom intersection and break the a.w == b.w invariant on the Spark
    side only (the oracle joins on the string). The hash exists solely
    for the SKETCH path (weighted_minhash_signatures), where a collision
    costs estimator noise, not correctness (advisor catch, round 9)."""
    wt = weighted_shingles(df, id_col, text_col, k, max_df, buckets)
    sizes = wt.groupBy("doc").agg(F.sum("w").cast("long").alias("wsize"))
    inter = (
        wt.alias("a")
        .join(wt.alias("b"), on="s")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.sum(F.col("a.w")).cast("long").alias("inter_w"))
    )
    # sizes is one row per doc — no static broadcast hint (AQE decides;
    # the ngram_jaccard_pairs 10^9-doc rationale)
    return (
        inter.join(sizes.withColumnRenamed("doc", "id_a"), "id_a")
        .withColumnRenamed("wsize", "w_a")
        .join(sizes.withColumnRenamed("doc", "id_b"), "id_b")
        .withColumnRenamed("wsize", "w_b")
        .withColumn(
            "w_jaccard",
            F.col("inter_w").cast("double")
            / (F.col("w_a") + F.col("w_b") - F.col("inter_w")).cast("double"),
        )
        .filter(F.col("w_jaccard") >= threshold)
        .select("id_a", "id_b", "w_jaccard")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.5,
    max_df_frac: tuple[int, int] = (1, 5),
    max_df: int | None = 10_000,
    buckets: tuple[tuple[int, int], ...] = IDF_WEIGHT_BUCKETS,
) -> DataFrame:
    """All pairs (a < b) with cosine similarity >= threshold over SPARSE
    integer tf-idf term vectors — the token-space twin of the embedding
    cosine join: w(d,t) = tf(d,t) * idf_bucket_weight(df(t)), an exact
    BIGINT, so the pair dot product and both squared norms are
    order-independent integer sums. The only float ops are one multiply,
    one sqrt, and one division — sqrt is IEEE-correctly-rounded (unlike
    the libm transcendentals the HLL estimator had to table out), so the
    cosine is bit-replayable in any engine.

    Plan: inverted-index equi-join on the term (never all-pairs); stop
    terms are DROPPED by the MIN of two document-frequency caps, each
    covering the other's failure mode (review catch — the relative cap
    alone reintroduced quadratic fan-out):

    * RELATIVE (df * den <= N * num, default df/N <= 1/5): single words
      (unlike k-gram shingles) have df proportional to corpus size, so
      a tight absolute cap alone silently empties the whole index as
      the corpus grows (measured: 10x replication at max_df=1000 ->
      ZERO surviving terms). The relative cap keeps idf meaningful at
      any N.
    * ABSOLUTE (df <= max_df, default 10,000): a term at df just under
      N/5 would alone emit (N/5)^2 join rows — ~4e16 at the 1e9-doc
      design point. The absolute cap bounds the worst-case per-term
      posting join at max_df^2 regardless of N, the same discipline as
      ngram_jaccard_pairs (set higher than ngram's 1000 because real
      Heaps-law vocabularies keep plenty of sub-10k-df words at any
      corpus size, where 3-gram shingles are far rarer).

    Both cap tests are pure integer arithmetic, exact in any engine.
    Both the tf and the dot-product groupBys partial-aggregate
    map-side. Output: (id_a, id_b, dot, cosine).
    """
    tok = (
        _spread(df, id_col)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(words(text_col)).alias("t"),
        )
        # split-on-space yields '' tokens on runs of whitespace; both
        # engines drop them (DuckDB's unnest already drops the NULL-text
        # rows Spark's explode never produces)
        .filter(F.col("t") != "")
    )
    tf = tok.groupBy("doc", "t").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # N as a bounded 1-row driver job folded into the cap filter and the
    # weight CASE as literals (the weighted_shingles pattern)
    n_docs = int(tf.agg(F.count_distinct("doc")).first()[0])
    num, den = max_df_frac
    dfc = (
        tf.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("__df"))
        .filter(F.col("__df") * den <= n_docs * num)
    )
    if max_df is not None:
        dfc = dfc.filter(F.col("__df") <= max_df)
    w = tf.join(dfc, "t").select(
        "doc",
        "t",
        (F.col("tf") * _idf_weight(F.col("__df"), F.lit(n_docs), buckets))
        .cast("long")
        .alias("w"),
    )
    norms = w.groupBy("doc").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    dots = (
        w.alias("a")
        .join(w.alias("b"), on="t")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).cast("long").alias("dot"))
    )
    # norms is one row per doc — no static broadcast hint (AQE decides;
    # the ngram_jaccard_pairs 10^9-doc rationale)
    return (
        dots.join(norms.withColumnRenamed("doc", "id_a"), "id_a")
        .withColumnRenamed("n2", "n2_a")
        .join(norms.withColumnRenamed("doc", "id_b"), "id_b")
        .withColumnRenamed("n2", "n2_b")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / F.sqrt(
                F.col("n2_a").cast("double") * F.col("n2_b").cast("double")
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "dot", "cosine")
    )


def weighted_minhash_signatures(
    weighted: DataFrame,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures over the REPLICATED weighted shingle set: each
    (doc, s, w) row becomes tokens 's#1' .. 's#w', then the plain
    minhash_signatures aggregation applies — sig equality estimates the
    weighted Jaccard exactly as it estimates plain Jaccard on sets.
    Replication fan-out is bounded by the max bucket weight (4), and the
    shuffle still carries only (id, num_hashes longs) per doc thanks to
    the map-side min combine. Output: (id, sig: array<bigint>)."""
    import random

    rnd = random.Random(seed)
    m31 = (1 << 31) - 1
    coeffs = [
        (rnd.randrange(1, m31), rnd.randrange(0, m31))
        for _ in range(num_hashes)
    ]
    rep = weighted.select(
        F.col("doc").alias("id"),
        F.explode(F.sequence(F.lit(1), F.col("w"))).alias("__j"),
        "s",
    ).select(
        "id",
        F.pmod(
            F.xxhash64(F.concat_ws("#", "s", F.col("__j").cast("string"))),
            F.lit(m31),
        ).alias("x"),
    )
    aggs = [
        F.expr(f"min(pmod({a}L * x + {b}L, {m31}L))").alias(f"__h{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        rep.groupBy("id")
        .agg(*aggs)
        .select(
            "id",
            F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("sig"),
        )
    )
