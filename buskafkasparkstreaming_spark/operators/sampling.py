"""Deterministic sampling / dataset-split operators for the training-data
pipeline surface (BASELINE.json north_star).

A training pipeline needs splits that are (a) stable across reruns and
engines, (b) a pure function of the row key — never of partitioning,
ordering, or RNG state — so that re-ingesting a doc lands it in the same
split forever and no eval example drifts into train. Both operators below
key off md5(id:salt): the hash is available and bit-identical in Spark and
every SQL engine, unlike per-partition RNG (`rand()`), which changes with
task layout.

The split decision compares the first 8 hex chars of the md5
LEXICOGRAPHICALLY against precomputed hex thresholds — string compare on
lowercase hex == numeric compare on the 32-bit prefix, and it avoids
hex→int conversion functions that differ across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] → 8-hex-digit lexicographic cutoff."""
    return format(min(int(fraction * (1 << 32)), (1 << 32) - 1), "08x")


def _bucket_hex(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 8
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic `fraction` of rows, keyed on md5(id:salt).
    Unlike df.sample(), membership is a pure function of the id — stable
    under reruns, repartitioning, and engine changes."""
    return df.filter(_bucket_hex(id_col, salt) < F.lit(_hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5(id:salt)
    prefix clears the THRESHOLD OF ITS STRATUM — the standard rebalancing
    op of a training-data pipeline (e.g. downsample boilerplate-heavy
    languages, keep all rare ones). Row-local like hash_sample: no
    shuffle, no RNG, membership a pure function of (id, stratum), so the
    sample is reproducible at any scale and partitioning. Strata absent
    from `fractions` use `default_fraction`."""
    h = _bucket_hex(id_col, salt)
    expr = None
    for stratum, frac in sorted(fractions.items()):
        cond = (F.col(strata_col) == F.lit(stratum)) & (
            h < F.lit(_hex_threshold(frac))
        )
        expr = cond if expr is None else expr | cond
    in_default = ~F.col(strata_col).isin(*fractions.keys()) & (
        h < F.lit(_hex_threshold(default_fraction))
    )
    expr = in_default if expr is None else expr | in_default
    return df.filter(expr)


def domain_cap(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Cap the number of rows kept per domain/source — the anti-spam quota
    step of a web-corpus pipeline (one crawl-happy domain must not dominate
    the training mix). Within each domain, rows are ranked by md5(id:salt)
    — a deterministic, engine-reproducible shuffle-within-domain, so the
    kept subset is unbiased w.r.t. document order and stable across reruns
    — and only the first `cap` survive.

    Plan: one hash exchange on the domain key + a per-domain window
    row_number; Spark inserts WindowGroupLimit, so each task retains only
    `cap` rows per domain while scanning — state is O(cap), not O(domain
    size), which is what makes the op safe on a 100 TB crawl with
    million-doc domains. Ties on the 8-hex prefix break by id for total
    determinism."""
    from pyspark.sql import Window

    h = _bucket_hex(id_col, salt)
    w = Window.partitionBy(domain_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Tag every row with a split label ('train'/'val'/'test' by default)
    from cumulative md5-prefix thresholds. Row-local (no shuffle, no
    action); the label column is a deterministic function of the id, so
    downstream filters prune at the scan."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    h = _bucket_hex(id_col, salt)
    cum = 0.0
    expr = None
    items = list(weights.items())
    for name, frac in items[:-1]:
        cum += frac
        cond = h < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def token_budget_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    n_tokens_col: Column | str,
    budget_tokens: int,
    salt: str = "mix",
) -> DataFrame:
    """Cap each domain's contribution to the training mix by TOKENS, not
    documents — the unit pretraining mixes are actually balanced in
    (a 10-word doc and a 10k-word doc are not equal contributions, which
    is what `domain_cap`'s doc quota assumes). Within each domain, rows
    are ordered by md5(id:salt) (deterministic, unbiased w.r.t. crawl
    order — same rationale as `domain_cap`) and kept while the RUNNING
    token total stays within `budget_tokens` (inclusive: the row whose
    cumulative count reaches the budget exactly is kept; the first row of
    an over-budget domain is dropped only if it alone exceeds the budget).

    Plan: one hash exchange on the domain + a per-domain running-sum
    window — identical shape to `domain_cap`, so the same 100 TB argument
    holds (per-task state is one accumulator per domain, not the domain's
    rows). Adds `n_tokens` (long) and keeps only in-budget rows.
    """
    from pyspark.sql import Window

    c = F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    h = _bucket_hex(id_col, salt)
    w = (
        Window.partitionBy(domain_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", c.cast("long"))
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .filter(F.col("__cum") <= budget_tokens)
        .drop("__cum")
    )


def prototypicality_prune(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    drop_pct: int = 30,
    centroid_id: str = "centroid_id",
    centroid_vec: str = "embedding",
) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, arXiv:2206.14486,
    "Beyond neural scaling laws"): cluster the embedding space, rank each
    example by cosine to its OWN cluster centroid (prototypicality), and
    drop the most prototypical `drop_pct` percent per cluster — redundant
    easy examples near cluster cores carry the least training signal, and
    pruning them beats random pruning at large data scale.

    Keep rule is exact integer arithmetic (`rank * 100 > n_cluster *
    drop_pct`), so the boundary is engine-independent; ranking ties break
    by id. Returns one row per input: (id_col, cluster, proto_sim,
    proto_rank, n_cluster, is_kept) — filter `is_kept` for the pruned
    corpus.

    Plan: one broadcast assignment pass (argmax over the tiny centroid
    set), a second broadcast join to re-attach the winning centroid's
    vector for the sim column, and ONE shuffle on the cluster label for
    the two windows (rank + size share the partitioning). At 100 TB,
    scale the number of clusters with the corpus (~sqrt(N)) so window
    partitions stay executor-sized; the centroid set remains broadcast.
    """
    from pyspark.sql import Window

    from buskafkasparkstreaming_spark.functions import cosine_similarity
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
    cent = centroids.select(
        F.col(centroid_id).alias("bucket"), F.col(centroid_vec).alias("__cv")
    )
    scored = assigned.join(F.broadcast(cent), "bucket").withColumn(
        "proto_sim", cosine_similarity(vec_col, "__cv")
    )
    w_rank = Window.partitionBy("bucket").orderBy(
        F.col("proto_sim").desc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy("bucket")
    return (
        scored.withColumn("proto_rank", F.row_number().over(w_rank).cast("long"))
        .withColumn("n_cluster", F.count(F.lit(1)).over(w_all).cast("long"))
        .select(
            F.col(id_col),
            F.col("bucket").alias("cluster"),
            "proto_sim",
            "proto_rank",
            "n_cluster",
            (F.col("proto_rank") * 100 > F.col("n_cluster") * drop_pct).alias(
                "is_kept"
            ),
        )
    )


def curriculum_stages(
    df: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Curriculum-ordering stages from an INTEGER quality score (e.g. the
    fixed-point LM score): band each doc by how many standard deviations
    its score sits below the corpus mean — stage 1 (at/above mean, train
    first) through stage 4 (more than 2σ below, train last / drop).

    Quantile staging (ntile) needs a global total order — a single-
    partition window that dies at scale. Standard-score banding gets the
    same curriculum shape from ONE 1-row aggregate broadcast back
    row-locally: sum and sum-of-squares of an integer score are exact
    BIGINTs (engine-order-independent), mean/σ derive from them with a
    fixed double expression, and the band comparison is row-local. No
    shuffle of the data, no sort, no collect.

    Output: input columns + (stage int). Degenerate corpora (σ = 0) land
    everything in stage 1.
    """
    s = F.col(score_col).cast("long")
    stats = df.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(s).cast("long").alias("__s"),
        F.sum(s * s).cast("long").alias("__ss"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    var = (
        F.col("__ss").cast("double") / F.col("__n").cast("double") - mean * mean
    )
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    sc = s.cast("double")
    stage = (
        F.when(sc >= mean, F.lit(1))
        .when(sc >= mean - sigma, F.lit(2))
        .when(sc >= mean - 2 * sigma, F.lit(3))
        .otherwise(F.lit(4))
    )
    return (
        df.crossJoin(F.broadcast(stats))  # scalar-broadcast idiom
        .withColumn("stage", stage.cast("int"))
        .drop("__n", "__s", "__ss")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    test_fraction: float = 0.1,
    salt: str = "leak",
    jaccard_threshold: float = 0.3,
) -> DataFrame:
    """Decontaminated train/test split: hash-split the corpus, then
    QUARANTINE every train doc that is a near-duplicate of any test doc —
    the practice that keeps eval sets honest (a test doc's near-dup left
    in train is silent leakage; plain random splits do this constantly on
    crawl corpora).

    Composition of existing primitives: the md5-threshold split is
    row-local; the cross-split near-dup pairs come from the df-capped
    n-gram inverted index (never all-pairs); the quarantine is one
    semi-join against the test side. Output: (id, split) with split ∈
    {train, test, quarantined} — every input doc appears exactly once.
    """
    from buskafkasparkstreaming_spark.operators.dedup import ngram_jaccard_pairs

    h = _bucket_hex(id_col, salt)
    split = df.withColumn(
        "__split",
        F.when(h < F.lit(_hex_threshold(test_fraction)), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )
    pairs = ngram_jaccard_pairs(
        df, id_col, text_col, k=3, threshold=jaccard_threshold
    )
    edges = pairs.select(
        F.col("id_a").alias("x"), F.col("id_b").alias("y")
    ).unionByName(pairs.select(F.col("id_b").alias("x"), F.col("id_a").alias("y")))
    test_ids = split.filter(F.col("__split") == "test").select(
        F.col(id_col).alias("y")
    )
    leaked = (
        edges.join(test_ids, "y").select(F.col("x").alias(id_col)).distinct()
    )
    out = split.join(
        leaked.withColumn("__leak", F.lit(True)), id_col, "left"
    )
    return out.select(
        id_col,
        F.when(F.col("__split") == "test", F.lit("test"))
        .when(F.col("__leak"), F.lit("quarantined"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    algorithm A-ES): each row gets priority key = ln(u) / w with u an
    md5-derived uniform in (0, 1]; the k largest keys are exactly a
    weighted sample without replacement. This is the data-mixing
    primitive a training pipeline uses to draw a corpus subset where
    inclusion probability tracks a quality/length/temperature weight.

    Deterministic like every sampler here: u is a pure function of
    (id, salt) — 52 md5 bits, exact in a double — so the sample is
    stable across reruns, partitionings, and engines. Rows with NULL or
    non-positive weight are excluded (they cannot be drawn).

    Plan: row-local key computation + one global top-k
    (TakeOrderedAndProject: per-partition heads then a driver merge of k
    rows — no full sort materialization at any scale). Adds `__wkey`
    ordering determinism via (key DESC, id ASC).
    """
    hx = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    u52 = F.conv(F.substring(hx, 1, 13), 16, 10).cast("long")
    u = (u52 + 1).cast("double") / float(1 << 52)  # (0, 1]
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__wkey")
    )


def weighted_sample_per_stratum(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    stratum_col: str,
    k: int,
    salt: str = "wstrat",
    rank_col: str = "rk",
) -> DataFrame:
    """STRATIFIED weighted reservoir: an independent A-ES weighted sample
    without replacement of size k inside EVERY stratum — the per-domain /
    per-language quota draw a corpus-mixing pipeline runs, where each
    stratum's inclusion probabilities track the weight but no stratum can
    starve another (contrast `weighted_sample`, whose single global top-k
    lets a heavy stratum take every slot).

    Same determinism contract as `weighted_sample`: priority key
    ln(u)/w with u a 52-bit md5 uniform of (id, salt) — a pure function
    of the row, so each stratum's reservoir is stable across reruns,
    partitionings, and engines, and INCREMENTAL: because A-ES keys are
    row-local, re-running over (old ∪ new) rows reproduces exactly the
    reservoir an online algorithm maintains by keeping the k largest
    keys seen so far.

    Plan: row-local key, ONE hash shuffle on the stratum, per-stratum
    row_number — never a global sort. Per-partition sort depth is the
    stratum size; at 100 TB with few huge strata the same two-phase
    trick as topk_per_group applies (pre-prune per input partition to
    its local top-k before the shuffle); with the testdata's stratum
    counts the single window is the right plan.
    """
    from pyspark.sql import Window

    hx = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    u52 = F.conv(F.substring(hx, 1, 13), 16, 10).cast("long")
    u = (u52 + 1).cast("double") / float(1 << 52)  # (0, 1]
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("__wkey").desc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wkey", key)
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop("__wkey")
    )


def dsir_importance_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_filter: Column,
    k: int,
    fp_scale: int = 10_000,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    select k source documents whose unigram bag looks most like a TARGET
    domain, by importance weight w(doc) = p_target(doc) / p_source(doc)
    under add-one-smoothed unigram models, sampled WITHOUT replacement
    via Gumbel-top-k on log w + Gumbel(u) (exactly the weighted sample
    `weighted_sample` draws, expressed in log space so length-long docs
    don't overflow the weight).

    Exactness contract (the `lm_unigram_score` idiom): each token's
    ln p_target and ln p_source are floor-fixed-pointed ROW-LOCALLY, so
    the per-doc log-ratio is an exact BIGINT sum — engine- and
    order-independent; the only float ops are the final key = logw +
    Gumbel(u), a fixed scalar expression over (exact int, md5 uniform).

    Plan: one explode; two word-keyed count aggregations (target model
    counts a filtered subset of the SAME token stream); token→vocab
    equi-joins co-partitioned on the word; 1-row totals broadcast;
    per-doc sum (shuffle on id); global top-k (TakeOrderedAndProject).
    At 100 TB the target side is typically small (a quality corpus) and
    its vocab broadcastable.

    Output: top-k rows (id, n_tokens, sum_logratio_fp) by Gumbel key.
    """
    from buskafkasparkstreaming_spark.operators.text import words

    toks = df.select(
        F.col(id_col).alias("id"),
        target_filter.alias("__tgt"),
        F.explode(words(text_col)).alias("w"),
    )
    sv = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cs"))
    tv = toks.filter(F.col("__tgt")).groupBy("w").agg(
        F.count(F.lit(1)).alias("ct")
    )
    totals = sv.agg(
        F.sum("cs").cast("long").alias("__Ns"),
        F.count(F.lit(1)).cast("long").alias("__Vs"),
    ).crossJoin(
        tv.agg(
            F.sum("ct").cast("long").alias("__Nt"),
            F.count(F.lit(1)).cast("long").alias("__Vt"),
        )
    )

    def nats_fp(cnt: Column, n: Column, v: Column) -> Column:
        return F.floor(
            F.log(
                (cnt + 1).cast("double") / (n + v).cast("double")
            )
            * F.lit(fp_scale)
        ).cast("long")

    scored = (
        toks.join(sv, "w")
        .join(tv, "w", "left")
        .crossJoin(F.broadcast(totals))  # scalar-broadcast idiom
        .withColumn(
            "__fp",
            nats_fp(
                F.coalesce(F.col("ct"), F.lit(0)), F.col("__Nt"), F.col("__Vt")
            )
            - nats_fp(F.col("cs"), F.col("__Ns"), F.col("__Vs")),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("__fp").cast("long").alias("sum_logratio_fp"),
    )
    hx = F.md5(F.concat(F.col("id").cast("string"), F.lit(":" + salt)))
    u = (F.conv(F.substring(hx, 1, 13), 16, 10).cast("long") + 1).cast(
        "double"
    ) / float(1 << 52)
    gumbel = -F.log(-F.log(u))
    key = (
        F.col("sum_logratio_fp").cast("double") / F.lit(float(fp_scale))
        + gumbel
    )
    return (
        per_doc.withColumn("__gkey", key)
        .orderBy(F.col("__gkey").desc(), F.col("id").asc())
        .limit(k)
        .drop("__gkey")
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weight_col: str,
    alpha_sqrt: bool = True,
    out_fraction_num: int = 1,
    out_fraction_den: int = 2,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled domain mixing (alpha = 0.5): resample so each
    domain's share of the OUTPUT is proportional to sqrt(domain weight)
    instead of the weight itself — the standard rebalancing that keeps
    head domains from drowning tail ones in a training mix.

    Every arithmetic step is engine-deterministic:
      * domain weights w_d and the target size N_out = total·num/den are
        exact BIGINT sums;
      * sqrt is IEEE-correctly-rounded in every engine, so
        floor(sqrt(w_d)) is bit-identical (it may differ from the true
        integer sqrt by the usual last-ulp perfect-square edge, but
        identically so on both sides of an oracle);
      * the per-domain keep threshold floor(isqrt_d·N_out·2^32/(S·w_d))
        is an EXACT integer floor-division: products go through
        DECIMAL(38,0) (BIGINT wraps past ~1e19 — the chi2 precedent), a
        double division proposes the quotient, and two exact decimal
        comparisons correct the proposal (+1/−1) — no reliance on either
        engine's decimal-division rounding mode;
      * membership compares the md5(id:salt) 8-hex prefix against the
        threshold rendered via lpad(lower(hex()),8,'0') — lexicographic
        == numeric on the 32-bit prefix (the hash_sample idiom), and a
        rate >= 1 keeps the whole domain outright (no 'ffffffff' loss).

    Returns the kept rows with the per-domain bookkeeping columns
    (__w_d, __thr_hex) still attached for auditability.
    """
    dec = "decimal(38,0)"
    pow32 = F.lit(1 << 32).cast(dec)
    per_dom = (
        df.groupBy(domain_col)
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__w_d"))
        # a weightless domain has no defined rate — dropped outright
        # (the oracle mirrors this)
        .filter(F.col("__w_d").isNotNull() & (F.col("__w_d") > 0))
    )
    if not alpha_sqrt:
        raise NotImplementedError("only alpha=0.5 (sqrt) is implemented")
    per_dom = per_dom.withColumn(
        "__isqrt",
        F.floor(F.sqrt(F.col("__w_d").cast("double"))).cast("long"),
    )
    glob = per_dom.agg(
        F.sum("__isqrt").cast("long").alias("__s"),
        F.sum("__w_d").cast("long").alias("__total"),
    ).select(
        "__s",
        # exact integer target size — DIV, never a rounded decimal/
        # double division
        F.expr(
            f"CAST((__total * {int(out_fraction_num)})"
            f" DIV {int(out_fraction_den)} AS DECIMAL(38,0))"
        ).alias("__n_out"),
    )
    d = per_dom.crossJoin(F.broadcast(glob))
    num = (F.col("__isqrt").cast(dec) * F.col("__n_out") * pow32).cast(dec)
    den = (F.col("__s").cast(dec) * F.col("__w_d").cast(dec)).cast(dec)
    q0 = F.floor(num.cast("double") / den.cast("double")).cast(dec)
    q = (
        q0
        + F.when((q0 + 1) * den <= num, F.lit(1)).otherwise(F.lit(0))
        - F.when(q0 * den > num, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    thr = d.select(
        domain_col,
        "__w_d",
        q.alias("__thr"),
        F.when(q >= F.lit(1 << 32), F.lit("keep_all"))
        .otherwise(F.lpad(F.lower(F.hex(q)), 8, "0"))
        .alias("__thr_hex"),
    )
    joined = df.join(F.broadcast(thr), domain_col)
    keep = (F.col("__thr_hex") == "keep_all") | (
        _bucket_hex(id_col, salt) < F.col("__thr_hex")
    )
    return joined.filter(keep).drop("__thr")


def weighted_reservoir_tiers(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    stratum_col: str,
    k: int,
    salt: str = "wres",
    max_weight: int = 8,
    prio_col: str = "prio",
    prune_buckets: int = 32,
) -> DataFrame:
    """BATCH twin of streaming/state.py::weighted_reservoir_per_key
    (SURVEY round-13 candidate): an A-ES weighted reservoir of size k
    per stratum with integer SIZE-TIER weights, using the exact
    max-of-w-md5 priority the streaming tracker folds — so a batch
    backfill and the live monitor draw the SAME sample from the same
    rows, and the ordering is pure lowercase-hex string compare (no
    pow/ln/float seam; contrast `weighted_sample_per_stratum`, the
    real-weight ln(u)/w variant).

    A-ES exactness: u^(1/w) has the law of max of w iid uniforms, so
    priority = max_{j=1..w} md5(id:j:salt); top-k by (prio DESC, id
    ASC, w ASC) is a weighted sample without replacement. Weights
    clamp to [1, max_weight] exactly like the streaming tracker (a
    malformed weight degrades to tier 1, never crashes or diverges).

    SET semantics like the tracker's state pool: verbatim duplicate
    rows occupy ONE slot. Implemented without a pre-dedup shuffle:
    duplicates tie on the full (prio, id, w) order key, so dense_rank
    keeps them in one slot through both phases and the final
    dropDuplicates runs on the k-bounded survivor set only. Output is
    the KEY columns only — (stratum, id, weight, prio) in the input's
    column order — because rows tying on the key but differing in
    extra payload columns collapse to one slot, and which payload
    survived would be partitioning-dependent. Callers wanting payload
    join it back on (stratum, id) deterministically.

    Plan (the two-phase trick topk_per_group's docstring promises):
    phase 1 ranks inside (stratum, hash-bucket-of-id) — parallelism =
    strata x prune_buckets, never one-task-per-stratum on a huge
    stratum — keeping each bucket's top-k (every true stratum-top-k
    row is top-k in its own bucket, so the prune is lossless); phase 2
    ranks the <= strata*prune_buckets*k survivors exactly. The priority
    itself is row-local codegen (sequence -> transform -> array_max),
    no shuffle.
    """
    wcl = F.least(
        F.greatest(F.col(weight_col).cast("long"), F.lit(1)),
        F.lit(max_weight),
    )
    base = df.filter(
        F.col(id_col).isNotNull() & F.col(weight_col).isNotNull()
    ).withColumn(weight_col, wcl)
    prio = F.array_max(
        F.transform(
            F.sequence(F.lit(1).cast("long"), F.col(weight_col)),
            lambda j: F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    j.cast("string"),
                    F.lit(":" + salt),
                )
            ),
        )
    )

    def order():
        return [
            F.col(prio_col).desc(),
            F.col(id_col).asc(),
            F.col(weight_col).asc(),
        ]

    from pyspark.sql import Window

    base = base.withColumn(prio_col, prio).withColumn(
        "__b", F.pmod(F.hash(F.col(id_col)), F.lit(prune_buckets))
    )
    w1 = Window.partitionBy(stratum_col, "__b").orderBy(*order())
    pruned = (
        base.withColumn("__dr", F.dense_rank().over(w1))
        .filter(F.col("__dr") <= k)
        .drop("__b", "__dr")
    )
    w2 = Window.partitionBy(stratum_col).orderBy(*order())
    keys = {stratum_col, id_col, weight_col}
    cols = [c for c in df.columns if c in keys] + [prio_col]
    return (
        pruned.withColumn("__dr", F.dense_rank().over(w2))
        .filter(F.col("__dr") <= k)
        .select(*cols)
        .dropDuplicates([stratum_col, id_col, weight_col, prio_col])
    )
