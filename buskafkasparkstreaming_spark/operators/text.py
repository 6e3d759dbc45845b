"""Text-analysis operators for the training-data pipeline surface
(BASELINE.json north_star: language-ID, quality scoring, token counting,
document fingerprinting).

Everything here is built-in-function compositions (JVM codegen) — no Python
in the hot path. The tokenizer regex and stopword sets are deliberately
simple + deterministic so a SQL oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish surface tokenizer: letter runs | single digits | punctuation marks.
TOKEN_PATTERN = "([a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ])"

#: tiny per-language marker-word sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ("the", "a", "of", "to", "and", "in"),
}
STOPWORDS = LANG_MARKERS["en"]


def normalize(col: Column | str) -> Column:
    """Canonical text form used by fingerprinting and exact dedup:
    lowercase, collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), " +", " "))


def words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def tokens(col: Column | str) -> Column:
    """Regex token array (TOKEN_PATTERN)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 1)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(text_col))).withColumn(
        "n_words", F.size(words(text_col))
    )


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/word counts, mean word length,
    stopword ratio, alpha ratio. All double-typed, deterministic."""
    ws = words(text_col)
    n_words = F.size(ws)
    sum_word_len = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    return (
        df.withColumn("q_chars", F.length(F.col(text_col)).cast("long"))
        .withColumn("q_words", n_words.cast("long"))
        .withColumn("q_avg_word_len", sum_word_len / n_words.cast("double"))
        .withColumn("q_stopword_ratio", n_stop.cast("double") / n_words.cast("double"))
    )


def langid_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-density language heuristic: texts whose English-marker-word
    density clears a threshold are tagged 'en', else 'und'. (A real model
    would use char n-gram profiles; the operator contract — one predicted
    label per doc, computed distributed — is what matters here.)"""
    ws = words(text_col)
    ratio = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))).cast(
        "double"
    ) / F.size(ws).cast("double")
    return df.withColumn(
        "pred_lang", F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("und"))
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dedup fingerprint: md5 of the normalized text."""
    return df.withColumn("fingerprint", F.md5(normalize(text_col)))


def rolling_hashes(col: Column | str, window: int = 5) -> Column:
    """Array of xxhash64 values over `window`-word shingles — the winnowing /
    rolling-hash fingerprint primitive. xxhash64 is Spark-native and
    deterministic across executors."""
    ws = words(col)
    n = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(ws, i, window)))
    )


def winnowing_fingerprint(df: DataFrame, text_col: str = "text", window: int = 5, keep: int = 8) -> DataFrame:
    """Keep the `keep` smallest rolling hashes per doc (a winnowing-style
    sketch): compact, order-independent near-dup signature."""
    hs = F.array_sort(rolling_hashes(text_col, window))
    return df.withColumn("winnow_sketch", F.slice(hs, 1, keep))


#: PII patterns deliberately restricted to constructs with identical
#: semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
#: bounded repetition, alternation — no lookaround, no backreferences.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+",
    "phone": "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """Scrub PII-shaped substrings (emails, phone numbers, SSNs) before a
    corpus enters training — the compliance gate every LLM data pipeline
    runs. Pure regexp_replace chains (JVM codegen, no Python); each match
    is replaced with a typed sentinel so downstream can count/audit
    redactions. Adds `out_col` plus `n_redactions`."""
    cleaned = F.col(text_col)
    n_red = F.lit(0)
    for kind, pat in sorted(PII_PATTERNS.items()):
        n_red = n_red + F.size(F.regexp_extract_all(cleaned, F.lit(pat), 0))
        cleaned = F.regexp_replace(cleaned, pat, f"<{kind}>")
    return df.withColumn("n_redactions", n_red.cast("long")).withColumn(
        out_col, cleaned
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition quality signals per document — the filters a
    training pipeline runs to drop boilerplate/spam before a corpus enters
    pretraining: fraction of word n-grams that are repeats, and the share
    taken by the single most frequent n-gram.

    Plan shape: ZERO shuffles. A document's n-grams all live inside its own
    row, so gram frequencies are computable row-locally: build the gram
    array, `array_sort` it, and one `aggregate` pass over the sorted array
    counts distinct grams and the longest equal-run (= max frequency,
    because equal grams are adjacent after sorting). Every expression is a
    JVM higher-order function — no Python, no explode, no groupBy; the
    operator scales linearly with corpus size with no exchange at any SF
    (gate: tests/test_plans.py::test_repetition_is_zero_shuffle).

    Short docs (< n words) degrade to one gram = the whole text, mirroring
    `word_shingles`. Adds: `n_grams`, `n_distinct_grams` (long),
    `dup_gram_frac`, `top_gram_frac` (double, exact integer ratios so the
    SQL oracle divides bit-identically).
    """
    ws = words(text_col)
    cnt = F.size(ws)
    idx = F.sequence(F.lit(1), F.greatest(cnt - n + 1, F.lit(1)))
    grams = F.array_sort(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
    )
    # one fold over the sorted grams: (prev, run, maxrun, distinct)
    state = F.aggregate(
        grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("maxrun"),
            F.lit(0).alias("distinct"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["maxrun"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("maxrun"),
            (
                acc["distinct"]
                + F.when(g == acc["prev"], F.lit(0)).otherwise(F.lit(1))
            ).alias("distinct"),
        ),
    )
    total = F.size(grams)
    return (
        df.withColumn("__rep", state)
        .withColumn("n_grams", total.cast("long"))
        .withColumn("n_distinct_grams", F.col("__rep")["distinct"].cast("long"))
        .withColumn(
            "dup_gram_frac",
            (total - F.col("__rep")["distinct"]).cast("double")
            / total.cast("double"),
        )
        .withColumn(
            "top_gram_frac",
            F.col("__rep")["maxrun"].cast("double") / total.cast("double"),
        )
        .drop("__rep")
    )


#: the Gopher "required word" set (Rae et al. 2021, A1.1): a document must
#: contain at least two of these to pass the stopword rule
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A1.1) —
    the published heuristic gate MassiveWeb applies before pretraining:
    word-count bounds, mean-word-length band, symbol-to-word ratio
    ('#'/'…'), fraction of words with an alphabetic character, and the
    required-stopword rule (≥ 2 distinct words from a fixed set).
    Repetition rules (A1.2) are `repetition_metrics`; composition of the
    two is the full filter.

    Plan shape: ZERO shuffles — every signal is a higher-order-function
    fold over the document's own word array (JVM codegen, no Python, no
    explode). Ratios divide exact integers so the SQL oracle reproduces
    them bit-identically.

    Adds per-rule signal columns, per-rule booleans (`pass_*`), and the
    conjunction `gopher_keep`.
    """
    ws = words(text_col)
    n_words = F.size(ws)
    sum_word_len = F.aggregate(
        F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_len = sum_word_len.cast("double") / n_words.cast("double")
    n_symbols = F.size(F.split(F.col(text_col), "#")) - 1 + (
        F.size(F.split(F.col(text_col), "…")) - 1
    )
    symbol_ratio = n_symbols.cast("double") / n_words.cast("double")
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = n_alpha.cast("double") / n_words.cast("double")
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(ws, s),
        )
    )
    out = (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_len)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("n_stopwords", n_stop.cast("long"))
        .withColumn(
            "pass_word_count",
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words),
        )
        .withColumn(
            "pass_word_len",
            (F.col("mean_word_len") >= min_word_len)
            & (F.col("mean_word_len") <= max_word_len),
        )
        .withColumn("pass_symbol", F.col("symbol_ratio") <= max_symbol_ratio)
        .withColumn("pass_alpha", F.col("alpha_word_frac") >= min_alpha_frac)
        .withColumn("pass_stopwords", F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn(
        "gopher_keep",
        F.col("pass_word_count")
        & F.col("pass_word_len")
        & F.col("pass_symbol")
        & F.col("pass_alpha")
        & F.col("pass_stopwords"),
    )


def c4_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 document-cleaning heuristics (Raffel et al. 2020, §2.2) as
    row-local signals: line count and the fraction of lines ending in
    terminal punctuation, sentence count (C4 drops pages with < 3
    sentences), the 'lorem ipsum' and curly-brace exclusions, and the
    policy-word exclusion C4 applies via its bad-words list (represented
    by the fixed marker 'javascript', the paper's named example).

    ZERO shuffles — splits and regex counts over the document's own text.
    `c4_keep` is the paper's page-level conjunction (line-level pruning
    composes via `chunk_boilerplate`-style ops instead of here).
    """
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    n_punct_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike("[.!?\"']$"))
    )
    n_sentences = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]"), 0))
    lower = F.lower(F.col(text_col))
    has_lorem = lower.contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    has_policy_word = lower.contains("javascript")
    out = (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn(
            "punct_line_frac",
            n_punct_lines.cast("double") / n_lines.cast("double"),
        )
        .withColumn("n_sentences", n_sentences.cast("long"))
        .withColumn("has_lorem", has_lorem)
        .withColumn("has_brace", has_brace)
        .withColumn("has_policy_word", has_policy_word)
    )
    return out.withColumn(
        "c4_keep",
        (F.col("n_sentences") >= 3)
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
        & ~F.col("has_policy_word"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per doc by tf·idf weight.

    Weight uses the LINEAR idf variant tf · (N / df) rather than
    tf · ln(N / df): the ratio of exact integers divides identically in
    every IEEE-754 engine, so the result is bit-reproducible across Spark
    and the SQL oracle (ln differs in the last ulp between libm
    implementations). Ranking order is identical to log-idf within a doc
    whenever tf·N/df ordering is (monotone transform per fixed tf);
    swap in F.log for presentation weights.

    Plan: one explode → (doc, word) tf aggregation (one shuffle),
    word-level df aggregation derived from the same exchange, corpus size
    N as a broadcast 1-row aggregate (no driver action), top-k via a
    per-doc window — WindowGroupLimit prunes before the final sort.
    Output: (id, word, tf, weight, rank).
    """
    w = df.select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("word"))
    tf = w.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("__n"))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "weight",
            (F.col("tf") * F.col("__n")).cast("double") / F.col("df").cast("double"),
        )
    )
    rk = Window.partitionBy("id").orderBy(
        F.col("weight").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= top_k)
        .select("id", "word", "tf", "weight", "rank")
    )


def lm_unigram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_scale: int = 10_000,
) -> DataFrame:
    """CCNet-style LM quality score (Wenzek et al. 2020, arXiv:1911.00359,
    score docs by LM perplexity and keep the low-perplexity tail; the
    unigram variant keeps the same train-then-score dataflow with an
    exactly-replayable model): token frequencies are trained on the corpus
    itself, each doc is scored by its mean token log-probability with
    add-one smoothing. Low scores flag OOV-heavy / non-language docs;
    unusually high scores flag degenerate repeated-token docs.

    Exactness contract: per-token log-probs are fixed-pointed ROW-LOCALLY —
    floor(ln(p) * fp_scale) as BIGINT — so the per-doc aggregation is exact
    integer arithmetic, independent of summation order (float sums are NOT
    reproducible across engines; integer sums are). ln's last-ulp variance
    between libm implementations can only flip a floor when ln(p)*fp_scale
    lands within ~1e-11 of an integer — odds ~1e-9 across a corpus at the
    default scale, and shrinking with fp_scale. The informative double
    `avg_logprob` (nats/token) derives from the exact integers by one
    division.

    Plan: one explode; vocab aggregation (shuffle on word); token→vocab
    equi-join co-partitioned on the same key (the exchanges are distinct —
    partial aggregation sits under the vocab one — but no extra shuffle is
    introduced beyond the join's own); corpus totals as a broadcast 1-row
    aggregate (no driver action); per-doc sum (shuffle on id). At 100 TB,
    cap the vocab (top-M words + an OOV bucket) and the join side becomes
    broadcastable; uncapped it stays a shuffle-colocated join on word.

    Output: (id, n_tokens, sum_nats_fp, avg_logprob).
    """
    toks = df.select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("long").alias("__N"),
        F.count(F.lit(1)).cast("long").alias("__V"),
    )
    scored = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(totals))  # scalar-broadcast idiom, not a cartesian
        .withColumn(
            "__nats_fp",
            F.floor(
                F.log(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("__N") + F.col("__V")).cast("double")
                )
                * F.lit(fp_scale)
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__nats_fp").cast("long").alias("sum_nats_fp"),
        )
        .withColumn(
            "avg_logprob",
            F.col("sum_nats_fp").cast("double")
            / F.col("n_tokens").cast("double")
            / F.lit(float(fp_scale)),
        )
    )


def lm_bigram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_scale: int = 10_000,
) -> DataFrame:
    """Bigram conditional LM quality score — the n-gram step up from
    `lm_unigram_score` toward the CCNet 5-gram filter: score each doc by
    its mean log p(w_i | w_{i-1}) under add-one-smoothed bigram
    frequencies trained on the corpus itself (p = (c(prev,cur) + 1) /
    (c(prev·) + V), V = corpus vocabulary size; the first token of each
    doc has no context and is skipped — standard conditional perplexity).
    Repetitive docs score high under a bigram model even when their
    unigrams are rare — the two scores disagree exactly on the degenerate
    docs a filter must catch.

    Same exactness contract as the unigram score: per-token log-probs are
    fixed-pointed row-locally to BIGINT nats, so aggregation is exact
    integer arithmetic in any engine.

    Plan: the bigram stream is a ROW-LOCAL zip of the word array with its
    shift (no positional self-join); bigram counts, context counts, and
    the vocabulary size are three aggregations; scoring re-joins the
    stream on (prev, cur) and prev. At 100 TB the count frames follow the
    vocab-cap guidance of the unigram score.

    Output: (id, n_bigrams, sum_nats_fp, avg_logprob); single-word docs
    are absent (no bigram to score).
    """
    ws = words(text_col)
    n = F.size(ws)
    bg = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
                lambda p, c: F.struct(p.alias("prev"), c.alias("cur")),
            )
        ).alias("b"),
    ).select("id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    cbg = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("c_ctx"))
    vocab_n = (
        df.select(F.explode(words(text_col)).alias("w"))
        .agg(F.count_distinct("w").cast("long").alias("__V"))
    )
    scored = (
        bg.join(cbg, ["prev", "cur"])
        .join(ctx, "prev")
        .crossJoin(F.broadcast(vocab_n))  # scalar-broadcast idiom
        .withColumn(
            "__nats_fp",
            F.floor(
                F.log(
                    (F.col("c_bg") + 1).cast("double")
                    / (F.col("c_ctx") + F.col("__V")).cast("double")
                )
                * F.lit(fp_scale)
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("__nats_fp").cast("long").alias("sum_nats_fp"),
        )
        .withColumn(
            "avg_logprob",
            F.col("sum_nats_fp").cast("double")
            / F.col("n_bigrams").cast("double")
            / F.lit(float(fp_scale)),
        )
    )


def hashed_linear_score(
    df: DataFrame,
    weights_fp: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_scale: int = 1_000_000,
) -> DataFrame:
    """Serving side of a hashed-bag-of-words linear classifier — the
    GPT-3-style quality-classifier filter (Brown et al. 2020 filtered
    CommonCrawl with a linear classifier; fastText, Joulin et al. 2016,
    is the standard architecture): score = mean over words of
    weight[h(word) mod dim]. Training happens offline on labeled data;
    this operator applies an injected weight vector to a corpus at scale.

    The weight vector arrives PRE-FIXED-POINTED (ints = floor(w *
    fp_scale)), so the per-word lookup is an integer literal and the
    per-doc aggregation is exact BIGINT arithmetic — zero float ops until
    the final division, hence bit-exact in any engine. The feature hash
    is the first 16 bits of md5(word) mod dim (md5 is available and
    bit-identical in Spark and DuckDB — the simhash precedent).

    Plan: one explode, one row-local literal-array lookup, one per-doc
    aggregation (single data shuffle on the id). dim is bounded by
    expression size (the weights inline into the plan) — hundreds to a
    few thousand buckets; a larger model would broadcast a weight table
    and join, same dataflow.

    Output: (id, n_words, score_fp, mean_weight).
    """
    dim = len(weights_fp)
    warr = F.array(*[F.lit(int(v)).cast("long") for v in weights_fp])
    toks = df.select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("w"))
    idx = (F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("int") % dim)
    scored = toks.withColumn("__fp", F.element_at(warr, idx + 1))
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__fp").cast("long").alias("score_fp"),
        )
        .withColumn(
            "mean_weight",
            F.col("score_fp").cast("double")
            / F.col("n_words").cast("double")
            / F.lit(float(fp_scale)),
        )
    )


def vocab_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    vocab_size: int = 64,
) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-`vocab_size` word
    vocabulary (the frequency-truncation step every tokenizer build starts
    from, before BPE merges), then score each document's out-of-vocabulary
    occurrence rate — the signal used to spot corpus/tokenizer mismatch
    (high OOV => the doc's language/domain isn't represented in the vocab).

    Plan shape: one word-keyed count shuffle (partial-agg), a top-V
    TakeOrdered over the DISTINCT-word frame (vocab-sized driver result,
    never data-sized), vocab re-broadcast against the token stream, one
    per-doc agg. Vocab boundary ties break deterministically
    (count desc, word asc) so the result is engine-independent.

    Output: (id, n_words, n_oov, oov_rate) with oov_rate an exact
    long/long double division.
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("word")
    )
    vocab = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("word").asc())
        .limit(vocab_size)
        .select("word", F.lit(True).alias("__in_vocab"))
    )
    flagged = tok.join(F.broadcast(vocab), "word", "left")
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(
            F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_oov"),
        (
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.25,
    b: float = 0.75,
    fp_scale: int = 1_000_000,
) -> DataFrame:
    """BM25 relevance of every document against a bag-of-words query
    (Robertson & Zaragoza 2009) — the lexical-retrieval complement of the
    embedding ANN family (hybrid search runs both and fuses).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).

    Scale shape: the token stream is FILTERED TO QUERY TERMS before any
    aggregation, so tf/df shuffles carry only matching occurrences (query
    cost tracks hit count, not corpus size); doc lengths are a row-local
    `size(split)`; N and avgdl are a 1-row aggregate broadcast via the
    scalar-crossJoin idiom; df is a term-count frame small enough to
    broadcast into the tf join.

    Oracle determinism: each TERM's score is floored to `fp_scale`
    fixed-point BIGINT first and the per-doc total is an integer sum —
    order-independent, so partial aggregation order can't flip results
    (the lm_score precedent). Default k1/b are dyadic (1.25, 0.75): k1+1
    and 1−b are exact binary doubles, so the oracle's literals are
    bit-identical. Output: (id, bm25_fp) for docs matching ≥1 term.
    """
    qlit = [str(t) for t in query_terms]
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("word")
    )
    dl = df.select(
        F.col(id_col).alias("id"), F.size(words(text_col)).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
    )
    qtok = tok.filter(F.col("word").isin(qlit))
    df_t = (
        qtok.distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("double").alias("df_t"))
    )
    tf = qtok.groupBy("id", "word").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    joined = (
        tf.join(F.broadcast(df_t), "word")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    norm = F.col("tf") + k1 * (
        (1.0 - b) + b * F.col("dl") / (F.col("sum_dl") / F.col("n_docs"))
    )
    term_fp = F.floor(
        idf * F.col("tf") * (k1 + 1.0) / norm * F.lit(float(fp_scale))
    ).cast("long")
    return (
        joined.select("id", term_fp.alias("__fp"))
        .groupBy("id")
        .agg(F.sum("__fp").cast("long").alias("bm25_fp"))
    )


def bigram_pmi(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 200,
    fp_scale: int = 10_000,
) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent word
    pairs — PMI(x,y) = ln(p(x,y) / (p(x)p(y))) over corpus unigram/bigram
    counts (Church & Hanks 1990). The vocabulary-building companion to
    the tokenizer ops: high-PMI bigrams are the merge candidates a
    BPE/WordPiece vocab promotes to single tokens.

    Scale shape: one explode for unigrams, one for bigrams (row-local
    adjacent zip — no self-join), two count shuffles keyed by token, and
    the two corpus totals broadcast as 1-row aggregates. Output bounded
    to `top_k` rows by (count, bigram) rank, never data-sized.

    Exactness: counts are BIGINT; the PMI ratio is ONE fixed-order float
    expression over six integer casts, then floor-quantized to
    `fp_scale` — the engine's ln-fixed-point contract (the LM-score and
    BM25 precedent), bit-identical across engines.
    """
    w = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("ws")
    ).filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    uni = w.select(F.explode("ws").alias("x")).groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c_x")
    )
    bg = (
        w.select(
            F.explode(
                F.when(
                    F.size("ws") >= 2,
                    F.expr(
                        "transform(sequence(1, size(ws) - 1), "
                        "i -> struct(ws[i - 1] AS x, ws[i] AS y))"
                    ),
                ).otherwise(F.expr("array()"))
            ).alias("b")
        )
        .select("b.x", "b.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
    )
    totals = uni.agg(
        F.sum("c_x").cast("long").alias("n_uni")
    ).crossJoin(bg.agg(F.sum("c_xy").cast("long").alias("n_bi")))
    # unigram counts are vocabulary-sized (can exceed broadcast budget at
    # corpus scale) — plain equi-joins, let AQE pick the strategy
    j = (
        bg.filter(F.col("c_xy") >= min_count)
        .join(uni.withColumnRenamed("c_x", "cx"), "x")
        .join(
            uni.select(F.col("x").alias("y"), F.col("c_x").alias("cy")), "y"
        )
        .crossJoin(F.broadcast(totals))
    )
    ratio = (
        F.col("c_xy").cast("double")
        * F.col("n_uni").cast("double")
        * F.col("n_uni").cast("double")
    ) / (
        F.col("n_bi").cast("double")
        * F.col("cx").cast("double")
        * F.col("cy").cast("double")
    )
    scored = j.select(
        "x",
        "y",
        "c_xy",
        F.floor(F.log(ratio) * F.lit(float(fp_scale))).cast("long").alias(
            "pmi_fp"
        ),
    )
    # (c_xy, x, y) is a unique total order → deterministic top-k; orderBy+
    # limit plans as TakeOrderedAndProject (per-partition heaps + driver
    # merge of k rows), never a single-partition global sort
    return scored.orderBy(
        F.col("c_xy").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(top_k)


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    id_col: str | None = None,
) -> DataFrame:
    """Learn the first k BPE merges (Sennrich et al. 2016) over the
    corpus, word-level with word-frequency weighting — the tokenizer-
    training step of a data pipeline, run where the data lives instead
    of funnelling the corpus through one machine.

    Semantics pinned exactly (and replayed by the k-stage unrolled
    oracle): symbols start as characters; pair counts are ADJACENT
    OCCURRENCES INCLUDING OVERLAPS ("aaa" counts (a,a) twice) weighted
    by word frequency; the winning pair maximizes (count, then
    lexicographically smallest left, then right); applying a merge
    rewrites every word left-to-right NON-overlapping — the replace()
    semantics all three engines (Python str, Spark, DuckDB) share on the
    space-delimited symbol string ' s1 s2 ... '.

    Plan: one explode + word-frequency aggregation (cached — the corpus
    state is one row per DISTINCT word, already ≤ vocabulary scale, not
    document scale); each of the k iterations is ONE distributed
    pair-count aggregation (explode of adjacent symbol pairs, groupBy
    sum) plus a 1-row argmax collect — the k driver round-trips are the
    inherent sequential dependency of BPE (merge i+1's counts depend on
    merge i), each bounded to a single (pair, count) row. Rewrites are
    row-local replaces chained on the cached vocab.

    Returns (step, lft, rgt, merged, pair_count) — k rows (fewer iff
    the corpus runs out of pairs first).
    """
    spark = df.sparkSession
    w = F.explode(words(text_col)).alias("w")
    vocab = (
        df.select(w)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .select(
            F.concat(
                F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 ")
            ).alias("s"),
            "f",
        )
        .cache()
    )
    corpus = vocab
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, k + 1):
        arr = F.filter(F.split(F.col("s"), " "), lambda z: z != "")
        pz = F.zip_with(
            F.slice(arr, 1, F.size(arr) - 1),
            F.slice(arr, 2, F.size(arr) - 1),
            lambda x, y: F.struct(x.alias("x"), y.alias("y")),
        )
        best = (
            corpus.select(F.col("f"), F.explode(pz).alias("p"))
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("f").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        x, y, cnt = best[0]["x"], best[0]["y"], best[0]["cnt"]
        merges.append((step, x, y, x + y, cnt))
        corpus = corpus.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f" {x} {y} "), F.lit(f" {x}{y} ")
            ),
        )
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "step int, lft string, rgt string, merged string, pair_count long"
    )


def unicode_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode text cleaning — the normalization stage every multilingual
    corpus pipeline runs before tokenization/dedup (round-11 second
    wave): NFC canonical composition (decomposed e+COMBINING ACUTE and
    precomposed é must hash identically or every downstream exact-dedup
    and fingerprint op silently splits them), C0/C1 control-character
    strip, and whitespace-run collapse.

    Cross-engine exactness pins, in order:
    * NFC FIRST (both engines agree codepoint-for-codepoint: DuckDB's
      utf8proc nfc_normalize == Python unicodedata NFC — probed),
    * control strip with the EXPLICIT class
      [\\x00-\\x08\\x0b-\\x1f\\x7f\\x80-\\x9f] — C0 (minus tab/newline,
      which survive into the collapse step), DEL, AND the C1 block
      U+0080-U+009F (round-12 ADVICE fix: the class previously stripped
      C0+DEL only while the docs claimed C1 too; both engines' classes
      widened together, codepoint-parity probed incl. U+0085 NEL),
    * collapse with the EXPLICIT ASCII class [ \\t\\n\\r\\f\\v]+ — never
      regex \\s, which is Unicode-aware in Python but ASCII-only in
      RE2/DuckDB (U+00A0 would split the engines),
    * trim of plain spaces only (after the collapse, edge whitespace is
      exactly one ' ').

    Plan: ZERO shuffles — one Arrow-batched mapInPandas projection over
    the scan; the md5 of the cleaned text is computed in the same batch
    (hashlib over UTF-8 bytes == DuckDB md5(VARCHAR)), so the output is
    a hash-verifiable cleaning certificate: (id, n_chars before/after,
    clean_md5). NULL text is the caller's filter (SQL semantics).
    """
    import pandas as pd

    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t")
    )

    def clean_batch(batches):
        import hashlib
        import re
        import unicodedata

        ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f\x80-\x9f]")
        ws = re.compile(r"[ \t\n\r\f\v]+")

        def clean(s: str) -> str:
            s = unicodedata.normalize("NFC", s)
            s = ctrl.sub("", s)
            s = ws.sub(" ", s)
            return s.strip(" ")

        for pdf in batches:
            if not len(pdf):
                continue
            cleaned = pdf["t"].map(clean)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_before": pdf["t"].str.len().astype("int64"),
                    "n_after": cleaned.str.len().astype("int64"),
                    "clean_md5": cleaned.map(
                        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
                    ),
                }
            )

    return base.mapInPandas(
        clean_batch, "id long, n_before long, n_after long, clean_md5 string"
    )
