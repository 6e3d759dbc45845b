"""Sequence packing for training-batch assembly (BASELINE.json north_star).

LLM pretraining concatenates documents into fixed-token-budget training
sequences; the cluster-side half of that job is assigning every document a
(pack_group, bin) so a downstream `groupBy(pack_group, bin)` +
`collect_list`/`concat_ws` materializes each training sequence with one
shuffle.

Scale shape: a GLOBAL greedy pack would need a global sort + running sum —
a single-partition window, dead at 100 TB. Bins are independent of each
other, so the corpus is first split into `num_groups` deterministic pack
groups (id modulo — a pure row-local function, no shuffle skew) and packed
WITHIN each group: the running-sum window partitions by group and
parallelizes across them. num_groups scales with the cluster (one group's
documents must fit one task's sort — at 100 TB pick num_groups so each
group is a few GB).

Bin assignment is fixed-boundary streaming packing: documents are laid out
in id order and a bin boundary falls every `budget` tokens — bin =
floor(tokens_before / budget). A document straddling a boundary belongs to
the bin its first token falls in (bins may exceed budget by less than one
document; training pipelines truncate or re-chunk at sequence assembly).
Deterministic, order-stable, and expressible as one window cumsum in any
SQL engine — no driver loop, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_budget(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_groups: int = 32,
) -> DataFrame:
    """Assign (pack_group, bin_in_group) to every row. One window cumsum
    partitioned by pack_group — parallel across groups, no global sort."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    grouped = df.withColumn(
        "pack_group", (F.col(id_col) % num_groups).cast("long")
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tokens_before = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return grouped.withColumn(
        "bin_in_group", F.floor(tokens_before / F.lit(budget)).cast("long")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into fixed-size training chunks with optional
    overlap — the other half of context-length preprocessing (packing
    concatenates short docs; chunking splits long ones). Chunk k of a doc
    covers words [k*stride, k*stride + chunk_tokens) for stride =
    chunk_tokens − overlap, for every k with k*stride < n_words; the tail
    chunk is emitted short rather than dropped (training pipelines pad or
    pack it downstream). A doc shorter than one chunk yields itself.

    Pure row-local explode — ZERO shuffles, no UDF: chunk count and slices
    are array expressions over the split-once word array, so at 100 TB
    this is a single map stage over the scan, parallel in the input
    splits. Deterministic and SQL-replayable (integer chunk boundaries).

    Output: (id, chunk_id, n_chunks, chunk_text, chunk_len) — one row per
    chunk, chunk_id 0-based.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    from buskafkasparkstreaming_spark.operators.text import words

    ws = words(text_col)
    n = F.size(ws)
    # ceil(n / stride) in exact integer arithmetic; n >= 1 always (split
    # of an empty string is [''])
    n_chunks = F.floor((n + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    return (
        df.select(
            F.col(id_col).alias("id"),
            ws.alias("__ws"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("__k", "__junk"),
        )
        .select(
            "id",
            F.col("__k").cast("long").alias("chunk_id"),
            F.floor((F.size("__ws") + F.lit(stride - 1)) / F.lit(stride))
            .cast("long")
            .alias("n_chunks"),
            F.array_join(
                F.slice(F.col("__ws"), F.col("__k") * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__ws"), F.col("__k") * stride + 1, chunk_tokens)
            ).cast("long").alias("chunk_len"),
        )
    )


FFD_SCHEMA = (
    "id long, tokens long, pack_group long, bin_in_group long"
)


def pack_ffd(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_groups: int = 32,
) -> DataFrame:
    """First-Fit-Decreasing bin packing within parallel pack groups — the
    QUALITY upgrade over `pack_token_budget`'s fixed-boundary streaming
    pack: every emitted bin respects the budget exactly (no boundary
    straddle), and FFD's classic guarantee (≤ 11/9·OPT + 6/9 bins,
    Johnson 1973) minimizes padding waste, which is what training-batch
    assembly actually pays for.

    Scale shape: same as pack_token_budget — bins never span pack groups,
    groups are a deterministic row-local id-modulo, so the sequential FFD
    loop runs per group inside `applyInPandas` (Arrow-batched, parallel
    across groups; ONE shuffle on pack_group). Pick num_groups so one
    group fits one task. Within a group: sort by (tokens desc, id asc)
    — deterministic — and place each doc into the lowest-numbered bin
    with room. A doc larger than the whole budget gets a dedicated
    overflow bin (emitted as-is; sequence assembly re-chunks it).

    Output: (id, tokens, pack_group, bin_in_group).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    import pandas as pd

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["tokens", "id"], ascending=[False, True], kind="mergesort"
        )
        caps: list[int] = []  # remaining capacity per bin
        bins: list[int] = []
        for t in pdf["tokens"]:
            t = int(t)
            if t >= budget:
                # dedicated overflow bin, never reused: capacity -1 so
                # not even a ZERO-size item first-fits into it (cap >= t
                # held for t == 0 at cap 0 — the r12 property-test catch)
                bins.append(len(caps))
                caps.append(-1)
                continue
            for i, cap in enumerate(caps):
                if cap >= t:
                    bins.append(i)
                    caps[i] = cap - t
                    break
            else:
                bins.append(len(caps))
                caps.append(budget - t)
        return pdf.assign(bin_in_group=bins)

    prepped = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(token_col), F.lit(0)).cast("long").alias("tokens"),
        (F.col(id_col) % num_groups).cast("long").alias("pack_group"),
    )
    return prepped.groupBy("pack_group").applyInPandas(ffd, FFD_SCHEMA)


def plan_compaction(
    objects: DataFrame,
    part_col: str,
    obj_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """FFD COMPACTION PLANNER over a lakehouse object inventory — the
    packing × manifest composition from the SURVEY round-12 candidate
    list: given (partition, object, size) rows, plan which small
    objects merge into which compacted output file so every planned
    write stays <= `budget` (rows or bytes — the caller's unit).

    This is `pack_ffd`'s loop pointed at a DIFFERENT domain: bins never
    span TABLE PARTITIONS (a compacted file lives in exactly one
    partition directory — the ManifestUpsertTable/Hudi layout
    invariant), the group key is the partition VALUE itself (string,
    domain-bounded: one partition per applyInPandas task — the
    grouped_ntile broadcast contract), and objects already >= budget
    get a DEDICATED singleton bin, i.e. the planner leaves them
    untouched (rewriting an already-full file buys nothing and costs a
    full read+write).

    Within a partition: sort (size DESC, object ASC) — deterministic —
    and first-fit each object into the lowest-numbered bin with room
    (FFD, <= 11/9·OPT + 6/9 bins, Johnson 1973: fewest compacted
    writes for the merge work). A partition that is already compact
    (every object in its own bin because nothing fits together) plans
    zero merges; the executor can skip any bin with a single object.

    Output: (part, obj, size, bin_in_part) — `groupBy(part,
    bin_in_part)` is the compactor's work list.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    import pandas as pd

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["size", "obj"], ascending=[False, True], kind="mergesort"
        )
        caps: list[int] = []
        bins: list[int] = []
        for t in pdf["size"]:
            t = int(t)
            if t >= budget:
                bins.append(len(caps))
                # capacity -1: not even a zero-size object may first-fit
                # into an untouched full object's bin
                caps.append(-1)
                continue
            for i, cap in enumerate(caps):
                if cap >= t:
                    bins.append(i)
                    caps[i] = cap - t
                    break
            else:
                bins.append(len(caps))
                caps.append(budget - t)
        return pdf.assign(bin_in_part=bins)

    prepped = objects.select(
        F.col(part_col).cast("string").alias("part"),
        F.col(obj_col).cast("string").alias("obj"),
        F.coalesce(F.col(size_col), F.lit(0)).cast("long").alias("size"),
    )
    schema = "part string, obj string, size long, bin_in_part long"
    return prepped.groupBy("part").applyInPandas(ffd, schema)
