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
