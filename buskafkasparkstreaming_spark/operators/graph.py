"""Iterative graph analytics over relational edges (join-based message
passing — the Pregel pattern expressed as DataFrame ops).

Complements the distributed union-find in operators/dedup.py
(connected_components): union-find answers "which docs form one near-dup
group"; PageRank answers "which doc is the most central of its group" — a
better canonical-representative choice than min-id when near-dup clusters
mix an original with partial copies (the original accumulates links from
every copy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: PageRank damping as an EXACT dyadic rational (7/8 = 0.875) so every
#: arithmetic step stays in integers — see pagerank_fixed_point.
DAMP_NUM, DAMP_DEN = 7, 8


def pagerank_fixed_point(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank with EXACT fixed-point integer arithmetic.

    `edges` must be DIRECTED (src, dst) — pass both directions for an
    undirected similarity graph. `nodes` is a 1-column frame of every
    node id (isolated nodes keep the teleport mass).

    Why fixed point: float PageRank sums contributions in partial-agg
    order, so two engines (or two runs) disagree in the last ulp and a
    rank hash-compare is meaningless. Here rank is a BIGINT in units of
    1/scale: contributions use integer division (`div`), the damping 7/8
    is exact, and integer sums are order-independent — bit-identical
    across engines, partitionings, and retries. The truncation error is
    ≤ deg/scale per node per round: irrelevant at scale=1e12.

    Plan shape per iteration: one broadcast-or-shuffle join of edges
    against current ranks (edges are the big side and keep their
    partitioning), one partial-agg shuffle on dst, one left join back to
    nodes. O(iters) shuffles of the edge list, never materializing an
    N×N matrix. At 1000 executors the edge join is the standard
    power-iteration cost; convergence needs ~10–20 iters, `iters` is the
    caller's budget.

    Dangling nodes (no out-edges) leak their damped mass instead of
    redistributing it — the standard simplification; ranks remain a
    correct relative ordering, just not a probability distribution.

    Output: (id, rank_fp) — BIGINT fixed-point rank.
    """
    n_nodes = nodes.count()  # scalar, metadata-sized (driver-safe)
    if n_nodes == 0:
        return nodes.sparkSession.createDataFrame(
            [], "id bigint, rank_fp bigint"
        )
    base_fp = (scale // DAMP_DEN) // n_nodes  # (1-d)/N in fixed point
    init_fp = scale // n_nodes

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select(
        F.col(nodes.columns[0]).alias("id"),
        F.lit(init_fp).cast("long").alias("rank_fp"),
    )
    ed = edges.join(out_deg, "src")
    for _ in range(iters):
        contrib = ed.join(
            ranks.select(F.col("id").alias("src"), "rank_fp"), "src"
        ).select(
            F.col("dst").alias("id"),
            F.expr("rank_fp div __deg").alias("__c"),
        )
        incoming = contrib.groupBy("id").agg(F.sum("__c").alias("__in"))
        ranks = (
            ranks.select("id")
            .join(incoming, "id", "left")
            .select(
                "id",
                (
                    F.lit(base_fp)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(__in, 0L)) div {DAMP_DEN}"
                    )
                ).cast("long").alias("rank_fp"),
            )
        )
    return ranks
