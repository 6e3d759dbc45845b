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


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance (<= max_hops) from any seed.

    The recursive-CTE workload Spark SQL cannot express (no WITH
    RECURSIVE): level-synchronous frontier expansion, the Pregel BFS
    pattern as DataFrame joins. Each round joins the CURRENT frontier
    (only nodes discovered last round — not the whole visited set)
    against the edge list, then anti-joins out already-visited nodes, so
    per-round work is O(frontier x avg-degree), the textbook distributed
    BFS cost.

    `edges` must be DIRECTED (src, dst) — pass both directions for an
    undirected graph. `seeds` is a 1-column frame of start node ids
    (hop 0). Hop counts are exact integers: bit-identical across engines
    and partitionings, so a SQL oracle (recursive CTE) reproduces them.

    Scale: O(max_hops) shuffle rounds, each an equi-join on node id. The
    visited set is carried as a DataFrame (never collected). The edge
    list and each round's frontier are localCheckpointed NON-eagerly
    (build stays action-free): an expensive edge derivation (e.g. the
    n-gram similarity join) is paid once, not once per hop, and the
    visited lineage — referenced twice per round (union + anti-join) —
    stops compounding exponentially.

    Output: (id, hop) — one row per reachable node, hop in [0, max_hops].
    """
    edges = edges.localCheckpoint(eager=False)
    visited = seeds.select(
        F.col(seeds.columns[0]).alias("id"), F.lit(0).cast("int").alias("hop")
    ).dropDuplicates(["id"])
    frontier = visited.select("id")
    for h in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(visited.select("id"), "id", "left_anti")
            .localCheckpoint(eager=False)
        )
        frontier = nxt
        visited = visited.unionByName(
            nxt.select("id", F.lit(h).cast("int").alias("hop"))
        ).localCheckpoint(eager=False)
    return visited


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    `edges` is one row per undirected edge with a < b ((id_a, id_b) —
    the near-dup pair shape from operators/dedup.py). The classic
    quadratic hazard is wedge enumeration at high-degree hubs; the
    standard fix (Cohen 2009 MapReduce triangle counting; GraphX's
    implementation) is DEGREE ORIENTATION: direct every edge from the
    lower-(degree, id) endpoint to the higher, so every wedge is rooted
    at its lowest-degree corner and per-node wedge work is bounded by
    (min-degree choose 2) — O(m^{3/2}) total instead of sum(deg^2).

    All joins are equi-joins on node ids; counts are exact integers, so
    the whole computation replays in a SQL oracle bit-identically.

    Output: (id, n_triangles) for every node that appears in an edge
    (0 for triangle-free nodes).
    """
    # the edge list is scanned by degree, orientation, wedge, and closure
    # stages — checkpoint it (non-eager) so an expensive upstream pair
    # derivation is computed once, and the oriented frame likewise (it
    # feeds three join inputs)
    und = edges.select(
        F.col(edges.columns[0]).alias("a"), F.col(edges.columns[1]).alias("b")
    ).localCheckpoint(eager=False)
    nodes = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .dropDuplicates(["id"])
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    # orient each edge from the lower (deg, id) endpoint to the higher
    d = und.join(
        deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a")), "a"
    ).join(deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b")), "b")
    lo_is_a = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = d.select(
        F.when(lo_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint(eager=False)
    # wedges rooted at the low corner: (root)->(u), (root)->(v), u < v
    # by the same orientation key; closing edge must also be oriented u->v
    left = oriented.select(F.col("lo").alias("root"), F.col("hi").alias("u"))
    right = oriented.select(F.col("lo").alias("root"), F.col("hi").alias("v"))
    wedges = left.join(right, "root").filter(F.col("u") != F.col("v"))
    closing = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    tri = wedges.join(closing, ["u", "v"])  # each triangle closes once
    corners = (
        tri.select(F.col("root").alias("id"))
        .unionByName(tri.select(F.col("u").alias("id")))
        .unionByName(tri.select(F.col("v").alias("id")))
    )
    counts = corners.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    return nodes.join(counts, "id", "left").select(
        "id",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )


def pagerank_weighted_fixed_point(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    scale: int = 10**12,
) -> DataFrame:
    """Edge-WEIGHTED PageRank in the same exact fixed-point contract as
    `pagerank_fixed_point`: `edges` is (src, dst, w) with POSITIVE
    integer weights (e.g. similarity in 1e-4 fixed point), and each
    node's rank is split across out-edges proportionally to weight —
    contribution = (rank_fp · w) div Σw(src). On a near-dup graph this
    is the degree-corrected centrality: a 0.9-Jaccard copy pulls far
    more rank to the original than a 0.3 borderline match, where the
    unweighted walk treats them alike.

    Integer-overflow bound: rank_fp ≤ scale and the product rank_fp · w
    must stay under 2^63, so per-edge weights up to ~9e5 are safe at the
    default scale — similarity fixed-point (≤ 1e4) has 500× headroom.
    Plan shape identical to the unweighted form: O(iters) edge-list
    shuffles, weights carried on the edge rows (no extra join).
    """
    n_nodes = nodes.count()  # scalar, metadata-sized (driver-safe)
    if n_nodes == 0:
        return nodes.sparkSession.createDataFrame(
            [], "id bigint, rank_fp bigint"
        )
    base_fp = (scale // DAMP_DEN) // n_nodes
    init_fp = scale // n_nodes

    out_w = edges.groupBy("src").agg(F.sum("w").cast("long").alias("__sw"))
    ranks = nodes.select(
        F.col(nodes.columns[0]).alias("id"),
        F.lit(init_fp).cast("long").alias("rank_fp"),
    )
    ed = edges.join(out_w, "src")
    for _ in range(iters):
        contrib = ed.join(
            ranks.select(F.col("id").alias("src"), "rank_fp"), "src"
        ).select(
            F.col("dst").alias("id"),
            F.expr("(rank_fp * w) div __sw").alias("__c"),
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


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """J-round k-core peeling: repeatedly drop every node whose degree
    (within the surviving subgraph) is below k. With enough rounds the
    survivors are exactly the k-core (the maximal subgraph of min-degree
    ≥ k) — the density filter a dedup pipeline runs on the near-dup
    graph to separate tight duplicate clusters from incidental edges.

    `rounds` is PINNED (not run-to-convergence) so the semantics are a
    pure function both engines replay — the entry's test asserts one
    extra peel changes nothing on the gate data, i.e. the pinned J
    reached the true fixed point. Each round is one degree aggregation
    + two semi-joins, localCheckpointed non-eagerly to keep the
    iteration's lineage flat (the bfs_levels discipline). Convergence
    rounds needed = peeling depth, typically ≪ node count; at 100 TB
    each round is degree-agg shuffle cost, nothing quadratic.

    `edges`: (src, dst) with BOTH directions present (symmetric).
    Returns (id, core_deg): surviving nodes with their within-core
    degree."""
    from pyspark.sql import functions as F

    edges = edges.localCheckpoint(eager=False)
    alive = edges.select(F.col("src").alias("id")).distinct().localCheckpoint(
        eager=False
    )
    # NOTE (round-15, measured and REJECTED): an early exit at the fixed
    # point (alive counts are monotone, so equal consecutive counts prove
    # convergence and make remaining rounds provable no-ops) is value-
    # safe but benched 4-5x WORSE at sf0.1 (4.1 -> 16-21 s, jobs 37 ->
    # 45): the per-round count() turns this single lazily-checkpointed
    # cascade — which the final action runs as ONE pipelined job tree —
    # into `rounds` synchronous barrier jobs, each paying its own AQE
    # replan + broadcast build. The lazy cascade stands.
    for _ in range(rounds):
        live_edges = (
            edges.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        deg = live_edges.groupBy("src").agg(
            F.count(F.lit(1)).cast("long").alias("dg")
        )
        alive = (
            deg.filter(F.col("dg") >= k)
            .select(F.col("src").alias("id"))
            .localCheckpoint(eager=False)
        )
    final_edges = (
        edges.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
    return final_edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("core_deg")
    )
