"""Distributed graph algorithms over edge-list DataFrames.

The reference's metadata model stores *relations*; real pipelines also
derive graphs from them (citation / link / trade graphs) and need
iterative algorithms that survive cluster scale. Everything here works
on a plain ``(src, dst, weight)`` edge DataFrame and keeps the data
distributed: per-iteration cost is one join + one groupBy shuffle, the
driver holds only iteration control, and every iteration ends in a
:func:`~iceberg_rs_spark.operators.dedup.barrier` so the lineage does
not double per round (rank_t feeds both the contribution join and the
dangling-mass aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_rs_spark.operators.dedup import barrier


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution.

    ``rank_{t+1}(v) = (1-d)/N + d * (Σ_u rank_t(u)·w(u,v)/out(u)
    + dangling_t/N)`` where ``out(u)`` is u's total outgoing weight and
    ``dangling_t`` is the rank mass sitting on nodes with no outgoing
    edges. Fixed ``iterations`` (no convergence test) so the result is
    a pure function of the input — required for oracle hash-checking.

    Scale posture: the node set, out-degree totals, and per-iteration
    contributions are all DataFrames partitioned by node id — nothing
    proportional to |V| or |E| ever reaches the driver. The two
    scalars an iteration needs (N once, dangling mass per round) stay
    in 1-row DataFrames joined in via broadcast — a broadcast of ONE
    row, not of a relation that grows with data. Each iteration is
    barriered: without it, rank_t's plan is re-derived once per
    downstream reference and the lineage doubles every round
    (2^iterations recomputes of the edge build by round 5).
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.col(weight) if weight else F.lit(1)).cast("double").alias("w"),
    ).where(F.col("w") > 0)
    e = barrier(e)

    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    nodes = barrier(nodes)
    n_nodes = nodes.count()  # one metadata-sized scalar, computed once

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # normalized transition weight w(u,v)/out(u), fixed across rounds
    trans = barrier(
        e.join(out_w, "src").select(
            "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
        )
    )
    has_out = trans.select("src").distinct()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    ranks = barrier(ranks)
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        dangling = (
            ranks.join(has_out, ranks["node"] == has_out["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contribs = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))  # 1-row frame: scalar, not a relation
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
        )
        prev = ranks
        ranks = barrier(new_ranks)
        prev.unpersist()
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
) -> DataFrame:
    """Synchronous weighted label propagation (community detection).

    Every node starts in its own community (label = node id). Each
    round, a node adopts the label carrying the highest total incoming
    edge weight among its neighbours' *previous-round* labels, ties
    broken by the smallest label — a deterministic variant of
    Raghavan et al.'s LPA, so a fixed ``iterations`` makes the result
    a pure function of the input (hash-checkable against an
    unrolled-CTE oracle). Pass symmetric edges for undirected graphs.

    Scale posture mirrors :func:`pagerank`: one join + one groupBy +
    one per-node window per round, everything partitioned by node id,
    nothing proportional to |V| or |E| on the driver, and each round
    barriered so lineage stays flat.
    """
    from pyspark.sql import Window

    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.col(weight) if weight else F.lit(1)).cast("double").alias("w"),
    ).where(F.col("w") > 0)
    e = barrier(e)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = barrier(nodes)

    labels = nodes.select("node", F.col("node").cast("long").alias("lbl"))
    labels = barrier(labels)
    rn = F.row_number().over(
        Window.partitionBy("node").orderBy(F.desc("wsum"), F.asc("lbl"))
    )
    for _ in range(iterations):
        votes = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.sum("w").alias("wsum"))
        )
        winners = (
            votes.withColumn("rn", rn)
            .where(F.col("rn") == 1)
            .select("node", F.col("lbl").alias("new_lbl"))
        )
        new_labels = (
            labels.join(winners, "node", "left")
            .select("node", F.coalesce("new_lbl", "lbl").alias("lbl"))
        )
        prev = labels
        labels = barrier(new_labels)
        prev.unpersist()
    return labels


def bfs_hops(
    edges: DataFrame,
    source: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Minimum-hop distances from ``source`` by ``rounds`` synchronous
    BFS relaxations (min-plus over the unweighted edge list). Returns
    ``(node, hops)`` for every node reached within ``rounds``; a fixed
    round count keeps the result a pure function of the input. Each
    round is one join + one groupBy-min shuffled on node id with a
    lineage barrier — the same bounded-round posture as the
    connected-components operator in operators/dedup.py."""
    e = barrier(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    dist = e.sparkSession.createDataFrame(
        [(source, 0)], "node long, hops int"
    )
    dist = barrier(dist)
    for _ in range(rounds):
        relaxed = (
            e.join(dist, e["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        new_dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hops").cast("int").alias("hops"))
        )
        prev = dist
        dist = barrier(new_dist)
        prev.unpersist()
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """``rounds`` synchronous peeling passes toward the k-core: each
    round drops every node whose current degree is below ``k`` and
    every edge touching a dropped node. A fixed round count keeps the
    result a pure function of the input (the true k-core is the fixed
    point; bounded rounds give the certified approximation, exactly
    like the bounded CC/BFS/LPA operators). Returns ``(node, deg)``
    for surviving nodes with their degree in the surviving subgraph.
    Each round is one degree aggregation plus two semi-joins, all
    shuffled on node id; survivors shrink monotonically so per-round
    cost only decreases."""
    e = barrier(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("node")
        new_e = e.join(
            keep.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        prev = e
        e = barrier(new_e)
        prev.unpersist()
    return (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
