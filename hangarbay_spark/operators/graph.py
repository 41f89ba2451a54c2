"""Iterative graph algorithms as distributed join-agg loops.

Companion of the connected-components min-label propagation in
operators/dedup.py. Every iteration is one hash join of the edge list
against the current per-node vector plus one aggregation shuffled on
the same node key; edge/degree frames are built once and
localCheckpoint'd so no iteration re-derives them, and rank vectors
stay distributed — the only driver-side scalar is the node count.

Float discipline (queries/base.py): the per-edge contribution
rank/deg is a single IEEE divide (identical inputs give identical
doubles on any engine), the per-node sum accumulates in
DECIMAL(30,15) (order-independent), and each iteration rounds at
12 dp as the FMA-contraction guard — so a fixed iteration count is
exactly reproducible cross-engine (see the unrolled-CTE oracle of
queries/analytics.py:graph_pagerank_copurchase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    symmetric: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Nodes are the distinct ``src`` values — callers whose graphs have
    sinks (nodes with no out-edges) should symmetrize or add self
    loops first; with every node having out-degree >= 1 no dangling
    mass is lost and ranks sum to 1. Nodes with no IN-edges keep the
    teleport mass (1-d)/n. Returns ``(node, rank)`` with rank rounded
    at 12 dp per iteration.

    ``symmetric=True`` declares every node has at least one IN-edge
    (true for any symmetrized/undirected graph, e.g. co-occurrence):
    the per-iteration "re-attach zero-in-degree nodes" left join is
    then provably a no-op and is skipped, so each iteration is exactly
    one hash join + one aggregation. The edge frame is additionally
    checkpointed pre-partitioned on ``src`` — the aggregation output
    is already hash-partitioned on the node key, so with AQE's
    partition coalescing off for the loop the join needs no new
    exchange: ONE shuffle per iteration, the floor for message-passing
    on a cluster.
    """
    from pyspark.sql.window import Window

    # Degree via an unordered window over the deduped edges: one
    # exchange on src, replacing the aggregate-then-join formulation's
    # groupBy exchange PLUS edge-side join exchange (3 exchanges -> 2
    # in the one-time build). Callers pass raw edge lists; the single
    # distinct here dedups them.
    e = edges.select("src", "dst").distinct()
    ed = e.withColumn(
        "deg",
        F.count(F.lit(1)).over(Window.partitionBy("src")).cast("bigint"),
    )
    if symmetric:
        # Pin the edge side to hashpartitioning(src, P) where P is the
        # static shuffle-partition count (AQE coalescing would give the
        # checkpointed RDD a data-dependent count that can never match
        # the loop aggregates', forcing a re-shuffle of ed every
        # iteration — the exact cost this path removes).
        spark = edges.sparkSession
        p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        ed = ed.repartition(p, "src")
    ed = ed.localCheckpoint(eager=True)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = float(nodes.count())
    jump = 1.0 - damping
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("rank"))
    for _ in range(iters):
        contrib = ed.join(
            ranks, ed["src"] == ranks["node"]
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).cast("decimal(30,15)").alias("c"),
        )
        sums = contrib.groupBy("node").agg(
            F.sum("c").cast("double").alias("s")
        )
        if symmetric:
            ranks = sums.select(
                "node",
                F.round(
                    F.lit(jump) / F.lit(n) + F.lit(damping) * F.col("s"),
                    12,
                ).alias("rank"),
            ).localCheckpoint(eager=False)
        else:
            ranks = (
                nodes.join(sums, "node", "left")
                .select(
                    "node",
                    F.round(
                        F.lit(jump) / F.lit(n)
                        + F.lit(damping) * F.coalesce("s", F.lit(0.0)),
                        12,
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
    return ranks
