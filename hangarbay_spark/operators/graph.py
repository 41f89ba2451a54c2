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
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Nodes are the distinct ``src`` values — callers whose graphs have
    sinks (nodes with no out-edges) should symmetrize or add self
    loops first; with every node having out-degree >= 1 no dangling
    mass is lost and ranks sum to 1. Nodes with no IN-edges keep the
    teleport mass (1-d)/n. Returns ``(node, rank)`` with rank rounded
    at 12 dp per iteration.
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
    ).localCheckpoint(eager=True)
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
