#!/usr/bin/env python3
"""Plan evidence for the round-10 co-purchase edge-build change.

`_copurchase_small` (and the pagerank edge build) end in
``localCheckpoint``, so every consumer's ``explain`` shows only a
``Scan ExistingRDD`` tail — the interesting subtrees are hidden. This
script explains the checkpoint-hidden pieces directly:

- ``copurchase_edge_build_{before,after}.txt``: the OLD lineitem
  self-join edge derivation vs the NEW collect_set + double-explode
  derivation (identical output rows — proven by the 16 oracle-parity
  rows; this file is the Exchange-count evidence).
- ``pagerank_iteration_{before,after}.txt``: one PageRank iteration
  joining the checkpointed edge frame against the rank vector,
  WITHOUT vs WITH the ``F.broadcast(ranks)`` hint the adaptive-regime
  loop now applies (the hint is the fix for the checkpoint carrying
  the explode origin's ~2 MB size estimate, which otherwise makes the
  planner broadcast the full edge frame every iteration).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from hangarbay_spark.queries.base import load_table  # noqa: E402
from hangarbay_spark.session import get_spark  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dump(df, name: str) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(HERE, "plans", "r10", f"{name}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")


def main() -> None:
    spark = get_spark(app_name="hangarbay_plan_dump")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")

    # OLD edge build (pre-r10): lineitem self-join on l_orderkey.
    e_old = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    dump(e_old, "copurchase_edge_build_before")

    # NEW edge build (r10): collect_set + double explode — one groupBy
    # shuffle of the projected fact table replaces both self-join sides.
    sets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    e_new = (
        sets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    dump(e_new, "copurchase_edge_build_after")

    # One PageRank iteration over the checkpointed NEW edge frame, as
    # operators/graph.py builds it in the adaptive regime.
    e = e_new.select("src", "dst").distinct()
    ed = e.withColumn(
        "deg",
        F.count(F.lit(1)).over(Window.partitionBy("src")).cast("bigint"),
    )
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ed = ed.repartition(p, "src").localCheckpoint(eager=True)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = float(nodes.count())
    jump, damping = 0.15, 0.85
    ranks0 = nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("rank"))

    def iteration(r_side):
        contrib = ed.join(r_side, ed["src"] == r_side["node"]).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).cast("decimal(30,15)").alias("c"),
        )
        sums = contrib.groupBy("node").agg(
            F.sum("c").cast("double").alias("s")
        )
        return sums.select(
            "node",
            F.round(
                F.lit(jump) / F.lit(n) + F.lit(damping) * F.col("s"), 12
            ).alias("rank"),
        )

    # Iteration 1's rank vector estimates SMALLER than the edge frame
    # (it is an aggregate of the same tiny origin), so the first round
    # plans fine either way — the pathology starts at iteration 2,
    # when ranks is checkpoint-backed by the round-1 JOIN plan and its
    # origin estimate exceeds the edge frame's ~2 MB: the planner then
    # broadcasts the FULL edge frame (before file). The loop's
    # F.broadcast(ranks) hint pins the rank vector as the build side
    # (after file).
    r1 = iteration(ranks0).localCheckpoint(eager=False)
    r1.count()  # materialize, as the real loop's action would
    dump(iteration(r1), "pagerank_iteration_before")
    dump(iteration(F.broadcast(r1)), "pagerank_iteration_after")
    spark.stop()


if __name__ == "__main__":
    main()
