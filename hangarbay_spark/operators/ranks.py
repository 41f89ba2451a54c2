"""Distributed exact-rank constructions.

Two shapes replace single-task global Sort+Window ranks (the last
row-scale serialized sorts in the registry, flagged by the round-7
plan audit):

1. ``value_prefix`` — the distinct-value / coarse-value-grid exact
   prefix sum proven in ``agg_equidepth_histogram``: collapse the
   frame to distinct (group, value) pairs with multiplicities (one
   map-side-combined groupBy — the only corpus-scale shuffle), split
   the cumulative with a coarse VALUE-GRID bin (bounded by the
   generator's fixed value range at ANY scale, monotone in the value
   since IEEE divide and floor are monotone) into a parallel
   within-bin window plus a tiny bin-offset pass — the classic
   two-level scan.  The fact table is never sorted through one
   partition; within-bin window partitions are value-domain-bounded
   (a $1000 price band holds at most 100k distinct cent values).
   Output: cb = #rows strictly before v in the group's order,
   c = multiplicity, n = group size.  The value at 1-indexed rank k
   is the unique row with cb < k <= cb + c; at 0-indexed position k,
   cb <= k < cb + c.  Works for ties: every copy of a value shares
   one row, and rank selection only ever needs the VALUE.

2. ``range_rank`` — exact 1-indexed global rank for a UNIQUE total
   ordering (row-domain frames where a distinct-value collapse buys
   nothing, e.g. per-user score deciles): the TeraSort construction.
   ``repartitionByRange`` puts contiguous key ranges in separate
   partitions (sampled boundaries — nondeterministic LAYOUT, but the
   rank of a unique tuple in a total order is boundary-independent,
   so the OUTPUT is deterministic); per-partition ``row_number`` plus
   a cumulative partition-count offset pass (P rows) yields the
   global rank with two parallel shuffles and no single-task sort.

``ntile_sql`` reproduces SQL NTILE(k) from the exact rank in pure
integer arithmetic (the first n % k buckets get one extra row —
identical semantics in Spark and DuckDB), so an oracle that says
NTILE hashes unchanged against a Spark side that ranks distributively.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def value_prefix(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    bin_div: float,
) -> DataFrame:
    """Exact distributed order-statistic prefix over distinct values.

    Returns (group..., __v, __c, __cb, __n): multiplicity, rows
    strictly before __v within the group's ascending value order, and
    the group row count.  ``bin_div`` is the coarse value-grid width;
    pick it so the grid is bounded by the generator's value range
    (~tens-to-hundreds of bins), independent of corpus scale.
    """
    gc = list(group_cols)
    d = df.groupBy(
        *gc,
        F.col(val_col).alias("__v"),
        F.floor(F.col(val_col) / F.lit(bin_div)).cast("bigint").alias("__g"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    b = d.groupBy(*gc, "__g").agg(F.sum("__c").cast("bigint").alias("__bc"))
    wg = Window.partitionBy(*gc).orderBy("__g")
    wall = Window.partitionBy(*gc).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    o = b.select(
        *gc,
        "__g",
        F.coalesce(
            F.sum("__bc").over(wg.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("__goff"),
        F.sum("__bc").over(wall).cast("bigint").alias("__n"),
    )
    wp = Window.partitionBy(*gc, "__g").orderBy("__v")
    return d.join(F.broadcast(o), [*gc, "__g"]).select(
        *gc,
        "__v",
        "__c",
        (
            F.col("__goff")
            + F.coalesce(
                F.sum("__c").over(wp.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
        )
        .cast("bigint")
        .alias("__cb"),
        "__n",
    )


def hit_rank(k: Column) -> Column:
    """True on the unique value_prefix row holding 1-indexed rank k."""
    return (F.col("__cb") < k) & (k <= F.col("__cb") + F.col("__c"))


def hit_idx(k: Column) -> Column:
    """True on the unique value_prefix row holding 0-indexed position k."""
    return (F.col("__cb") <= k) & (k < F.col("__cb") + F.col("__c"))


def range_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    num_partitions: int = 32,
    out: str = "rn",
) -> DataFrame:
    """Exact 1-indexed rank of each row under a UNIQUE total ordering.

    Appends ``out`` (the rank) and ``__n`` (total rows) to df's
    columns.  ``order_cols`` must define a total order (include a
    unique tie-break) — required both for exactness and so no tie
    straddles a range boundary.  The range-partitioned frame is
    localCheckpointed because it feeds two consumers (the P-row count
    pass and the ranked pass) with different projections, which
    ReuseExchange does not dedup; the checkpoint also stops the
    boundary-sampling pass from re-executing an expensive child.
    ``num_partitions`` bounds the serialized offset pass at P rows;
    size it by rows at cluster scale (the graph.loop_partitions
    ~300k-rows-per-partition discipline).
    """
    t = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    pc = t.groupBy("__pid").agg(F.count(F.lit(1)).cast("bigint").alias("__pc"))
    wo = Window.orderBy("__pid")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = pc.select(
        "__pid",
        F.coalesce(
            F.sum("__pc").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("__off"),
        F.sum("__pc").over(wall).cast("bigint").alias("__n"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return t.join(F.broadcast(off), "__pid").select(
        *df.columns,
        (F.col("__off") + F.row_number().over(w)).cast("bigint").alias(out),
        "__n",
    )


def ntile_sql(rn: str, n: str, k: int) -> str:
    """SQL text reproducing NTILE(k) from exact rank ``rn`` of ``n``
    rows: q = n DIV k, r = n % k; the first r buckets hold q+1 rows.
    Pure integer arithmetic — identical in Spark and DuckDB, so it
    matches an oracle-side NTILE exactly."""
    q = f"({n} DIV {k})"
    r = f"({n} % {k})"
    return (
        f"CAST(CASE WHEN {rn} <= {r} * ({q} + 1) "
        f"THEN ({rn} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {r} + ({rn} - {r} * ({q} + 1) - 1) DIV {q} + 1 END "
        f"AS BIGINT)"
    )
