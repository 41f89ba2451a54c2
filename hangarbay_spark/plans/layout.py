"""Physical layout helpers — the Spark substitutes for the reference's
six B-tree indexes (/root/reference/pipelines/publish.py:206-213; see
SURVEY.md Q6).

Spark has no secondary indexes; the equivalents are layout decisions
made at write time:

- **sorted layout** (:func:`write_sorted`): range-partition + sort by
  the lookup key so parquet row-group min/max statistics prune point
  lookups and range scans to one row group — the B-tree analog.
- **bucketed layout** (:func:`write_bucketed`): hash-bucket by the join
  key via the catalog writer so repeated joins on that key skip the
  shuffle entirely (both sides co-located) — the join-index analog.
- **partitioned layout** (:func:`write_partitioned`): directory
  partitioning on a low-cardinality column for partition pruning — the
  filtered-scan analog.

All three are write-once costs amortized over every subsequent query —
exactly the trade a B-tree makes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sorted(
    df: DataFrame, path: str, *keys: str, partitions: int | None = None
) -> None:
    """Range-partition by ``keys`` then sort within partitions.

    Global range partitioning (not hash) means each output file owns a
    contiguous key range, so a point predicate prunes to ONE file and
    one row group via parquet min/max stats.
    """
    out = df.repartitionByRange(*keys) if partitions is None else df.repartitionByRange(partitions, *keys)
    out.sortWithinPartitions(*keys).write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *keys: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed catalog table: joins/aggregations on
    ``keys`` between tables bucketed the same way run shuffle-free."""
    writer = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def write_partitioned(df: DataFrame, path: str, *keys: str) -> None:
    """Directory-partitioned parquet for partition pruning on ``keys``
    (low-cardinality columns only — snapshot_date, region, lang)."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def zorder_key_expr(cols: list[str], bits: int = 16) -> Column:
    """Morton (Z-order) key over 2+ integer columns: each value is
    clamped to ``bits`` bits, then the columns' bits are interleaved
    (column 0 owns the lowest interleaved bit).

    Sorting by this single key gives files LOCALITY IN EVERY DIMENSION
    at once — the layout answer when queries filter on several columns
    and :func:`write_sorted` can only serve the leading one. Pure
    integer bit arithmetic (shiftright / % / *), JVM-side, zero shuffle;
    the write itself range-partitions on the key.

    Callers with non-integer dims quantize first (e.g. rank or
    fixed-width binning — see agg_histogram_price for the binning
    pattern). Built as ONE SQL expression string — bits*len(cols)
    Column-object terms would cost hundreds of py4j round trips (see
    CLAUDE.md invariants).
    """
    n = len(cols)
    terms = [
        f"shiftleft((shiftright(cast({c} as bigint), {b}) % 2), {b * n + j})"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    partitions: int = 8,
) -> None:
    """Write parquet Z-ordered on ``cols``: range-partition + sort by
    the interleaved key so every file's min/max box is tight in all
    dimensions and a multi-column predicate prunes to few files."""
    keyed = df.withColumn("__z", zorder_key_expr(cols, bits))
    (
        keyed.repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def scan_stats(spark: SparkSession, df: DataFrame) -> dict[str, bool]:
    """Plan introspection: which scan-efficiency properties hold for
    this DataFrame's physical plan (used by tests and tuning)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    simple = df._jdf.queryExecution().simpleString()
    return {
        "has_pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "whole_stage_codegen": "WholeStageCodegen" in plan,
        "has_exchange": "Exchange" in plan,
        "has_broadcast": "Broadcast" in plan,
        "plan": simple,
    }
