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
    path: str | None = None,
) -> None:
    """Persist as a bucketed catalog table: joins/aggregations on
    ``keys`` between tables bucketed the same way run shuffle-free
    (and, with ``sort=True``, sort-free — the SMJ reads both sides
    pre-sorted per bucket). ``path`` makes it an external table.

    The pre-write ``repartition(buckets, *keys)`` uses the same Murmur3
    hash as the bucket spec, so each task holds exactly one bucket and
    writes ONE file per bucket — the layout under which Spark can trust
    the write-time sort at read time (several files per bucket would
    force a per-query re-sort). One shuffle at write, amortized over
    every subsequent join. The shuffle elimination is unconditional;
    eliding the per-query Sort additionally needs
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
    default since Spark 3.0 because it is only sound one-file-per-bucket
    — which this writer guarantees).
    """
    writer = (
        df.repartition(buckets, *keys)
        .write.mode("overwrite")
        .bucketBy(buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
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


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of data files under ``path``, via the Hadoop
    FileSystem API so any supported scheme (file://, hdfs://, s3a://)
    works — a driver-side metadata listing, no data read."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = True,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes``-sized
    files — the OPTIMIZE/small-file-compaction maintenance operator.

    Streaming sinks, incremental ingests and over-parallel writes leave
    thousands of KB-scale files; at 100 TB the resulting per-file open
    (+ S3 request) overhead and undersized row groups dominate scan
    cost, and driver-side file listings stop fitting in memory. The fix
    is a metadata-driven rewrite: file count = ceil(input_bytes /
    target) from the directory listing alone.

    ``shuffle=True`` (default) uses round-robin ``repartition`` — one
    full shuffle, but output files are near-uniform regardless of input
    skew. ``shuffle=False`` uses ``coalesce``: shuffle-free, but a
    coalesced partition inherits its inputs' skew and locality. Returns
    the output file count. (Parquet's encoded size differs from the
    input's, so file sizes track — not exactly hit — the target.)
    """
    n = max(1, -(-dir_bytes(spark, src) // target_file_bytes))
    df = spark.read.parquet(src)
    out = df.repartition(n) if shuffle else df.coalesce(n)
    out.write.mode("overwrite").parquet(dst)
    return n
