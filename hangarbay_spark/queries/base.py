"""Query-spec registry + cross-engine numeric parity helpers.

Parity rules (Spark vs the DuckDB oracle) — every query in this package
follows them so the driver's order-insensitive value hash matches bit
for bit:

- **Sums of doubles** are never aggregated as doubles (parallel FP
  addition is order-dependent). Per-row arithmetic stays in DOUBLE
  (IEEE, engine-independent), the per-row result is cast to DECIMAL for
  the exact/associative aggregation, and the aggregate is cast back to
  DOUBLE. Both engines produce the identical exact decimal, hence the
  identical double.
- **Counts / ranks** are cast to BIGINT on both sides (Spark's
  row_number/length/year return INT, DuckDB's return BIGINT).
- **Timestamps** are surfaced as epoch milliseconds (BIGINT) or DATE —
  never raw TIMESTAMP — to dodge ns/us/tz canonicalization drift.
- Every computed column is aliased identically in the DataFrame code
  and the oracle SQL (the driver sorts columns by name before hashing).
- **Top-k queries** always carry a unique tie-break key in the ORDER BY
  so LIMIT selects the same row set in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    description: str
    survey: str  # SURVEY.md §2 operator ids this query covers


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, description: str, survey: str
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, survey)
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, *by: str) -> DataFrame:
    """Spread a small scan across the cluster before a CPU-heavy stage.

    Parquet scan parallelism is row-group-granular and the driver's
    testdata writes ONE row group per table, so every per-row-expensive
    scan stage (exact decimal moment casts, per-row hashing, tokenize)
    otherwise runs in a single task no matter how many cores the master
    has (``spark.sql.files.maxPartitionBytes`` cannot split inside a
    row group). One narrow shuffle of the pruned columns spreads the
    work; partition count is ``defaultParallelism`` (scales with the
    master / executor count, not a local[32] constant). With many
    input splits (the 100 TB case) the shuffle is merely redundant.
    Explicit-N repartition so AQE cannot coalesce the tiny byte size
    back into one partition (the CLAUDE.md checkpointed-loop rule).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if by:
        return df.repartition(n, *[F.col(c) for c in by])
    return df.repartition(n)


def normalize_ns_ts(df: DataFrame, *cols: str) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns -> TimestampType (µs).

    Two reader behaviors exist for nanos parquet across Spark versions /
    writer metadata: ``nanosAsLong`` surfaces the raw ns-since-epoch
    bigint (convert via integral div — a double division would round at
    ns scale), newer readers surface TIMESTAMP_NTZ directly (cast to the
    session-zone timestamp; the session is pinned UTC so the instant is
    unchanged). No-op for columns already TimestampType.
    """
    out = df
    for c in cols:
        dt = dict(df.dtypes).get(c)
        if dt == "bigint":
            out = out.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        elif dt == "timestamp_ntz":
            out = out.withColumn(c, F.col(c).cast("timestamp"))
    return out


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` normalized to TimestampType.

    Sets ``nanosAsLong`` defensively — the driver's harness may hand us
    a session built without it, and the events parquet is
    TIMESTAMP(NANOS) which Spark otherwise refuses to read. Also pins
    the session timezone to UTC: the NTZ branch of
    :func:`normalize_ns_ts` casts via the session zone, and a
    driver-built session on a non-UTC host would otherwise shift every
    instant and break epoch-ms oracle parity.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_ns_ts(load_table(spark, sf_dir, "events"), "ts")


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact cross-engine sum of a double expression.

    Cast per-row double -> DECIMAL(30, scale), sum exactly, cast back
    to double. Oracle twin: :func:`o_dsum`.

    ``scale`` must exceed the true decimal precision of the data (money
    columns here are 2dp; a product of two 2dp values is 4dp) but stay
    well below ~15 significant digits: Spark converts double->decimal
    via the shortest string representation while DuckDB rounds the exact
    binary expansion, and the two only agree when the rounding target is
    far from the double's noise floor.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(30,{scale})")).cast("double").alias(alias)
    )


def o_dsum(expr: str, alias: str, scale: int = 4) -> str:
    """Oracle-SQL twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE) AS {alias}"


def stage_micro_batches(
    df: DataFrame,
    batch_col: Column | str,
    n: int,
    prefix: str,
    keep: list[str] | None = None,
) -> str:
    """Write ``df`` as ``n`` single-file micro-batch directories
    (``b0..b{n-1}``, rows where ``batch_col == b``) with strictly
    increasing mtimes, so Spark's file source under
    ``maxFilesPerTrigger=1`` delivers them in batch order on any
    filesystem (the source orders by (modTime, path)). Shared by every
    streaming-maintenance registry query — batch determinism is what
    makes their results oracle-comparable. Returns the staging dir."""
    import os
    import tempfile
    import time

    c = F.col(batch_col) if isinstance(batch_col, str) else batch_col
    stage = tempfile.mkdtemp(prefix=prefix)
    t0 = time.time()
    for b in range(n):
        part = df.filter(c == b)
        if keep is not None:
            part = part.select(*keep)
        part.coalesce(1).write.parquet(f"{stage}/b{b}")
        for root, _, files in os.walk(f"{stage}/b{b}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t0 + b, t0 + b))
    return stage
