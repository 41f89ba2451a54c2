"""Oracle-differential comparison — the correctness gate as a library.

Runs a declared query on Spark AND its DuckDB oracle SQL over the same
parquet directory, then compares row count, column-name sets, and
order-insensitive canonicalized values (floats by exact-double repr,
nulls/NaNs by sentinel) — the same discipline as the driver's gate and
``tests/test_oracle_parity.py``. Exposed on the CLI as
``hangar check`` so an engine user can verify any query against an
independent engine on their own data layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from hangarbay_spark.queries.base import REGISTRY, TABLES


def canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # repr of the exact double — engines must agree bit-for-bit
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def canon_rows(cols, rows) -> list[tuple[str, ...]]:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in idx) for r in rows)


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int | None  # None -> rows-only query (no oracle)
    rows_match: bool | None
    schema_match: bool | None
    values_match: bool | None
    first_diffs: list[tuple] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        if self.oracle_rows is None:
            return self.spark_rows >= 0
        return bool(self.rows_match and self.schema_match and self.values_match)


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with every engine table registered as a view
    over ``{sf_dir}/<table>.parquet`` (the driver's setup)."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare_query(
    spark: SparkSession, name: str, sf_dir: str, con=None
) -> CompareResult:
    """Differential-check one declared query; see module docstring."""
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if spec.oracle is None:
        return CompareResult(
            name, len(spark_rows), None, None, None, None
        )

    own = con is None
    if own:
        con = duckdb_connection(sf_dir)
    try:
        res = con.execute(spec.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        if own:
            con.close()

    schema_match = sorted(spark_cols) == sorted(duck_cols)
    rows_match = len(spark_rows) == len(duck_rows)
    a = canon_rows(spark_cols, spark_rows)
    b = canon_rows(duck_cols, duck_rows)
    values_match = a == b
    diffs = (
        [] if values_match else [(x, y) for x, y in zip(a, b) if x != y][:5]
    )
    return CompareResult(
        name,
        len(spark_rows),
        len(duck_rows),
        rows_match,
        schema_match,
        values_match,
        diffs,
    )
