"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` re-export the registry in
``hangarbay_spark.queries`` — one entry per implemented operator family
from SURVEY.md §2 plus the training-data-pipeline extensions. The local
twin of the driver's comparison lives in tests/test_oracle_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hangarbay_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3 shape (3-way join -> agg -> top-k) — exercises scan,
    filter pushdown, broadcast join, shuffle join, hash agg and
    TakeOrderedAndProject in one plan.
    """
    return REGISTRY["join_topk_shipping_priority"].fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops -> driver does rows-only check)."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }
