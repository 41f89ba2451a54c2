"""Declared query surface: every operator family from SURVEY.md §2 as a
named (Spark DataFrame builder, DuckDB oracle SQL) pair.

``__spark_entry__.py`` re-exports this registry to the driver; the local
differential harness (tests/test_oracle_parity.py) runs the same
comparison the driver does.
"""

from __future__ import annotations

from hangarbay_spark.queries.base import REGISTRY, QuerySpec, load_table, register

# Importing the modules populates REGISTRY.
from hangarbay_spark.queries import relational  # noqa: E402,F401
from hangarbay_spark.queries import events  # noqa: E402,F401
from hangarbay_spark.queries import llmops  # noqa: E402,F401
from hangarbay_spark.queries import search  # noqa: E402,F401
from hangarbay_spark.queries import filters  # noqa: E402,F401
from hangarbay_spark.queries import analytics  # noqa: E402,F401
from hangarbay_spark.queries import reports  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "load_table", "register"]
