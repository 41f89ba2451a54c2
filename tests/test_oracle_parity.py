"""Local twin of the driver's correctness gate: run every declared query
on Spark AND its oracle SQL on DuckDB over the same parquet, compare
row count, column names, and order-insensitive canonicalized values.
The comparison itself lives in ``hangarbay_spark.queries.compare``
(also exposed as ``hangar check``).
"""

from __future__ import annotations

import os

import pytest

from hangarbay_spark.queries import REGISTRY
from hangarbay_spark.queries.compare import compare_query, duckdb_connection

# The slow gate: deselect with `-m "not oracle"` for the fast dev loop;
# the full suite (no -m) still runs everything — zero skips either way.
pytestmark = pytest.mark.oracle

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    r = compare_query(spark, name, SF_DIR, con=duck)
    if r.oracle_rows is None:
        assert r.spark_rows >= 0  # rows-only smoke
        return
    assert r.schema_match, f"{name}: column mismatch"
    assert r.rows_match, (
        f"{name}: row count {r.spark_rows} vs {r.oracle_rows}"
    )
    assert r.values_match, (
        f"{name}: value mismatch; first diffs: {r.first_diffs}"
    )
