#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Methodology: one untimed warmup execution per query (JVM class loading
+ whole-stage-codegen compilation dominate the first run of any Spark
plan — a fixed cost irrelevant at cluster scale), then one timed run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hangarbay_spark.queries import REGISTRY  # noqa: E402
from hangarbay_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "agg_pricing_summary",
    "filter_revenue_scan",
    "join_topk_shipping_priority",
    "join_local_supplier_volume",
    "topk_brands",
    "search_fleet_like",
    "lookup_point_customer",
    "agg_group_concat",
    "window_top_orders_per_customer",
    "subquery_small_quantity_revenue",
    "argmin_cheapest_supplier_per_part",
    "events_tumbling_hourly",
    "events_sessionize",
    "text_profile",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash_groups",
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "fts_match_all",
    "multimodal_text_features",
    "tfidf_top_terms",
    "sample_split_distribution",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="hangarbay_bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).collect()  # warmup: codegen + class loading
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
