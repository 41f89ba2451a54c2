"""operators/ranks.py — the distributed exact-rank constructions that
replaced the registry's last single-task row-scale sorts (round 8).
Each construction is pinned against the built-in it replaces: the
outputs must be EXACTLY equal (the oracle hashes of the migrated
queries depend on it)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hangarbay_spark.operators.ranks import (
    hit_idx,
    hit_rank,
    ntile_sql,
    range_rank,
    value_prefix,
)


@pytest.fixture(scope="module")
def vals(spark):
    rng = random.Random(7)
    rows = [(i % 3, round(rng.random() * 5000, 2)) for i in range(2000)]
    # heavy ties: rank selection must stay exact when a value repeats
    rows += [(g, 1234.56) for g in (0, 1, 2) for _ in range(17)]
    return spark.createDataFrame(rows, ["grp", "v"]).localCheckpoint()


def test_value_prefix_matches_row_number(vals):
    vp = value_prefix(vals, ["grp"], "v", 500.0)
    ref = (
        vals.select(
            "grp",
            "v",
            (
                F.row_number().over(W.partitionBy("grp").orderBy("v")) - 1
            ).alias("rk"),
        )
        .groupBy("grp", "v")
        .agg(F.min("rk").alias("cb"), F.count(F.lit(1)).alias("c"))
    )
    j = vp.join(ref, (vp["grp"] == ref["grp"]) & (vp["__v"] == ref["v"]))
    assert j.count() == ref.count()
    assert (
        j.filter(
            (F.col("__cb") != F.col("cb")) | (F.col("__c") != F.col("c"))
        ).count()
        == 0
    )


def test_value_prefix_rank_and_idx_selection(vals):
    vp = value_prefix(vals, ["grp"], "v", 500.0)
    got = vp.filter(hit_rank(F.lit(500))).select("grp", "__v").collect()
    ref = (
        vals.select(
            "grp",
            "v",
            F.row_number().over(W.partitionBy("grp").orderBy("v")).alias("rn"),
        )
        .filter("rn = 500")
        .collect()
    )
    assert sorted((r["grp"], r["__v"]) for r in got) == sorted(
        (r["grp"], r["v"]) for r in ref
    )
    got0 = vp.filter(hit_idx(F.lit(499))).select("grp", "__v").collect()
    assert sorted((r["grp"], r["__v"]) for r in got0) == sorted(
        (r["grp"], r["v"]) for r in ref
    )


def test_range_rank_matches_global_row_number(spark):
    rng = random.Random(11)
    df = spark.createDataFrame(
        [(i, round(rng.random() * 100, 2)) for i in range(3000)], ["id", "v"]
    ).localCheckpoint()
    rr = range_rank(df, [F.col("v").desc(), F.col("id").asc()], 8)
    ref = df.select(
        "id",
        F.row_number().over(W.orderBy(F.col("v").desc(), "id")).alias("rn2"),
    )
    assert rr.join(ref, "id").filter("rn != rn2").count() == 0
    assert rr.select(F.max("__n")).first()[0] == 3000


@pytest.mark.parametrize("n,k", [(3000, 10), (2003, 5), (7, 10), (10, 10)])
def test_ntile_formula_matches_builtin(spark, n, k):
    rng = random.Random(n * 31 + k)
    df = spark.createDataFrame(
        [(i, round(rng.random() * 100, 2)) for i in range(n)], ["id", "v"]
    ).localCheckpoint()
    got = range_rank(df, [F.col("v").asc(), F.col("id").asc()], 8).select(
        "id", F.expr(ntile_sql("rn", "__n", k)).alias("b")
    )
    ref = df.select(
        "id", F.ntile(k).over(W.orderBy("v", "id")).cast("bigint").alias("b2")
    )
    assert got.join(ref, "id").filter("b != b2").count() == 0
