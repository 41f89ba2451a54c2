"""Tests for the skew helpers (salted join / two-phase agg) and
snapshot diffing."""

from __future__ import annotations

from pyspark.sql import functions as F

from hangarbay_spark.pipelines.diff import snapshot_diff, table_diff
from hangarbay_spark.plans.skew import salted_join, two_phase_agg


def test_salted_join_matches_plain_join(spark):
    # power-law key: key 0 carries half the rows
    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1000, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"d{i}") for i in range(50)], "k long, d string"
    )
    plain = big.join(small, "k").select("k", "v", "d")
    salted = salted_join(big, small, "k", salt=8).select("k", "v", "d")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, d string")
    out = salted_join(big, small, "k", salt=4, how="left").collect()
    got = {(r["k"], r["v"], r["d"]) for r in out}
    assert got == {(1, "a", "x"), (2, "b", "y"), (99, "c", None)}


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, d string")
    for how in ("right", "full_outer", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(big, small, "k", salt=4, how=how)


def test_two_phase_agg_matches_plain(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 2).alias("x"),
    )
    plain = df.groupBy("k").agg(
        F.sum("x").alias("sx"), F.count("x").alias("n"), F.max("x").alias("mx")
    )
    salted = two_phase_agg(
        df, "k", {"sx": ("x", "sum"), "n": ("x", "count"), "mx": ("x", "max")},
        salt=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select("k", "sx", "n", "mx").collect())
    )


def test_table_diff(spark):
    old = spark.createDataFrame(
        [("A", 1, "x"), ("B", 2, "y"), ("C", 3, "z")], "k string, a int, b string"
    )
    new = spark.createDataFrame(
        [("B", 2, "y"), ("C", 30, "z"), ("D", 4, "w")], "k string, a int, b string"
    )
    got = {(r["k"], r["change"]) for r in table_diff(old, new, "k").collect()}
    assert got == {("A", "removed"), ("C", "modified"), ("D", "added")}


def test_merge_upsert_reconstructs_new(spark):
    """CDC composition law: applying a table's diff to the old version
    reconstructs the new version exactly."""
    from hangarbay_spark.pipelines.diff import merge_upsert

    old = spark.createDataFrame(
        [("A", 1, "x"), ("B", 2, "y"), ("C", 3, "z")], "k string, a int, b string"
    )
    new = spark.createDataFrame(
        [("B", 2, "y"), ("C", 30, "z"), ("D", 4, "w")], "k string, a int, b string"
    )
    d = table_diff(old, new, "k")
    changed_keys = d.filter(F.col("change").isin("added", "modified")).select("k")
    updates = new.join(changed_keys, "k", "left_semi")
    deletes = d.filter(F.col("change") == "removed").select("k")
    rebuilt = merge_upsert(old, updates, "k", deletes)
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_snapshot_diff(spark, tmp_path):
    for ver, rows in (
        ("v1", [("100", "S1"), ("200", "S2")]),
        ("v2", [("100", "S1-upd"), ("300", "S3")]),
    ):
        df = spark.createDataFrame(rows, "n_number string, serial_no string")
        df.write.mode("overwrite").parquet(str(tmp_path / ver / "aircraft.parquet"))
    out = snapshot_diff(
        spark,
        str(tmp_path / "v1"),
        str(tmp_path / "v2"),
        tables=("aircraft",),
        keys={"aircraft": "n_number"},
    )
    got = {(r["key"], r["change"]) for r in out.collect()}
    assert got == {("100", "modified"), ("200", "removed"), ("300", "added")}


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (pipelines/incremental.py)
# ---------------------------------------------------------------------------

from decimal import Decimal

from hangarbay_spark.pipelines.incremental import (  # noqa: E402
    build_agg,
    delta_agg_update,
    signed_delta,
)

_SPECS = {"s": ("v", 2)}


def _agg_map(df):
    return {r["g"]: (r["n"], Decimal(r["s"])) for r in df.collect()}


def test_incremental_agg_composition_law(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.25), (2, "a", 2.50), (3, "b", 10.00), (4, "c", 7.00)],
        "id int, g string, v double",
    )
    # id 2 modified, id 3 removed (group b vanishes), id 5 added (new
    # group d), id 4 untouched
    new = spark.createDataFrame(
        [(1, "a", 1.25), (2, "a", 9.75), (4, "c", 7.00), (5, "d", 3.00)],
        "id int, g string, v double",
    )
    updated = delta_agg_update(
        build_agg(old, ["g"], _SPECS),
        signed_delta(old, new, "id"),
        ["g"],
        _SPECS,
    )
    assert _agg_map(updated) == _agg_map(build_agg(new, ["g"], _SPECS))
    # group b hit count zero and was dropped
    assert "b" not in _agg_map(updated)


def test_incremental_agg_chained_updates(spark):
    v1 = spark.createDataFrame([(1, "x", 1.10)], "id int, g string, v double")
    v2 = spark.createDataFrame(
        [(1, "x", 1.10), (2, "x", 2.20)], "id int, g string, v double"
    )
    v3 = spark.createDataFrame(
        [(2, "x", 5.00), (3, "y", 0.50)], "id int, g string, v double"
    )
    agg = build_agg(v1, ["g"], _SPECS)
    agg = delta_agg_update(agg, signed_delta(v1, v2, "id"), ["g"], _SPECS)
    agg = delta_agg_update(agg, signed_delta(v2, v3, "id"), ["g"], _SPECS)
    assert _agg_map(agg) == _agg_map(build_agg(v3, ["g"], _SPECS))


def test_signed_delta_composite_key(spark):
    old = spark.createDataFrame(
        [(1, 1, "p"), (1, 2, "q")], "k1 int, k2 int, v string"
    )
    new = spark.createDataFrame(
        [(1, 1, "p"), (1, 2, "q2"), (2, 1, "r")], "k1 int, k2 int, v string"
    )
    d = signed_delta(old, new, ["k1", "k2"])
    got = {(r["k1"], r["k2"], r["v"], r["__sign"]) for r in d.collect()}
    assert got == {(1, 2, "q", -1), (1, 2, "q2", 1), (2, 1, "r", 1)}


def test_aqe_skew_join_splits_hot_partition(spark):
    """The session's AQE skew-join config actually fires: a 90%-hot key
    under forced thresholds yields SortMergeJoin(skew=true) with a
    'coalesced and skewed' AQE shuffle read — the runtime safety net
    behind salted_join for skew discovered only at execution time."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"),
        )
        small = spark.range(0, 1000).select(F.col("id").alias("k"))
        j = big.join(small, "k").select(F.sum(F.length("pad")).alias("s"))
        j.collect()  # AQE finalizes the plan only after execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "coalesced and skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
