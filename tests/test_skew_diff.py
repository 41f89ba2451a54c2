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
