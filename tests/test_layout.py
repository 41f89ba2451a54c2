"""Physical-layout tests: sorted/partitioned writes actually enable
pruning; plan introspection confirms scan-efficiency properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from hangarbay_spark.plans.layout import (
    scan_stats,
    write_partitioned,
    write_sorted,
)


def test_write_sorted_point_lookup(spark, tmp_path):
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    path = str(tmp_path / "sorted")
    write_sorted(df, path, "k", partitions=4)
    back = spark.read.parquet(path)
    stats = scan_stats(spark, back.filter(F.col("k") == 4242))
    assert stats["has_pushed_filters"]
    # (WholeStageCodegen only appears in the post-AQE final plan)
    assert not stats["has_exchange"]  # pure scan+filter, no shuffle
    rows = back.filter(F.col("k") == 4242).collect()
    assert len(rows) == 1 and rows[0]["v"] == 8484
    # range partitioning: each file owns a contiguous range
    import glob

    files = glob.glob(f"{path}/part-*")
    assert len(files) == 4


def test_write_partitioned_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(300)], "id int, grp string"
    )
    path = str(tmp_path / "parted")
    write_partitioned(df, path, "grp")
    back = spark.read.parquet(path)
    q = back.filter(F.col("grp") == "b")
    assert q.count() == 100
    # partition pruning: only the grp=b directory is read
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_scan_stats_broadcast(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    stats = scan_stats(spark, a.join(F.broadcast(b), "k"))
    assert stats["has_broadcast"]
