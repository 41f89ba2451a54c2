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


def test_embedding_bucket_partition_pruning(spark, tmp_path):
    """The similarity docs claim the LSH band value doubles as a
    write-time partition key — prove it: embeddings written partitioned
    by band0 are partition-pruned when a probe filters its bucket."""
    from hangarbay_spark.operators.similarity import hyperplane_band_cols

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    band0 = hyperplane_band_cols("embedding", dim=64)[0]
    path = str(tmp_path / "emb_by_bucket")
    emb.withColumn("b0", band0).write.partitionBy("b0").mode(
        "overwrite"
    ).parquet(path)
    back = spark.read.parquet(path)
    some_bucket = back.select("b0").first()["b0"]
    q = back.filter(F.col("b0") == some_bucket)
    # the bucket predicate becomes a partition filter (directory prune)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [isnotnull(b0" in plan
    assert f"(b0#" in plan and f"= {some_bucket})" in plan
    assert 0 < q.count() < emb.count()


def test_scan_stats_broadcast(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    stats = scan_stats(spark, a.join(F.broadcast(b), "k"))
    assert stats["has_broadcast"]
