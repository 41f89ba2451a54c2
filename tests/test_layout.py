"""Physical-layout tests: sorted/partitioned writes actually enable
pruning; plan introspection confirms scan-efficiency properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from hangarbay_spark.plans import layout
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


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed+sorted on the same key with the same bucket
    count join with NO Exchange and NO Sort — the join-index analog: the
    shuffle is paid once at write time, every subsequent join is free.
    At 100 TB this is the difference between re-shuffling both fact
    tables per query and a purely local merge per bucket."""
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    layout.write_bucketed(
        left, "bkt_l", "k", buckets=8, path=str(tmp_path / "bkt_l")
    )
    layout.write_bucketed(
        right, "bkt_r", "k", buckets=8, path=str(tmp_path / "bkt_r")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucketing (not a broadcast)
        # is what removes the exchanges; the legacy ordering flag lets
        # the scan report the write-time sort (sound here: write_bucketed
        # guarantees one file per bucket)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        j = spark.table("bkt_l").join(spark.table("bkt_r"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # a Sort node prints as "Sort [key ..." — distinct from the
        # SortMergeJoin node name
        import re

        assert not re.search(r"\bSort \[", plan)  # no per-query sort
        assert j.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.sql("DROP TABLE IF EXISTS bkt_l")
        spark.sql("DROP TABLE IF EXISTS bkt_r")


def test_compact_files_repartition(spark, tmp_path):
    """compact_files rewrites a many-small-files directory into the
    metadata-computed file count with no data change."""
    import glob

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    df.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*")) == 64

    size = layout.dir_bytes(spark, src)
    assert size > 0
    target = -(-size // 4)  # aim for ~4 output files
    n = layout.compact_files(spark, src, dst, target_file_bytes=target)
    assert n == -(-size // target)
    assert len(glob.glob(f"{dst}/part-*")) == n
    back = spark.read.parquet(dst)
    assert back.count() == 20000
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_compact_files_coalesce_mode(spark, tmp_path):
    """shuffle=False compacts via coalesce: same file count contract,
    zero shuffle (verified on the write plan by construction: coalesce
    only narrows partitioning)."""
    import glob

    src, dst = str(tmp_path / "small2"), str(tmp_path / "compacted2")
    spark.range(0, 5000).toDF("k").repartition(32).write.parquet(src)
    size = layout.dir_bytes(spark, src)
    n = layout.compact_files(
        spark, src, dst, target_file_bytes=-(-size // 2), shuffle=False
    )
    assert len(glob.glob(f"{dst}/part-*")) == n == 2
    assert spark.read.parquet(dst).count() == 5000


def test_scan_stats_broadcast(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    stats = scan_stats(spark, a.join(F.broadcast(b), "k"))
    assert stats["has_broadcast"]


def _py_morton(vals, bits):
    key = 0
    n = len(vals)
    for b in range(bits):
        for j, v in enumerate(vals):
            key += ((v >> b) & 1) << (b * n + j)
    return key


def test_zorder_key_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (65535, 1), (1234, 4321)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", layout.zorder_key_expr(["x", "y"], bits=16)
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_morton((x, y), 16)


def test_zorder_layout_prunes_in_both_dimensions(spark, tmp_path):
    import itertools

    # 64x64 grid of (x, y) points
    pts = spark.createDataFrame(
        list(itertools.product(range(64), range(64))), "x int, y int"
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsorted")
    layout.write_zordered(pts, zpath, ["x", "y"], bits=6, partitions=16)
    layout.write_sorted(pts, spath, "x", partitions=16)

    def files_hit(path, lo, hi):
        """Files whose (min,max) box intersects the query box — what
        parquet row-group stats pruning would read."""
        import pyarrow.parquet as pq
        from pathlib import Path

        hit = 0
        for f in Path(path).glob("*.parquet"):
            t = pq.read_table(f, columns=["x", "y"])
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            if min(xs) <= hi and max(xs) >= lo and min(ys) <= hi and max(ys) >= lo:
                hit += 1
        return hit

    # small box query on BOTH dims: the z-ordered layout keeps it local;
    # the x-sorted layout spreads every x-stripe across all y
    z_hit = files_hit(zpath, 8, 15)
    s_hit = files_hit(spath, 8, 15)
    assert z_hit <= s_hit
    assert z_hit <= 4  # 8x8 box in a 64x64 grid over 16 files


def test_dynamic_partition_pruning(spark, tmp_path):
    """Day-partitioned fact + a dim whose qualifying days are only
    known at runtime (filter on a non-partition column) -> Spark must
    inject a DPP subquery into the fact scan's PartitionFilters, so at
    cluster scale the fact table reads only the days the dim join can
    match — the partitioned-warehouse pattern static pruning can't
    express."""
    from hangarbay_spark.queries.base import load_events

    ev = load_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "user_id", "event_type", F.to_date("ts").alias("day")
    )
    path = str(tmp_path / "ev_by_day")
    write_partitioned(ev, path, "day")
    fact = spark.read.parquet(path)
    # runtime-only dim: the day set survives a non-partition filter, so
    # the optimizer cannot constant-fold it into static pruning
    dim = (
        load_events(spark, "/root/testdata/sf0.001")
        .filter(F.col("event_type") == "purchase")
        .select(F.to_date("ts").alias("day"))
        .distinct()
        .limit(3)
    )
    joined = fact.join(dim, "day").groupBy("event_type").count()
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
