"""Structured Streaming tests: drive the streaming builders with a file
source over the driver's events parquet (availableNow trigger) and
check the results against their batch twins.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hangarbay_spark.streaming import events as SE

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """The file streaming source needs a *directory*; re-write the
    driver's single-file events parquet (ts normalized to µs) into one."""
    from hangarbay_spark.queries.base import load_events

    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_events(spark, SF_DIR).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture()
def events_stream(spark, events_dir):
    return SE.read_events_stream(spark, events_dir)


def _events_batch(spark):
    from hangarbay_spark.queries.base import load_events

    return load_events(spark, SF_DIR)


def test_hourly_rollup_matches_batch(spark, events_stream):
    got = SE.run_to_memory(
        SE.hourly_rollup(events_stream), "t_hourly", spark
    )
    batch = (
        _events_batch(spark)
        .groupBy(
            F.unix_millis(F.date_trunc("hour", "ts")).alias("window_start_ms"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    g = {
        (r["window_start_ms"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got.collect()
    }
    b = {
        (r["window_start_ms"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert g == b


def test_sliding_rollup_covers_events(spark, events_stream):
    got = SE.run_to_memory(
        SE.sliding_rollup(events_stream), "t_sliding", spark
    )
    rows = got.collect()
    assert len(rows) > 0
    # every tumbling hour appears in 4 slides (60/15)
    n_events_total = _events_batch(spark).count()
    assert sum(r["n_events"] for r in rows) == 4 * n_events_total


def test_sessionize_stream(spark, events_stream):
    got = SE.run_to_memory(SE.sessionize(events_stream), "t_sessions", spark)
    rows = got.collect()
    assert len(rows) > 0
    ev = _events_batch(spark)
    # session count per user is bounded by event count; totals preserved
    assert sum(r["n_events"] for r in rows) == ev.count()
    # no session shorter than one event; gaps respected (end >= start)
    assert all(r["session_end_ms"] >= r["session_start_ms"] for r in rows)
    # EXACT equivalence with the batch gaps-and-islands formulation:
    # same (user, start, n, value) sessions; session_window's end is
    # last_event + gap, the batch twin's is last_event — normalize.
    from hangarbay_spark.queries import REGISTRY

    gap_ms = 30 * 60 * 1000
    g = {
        (
            r["user_id"],
            r["session_start_ms"],
            r["session_end_ms"] - gap_ms,
            r["n_events"],
            r["session_value"],
        )
        for r in rows
    }
    b = {
        (
            r["user_id"],
            r["session_start_ms"],
            r["session_end_ms"],
            r["n_events"],
            r["session_value"],
        )
        for r in REGISTRY["events_sessionize"].fn(spark, SF_DIR).collect()
    }
    assert g == b


def test_stream_stream_window_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream interval join == the batch binned
    range join over the same data."""
    from hangarbay_spark.queries import REGISTRY

    stream = SE.read_events_stream(spark, events_dir, max_files_per_trigger=8)
    purchases = stream.filter(F.col("event_type") == "purchase")
    signups = stream.filter(F.col("event_type") == "signup")
    got = SE.run_to_memory(
        SE.purchase_signup_window_join(purchases, signups),
        "t_ssjoin",
        spark,
        output_mode="append",
    )
    batch = REGISTRY["events_range_join_purchase_window"].fn(spark, SF_DIR)
    g = {
        (r["purchase_id"], r["user_id"], r["signup_id"], r["lag_ms"])
        for r in got.collect()
    }
    b = {
        (r["purchase_id"], r["user_id"], r["signup_id"], r["lag_ms"])
        for r in batch.collect()
    }
    assert g == b and len(b) > 0


def test_running_user_totals_stateful(spark, events_stream):
    """applyInPandasWithState running totals: the LAST update emitted
    per user equals the batch per-user aggregate exactly."""
    from pyspark.sql.window import Window as W

    got = SE.run_to_memory(
        SE.running_user_totals(events_stream),
        "t_totals",
        spark,
        output_mode="update",
    )
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    last = (
        got.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = (
        _events_batch(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    g = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in last.collect()
    }
    b = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert g == b


def test_dedup_stream_exactly_once_across_restarts(spark, tmp_path):
    """Checkpointed restart semantics: a second availableNow run with
    the same checkpoint processes only new files, and duplicate
    event_ids arriving in them are suppressed by the persisted
    dedup state — the file sink ends exactly-once."""
    from datetime import datetime, timedelta

    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = "event_id bigint, ts timestamp, user_id bigint, value double"

    def write_chunk(name, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(src / name)
        )
        # flatten: move part file up so the source dir is one level
        import glob
        import shutil

        part = glob.glob(f"{src}/{name}/part-*.parquet")[0]
        shutil.move(part, f"{src}/{name}.parquet")
        shutil.rmtree(src / name)

    t0 = datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda eid, mins: (  # noqa: E731
        eid, t0 + timedelta(minutes=mins), eid % 3, float(eid)
    )
    write_chunk("a", [mk(1, 0), mk(2, 5), mk(3, 10), mk(4, 15), mk(5, 20)])

    def drain():
        stream = (
            spark.readStream.schema(
                spark.read.parquet(f"{src}/a.parquet").schema
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            SE.dedup_events(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = spark.read.parquet(sink).count()
    assert first == 5
    # restart input: duplicates of 3..5 plus genuinely new 6, 7
    write_chunk("b", [mk(3, 10), mk(4, 15), mk(5, 20), mk(6, 25), mk(7, 30)])
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 7  # dups suppressed across the restart
    assert out.select("event_id").distinct().count() == 7


def test_dedup_events_stream(spark, events_stream):
    got = SE.run_to_memory(
        SE.dedup_events(events_stream), "t_dedup", spark, output_mode="append"
    )
    ev = _events_batch(spark)
    assert got.count() == ev.select("event_id").distinct().count()


# ---------------------------------------------------------------------------
# Streaming materialized-view maintenance (streaming/maintenance.py)
# ---------------------------------------------------------------------------

from decimal import Decimal

from hangarbay_spark.pipelines.incremental import build_agg
from hangarbay_spark.streaming import maintenance as SM

_SPECS = {"total_value": ("value", 4)}
_GROUPS = ["event_type"]


def _agg_map(df):
    return {
        r["event_type"]: (r["n"], Decimal(r["total_value"]))
        for r in df.collect()
    }


def test_maintained_agg_matches_batch(spark, tmp_path):
    # several source files -> several micro-batches at 1 file/trigger
    src = str(tmp_path / "ev")
    _events_batch(spark).repartition(4).write.parquet(src)
    agg_dir = str(tmp_path / "agg")
    q = SM.maintain_agg_stream(
        SE.read_events_stream(spark, src),
        agg_dir,
        _GROUPS,
        _SPECS,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = _agg_map(SM.read_maintained_agg(spark, agg_dir))
    want = _agg_map(build_agg(_events_batch(spark), _GROUPS, _SPECS))
    assert got == want  # decimal-exact across 4 incremental merges

    # restart with the same checkpoint and no new data: no-op
    q2 = SM.maintain_agg_stream(
        SE.read_events_stream(spark, src),
        agg_dir,
        _GROUPS,
        _SPECS,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    assert _agg_map(SM.read_maintained_agg(spark, agg_dir)) == want


def test_replayed_batch_is_idempotent(spark, tmp_path):
    agg_dir = str(tmp_path / "agg")
    import os as _os

    _os.makedirs(agg_dir, exist_ok=True)
    batch = spark.createDataFrame(
        [("click", 1.5), ("view", 2.0)], "event_type string, value double"
    )
    assert SM.apply_delta_batch(spark, batch, 0, agg_dir, _GROUPS, _SPECS)
    first = _agg_map(SM.read_maintained_agg(spark, agg_dir))
    # crash-replay of the same batch_id must not double-count
    assert not SM.apply_delta_batch(spark, batch, 0, agg_dir, _GROUPS, _SPECS)
    assert _agg_map(SM.read_maintained_agg(spark, agg_dir)) == first
    # the next batch does apply
    assert SM.apply_delta_batch(spark, batch, 1, agg_dir, _GROUPS, _SPECS)
    doubled = _agg_map(SM.read_maintained_agg(spark, agg_dir))
    assert doubled["click"] == (2, Decimal("3.0000"))


def test_stream_static_enrichment_matches_batch(spark, events_stream):
    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).cast("bigint").alias("cohort"),
    )
    enriched = SE.enrich_with_dim(events_stream, dim).groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n")
    )
    got = {
        r["cohort"]: r["n"]
        for r in SE.run_to_memory(enriched, "t_enrich", spark).collect()
    }
    batch = {
        r["cohort"]: r["n"]
        for r in _events_batch(spark)
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch and len(got) == 3


def test_stream_stream_outer_join_matches_batch(spark, events_dir):
    """LEFT OUTER stream-stream interval join: for every purchase the
    final watermark can prove closed, the drained stream equals the
    batch left join exactly — matched rows with their signup, unmatched
    with nulls. (Rows inside the final eviction horizon may legally be
    withheld; they are excluded from the comparison on both sides.)"""
    stream = SE.read_events_stream(spark, events_dir, max_files_per_trigger=8)
    purchases = stream.filter(F.col("event_type") == "purchase")
    signups = stream.filter(F.col("event_type") == "signup")
    got = SE.run_to_memory(
        SE.purchase_signup_window_join_outer(purchases, signups),
        "t_ssjoin_outer",
        spark,
        output_mode="append",
    )
    ev = _events_batch(spark)
    # Closed horizon: the joint watermark is min(max purchase ts, max
    # signup ts) - 2h (each filtered side tracks its own watermark),
    # and left-state eviction subtracts the 2h join interval again;
    # 1h slack covers the one-batch watermark lag.
    side_max = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(F.max(F.unix_millis("ts")).alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    )
    horizon = side_max - (5 * 3600 * 1000)
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
    )
    bs = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_uid"),
        F.col("event_id").alias("signup_id"),
        F.unix_millis("ts").alias("signup_ms"),
    )
    batch = bp.join(
        bs,
        (F.col("user_id") == F.col("s_uid"))
        & (F.col("purchase_ms") >= F.col("signup_ms"))
        & (F.col("purchase_ms") <= F.col("signup_ms") + 2 * 3600 * 1000),
        "left",
    ).select(
        "purchase_id",
        "user_id",
        "purchase_ms",
        "signup_id",
        (F.col("purchase_ms") - F.col("signup_ms")).alias("lag_ms"),
    )
    key = lambda r: (  # noqa: E731
        r["purchase_id"],
        r["user_id"],
        r["signup_id"],
        r["lag_ms"],
    )
    g = {key(r) for r in got.filter(F.col("purchase_ms") < horizon).collect()}
    b = {
        key(r) for r in batch.filter(F.col("purchase_ms") < horizon).collect()
    }
    assert g == b and len(b) > 0
    # the outer join genuinely adds null rows beyond the inner join
    assert any(k[2] is None for k in b)


def test_running_user_totals_tws_matches_old_api(spark, events_stream):
    """transformWithStateInPandas (the Spark-4 arbitrary-state API)
    computes the same per-user final totals as the batch aggregate —
    and hence as the applyInPandasWithState twin. Runs on the RocksDB
    state store provider, which the new API requires (and which is the
    disk-backed provider a huge keyspace needs anyway)."""
    from pyspark.sql.window import Window as W

    # the TWS driver worker speaks protobuf to the state server; the
    # container ships no usable google.protobuf -> skip, don't fail
    pytest.importorskip("google.protobuf.descriptor")

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got = SE.run_to_memory(
            SE.running_user_totals_tws(events_stream),
            "t_totals_tws",
            spark,
            output_mode="update",
        )
        w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
        last = (
            got.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        batch = (
            _events_batch(spark)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(30,4)"))
                .cast("double")
                .alias("total_value"),
            )
        )
        g = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in last.collect()
        }
        b = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in batch.collect()
        }
        assert g == b and len(b) > 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_streaming_dedup_ingest(spark, tmp_path):
    """Near-dup-rejecting ingest: batch 1 admits one of two near-dups;
    batch 2 rejects a near-dup of an ALREADY-ADMITTED doc (cross-batch,
    via the signature table only) and admits a novel one; restart with
    the same checkpoint is a no-op."""
    from hangarbay_spark.streaming import dedup_ingest as DI

    base = (
        "the quick brown fox jumps over the lazy dog and runs far "
        "away into the deep green forest tonight"
    )
    novel = (
        "completely different subject matter entirely about spark "
        "query engines and distributed columnar analytics at scale"
    )
    src = tmp_path / "docs_src"
    src.mkdir()
    # one file per micro-batch (maxFilesPerTrigger=1)
    spark.createDataFrame(
        [(1, base), (2, base + " extra")], "doc_id int, text string"
    ).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(
        [(3, base + " more"), (4, novel)], "doc_id int, text string"
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    corpus_dir = str(tmp_path / "admitted")
    q = DI.dedup_ingest_stream(
        stream, corpus_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    admitted = {
        r["doc_id"] for r in DI.read_admitted(spark, corpus_dir).collect()
    }
    # 2 rejected in-batch (near-dup of 1); 3 rejected cross-batch
    # (near-dup of admitted 1, found via signatures only); 4 novel
    assert admitted == {1, 4}
    sigs = spark.read.parquet(f"{corpus_dir}/{DI.SIGS_SUBDIR}")
    assert {r["doc_id"] for r in sigs.collect()} == {1, 4}

    # restart, same checkpoint, no new files: nothing re-applied
    q2 = DI.dedup_ingest_stream(
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*")),
        corpus_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    assert {
        r["doc_id"] for r in DI.read_admitted(spark, corpus_dir).collect()
    } == {1, 4}

    # crash-replay of an already-applied batch_id is a no-op
    batch = spark.createDataFrame([(9, novel)], "doc_id int, text string")
    assert not DI.ingest_batch(spark, batch, 0, corpus_dir)


def test_stream_stream_full_outer_join_matches_batch(spark, events_dir):
    """FULL OUTER stream-stream interval join: on rows the final
    watermark can prove closed (either side's event time before the
    joint horizon), the drained stream equals the batch full join —
    matched rows, purchase-only rows, and signup-only rows alike."""
    stream = SE.read_events_stream(spark, events_dir, max_files_per_trigger=8)
    purchases = stream.filter(F.col("event_type") == "purchase")
    signups = stream.filter(F.col("event_type") == "signup")
    got = SE.run_to_memory(
        SE.purchase_signup_window_join_full(purchases, signups),
        "t_ssjoin_full",
        spark,
        output_mode="append",
    )
    ev = _events_batch(spark)
    side_max = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(F.max(F.unix_millis("ts")).alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    )
    horizon = side_max - (5 * 3600 * 1000)
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_uid"),
        F.unix_millis("ts").alias("purchase_ms"),
    )
    bs = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_uid"),
        F.col("event_id").alias("signup_id"),
        F.unix_millis("ts").alias("signup_ms"),
    )
    batch = bp.join(
        bs,
        (F.col("p_uid") == F.col("s_uid"))
        & (F.col("purchase_ms") >= F.col("signup_ms"))
        & (F.col("purchase_ms") <= F.col("signup_ms") + 2 * 3600 * 1000),
        "full",
    ).select(
        "purchase_id",
        F.coalesce(F.col("p_uid"), F.col("s_uid")).alias("user_id"),
        "purchase_ms",
        "signup_id",
        "signup_ms",
    )
    closed = F.coalesce(F.col("purchase_ms"), F.col("signup_ms")) < horizon

    def key(r):
        return (
            r["purchase_id"],
            r["user_id"],
            r["purchase_ms"],
            r["signup_id"],
            r["signup_ms"],
        )

    g = {key(r) for r in got.filter(closed).collect()}
    b = {key(r) for r in batch.filter(closed).collect()}
    assert g == b and len(b) > 0
    # both unmatched directions genuinely appear
    assert any(k[0] is None for k in b) and any(k[3] is None for k in b)


def test_streaming_ann_index_maintenance(spark, tmp_path):
    """Streamed embedding batches are encoded against FROZEN codebooks
    and appended to the persisted PQ index; the served search sees new
    vectors without any rebuild; restart with the same checkpoint and
    a crash-replayed batch are both no-ops."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import similarity as S
    from hangarbay_spark.streaming import ann_maintenance as AM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    initial = emb.filter(F.col("vec_id") % 3 == 0)
    rest = emb.filter(F.col("vec_id") % 3 != 0)

    index_dir = str(tmp_path / "ann_index")
    AM.bootstrap_index(initial, index_dir, dim=64)
    n0 = spark.read.parquet(AM.codes_path(index_dir)).count()
    assert n0 == initial.count()

    # stream the remainder as two micro-batches (one file each)
    src = tmp_path / "emb_src"
    src.mkdir()
    b0 = rest.filter(F.col("vec_id") % 3 == 1)
    b1 = rest.filter(F.col("vec_id") % 3 == 2)
    b0.coalesce(1).write.parquet(str(src / "b0"))
    b1.coalesce(1).write.parquet(str(src / "b1"))
    schema = emb.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = AM.ann_index_maintenance_stream(
        stream, index_dir, checkpoint_dir=str(tmp_path / "ckpt"), dim=64
    )
    q.awaitTermination()
    codes = spark.read.parquet(AM.codes_path(index_dir))
    assert codes.count() == emb.count()
    assert {r["vec_id"] for r in codes.select("vec_id").collect()} == {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }

    # the served search covers streamed-in vectors with no rebuild
    probes = emb.filter(F.col("vec_id").isin(0, 1, 2))
    got = S.pq_topk_from_index(
        spark,
        AM.codes_path(index_dir),
        AM.books_path(index_dir),
        emb,
        probes,
        k=5,
    )
    assert got.count() == 15

    # restart with same checkpoint: no new files -> no change
    q2 = AM.ann_index_maintenance_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*")),
        index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        dim=64,
    )
    q2.awaitTermination()
    assert spark.read.parquet(AM.codes_path(index_dir)).count() == emb.count()

    # crash-replay of an already-applied batch id is a no-op
    assert (
        AM.ingest_embeddings_batch(spark, b0, 0, index_dir, dim=64) == 0
    )


def test_streaming_heavy_hitters(spark, tmp_path):
    """Streamed MG summary vs batch truth: every exact heavy hitter
    (>1/inv_phi of the stream) is in the candidate set; brackets hold
    (cnt_lo <= true <= cnt_hi); replaying the drained stream is a
    no-op (idempotent batch commit)."""
    import json
    import os
    import time

    from pyspark.sql import functions as F

    from hangarbay_spark.operators.text import tokens_expr
    from hangarbay_spark.streaming import hh_maintenance as HH

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens_expr("text")).alias("tok")
    )
    stage = str(tmp_path / "src")
    t0 = time.time()
    for b in range(3):
        toks.filter(F.col("doc_id") % 3 == b).select("tok").coalesce(
            1
        ).write.parquet(f"{stage}/b{b}")
        for root, _, files in os.walk(f"{stage}/b{b}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t0 + b, t0 + b))
    state = str(tmp_path / "state")
    k, inv_phi = 100, 50

    def drain(ckpt: str) -> None:
        stream = (
            spark.readStream.schema("tok string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stage}/*")
        )
        HH.hh_maintenance_stream(
            stream, state, checkpoint_dir=ckpt, k=k
        ).awaitTermination()

    drain(str(tmp_path / "ckpt1"))
    got = {
        r.tok: (r.cnt_lo, r.cnt_hi)
        for r in HH.heavy_hitters_from_state(
            spark, state, inv_phi=inv_phi
        ).collect()
    }
    n = toks.count()
    exact = {
        r.tok: r.cnt
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * inv_phi > n)
        .collect()
    }
    assert exact, "test corpus must have heavy hitters"
    # no false negatives + valid brackets
    for tok, true_cnt in exact.items():
        assert tok in got, f"missed heavy hitter {tok!r}"
        lo, hi = got[tok]
        assert lo <= true_cnt <= hi, (tok, lo, true_cnt, hi)
    # bracket width respects the theoretical n/(k+1) budget
    meta = json.load(open(f"{state}/_state.json"))
    assert meta["n"] == n
    widths = {hi - lo for lo, hi in got.values()}
    assert all(w <= n // (k + 1) for w in widths)
    # replay with a FRESH checkpoint re-delivers the same batches;
    # the batch-id marker must make them all no-ops
    before = json.load(open(f"{state}/_state.json"))
    drain(str(tmp_path / "ckpt2"))
    after = json.load(open(f"{state}/_state.json"))
    assert before["n"] == after["n"]


def test_fts_maintenance_stream_matches_batch_and_compacts(
    spark, tmp_path
):
    """FTS maintenance drained over time-split micro-batches serves the
    SAME search results as a batch-built index on the same corpus, the
    size-ratio compaction fires (file count folds back to ~one
    generation) WITHOUT changing a single posting, and a replay with a
    fresh checkpoint is a no-op."""
    import os
    import time

    from pyspark.sql import functions as F

    from hangarbay_spark.operators import fts
    from hangarbay_spark.streaming import fts_maintenance as FM

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    stage = str(tmp_path / "src")
    t0 = time.time()
    for b in range(4):
        docs.filter(F.col("doc_id") % 4 == b).coalesce(1).write.parquet(
            f"{stage}/b{b}"
        )
        for root, _, files in os.walk(f"{stage}/b{b}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t0 + b, t0 + b))
    index_dir = str(tmp_path / "idx")

    def drain(ckpt: str) -> None:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stage}/*")
        )
        FM.fts_maintenance_stream(
            stream, index_dir, checkpoint_dir=ckpt, buckets=8,
            max_file_ratio=2.0,
        ).awaitTermination()

    drain(str(tmp_path / "ckpt1"))
    # compaction fired at least once: <= ratio*buckets data files left
    # even though 4 appended generations were written
    n_files = fts.index_data_file_count(spark, FM.index_path(index_dir))
    assert n_files <= 2.0 * 8, n_files

    idx = FM.read_maintained_index(spark, index_dir)
    batch_idx = fts.build_inverted_index(docs, "doc_id", "text")
    # stream == batch: identical postings row set
    assert idx.exceptAll(batch_idx).count() == 0
    assert batch_idx.exceptAll(idx).count() == 0
    # and identical search results through the API
    q = docs.select(F.col("text")).first()["text"].split()[0].lower()
    got = {
        r["doc_id"]
        for r in fts.match_all(idx, q, "doc_id").collect()
    }
    want = {
        r["doc_id"]
        for r in fts.match_all(batch_idx, q, "doc_id").collect()
    }
    assert got == want and got

    # idempotent compaction: forcing another compaction right after
    # changes nothing (row set identical; manifest ids preserved)
    before = idx.collect()
    assert fts.compact_index(
        spark, FM.index_path(index_dir), "doc_id", buckets=8, force=True
    )
    after = FM.read_maintained_index(spark, index_dir)
    assert sorted(map(tuple, before)) == sorted(
        map(tuple, after.collect())
    )
    ids = spark.read.parquet(FM.index_path(index_dir) + "_ids")
    assert ids.distinct().count() == docs.count()

    # BM25 artifacts (r7): maintained tf + doclen generations equal the
    # batch builds row for row, BM25 top-k is bit-identical, and the
    # gen-count compaction fired (4 batches, max_generations=3)
    tf_s = sorted(map(tuple, FM.read_maintained_tf(spark, index_dir).collect()))
    tf_b = sorted(map(tuple, fts.build_tf_index(docs, "doc_id", "text").collect()))
    assert tf_s == tf_b
    dl_s = sorted(map(tuple, FM.read_maintained_doclen(spark, index_dir).collect()))
    dl_b = sorted(map(tuple, fts.build_doclen(docs, "doc_id", "text").collect()))
    assert dl_s == dl_b
    bm_s = [
        tuple(r)
        for r in fts.bm25_topk(
            FM.read_maintained_tf(spark, index_dir),
            FM.read_maintained_doclen(spark, index_dir),
            q, "doc_id", k=10,
        ).collect()
    ]
    bm_b = [
        tuple(r)
        for r in fts.bm25_topk(
            fts.build_tf_index(docs, "doc_id", "text"),
            fts.build_doclen(docs, "doc_id", "text"),
            q, "doc_id", k=10,
        ).collect()
    ]
    assert bm_s == bm_b and bm_s
    assert len(FM._live_gens(FM.tf_path(index_dir))) < 4  # compacted

    # replay with a fresh checkpoint: batch-id marker + id manifest
    # make every re-delivered batch a no-op
    drain(str(tmp_path / "ckpt2"))
    again = FM.read_maintained_index(spark, index_dir)
    assert again.count() == len(before)
    assert sorted(
        map(tuple, FM.read_maintained_tf(spark, index_dir).collect())
    ) == tf_b


def test_fts_compact_swap_recovery(spark, tmp_path):
    """ADVICE r6: compaction is write-new-then-swap — a crash mid-swap
    leaves either the complete folded copy in ``__compact_tmp`` or the
    old copy in ``__old``, and the next compaction's recovery puts one
    back in place before proceeding. The index is never lost to
    checkpoint-block eviction or a partial overwrite."""
    import shutil

    from hangarbay_spark.operators import fts

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    path = str(tmp_path / "idx")
    fts.save_index(
        fts.build_inverted_index(docs, "doc_id", "text"), path, buckets=4
    )
    before = sorted(map(tuple, fts.load_index(spark, path).collect()))

    # crash after the tmp write, before swap-in: dst gone, tmp complete
    shutil.copytree(path, path + "__compact_tmp")
    shutil.rmtree(path)
    fts.compact_index(spark, path, "doc_id", buckets=4)
    assert sorted(map(tuple, fts.load_index(spark, path).collect())) == before
    assert not (tmp_path / "idx__compact_tmp").exists()

    # crash between the two renames: dst gone, __old complete
    shutil.move(path, path + "__old")
    fts.compact_index(spark, path, "doc_id", buckets=4)
    assert sorted(map(tuple, fts.load_index(spark, path).collect())) == before
    assert not (tmp_path / "idx__old").exists()

    # and a real (forced) compaction through the swap path is lossless
    assert fts.compact_index(spark, path, "doc_id", buckets=4, force=True)
    assert sorted(map(tuple, fts.load_index(spark, path).collect())) == before


def test_fts_tf_generations_crash_windows(spark, tmp_path):
    """The BM25 artifacts ride the gen-dir LSM: a poisoned gen=b from a
    crashed attempt above the batch marker is OVERWRITTEN wholesale on
    replay, and a partial gen=m (no _SUCCESS) is reader-invisible and
    GC'd by the next compaction — tf counts can never double-land."""
    import os

    from pyspark.sql import functions as F

    from hangarbay_spark.operators import fts
    from hangarbay_spark.streaming import fts_maintenance as FM
    from hangarbay_spark.streaming import genlsm

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "idx")
    assert FM.ingest_docs_batch(spark, b0, 0, idx, buckets=4) == b0.count()

    # crashed attempt left a poisoned tf generation for batch 1; the
    # marker never advanced, so the replay rewrites it byte-identical
    spark.createDataFrame(
        [("poison", 1, 999)], "token string, doc_id long, tf long"
    ).write.mode("overwrite").parquet(f"{FM.tf_path(idx)}/gen=b1")
    assert FM.ingest_docs_batch(spark, b1, 1, idx, buckets=4) == b1.count()
    tf_s = sorted(map(tuple, FM.read_maintained_tf(spark, idx).collect()))
    tf_b = sorted(
        map(tuple, fts.build_tf_index(docs, "doc_id", "text").collect())
    )
    assert tf_s == tf_b
    assert not any(r[0] == "poison" for r in tf_s)

    # partial merge attempt (no _SUCCESS): invisible, then GC'd
    spark.createDataFrame(
        [("poison_m", 1, 999)], "token string, doc_id long, tf long"
    ).write.mode("overwrite").parquet(f"{FM.tf_path(idx)}/gen=m5")
    os.remove(f"{FM.tf_path(idx)}/gen=m5/_SUCCESS")
    assert "gen=m5" not in genlsm.live_generations(FM.tf_path(idx))
    assert sorted(
        map(tuple, FM.read_maintained_tf(spark, idx).collect())
    ) == tf_b
    assert genlsm.compact_generations(
        spark, FM.tf_path(idx), buckets=4, key="token", force=True
    )
    assert "gen=m5" not in genlsm.generations(FM.tf_path(idx))
    assert sorted(
        map(tuple, FM.read_maintained_tf(spark, idx).collect())
    ) == tf_b


def test_spandf_maintenance_stream_matches_batch(spark, tmp_path):
    """Gram-df maintenance drained over 4 time-split micro-batches
    converges to EXACTLY the batch-built gram document frequencies
    (counts merge by sum across generations), duplicated-span counts
    from the maintained state equal the batch operator on the full
    corpus, merge-compaction fired without changing a single count,
    and a fresh-checkpoint replay is a no-op."""
    import os
    import time

    from pyspark.sql import functions as F

    from hangarbay_spark.operators import dedup as D
    from hangarbay_spark.streaming import spandf_maintenance as SM

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    stage = str(tmp_path / "src")
    t0 = time.time()
    for b in range(4):
        docs.filter(F.col("doc_id") % 4 == b).coalesce(1).write.parquet(
            f"{stage}/b{b}"
        )
        for root, _, files in os.walk(f"{stage}/b{b}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (t0 + b, t0 + b))
    state = str(tmp_path / "state")

    def drain(ckpt: str) -> None:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stage}/*")
        )
        SM.spandf_maintenance_stream(
            stream, state, checkpoint_dir=ckpt, buckets=8,
            max_generations=2,
        ).awaitTermination()

    drain(str(tmp_path / "ckpt1"))
    # compaction fired: live generations folded under the count gate
    assert len(SM._live_generations(state)) <= 2
    assert any(g.startswith("gen=m") for g in SM._live_generations(state))

    # stream == batch: maintained gram-df equals one built in one shot
    got = {
        r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()
    }
    batch = {
        r["g"]: r["gdf"]
        for r in D.positional_gram_postings(docs, "doc_id", "text", 10)
        .select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("gdf"))
        .collect()
    }
    assert got == batch

    # span counts from state == the batch operator on the full corpus
    from_state = {
        r["doc_id"]: r["n_dup_spans"]
        for r in SM.duplicated_span_counts_from_state(
            spark, docs, state
        ).collect()
    }
    direct = {
        r["doc_id"]: r["n_dup_spans"]
        for r in D.duplicated_span_counts(
            docs, "doc_id", "text", n=10
        ).collect()
    }
    assert from_state == direct and direct

    # forced re-compaction: identical sums (merge is pure)
    assert SM.compact_gram_df(spark, state, buckets=8, force=True)
    assert {
        r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()
    } == batch

    # fresh-checkpoint replay: marker + manifest make it a no-op
    drain(str(tmp_path / "ckpt2"))
    assert {
        r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()
    } == batch


def test_spandf_crash_replay_never_double_counts(spark, tmp_path):
    """Counts must never double-add across crashes: a crash AFTER the
    generation write but BEFORE the id manifest/marker replays the
    batch — the generation-dir OVERWRITE makes the replay rewrite
    identical content instead of appending a duplicate; and a crash
    between the compaction merge write and its GC leaves stale folded
    dirs that readers provably ignore."""
    from pyspark.sql import functions as F

    from hangarbay_spark.streaming import spandf_maintenance as SM

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    state = str(tmp_path / "state")
    assert SM.ingest_docs_batch(spark, b0, 0, state) == b0.count()

    # crash during batch 1: generation written, manifest+marker not
    real = SM._record_applied

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before marker")

    import unittest.mock as mock

    with mock.patch.object(SM, "_record_applied", side_effect=boom):
        try:
            SM.ingest_docs_batch(spark, b1, 1, state)
        except RuntimeError:
            pass
    assert SM._last_applied(state) == 0  # marker never advanced

    # replay batch 1: the crashed attempt landed the generation AND
    # ids/b1, but the anti-join consults only the COMMITTED prefix
    # (batches <= marker), so the replay recomputes from the FULL
    # original batch and OVERWRITES both dirs with byte-identical
    # content — crucially the counts are NOT doubled (ADVICE r6: an
    # append + separate manifest would undercount here if the ids
    # append had been partial)
    assert SM.ingest_docs_batch(spark, b1, 1, state) == b1.count()
    got = {r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()}
    from hangarbay_spark.operators import dedup as D

    expect = {
        r["g"]: r["gdf"]
        for r in D.positional_gram_postings(docs, "doc_id", "text", 10)
        .select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("gdf"))
        .collect()
    }
    assert got == expect

    # the other crash point — generation written, id manifest NOT:
    # the replay recomputes the batch and OVERWRITES the generation
    # dir, so even a half-written/poisoned gen=b<id> is replaced, never
    # added to (simulated by planting a poisoned generation)
    state2 = str(tmp_path / "state2")
    assert SM.ingest_docs_batch(spark, b0, 0, state2) == b0.count()
    spark.createDataFrame(
        [("poison", 999)], "g string, gdf long"
    ).write.mode("overwrite").parquet(
        f"{SM.grams_path(state2)}/gen=b1"
    )
    assert SM.ingest_docs_batch(spark, b1, 1, state2) == b1.count()
    got2 = {
        r["g"]: r["gdf"] for r in SM.gram_df(spark, state2).collect()
    }
    assert got2 == expect and "poison" not in got2

    # crash between compaction merge and GC: stale dirs are invisible
    with mock.patch.object(
        SM.shutil, "rmtree", side_effect=lambda *a, **k: None
    ):
        assert SM.compact_gram_df(spark, state, force=True)
    # folded dirs still on disk, but readers exclude them
    assert len(SM._generations(state)) > len(SM._live_generations(state))
    assert {
        r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()
    } == expect
    assert real is SM._record_applied  # patch fully unwound


def test_spandf_partial_manifest_and_partial_merge_ignored(
    spark, tmp_path
):
    """ADVICE r6 crash windows: (1) an id-manifest dir above the batch
    marker (a crashed attempt's possibly-partial write) must NOT
    shrink a replayed batch — the old append-manifest protocol
    permanently undercounted here; (2) a ``gen=m`` merge dir without
    ``_SUCCESS`` is invisible to readers (the previous generations it
    was folding are still selected) and is GC'd by the next
    compaction."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators import dedup as D
    from hangarbay_spark.streaming import spandf_maintenance as SM

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    state = str(tmp_path / "state")
    assert SM.ingest_docs_batch(spark, b0, 0, state) == b0.count()

    # (1) plant a crashed attempt's manifest for batch 1 claiming ALL
    # of b1 was ingested, plus a poisoned generation — the replay must
    # ignore both (marker still at 0) and recompute from the full batch
    b1.select("doc_id").write.mode("overwrite").parquet(
        f"{SM._ids_path(state)}/b1"
    )
    spark.createDataFrame(
        [("poison", 999)], "g string, gdf long"
    ).write.mode("overwrite").parquet(f"{SM.grams_path(state)}/gen=b1")
    assert SM.ingest_docs_batch(spark, b1, 1, state) == b1.count()
    expect = {
        r["g"]: r["gdf"]
        for r in D.positional_gram_postings(docs, "doc_id", "text", 10)
        .select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("gdf"))
        .collect()
    }
    got = {r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()}
    assert got == expect and "poison" not in got

    # (2) a partial merge write (no _SUCCESS) never shadows the
    # b-generations it was folding
    import os

    spark.createDataFrame(
        [("poison_m", 999)], "g string, gdf long"
    ).write.mode("overwrite").parquet(f"{SM.grams_path(state)}/gen=m5")
    os.remove(f"{SM.grams_path(state)}/gen=m5/_SUCCESS")
    assert "gen=m5" not in SM._live_generations(state)
    got = {r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()}
    assert got == expect
    # next compaction GCs the partial attempt and lands a real merge
    assert SM.compact_gram_df(spark, state, force=True)
    assert "gen=m5" not in SM._generations(state)
    got = {r["g"]: r["gdf"] for r in SM.gram_df(spark, state).collect()}
    assert got == expect


def test_gk_maintenance_stream_matches_batch(spark, tmp_path):
    """Streamed GK summaries == the one-pass batch build with the same
    data-derived batch tags (summary merge is union — generations
    concatenate), quantile estimates from the maintained state are
    identical, a replayed batch id no-ops, and delivery ORDER doesn't
    matter (the tag comes from the data)."""
    from pyspark.sql import functions as F

    from hangarbay_spark.operators.sketches import (
        gk_quantile_estimates,
        gk_summary,
    )
    from hangarbay_spark.streaming import gk_maintenance as GM

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    rows = li.select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
        (F.col("l_orderkey") % 4).alias("bi"),
    )
    state = str(tmp_path / "state")
    # deliver batches OUT of tag order: 2, 0, 3, 1
    for batch_id, b in enumerate([2, 0, 3, 1]):
        assert GM.ingest_batch(
            spark, rows.filter(F.col("bi") == b), batch_id, state,
            "v", "tb", "bi", partitions=8,
        )
    streamed = sorted(
        map(tuple, GM.read_summary(spark, state).collect())
    )
    direct = sorted(
        map(
            tuple,
            gk_summary(
                rows, "v", "tb", partitions=8, batch_col="bi"
            ).collect(),
        )
    )
    assert streamed == direct and streamed

    est_s = sorted(
        map(
            tuple,
            gk_quantile_estimates(GM.read_summary(spark, state)).collect(),
        )
    )
    est_b = sorted(
        map(
            tuple,
            gk_quantile_estimates(
                gk_summary(rows, "v", "tb", partitions=8, batch_col="bi")
            ).collect(),
        )
    )
    assert est_s == est_b

    # replayed batch id: no-op; state unchanged
    assert not GM.ingest_batch(
        spark, rows.filter(F.col("bi") == 0), 1, state, "v", "tb", "bi",
        partitions=8,
    )
    assert sorted(
        map(tuple, GM.read_summary(spark, state).collect())
    ) == streamed

    # compaction fired during ingest (4 gens > max_generations=3) and
    # a further forced fold leaves one generation — rows untouched
    from hangarbay_spark.streaming import genlsm

    assert len(genlsm.live_generations(GM.summary_path(state))) < 4
    genlsm.compact_generations(
        spark, GM.summary_path(state), buckets=1, key="p", force=True
    )
    assert len(genlsm.live_generations(GM.summary_path(state))) == 1
    assert sorted(
        map(tuple, GM.read_summary(spark, state).collect())
    ) == streamed


def test_heavy_hitter_crash_replay_never_double_adds(
    spark, tmp_path, monkeypatch
):
    """Exactly-once across a crash BETWEEN the summary write and the
    meta commit: batch 1 crashes after writing its versioned summary
    but before the atomic meta flip, so the replay must re-merge from
    the batch-0 committed summary — counter mass is applied exactly
    once (with k larger than the distinct-token count MG is exact, so
    any double-add would show as inflated counts)."""
    import json

    from hangarbay_spark.streaming import hh_maintenance as HH

    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3, "tok string"
    )
    b1 = spark.createDataFrame(
        [("a",)] * 2 + [("c",)] * 4, "tok string"
    )
    assert HH.ingest_tokens_batch(spark, b0, 0, state, k=100) == 8

    # crash: versioned summary for batch 1 lands, meta flip does not
    real_write_meta = HH._write_meta

    def boom(*a, **kw):
        raise RuntimeError("simulated crash before meta commit")

    monkeypatch.setattr(HH, "_write_meta", boom)
    try:
        HH.ingest_tokens_batch(spark, b1, 1, state, k=100)
    except RuntimeError:
        pass
    meta = json.load(open(f"{state}/_state.json"))
    assert meta["batch_id"] == 0  # commit point never reached

    # replay of batch 1 merges from the batch-0 COMMITTED summary
    monkeypatch.setattr(HH, "_write_meta", real_write_meta)
    assert HH.ingest_tokens_batch(spark, b1, 1, state, k=100) == 6
    got = {
        r.tok: r.cnt
        for r in spark.read.parquet(
            HH._summary_path(state, HH._read_meta(state))
        ).collect()
    }
    assert got == {"a": 7, "b": 3, "c": 4}  # exact — no double-add
    # replaying an already-committed batch id stays a no-op
    assert HH.ingest_tokens_batch(spark, b1, 1, state, k=100) == 0


def test_last_touch_attribution_stream_matches_batch(spark, tmp_path):
    """Stateful last-touch attribution drained over FOUR time-split
    files (one micro-batch each, so touch state genuinely carries
    across batches) aggregates to exactly the batch query's per-channel
    purchase counts and decimal-exact revenue."""
    from pyspark.sql.window import Window as W

    from hangarbay_spark.queries.base import load_events
    from hangarbay_spark.queries.events import events_last_touch_attribution

    ev = load_events(spark, SF_DIR)
    n = ev.count()
    ranked = ev.withColumn(
        "rn", F.row_number().over(W.orderBy("ts", "event_id"))
    ).withColumn("part", ((F.col("rn") - 1) * 4 / n).cast("int"))
    path = str(tmp_path / "seq")
    for i in range(4):  # sequential writes -> sequential file mtimes
        ranked.filter(F.col("part") == i).drop("rn", "part").coalesce(
            1
        ).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    got = SE.run_to_memory(
        SE.last_touch_attribution(stream),
        "t_last_touch",
        spark,
        output_mode="append",
    )
    got_agg = got.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("purchases"),
        F.sum(F.col("value").cast("decimal(30,4)"))
        .cast("double")
        .alias("attributed_revenue"),
    )
    g = {
        r["channel"]: (r["purchases"], r["attributed_revenue"])
        for r in got_agg.collect()
    }
    b = {
        r["channel"]: (r["purchases"], r["attributed_revenue"])
        for r in events_last_touch_attribution(spark, SF_DIR).collect()
    }
    assert g == b


def test_sequence_pattern_stream_matches_batch(spark, tmp_path):
    """Streaming CEP (contiguous v->c->p detector) drained over FOUR
    time-split files equals the batch journey-string substring count
    per user — including runs split across micro-batch boundaries
    (the 2-char state window carries them)."""
    from pyspark.sql.window import Window as W

    from hangarbay_spark.queries.base import load_events

    ev = load_events(spark, SF_DIR)
    n = ev.count()
    ranked = ev.withColumn(
        "rn", F.row_number().over(W.orderBy("ts", "event_id"))
    ).withColumn("part", ((F.col("rn") - 1) * 4 / n).cast("int"))
    path = str(tmp_path / "cepseq")
    for i in range(4):
        ranked.filter(F.col("part") == i).drop("rn", "part").coalesce(
            1
        ).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    got = SE.run_to_memory(
        SE.sequence_pattern_matches(stream),
        "t_cep",
        spark,
        output_mode="append",
    )
    g = {
        r["user_id"]: r["m"]
        for r in got.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
        .collect()
    }
    # batch truth: the journey-string substring elimination count
    j = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("ch"),
                        )
                    )
                ),
                lambda s: s["ch"],
            ),
        ).alias("s")
    )
    b = {
        r["user_id"]: r["m"]
        for r in j.select(
            "user_id",
            (
                (
                    F.length("s")
                    - F.length(F.replace(F.col("s"), F.lit("vcp")))
                )
                / F.lit(3)
            )
            .cast("bigint")
            .alias("m"),
        )
        .filter(F.col("m") > 0)
        .collect()
    }
    assert g == b and len(g) > 0


def test_bloom_maintenance_replay_idempotent(spark, tmp_path):
    """Streaming Bloom maintenance survives replay by ALGEBRA: ingest
    two batches, re-ingest batch 0 (a crash-replay double-apply), and
    the maintained member vocabulary and bit set are UNCHANGED — set
    union is idempotent, so no marker/manifest protocol is needed.
    Also pins streamed == batch-built artifacts on the same docs."""
    from hangarbay_spark.operators import text as X
    from hangarbay_spark.queries.llmops import bloom_lanes_of
    from hangarbay_spark.streaming import bloom_maintenance as BM

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en"),
            (2, "voila un document", "fr"),
            (3, "data model the pipeline", "en"),
            (4, "quick data quick data", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    root = str(tmp_path / "bloom")
    b0 = docs.filter(F.col("doc_id") <= 2)
    b1 = docs.filter(F.col("doc_id") > 2)
    BM.ingest_batch(b0, root)
    BM.ingest_batch(b1, root)
    members = sorted(r[0] for r in BM.read_members(spark, root).collect())
    bits = sorted(tuple(r) for r in BM.read_bits(spark, root).collect())

    BM.ingest_batch(b0, root)  # replayed batch: plain re-append
    assert (
        sorted(r[0] for r in BM.read_members(spark, root).collect())
        == members
    )
    assert (
        sorted(tuple(r) for r in BM.read_bits(spark, root).collect()) == bits
    )

    # streamed artifacts == one-shot batch build over the same corpus
    exp_members = sorted(
        r[0]
        for r in docs.filter(F.col("lang") == "en")
        .select(F.explode(X.tokens_expr("text")).alias("token"))
        .distinct()
        .collect()
    )
    exp_bits = sorted(
        tuple(r)
        for r in bloom_lanes_of(
            docs.filter(F.col("lang") == "en").select(
                F.explode(X.tokens_expr("text")).alias("token")
            )
        )
        .select("r", "idx")
        .distinct()
        .collect()
    )
    assert members == exp_members and bits == exp_bits


def test_classifier_admission_replay_idempotent(spark, tmp_path):
    """Replaying a micro-batch through the classifier-admission sink
    must change nothing after distinct-on-read (crash-safety by
    ALGEBRA: the model is frozen, so admitted rows are pure functions
    of the docs — the bloom_maintenance discipline), and the admitted
    set must equal the batch gate exactly."""
    import os

    from hangarbay_spark.pipelines import indexes
    from hangarbay_spark.operators import classifier as C
    from hangarbay_spark.streaming import classifier_admission as CA

    sf_dir = "/root/testdata/sf0.001"
    os.environ.pop("HANGARBAY_INDEX_DIR", None)
    model_path = indexes.ensure_quality_model(spark, sf_dir)
    assert os.path.exists(model_path.rstrip("/") + "_model.json")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    root = str(tmp_path / "adm_root")
    CA.ingest_batch(batch, model_path, root)
    once = sorted(map(tuple, CA.read_admitted(spark, root).collect()))
    CA.ingest_batch(batch, model_path, root)  # crash-replay
    twice = sorted(map(tuple, CA.read_admitted(spark, root).collect()))
    assert once == twice and once
    # admitted == the batch gate over the same docs and frozen model
    wdf = spark.read.parquet(model_path)
    expect = sorted(
        map(
            tuple,
            C.score_docs(batch, wdf)
            .filter(F.col("p") >= CA.ADMIT_THRESHOLD_MICRO)
            .join(batch.select("doc_id", "source"), "doc_id")
            .collect(),
        )
    )
    assert once == expect
