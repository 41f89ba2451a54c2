"""Streaming materialized-view maintenance: keep a parquet aggregate
table up to date from an append-only event stream via
``foreachBatch`` + ``pipelines/incremental.delta_agg_update``.

This is the streaming half of the incremental-maintenance story: the
batch module maintains an aggregate across snapshot versions; here each
micro-batch IS the delta (+1 rows — append streams have no deletes),
merged into the maintained table without ever rescanning history. At
scale the maintained table is a Delta/Iceberg MERGE target; on plain
parquet the merge result is materialized (localCheckpoint) before the
atomic-overwrite so the read side never races the write.

Exactly-once across restarts: Structured Streaming replays the last
uncommitted micro-batch after a crash, and re-merging the same delta
twice would double-count — the standard idempotent-foreachBatch recipe
applies: the last applied ``batch_id`` is recorded atomically next to
the table and replayed batches are skipped. (Public pattern from the
Structured Streaming programming guide's foreachBatch notes.)
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.pipelines.incremental import (
    SIGN_COL,
    build_agg,
    delta_agg_update,
)

AGG_SUBDIR = "agg.parquet"
META_FILE = "_applied_batch.json"


def _last_applied(agg_dir: str) -> int:
    meta = Path(agg_dir) / META_FILE
    if not meta.exists():
        return -1
    return int(json.loads(meta.read_text())["batch_id"])


def apply_delta_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    agg_dir: str,
    group_cols: Sequence[str],
    sum_specs: dict[str, tuple[str, int]],
) -> bool:
    """Merge one micro-batch of appended rows into the maintained
    aggregate at ``agg_dir``. Returns False (no-op) for an
    already-applied ``batch_id`` — the idempotence that makes
    foreachBatch exactly-once under replay.

    Single-writer contract: one maintenance stream per ``agg_dir``
    (foreachBatch already serializes batches within a stream; two
    streams would race the read-merge-overwrite)."""
    if batch_id <= _last_applied(agg_dir):
        return False
    path = os.path.join(agg_dir, AGG_SUBDIR)
    delta = batch_df.withColumn(SIGN_COL, F.lit(1))
    if Path(path).exists():
        prev = spark.read.parquet(path)
    else:
        prev = build_agg(batch_df.limit(0), group_cols, sum_specs)
    updated = delta_agg_update(prev, delta, group_cols, sum_specs)
    # materialize BEFORE overwriting the path being read
    updated = updated.localCheckpoint()
    updated.write.mode("overwrite").parquet(path)
    tmp = Path(agg_dir) / (META_FILE + ".tmp")
    tmp.write_text(json.dumps({"batch_id": batch_id}))
    tmp.replace(Path(agg_dir) / META_FILE)  # atomic rename commit
    return True


def maintain_agg_stream(
    events: DataFrame,
    agg_dir: str,
    group_cols: Sequence[str],
    sum_specs: dict[str, tuple[str, int]],
    checkpoint_dir: str,
    query_name: str = "agg_maintenance",
):
    """Start the maintenance stream: every micro-batch is merged into
    the parquet aggregate at ``agg_dir``. Returns the StreamingQuery
    (availableNow trigger — drains what exists, then stops)."""
    spark = events.sparkSession
    os.makedirs(agg_dir, exist_ok=True)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_delta_batch(
            spark, batch_df, batch_id, agg_dir, group_cols, sum_specs
        )

    return (
        events.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_maintained_agg(spark: SparkSession, agg_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(agg_dir, AGG_SUBDIR))
