"""Streaming maintenance of GK quantile summaries: each micro-batch
contributes its bounded summary tuples as a GENERATION; quantile
queries read the union of live generations — summary MERGE is the
union itself (the mergeable-summaries property the batch
``agg_gk_merge_rollup`` query demonstrates), so the maintained
estimate equals a one-shot batch build with the same batch
partitioning, WITHOUT ever re-reading ingested raw rows.

The batch tag inside each summary's partition key is derived from the
DATA (``batch_col``), not from the delivery order, so the maintained
state — and every estimate — is a pure function of the ingested
multiset: identical no matter how the stream was sliced or reordered,
and therefore oracle-verifiable cross-engine (the
``streaming_gk_quantiles`` registry entry hash-compares against
DuckDB).

Crash safety: the generation-dir LSM protocol (:mod:`streaming.genlsm`
— per-batch OVERWRITE gens, ``_SUCCESS``-gated liveness, merge-then-GC
concat compaction; summary tuples concatenate because partition keys
are disjoint across batches by construction) plus the atomic batch
marker. At 100 TB each generation is <= partitions * (2*err_div + 2)
rows regardless of batch size — the whole maintained state is
broadcast-scale.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hangarbay_spark.operators.sketches import gk_summary
from hangarbay_spark.streaming import genlsm

SUMMARY_SUBDIR = "gk_summary.parquet"
META_FILE = "_applied_batch.json"


def summary_path(state_dir: str) -> str:
    return str(Path(state_dir) / SUMMARY_SUBDIR)


def _last_applied(state_dir: str) -> int:
    try:
        with open(Path(state_dir) / META_FILE) as f:
            return int(json.load(f)["batch_id"])
    except (OSError, ValueError, KeyError):
        return -1


def _record_applied(state_dir: str, batch_id: int) -> None:
    tmp = Path(state_dir) / (META_FILE + ".tmp")
    tmp.write_text(json.dumps({"batch_id": int(batch_id)}))
    os.replace(tmp, Path(state_dir) / META_FILE)


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    value_col: str,
    id_col: str,
    batch_col: str,
    partitions: int = 32,
    err_div: int = 100,
    max_generations: int = 3,
) -> bool:
    """Summarize one micro-batch and land it as a generation. The rows'
    own ``batch_col`` value tags the summary partitions, so admission
    order never matters. CONTRACT: each distinct ``batch_col`` value
    must arrive whole within one micro-batch (the tag IS the batch
    identity — local ranks of a split tag would collide when the
    halves union). Returns False for replayed batch ids."""
    if batch_id <= _last_applied(state_dir):
        return False
    Path(state_dir).mkdir(parents=True, exist_ok=True)
    kept = gk_summary(
        batch_df, value_col, id_col,
        partitions=partitions, err_div=err_div, batch_col=batch_col,
    )
    genlsm.write_batch_generation(
        kept, summary_path(state_dir), batch_id, buckets=1, key="p"
    )
    _record_applied(state_dir, batch_id)
    genlsm.compact_generations(
        spark, summary_path(state_dir), buckets=1, key="p",
        max_generations=max_generations,
    )
    return True


def read_summary(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained summary — live generations unioned; feed it to
    :func:`operators.sketches.gk_quantile_estimates`."""
    return genlsm.read_live(spark, summary_path(state_dir))


def gk_maintenance_stream(
    rows: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    id_col: str,
    batch_col: str,
    partitions: int = 32,
    err_div: int = 100,
    max_generations: int = 3,
):
    """Attach the maintenance sink to a row stream (availableNow).
    Single-writer contract per ``state_dir``."""
    spark = rows.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, batch_id, state_dir, value_col, id_col,
            batch_col, partitions, err_div, max_generations,
        )

    return (
        rows.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
