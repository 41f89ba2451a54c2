"""Streaming heavy-hitters maintenance: a bounded Misra-Gries summary
kept up to date from an append-only token stream via ``foreachBatch``.

The frequency twin of the ANN/FTS maintenance stories, built on the
MERGEABILITY of MG summaries (Agarwal et al., "Mergeable Summaries",
PODS 2012): merging capacity-k summaries and re-pruning to k yields a
valid capacity-k summary of the concatenated stream — so the persisted
state never exceeds k rows no matter how much history flows through,
and no micro-batch ever rescans previous data.

Per micro-batch:

- the batch's token column runs through the distributed MG kernel
  (``operators.sketches.misra_gries_summary`` — <=k counters per
  partition, the only data-sized work);
- the bounded partial summaries merge with the persisted summary
  driver-side (by-contract-small: k rows per frame) and are re-pruned
  to k;
- state (summary parquet + n/k/batch_id meta) is committed with the
  idempotent-foreachBatch recipe: a crash-replayed batch id is skipped
  whole, so counters are never double-added.

Guarantees surfaced by :func:`heavy_hitters_from_state`: every
decrement event (kernel-internal or merge-level) of magnitude d
removes at least d*(k+1) mass from the stream total, so the total
per-item undercount D satisfies D <= (n - sum(counters)) / (k+1) —
computable from the state alone, no decrement tracking needed. For
every item, true_count is in [cnt, cnt + D]; any item with
true_count > n/(k+1) is present. A query for "frequency > n/inv_phi"
therefore returns every true heavy hitter (no false negatives) when
k >= inv_phi, with per-item count brackets — the streaming analog of
the exact two-pass batch query (``text_heavy_hitter_tokens``), which
re-verifies candidates exactly because batch jobs CAN rescan.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.operators.sketches import (
    mg_merge,
    misra_gries_summary,
)

SUMMARY_SUBDIR = "summary.parquet"  # legacy (pre-versioned) layout
META_FILE = "_state.json"


def _summary_path(state_dir: str, meta: dict | None = None) -> str:
    """Path of the COMMITTED summary: the one the meta pointer names.

    Exactly-once across crashes: each batch writes its merged summary to
    a batch-id-versioned path (``summary-<batch_id>.parquet``) and the
    commit is the atomic meta flip (``os.replace``). A crash between the
    summary write and the meta flip leaves the meta pointing at the
    PREVIOUS committed summary, so the replayed micro-batch re-merges
    from pre-batch state instead of the half-committed one — counter
    mass is never double-added (the ANN-maintenance anti-join has no
    analog here; the pointer IS the idempotency layer).
    """
    name = (meta or {}).get("summary") or SUMMARY_SUBDIR
    return str(Path(state_dir) / name)


def _read_meta(state_dir: str) -> dict:
    try:
        with open(Path(state_dir) / META_FILE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"n": 0, "k": 0, "batch_id": -1}


def _write_meta(state_dir: str, meta: dict) -> None:
    tmp = Path(state_dir) / (META_FILE + ".tmp")
    tmp.write_text(json.dumps(meta))
    os.replace(tmp, Path(state_dir) / META_FILE)


def ingest_tokens_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    col: str = "tok",
    k: int = 200,
) -> int:
    """Fold one micro-batch into the persisted summary. Returns the
    batch row count applied (0 for replayed batch ids)."""
    Path(state_dir).mkdir(parents=True, exist_ok=True)
    meta = _read_meta(state_dir)
    if batch_id <= meta["batch_id"]:
        return 0
    # distributed, bounded-state pass over the batch; everything after
    # this line touches <=k-per-partition rows only
    parts = misra_gries_summary(batch_df.select(col), col, k=k)
    n_batch = batch_df.count()
    counts: dict = {}
    for r in parts.collect():  # bounded by contract (k x partitions)
        counts[r[col]] = counts.get(r[col], 0) + int(r["cnt"])
    if int(meta["batch_id"]) >= 0 or (
        Path(_summary_path(state_dir, meta))
    ).exists():  # merge from the COMMITTED summary only (see _summary_path)
        for r in spark.read.parquet(
            _summary_path(state_dir, meta)
        ).collect():
            counts[r[col]] = counts.get(r[col], 0) + int(r["cnt"])
    merged, _ = mg_merge(counts, k)
    rows = [(i, int(c)) for i, c in sorted(merged.items())]
    new_summary = f"summary-{int(batch_id)}.parquet"
    spark.createDataFrame(rows, f"{col} string, cnt long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(Path(state_dir) / new_summary))
    prev_summary = _summary_path(state_dir, meta)
    _write_meta(  # the atomic commit point (os.replace)
        state_dir,
        {
            "n": int(meta["n"]) + int(n_batch),
            "k": int(k),
            "batch_id": int(batch_id),
            "summary": new_summary,
        },
    )
    # post-commit GC of the superseded summary (best-effort; a leftover
    # dir is harmless — nothing points at it)
    if Path(prev_summary) != Path(state_dir) / new_summary:
        shutil.rmtree(prev_summary, ignore_errors=True)
    return int(n_batch)


def hh_maintenance_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    col: str = "tok",
    k: int = 200,
):
    """Attach the summary-maintenance sink to a token stream
    (``availableNow`` — the batch-job form of continuous
    maintenance)."""
    spark = stream.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_tokens_batch(spark, batch_df, batch_id, state_dir, col, k)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def heavy_hitters_from_state(
    spark: SparkSession,
    state_dir: str,
    inv_phi: int,
    col: str = "tok",
) -> DataFrame:
    """Items that MAY exceed frequency n/inv_phi, with count brackets.

    cnt_lo is the summary counter (a guaranteed lower bound); cnt_hi =
    cnt_lo + D where D = (n - sum(counters)) // (k+1) is the
    conservation-law undercount bound (module docstring — it covers
    kernel-internal AND merge decrements, with no tracking). Filtering
    on cnt_hi keeps every true heavy hitter (no false negatives); a
    consumer that needs exact counts re-verifies cnt_hi survivors
    against the archived corpus — the batch query's second pass."""
    meta = _read_meta(state_dir)
    s = spark.read.parquet(_summary_path(state_dir, meta))
    total = s.agg(F.sum("cnt")).collect()[0][0] or 0
    err = max(0, (int(meta["n"]) - int(total)) // (int(meta["k"]) + 1))
    return (
        s.select(
            F.col(col),
            F.col("cnt").alias("cnt_lo"),
            (F.col("cnt") + F.lit(int(err))).alias("cnt_hi"),
            F.lit(int(meta["n"])).alias("n"),
        )
        .filter(F.col("cnt_hi") * inv_phi > F.col("n"))
        .orderBy(F.col("cnt_lo").desc(), col)
    )
