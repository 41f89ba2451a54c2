"""Streaming FTS-index maintenance with LSM-style compaction: keep a
persisted inverted index up to date from an append-only document
stream via ``foreachBatch`` +
:func:`hangarbay_spark.operators.fts.append_to_index`, folding the
accumulated append generations back into one base generation once they
exceed a size ratio (:func:`hangarbay_spark.operators.fts.
compact_index`).

This completes the LSM-ish story for the durable indexes: appends are
cheap batch-only writes (new postings land as their own token-bucketed
file generation; old documents are never re-tokenized), reads see base
+ appends transparently (one parquet directory), and the compaction
step — the LSM merge — restores single-generation token locality when
the small-file count crosses ``max_file_ratio * buckets``. The
size-ratio gate makes calling it after every batch cheap: it is a
driver-side file-count listing until the policy actually fires.

Exactly-once across restarts, two layers (the idempotent-foreachBatch
recipe every maintenance sink in this package uses):

- the last applied ``batch_id`` commits atomically next to the index,
  so a crash-replayed micro-batch is skipped whole;
- ``append_to_index``'s id-manifest anti-join makes even a replay that
  slips past the marker a no-op for already-ingested documents.

Compaction interacts safely with both layers: it rewrites the SAME row
set (postings and distinct manifest ids are preserved exactly — pinned
in tests), so a crash between a compaction and the next batch changes
nothing about which documents count as ingested.

Reference parity: the reference's FTS is a SQLite-FTS5 rebuild-on-
publish (/root/reference/pipelines/publish.py:286-304); incremental
append + compaction extends it to ingest time, the way an FTS5
deployment runs ``merge`` maintenance.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hangarbay_spark.operators import fts
from hangarbay_spark.streaming.genlsm import (
    compact_generations as _compact_gens,
)
from hangarbay_spark.streaming.genlsm import live_generations as _live_gens
from hangarbay_spark.streaming.genlsm import read_live as _read_gens
from hangarbay_spark.streaming.genlsm import (
    write_batch_generation as _write_gen,
)

INDEX_SUBDIR = "fts.parquet"
TF_SUBDIR = "fts_tf.parquet"
DL_SUBDIR = "fts_doclen.parquet"
META_FILE = "_applied_batch.json"


# The boolean postings index tolerates plain appends (match_* queries
# deduplicate at read), but term FREQUENCIES and doc lengths must never
# double-land, so they ride the generation-dir LSM protocol
# (:mod:`streaming.genlsm` — per-batch OVERWRITE gens, _SUCCESS-gated
# liveness, merge-then-GC concat compaction). tf/dl rows are per-doc
# quantities and doc ids are disjoint across batches by contract.


def index_path(index_dir: str) -> str:
    return str(Path(index_dir) / INDEX_SUBDIR)


def tf_path(index_dir: str) -> str:
    return str(Path(index_dir) / TF_SUBDIR)


def dl_path(index_dir: str) -> str:
    return str(Path(index_dir) / DL_SUBDIR)


def _last_applied(index_dir: str) -> int:
    try:
        with open(Path(index_dir) / META_FILE) as f:
            return int(json.load(f)["batch_id"])
    except (OSError, ValueError, KeyError):
        return -1


def _record_applied(index_dir: str, batch_id: int) -> None:
    tmp = Path(index_dir) / (META_FILE + ".tmp")
    tmp.write_text(json.dumps({"batch_id": int(batch_id)}))
    os.replace(tmp, Path(index_dir) / META_FILE)


def ingest_docs_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "doc_id",
    text_cols: tuple[str, ...] = ("text",),
    buckets: int = 8,
    max_file_ratio: float = 2.0,
) -> int:
    """Apply one micro-batch: tokenize ONLY the batch, append its
    postings generation, write its tf + doclen generations (the BM25
    artifacts — per-batch OVERWRITE gen dirs, see the LSM note above),
    then run the compaction checks. Returns the number of newly
    ingested documents (0 for replays)."""
    if batch_id <= _last_applied(index_dir):
        return 0
    Path(index_dir).mkdir(parents=True, exist_ok=True)
    raw = batch_df.localCheckpoint(eager=True)  # postings + tf + dl
    if raw.count() == 0:
        _record_applied(index_dir, batch_id)
        return 0
    n = fts.append_to_index(
        raw, index_path(index_dir), id_col, *text_cols,
        buckets=buckets,
    )
    # unconditional (not gated on n): a crash between the postings
    # append and these writes would otherwise skip them forever on the
    # replay (append_to_index's manifest already knows the docs, n=0);
    # the OVERWRITE gen protocol makes rewriting them exactly-once
    _write_gen(
        fts.build_tf_index(raw, id_col, text_cols[0]),
        tf_path(index_dir), batch_id, buckets, "token",
    )
    _write_gen(
        fts.build_doclen(raw, id_col, text_cols[0]),
        dl_path(index_dir), batch_id, 1, id_col,
    )
    _record_applied(index_dir, batch_id)
    fts.compact_index(
        spark, index_path(index_dir), id_col,
        buckets=buckets, max_file_ratio=max_file_ratio,
    )
    _compact_gens(spark, tf_path(index_dir), buckets, "token")
    _compact_gens(spark, dl_path(index_dir), 1, id_col)
    return n


def fts_maintenance_stream(
    docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_cols: tuple[str, ...] = ("text",),
    buckets: int = 8,
    max_file_ratio: float = 2.0,
):
    """Attach the maintenance sink to a document stream; processes
    everything available, then stops (``availableNow`` — the batch-job
    form of continuous maintenance). Single-writer contract per
    ``index_dir``."""
    spark = docs.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_docs_batch(
            spark, batch_df, batch_id, index_dir, id_col, text_cols,
            buckets, max_file_ratio,
        )

    return (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_maintained_index(spark: SparkSession, index_dir: str) -> DataFrame:
    return fts.load_index(spark, index_path(index_dir))


def read_maintained_tf(spark: SparkSession, index_dir: str) -> DataFrame:
    """(token, id, tf) rows from the live tf generations — equals the
    batch-built ``build_tf_index`` over everything ingested (disjoint
    doc ids across batches; pinned in tests)."""
    return _read_gens(spark, tf_path(index_dir))


def read_maintained_doclen(spark: SparkSession, index_dir: str) -> DataFrame:
    """(id, dl) rows from the live doclen generations."""
    return _read_gens(spark, dl_path(index_dir))
