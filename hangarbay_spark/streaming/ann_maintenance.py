"""Streaming ANN-index maintenance: keep a persisted PQ code table up
to date from an append-only embedding stream via ``foreachBatch`` +
:func:`hangarbay_spark.operators.similarity.pq_append_to_index`.

The vector twin of the FTS/aggregate maintenance stories: the index is
bootstrapped once (``write_pq_index`` — codebook training + the only
corpus-wide encode), after which every micro-batch is a BATCH-ONLY
encode against the frozen codebooks (a zero-exchange Arrow kernel scan
of the batch) appended to the codes parquet. Search continues to serve
from the same paths (``pq_topk_from_index``) with no rebuild.

Exactly-once across restarts, two layers (the idempotent-foreachBatch
recipe from the Structured Streaming programming guide):

- the last applied ``batch_id`` is recorded atomically next to the
  codes table, so a crash-replayed micro-batch is skipped whole;
- ``pq_append_to_index``'s id anti-join guard makes even a replay that
  slips past the marker (e.g. a manually re-driven batch) a no-op for
  already-coded vectors.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hangarbay_spark.operators import similarity as S

CODES_SUBDIR = "codes.parquet"
BOOKS_SUBDIR = "books.parquet"
META_FILE = "_applied_batch.json"


def codes_path(index_dir: str) -> str:
    return str(Path(index_dir) / CODES_SUBDIR)


def books_path(index_dir: str) -> str:
    return str(Path(index_dir) / BOOKS_SUBDIR)


def bootstrap_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> None:
    """One-time build: train codebooks on the initial corpus and encode
    it. Codebooks are FROZEN afterwards — appends never retrain (the
    FAISS convention; recall drifts only if the data distribution
    does, at which point a full rebuild is an explicit operation)."""
    Path(index_dir).mkdir(parents=True, exist_ok=True)
    S.write_pq_index(
        corpus, codes_path(index_dir), books_path(index_dir),
        id_col=id_col, vec_col=vec_col, dim=dim,
    )


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


def ingest_embeddings_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> int:
    """Apply one micro-batch: encode against the frozen codebooks and
    append. Returns the number of newly coded vectors (0 for replays
    and for batches whose ids are all already coded)."""
    if batch_id <= _last_applied(index_dir):
        return 0
    n = S.pq_append_to_index(
        spark,
        batch_df,
        codes_path(index_dir),
        books_path(index_dir),
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    )
    _record_applied(index_dir, batch_id)
    return n


def ann_index_maintenance_stream(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
):
    """Attach the maintenance sink to an embedding stream; processes
    everything available, then stops (``availableNow`` — the batch-job
    form of continuous maintenance)."""
    spark = stream.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_embeddings_batch(
            spark, batch_df, batch_id, index_dir, id_col, vec_col, dim
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
