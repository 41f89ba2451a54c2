"""Streaming near-dup-rejecting ingest: admit only documents that are
NOT near-duplicates of anything already admitted.

Each micro-batch is MinHash-checked against the persisted signature
table of every previously admitted document
(:func:`operators.dedup.minhash_pairs_incremental` — old text is never
re-shingled; the corpus is touched only through fixed-width signature
rows). Rejection is greedy and deterministic: a new doc is rejected if
it pairs (Jaccard >= threshold) with ANY already-admitted doc or with a
smaller-id doc in its own batch. Survivors' rows are appended to the
admitted-corpus parquet and their signatures to the signature table, so
later batches dedup against everything admitted so far — the streaming
twin of the batch `near_dedup_survivors` step, at per-batch cost
O(|batch| + matched buckets), never O(|corpus|).

Exactly-once across restarts: same idempotent-foreachBatch recipe as
:mod:`streaming.maintenance` — the last applied ``batch_id`` commits
via atomic rename; replayed batches no-op. Single-writer contract per
``corpus_dir``.

At 100 TB: the signature table is id-bucketed parquet (a Delta/Iceberg
append target in production); batch admission is one banded bucket join
against it. Reference parity: the reference has no streaming surface at
all (SURVEY.md §2.7) — this extends its dedup story to ingest time.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.operators import dedup as D

DOCS_SUBDIR = "admitted.parquet"
SIGS_SUBDIR = "sigs.parquet"
META_FILE = "_applied_batch.json"


def _last_applied(corpus_dir: str) -> int:
    meta = Path(corpus_dir) / META_FILE
    if not meta.exists():
        return -1
    return int(json.loads(meta.read_text())["batch_id"])


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> bool:
    """Admit one micro-batch. Returns False (no-op) for an
    already-applied ``batch_id``."""
    if batch_id <= _last_applied(corpus_dir):
        return False
    docs_path = os.path.join(corpus_dir, DOCS_SUBDIR)
    sigs_path = os.path.join(corpus_dir, SIGS_SUBDIR)
    batch_df = batch_df.localCheckpoint()  # consumed by pairs + survivors

    if Path(sigs_path).exists():
        pairs = D.minhash_pairs_incremental(
            spark, batch_df, id_col, text_col, sigs_path, threshold
        )
        batch_ids = batch_df.select(F.col(id_col))
        # id_a is always the new side; a new-new pair may arrive in
        # either order, so reject the larger id of an in-batch pair and
        # any new id paired with an admitted (non-batch) doc.
        new_new = pairs.join(
            batch_ids.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi"
        ).select(F.greatest("id_a", "id_b").alias(id_col))
        new_old = pairs.join(
            batch_ids.withColumnRenamed(id_col, "id_b"),
            "id_b",
            "left_anti",
        ).select(F.col("id_a").alias(id_col))
        rejected = new_new.unionByName(new_old).distinct()
        survivors = batch_df.join(rejected, id_col, "left_anti")
    else:
        # bootstrap: first batch dedups only against itself
        pairs = D.minhash_lsh_dedup_pairs(
            batch_df, id_col, text_col, threshold
        )
        rejected = pairs.select(
            F.greatest("id_a", "id_b").alias(id_col)
        ).distinct()
        survivors = batch_df.join(rejected, id_col, "left_anti")

    survivors = survivors.localCheckpoint()  # rows + signature append
    survivors.write.mode("append").parquet(docs_path)
    D.minhash_signature_frame(survivors, id_col, text_col).write.mode(
        "append"
    ).parquet(sigs_path)
    tmp = Path(corpus_dir) / (META_FILE + ".tmp")
    tmp.write_text(json.dumps({"batch_id": batch_id}))
    tmp.replace(Path(corpus_dir) / META_FILE)  # atomic rename commit
    return True


def dedup_ingest_stream(
    docs: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    query_name: str = "dedup_ingest",
):
    """Start the admission stream (availableNow trigger — drains the
    source, then stops). Returns the StreamingQuery."""
    spark = docs.sparkSession
    os.makedirs(corpus_dir, exist_ok=True)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, batch_id, corpus_dir, id_col, text_col, threshold
        )

    return (
        docs.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_admitted(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(corpus_dir, DOCS_SUBDIR))
