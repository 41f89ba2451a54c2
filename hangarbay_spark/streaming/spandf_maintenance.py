"""Streaming maintenance of the gram document-frequency table behind
substring-duplication detection (the ExactSubstr family): each
micro-batch of documents contributes its positional n-grams' per-batch
distinct-doc counts as an appended generation, and compaction MERGES
generations by summing — the LSM-with-merge complement to the FTS
index's append-only compaction (postings concatenate; COUNTS add).

Correct because document ids arrive exactly once (enforced by the id
manifest): a gram's global document frequency is the SUM of its
per-batch distinct-doc counts when no doc spans two batches, so the
maintained table converges to exactly the batch-built gram-df
regardless of how the stream was sliced (stream == batch, pinned in
tests). Downstream, duplicated-span detection for ANY document set is
a join of its positional grams against ``gram_df(...) >= min_df`` —
new docs are screened against everything ingested so far without
re-tokenizing old text, completing incremental parity with the
minhash/simhash/FTS/PQ maintenance twins.

Exactly-once across restarts, two layers like every sink in this
package: the last applied ``batch_id`` commits atomically next to the
table, and the id manifest anti-join makes a replay that slips past
the marker a no-op. Compaction is a pure re-aggregation of the SAME
counts (sum is associative), so it can never double-apply a batch.

At 100 TB: generations are token-hash-keyed parquet appends (a
Delta/Iceberg MERGE target in production); the compaction sum is one
shuffle on the gram digest, postings-scaled.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.operators.dedup import positional_gram_postings

GRAMS_SUBDIR = "gram_df.parquet"
IDS_SUBDIR = "ingested_ids.parquet"
META_FILE = "_applied_batch.json"
SPAN_N = 10


def grams_path(state_dir: str) -> str:
    return str(Path(state_dir) / GRAMS_SUBDIR)


def _ids_path(state_dir: str) -> str:
    return str(Path(state_dir) / IDS_SUBDIR)


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


def _file_count(spark: SparkSession, path: str) -> int:
    from hangarbay_spark.operators.fts import index_data_file_count

    return index_data_file_count(spark, path)


def ingest_docs_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SPAN_N,
    buckets: int = 8,
    max_file_ratio: float = 2.0,
) -> int:
    """Fold one micro-batch of documents into the gram-df table:
    tokenize ONLY the batch, append its per-gram distinct-doc counts as
    a generation, then run the size-ratio merge-compaction. Returns the
    number of newly ingested documents (0 for replays)."""
    from pyspark.errors import AnalysisException

    if batch_id <= _last_applied(state_dir):
        return 0
    Path(state_dir).mkdir(parents=True, exist_ok=True)
    batch = batch_df
    try:  # id-manifest guard: a doc is counted at most once, ever
        seen = spark.read.parquet(_ids_path(state_dir)).select(
            F.col(id_col)
        )
        batch = batch.join(seen, id_col, "left_anti")
    except AnalysisException:
        pass
    batch = batch.localCheckpoint(eager=True)
    n_new = batch.count()
    if n_new == 0:
        _record_applied(state_dir, batch_id)
        return 0
    gen = (
        positional_gram_postings(batch, id_col, text_col, n)
        .select("g", id_col)
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("gdf"))
    )
    gen.repartition(buckets, "g").write.mode("append").parquet(
        grams_path(state_dir)
    )
    batch.select(F.col(id_col)).write.mode("append").parquet(
        _ids_path(state_dir)
    )
    _record_applied(state_dir, batch_id)
    compact_gram_df(
        spark, state_dir, buckets=buckets, max_file_ratio=max_file_ratio
    )
    return n_new


def compact_gram_df(
    spark: SparkSession,
    state_dir: str,
    buckets: int = 8,
    max_file_ratio: float = 2.0,
    force: bool = False,
) -> bool:
    """Merge appended gram-df generations by SUMMING counts per gram —
    the LSM merge step (counts add; contrast the FTS compaction, which
    only re-concatenates postings). Gated on the same file-count ratio;
    idempotent: re-compacting re-aggregates identical sums. Returns
    True when a rewrite ran."""
    gp = grams_path(state_dir)
    n_files = _file_count(spark, gp)
    if n_files == 0 or (not force and n_files <= max_file_ratio * buckets):
        return False
    merged = (
        spark.read.parquet(gp)
        .groupBy("g")
        .agg(F.sum("gdf").cast("bigint").alias("gdf"))
        .localCheckpoint()  # materialize BEFORE overwriting the source
    )
    merged.repartition(buckets, "g").write.mode("overwrite").parquet(gp)
    return True


def gram_df(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained (g, gdf) table — generations summed at read time,
    so readers are correct between compactions too."""
    return (
        spark.read.parquet(grams_path(state_dir))
        .groupBy("g")
        .agg(F.sum("gdf").cast("bigint").alias("gdf"))
    )


def duplicated_span_counts_from_state(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SPAN_N,
    min_df: int = 2,
) -> DataFrame:
    """Per-doc duplicated-span counts for ``docs`` against the
    MAINTAINED gram-df — screens any document set (new batches
    included) without re-tokenizing the ingested corpus; equals the
    batch operator when ``docs`` is the full ingested corpus (pinned
    in tests)."""
    post = positional_gram_postings(docs, id_col, text_col, n)
    hot = gram_df(spark, state_dir).filter(
        F.col("gdf") >= min_df
    ).select("g")
    return (
        post.join(hot, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )


def spandf_maintenance_stream(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SPAN_N,
    buckets: int = 8,
    max_file_ratio: float = 2.0,
):
    """Attach the maintenance sink to a document stream (availableNow).
    Single-writer contract per ``state_dir``."""
    spark = docs.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_docs_batch(
            spark, batch_df, batch_id, state_dir, id_col, text_col, n,
            buckets, max_file_ratio,
        )

    return (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
