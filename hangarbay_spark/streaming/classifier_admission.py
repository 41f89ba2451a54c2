"""Streaming admission under the TRAINED quality classifier: each
micro-batch of documents is scored against the persisted 34-row model
(:func:`hangarbay_spark.pipelines.indexes.ensure_quality_model`) and
the admitted rows — micro-probability at or above the decision
boundary — are appended as (doc_id, p, source) parquet postings;
readers take DISTINCT.

Crash-safety by ALGEBRA (the bloom_maintenance contrast to the
counts-shaped LSMs): the model is FROZEN at publish time, so a doc's
(doc_id, p, source) row is a pure function of the doc — a replayed
batch re-appends identical rows and the reader's distinct collapses
them. No batch marker, generation dir, or manifest. The one invariant:
the model artifact must not be retrained in place between batches
(retraining = a NEW artifact root, the publish flow), or replays could
disagree with first plays.

At 100 TB: per batch the work is one broadcast 34-row join + one
map-side-combined per-doc aggregate — no corpus-scale state is read or
held; the admitted postings table is the output corpus itself.

Reference parity: the reference has no streaming surface (SURVEY.md
§2.7); this extends its publish-time gating story to ingest time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ADMITTED_SUBDIR = "admitted.parquet"
ADMIT_THRESHOLD_MICRO = 500000  # the 0.5 decision boundary


def _validate_model_geometry(model_path: str) -> None:
    """Readers must derive feature geometry from the artifact, never
    module defaults (the persisted-geometry rule the NSW side files
    follow): scoring rebuilds features with the CURRENT module bucket
    layout, so a model trained under a different layout would silently
    mis-bucket every token. A missing side file means the artifact is
    incomplete — fail, don't guess."""
    import json
    from pathlib import Path

    from hangarbay_spark.operators import classifier as C

    sp = Path(model_path.rstrip("/") + "_model.json")
    if not sp.exists():
        raise FileNotFoundError(
            f"quality-model side file missing at {sp}: the artifact is "
            "incomplete — rebuild it (hyperparameters must ride with "
            "the model)"
        )
    meta = json.loads(sp.read_text())
    got = (meta.get("buckets"), meta.get("bias"), meta.get("len_feature"))
    want = (C.QC_B, C.QC_BIAS, C.QC_LENF)
    if got != want:
        raise ValueError(
            f"quality-model feature geometry {got} does not match this "
            f"module's layout {want}: rebuild the model artifact before "
            "scoring (a silent mismatch mis-buckets every token)"
        )


def ingest_batch(batch_df: DataFrame, model_path: str, root: str) -> None:
    """Score one micro-batch against the persisted model and append
    its admitted (doc_id, p, source) rows (idempotent postings — see
    module docstring)."""
    from hangarbay_spark.operators import classifier as C

    spark = batch_df.sparkSession
    wdf = spark.read.parquet(model_path)
    _validate_model_geometry(model_path)
    admitted = (
        C.score_docs(batch_df, wdf)
        .filter(F.col("p") >= ADMIT_THRESHOLD_MICRO)
        .join(batch_df.select("doc_id", "source"), "doc_id")
    )
    admitted.write.mode("append").parquet(f"{root}/{ADMITTED_SUBDIR}")


def admission_ingest_stream(
    stream: DataFrame, model_path: str, root: str, checkpoint_dir: str
):
    """Drain a documents stream through the classifier gate
    (availableNow)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, model_path, root)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_admitted(spark: SparkSession, root: str) -> DataFrame:
    """The maintained admitted-corpus postings (distinct-on-read).
    Existence is probed through the Spark reader, never os.path — the
    bloom_maintenance FS-agnostic rule, with the same narrow
    missing-store-only handler (a corrupted store re-raises)."""
    from hangarbay_spark.streaming.bloom_maintenance import _read_or_empty

    return _read_or_empty(
        spark,
        f"{root}/{ADMITTED_SUBDIR}",
        "doc_id bigint, p bigint, source string",
    )
