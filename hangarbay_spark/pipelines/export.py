"""Training-shard export — the final materialization stage of an LLM
data pipeline: corpus -> (exact dedup + length gate) -> deterministic
epoch shuffle -> order-preserving sharded parquet + manifest.

Reference parity: the reference's publish stage materializes decoded
warehouse tables (pipelines/publish.py twin); this is the same
"materialize for the consumer" move for the training-data consumer —
the trainer reads shard directories in (shard, pos) order, and a new
epoch is a re-export with a different seed, not a new pipeline.

Scale shape: the shuffle key is a seeded md5 of the doc id, shard
assignment and in-shard rank both derive from it (per-SHARD windows —
never a global row_number, which would serialize through one
partition). ``repartition(shard)`` gives each shard to one task, so
each output directory holds exactly one file written in rank order; at
100 TB raise ``n_shards`` until shards are file-sized (the trainer's
usual contract) — every stage stays one-pass.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hangarbay_spark.operators.text import fingerprint_expr


def shuffled(docs: DataFrame, n_shards: int, seed: str) -> DataFrame:
    """doc rows + (shard, pos): the deterministic training order (same
    derivation as queries/llmops.py:sample_epoch_shuffle, generalized
    to any shard count via the md5 hex prefix)."""
    key = F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    keyed = docs.withColumn("__k", key)
    shard = (
        F.conv(F.substring("__k", 1, 8), 16, 10).cast("bigint")
        % F.lit(n_shards)
    )
    w = Window.partitionBy(shard).orderBy("__k", "doc_id")
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__k")
    )


def export_training_shards(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    n_shards: int = 8,
    seed: str = "ep1",
    dedup_exact: bool = True,
    min_chars: int = 1,
) -> dict:
    """Materialize the training corpus into ``out_dir/shard=K/`` parquet
    (one file per shard, rows in training order) plus
    ``out_dir/_meta/export.json``. Returns the manifest dict."""
    docs = spark.read.parquet(f"{corpus_dir.rstrip('/')}/documents.parquet")
    n_input = docs.count()
    kept = docs.filter(F.length("text") >= min_chars)
    if dedup_exact:
        wdup = Window.partitionBy(fingerprint_expr("text")).orderBy("doc_id")
        kept = (
            kept.withColumn("__rn", F.row_number().over(wdup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    ordered = shuffled(kept, n_shards, seed)
    (
        ordered.repartition(n_shards, "shard")
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    per_shard = {
        int(r["shard"]): int(r["n"])
        for r in back.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "corpus_dir": os.path.abspath(corpus_dir),
        "seed": seed,
        "n_shards": n_shards,
        "n_input_docs": n_input,
        "n_exported_docs": sum(per_shard.values()),
        "dedup_exact": dedup_exact,
        "min_chars": min_chars,
        "per_shard_counts": {str(k): per_shard[k] for k in sorted(per_shard)},
    }
    meta_dir = os.path.join(out_dir, "_meta")
    os.makedirs(meta_dir, exist_ok=True)
    with open(os.path.join(meta_dir, "export.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
