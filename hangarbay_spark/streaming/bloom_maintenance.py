"""Streaming maintenance of a Bloom membership filter: each micro-batch
appends its member-vocabulary tokens and their Bloom bit addresses to
two parquet postings tables; readers take DISTINCT.

Crash-safety by ALGEBRA, not protocol — the deliberate contrast to the
counts-shaped gram-df/tf LSMs (:mod:`streaming.genlsm`,
:mod:`streaming.spandf_maintenance`): set union is idempotent, so a
replayed batch re-appending the same (r, idx) / token rows changes
NOTHING after the reader's distinct. Plain ``mode("append")`` — the
exact pattern CLAUDE.md forbids for COUNTS — is provably safe here, and
no batch marker, generation dir, or manifest is needed. The one
invariant: rows must be idempotent-on-replay postings (facts about a
token), never per-batch quantities.

At 100 TB: the bits table is bounded by filter geometry (k lanes x m
bits rows worst case) no matter the corpus size — it is the broadcast
artifact a join-pruning probe side ships to every task; the token table
is the member vocabulary (compaction = rewrite-distinct, optional).

Reference parity: the reference has no streaming surface (SURVEY.md
§2.7); this extends its indexing story to ingest time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.operators import text as X

MEMBERS_SUBDIR = "members.parquet"
BITS_SUBDIR = "bits.parquet"


def ingest_batch(batch_df: DataFrame, root: str) -> None:
    """Append one micro-batch's member tokens + Bloom bit addresses.

    Per-batch DISTINCT keeps the append volume at the batch's novel
    vocabulary scale; cross-batch duplicates are collapsed by the
    reader (idempotent union — see module docstring for why a crash or
    replay anywhere in these two appends is harmless)."""
    from hangarbay_spark.queries.llmops import bloom_lanes_of

    members = (
        batch_df.filter(F.col("lang") == "en")
        .select(F.explode(X.tokens_expr("text")).alias("token"))
        .distinct()
    ).localCheckpoint()  # two consumers: token append + lane append
    members.write.mode("append").parquet(f"{root}/{MEMBERS_SUBDIR}")
    (
        bloom_lanes_of(members)
        .select("r", "idx")
        .distinct()
        .write.mode("append")
        .parquet(f"{root}/{BITS_SUBDIR}")
    )


def bloom_ingest_stream(stream: DataFrame, root: str, checkpoint_dir: str):
    """Drain a documents stream into the Bloom artifacts (availableNow)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, root)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a postings subdir, or return an empty typed frame when no
    batch has landed yet (e.g. a stream whose first batch crashed
    before its first append) — an empty Bloom filter is a valid state
    of the set algebra, not an error.  Existence is probed through the
    Spark reader itself (catching the PATH_NOT_FOUND / schema-inference
    AnalysisException), not os.path — a local-fs check would misread a
    populated hdfs://-or-s3:// store as empty (ADVICE r8).  Only the
    missing-path / empty-dir error classes map to "empty store"; any
    other AnalysisException (a corrupted or unreadable store) re-raises
    — masking data problems as valid empty state would silently
    re-admit everything (ADVICE r9)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).distinct()
    except AnalysisException as e:
        if _is_missing_store(e):
            return spark.createDataFrame([], schema)
        raise


#: AnalysisException error classes that mean "no store here yet" (vs a
#: store that exists but cannot be read — which must re-raise).
_MISSING_STORE_CLASSES = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}


def _is_missing_store(e) -> bool:
    """True iff ``e`` is the missing-path / empty-dir class of
    AnalysisException (shared with classifier_admission's
    read_admitted)."""
    try:
        cls = e.getCondition()  # Spark 4 name for getErrorClass
    except Exception:
        try:
            cls = e.getErrorClass()
        except Exception:
            cls = None
    return cls in _MISSING_STORE_CLASSES


def read_members(spark: SparkSession, root: str) -> DataFrame:
    """The maintained member vocabulary (distinct-on-read)."""
    return _read_or_empty(
        spark, f"{root}/{MEMBERS_SUBDIR}", "token string"
    )


def read_bits(spark: SparkSession, root: str) -> DataFrame:
    """The maintained Bloom bit set (distinct-on-read; bounded by
    geometry, broadcastable by contract)."""
    return _read_or_empty(
        spark, f"{root}/{BITS_SUBDIR}", "r int, idx int"
    )
