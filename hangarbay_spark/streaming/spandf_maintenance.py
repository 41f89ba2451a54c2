"""Streaming maintenance of the gram document-frequency table behind
substring-duplication detection (the ExactSubstr family): each
micro-batch of documents contributes its positional n-grams' per-batch
distinct-doc counts as a GENERATION, and compaction MERGES generations
by summing — the LSM-with-merge complement to the FTS index's
append-only compaction (postings concatenate; COUNTS add).

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

Exactly-once across crashes — counts may NEVER double-add, so this
module gets the strictest protocol in the package (the ADVICE-r5
heavy-hitter lesson applied at design time):

- each batch's generation is written by OVERWRITE to its own
  ``gen=b<batch_id>`` partition directory — a replay that slips past
  the batch marker rewrites byte-identical content instead of
  appending a duplicate generation;
- compaction writes the merged table as ``gen=m<k>`` (k = the highest
  batch id folded) and only THEN garbage-collects the folded
  directories; readers select the highest m-generation plus b-
  generations NEWER than it, so a crash between the merge write and
  the GC leaves stale directories that every reader provably ignores;
- the id manifest (anti-join guard) is itself per-batch OVERWRITE
  directories (``ids/b<j>``), and only batches at or below the atomic
  batch marker are consulted — a replay anti-joins against exactly the
  committed prefix and recomputes its generation from the FULL
  original batch, so a crash mid-manifest-write can never turn into a
  permanent undercount (an append + separate manifest always has that
  window — CLAUDE.md invariant);
- a generation directory is live only once its ``_SUCCESS`` job-commit
  marker exists, so a crash mid-merge-write leaves a partial ``gen=m``
  that readers provably ignore in favor of the previous m + its
  still-present b-generations.

At 100 TB: generations are token-hash-keyed parquet partition dirs (a
Delta/Iceberg MERGE target in production); the compaction sum is one
shuffle on the gram digest, postings-scaled.
"""

from __future__ import annotations

import json
import os
import shutil
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


def _committed_id_batches(state_dir: str, upto: int) -> list[str]:
    """Per-batch id manifest dirs (``ids/b<j>``) for batches j <=
    ``upto`` — the committed prefix. A dir above the batch marker is a
    possibly-partial write from a crashed attempt and must be ignored
    so the replay recomputes from the full original batch."""
    root = Path(_ids_path(state_dir))
    if not root.exists():
        return []
    out = []
    for p in sorted(root.iterdir()):
        if p.is_dir() and p.name.startswith("b"):
            try:
                j = int(p.name[1:])
            except ValueError:
                continue
            if j <= upto:
                out.append(str(p))
    return out


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


def _generations(state_dir: str) -> list[str]:
    """gen=... subdirectory names currently on disk ([] if none)."""
    gp = Path(grams_path(state_dir))
    if not gp.exists():
        return []
    return sorted(
        p.name for p in gp.iterdir() if p.is_dir() and p.name.startswith("gen=")
    )


def _committed(state_dir: str, gen: str) -> bool:
    """A generation counts only once Spark's job-commit ``_SUCCESS``
    marker exists (the ``indexes._is_built`` rule): a crash mid-write
    of ``gen=m<k>`` must not shadow the still-present b-generations it
    was folding (GC only runs after a COMPLETE merge write), and a
    crash mid-write of ``gen=b<j>`` is replayed (batch marker not yet
    advanced) so readers skip the partial attempt."""
    return (Path(grams_path(state_dir)) / gen / "_SUCCESS").exists()


def _live_generations(state_dir: str) -> list[str]:
    """The generations a READER must see: the highest COMMITTED
    m-generation (each m<k> folds every batch <= k) plus committed
    b-generations newer than it. Stale folded directories a crashed GC
    left behind, and partial directories a crashed write left behind,
    are excluded by construction."""
    gens = [g for g in _generations(state_dir) if _committed(state_dir, g)]
    m_max = -1
    for g in gens:
        if g.startswith("gen=m"):
            m_max = max(m_max, int(g[len("gen=m"):]))
    live = []
    for g in gens:
        if g.startswith("gen=m") and int(g[len("gen=m"):]) == m_max:
            live.append(g)
        elif g.startswith("gen=b") and int(g[len("gen=b"):]) > m_max:
            live.append(g)
    return live


def ingest_docs_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = SPAN_N,
    buckets: int = 8,
    max_generations: int = 3,
) -> int:
    """Fold one micro-batch of documents into the gram-df table:
    tokenize ONLY the batch, OVERWRITE its ``gen=b<batch_id>``
    generation (idempotent under replay at any crash point), then run
    the generation-count merge-compaction. Returns the number of newly
    ingested documents (0 for replays)."""
    applied = _last_applied(state_dir)
    if batch_id <= applied:
        return 0
    Path(state_dir).mkdir(parents=True, exist_ok=True)
    batch = batch_df
    # id-manifest guard: a doc is counted at most once, ever. Only the
    # COMMITTED prefix (batches <= marker) is consulted — a partial
    # ids/b<batch_id> from a crashed attempt is invisible, so the
    # replay recomputes the generation from the full original batch.
    id_dirs = _committed_id_batches(state_dir, applied)
    if id_dirs:
        seen = spark.read.parquet(*id_dirs).select(F.col(id_col))
        batch = batch.join(seen, id_col, "left_anti")
    batch = batch.localCheckpoint(eager=True)
    n_new = batch.count()
    if n_new > 0:
        gen = (
            positional_gram_postings(batch, id_col, text_col, n)
            .select("g", id_col)
            .distinct()
            .groupBy("g")
            .agg(F.count(F.lit(1)).cast("bigint").alias("gdf"))
        )
        # OVERWRITE the batch's own generation dir: a replay rewrites
        # identical content — never a second copy of the counts
        gen.repartition(buckets, "g").write.mode("overwrite").parquet(
            f"{grams_path(state_dir)}/gen=b{int(batch_id)}"
        )
        # OVERWRITE the batch's own ids dir (same protocol as the
        # generation): idempotent under replay, no append crash window
        batch.select(F.col(id_col)).write.mode("overwrite").parquet(
            f"{_ids_path(state_dir)}/b{int(batch_id)}"
        )
    _record_applied(state_dir, batch_id)
    compact_gram_df(
        spark, state_dir, buckets=buckets, max_generations=max_generations
    )
    return n_new


def compact_gram_df(
    spark: SparkSession,
    state_dir: str,
    buckets: int = 8,
    max_generations: int = 3,
    force: bool = False,
) -> bool:
    """Merge the live generations by SUMMING counts per gram — the LSM
    merge step (counts add; contrast the FTS compaction, which only
    re-concatenates postings). The merged table lands at ``gen=m<k>``
    (k = highest batch id folded) BEFORE the folded directories are
    GC'd, so readers never see a partial state: a crash mid-GC leaves
    stale dirs that ``_live_generations`` excludes. Gated on the live
    generation count; idempotent (sum is associative and the fold set
    is re-derived from disk). Returns True when a merge ran."""
    live = _live_generations(state_dir)
    if len(live) <= 1 or (not force and len(live) <= max_generations):
        return False
    gp = grams_path(state_dir)
    # GC partial merge attempts a crash left behind (dir, no _SUCCESS)
    # — reader-invisible already, this just reclaims the space
    for g in _generations(state_dir):
        if g.startswith("gen=m") and not _committed(state_dir, g):
            shutil.rmtree(Path(gp) / g, ignore_errors=True)
    suffixes = [
        int(g[len("gen=m"):]) if g.startswith("gen=m")
        else int(g[len("gen=b"):])
        for g in live
    ]
    k = max(suffixes)
    merged = (
        gram_df(spark, state_dir)
        .localCheckpoint()  # materialize BEFORE touching the source dirs
    )
    merged.repartition(buckets, "g").write.mode("overwrite").parquet(
        f"{gp}/gen=m{k}"
    )
    # post-commit GC (best-effort; stale dirs are reader-invisible)
    for g in live:
        if g != f"gen=m{k}":
            shutil.rmtree(Path(gp) / g, ignore_errors=True)
    return True


def gram_df(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained (g, gdf) table — LIVE generations summed at read
    time, so readers are correct between compactions and immune to
    stale folded directories."""
    live = _live_generations(state_dir)
    gp = grams_path(state_dir)
    paths = [f"{gp}/{g}" for g in live]
    return (
        spark.read.parquet(*paths)
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
    max_generations: int = 3,
):
    """Attach the maintenance sink to a document stream (availableNow).
    Single-writer contract per ``state_dir``."""
    spark = docs.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_docs_batch(
            spark, batch_df, batch_id, state_dir, id_col, text_col, n,
            buckets, max_generations,
        )

    return (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
