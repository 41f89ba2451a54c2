"""Generic generation-directory LSM for CONCATENATION-merged tables —
the shared crash-safety protocol behind the FTS BM25 artifacts
(tf/doclen) and the streaming GK quantile summaries.

Protocol (the hardened spandf_maintenance rules, applied to tables
whose merge is plain row concatenation — per-doc/per-batch quantities
with disjoint keys across batches, never additive counts):

- each batch OVERWRITEs its own ``gen=b<batch_id>`` directory, so a
  replay that slips past the caller's batch marker rewrites
  byte-identical content instead of landing a duplicate;
- a generation is live only once Spark's ``_SUCCESS`` job-commit
  marker exists — a crash mid-write leaves a directory every reader
  provably ignores;
- compaction writes the folded rows to ``gen=m<k>`` (k = highest
  generation folded) BEFORE garbage-collecting the folded dirs;
  readers select the highest committed m plus committed b-generations
  newer than it, so every crash point leaves a complete readable
  state.

Tables whose values are COUNTS must NOT use this module — their merge
is a SUM, which is :mod:`streaming.spandf_maintenance`'s protocol
(same directory rules, different fold).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generations(root: str) -> list[str]:
    """All ``gen=*`` subdirectory names on disk ([] if none)."""
    rp = Path(root)
    if not rp.exists():
        return []
    return sorted(
        p.name for p in rp.iterdir()
        if p.is_dir() and p.name.startswith("gen=")
    )


def committed(root: str, gen: str) -> bool:
    """True once the generation's ``_SUCCESS`` job-commit marker
    exists (the ``indexes._is_built`` rule)."""
    return (Path(root) / gen / "_SUCCESS").exists()


def live_generations(root: str) -> list[str]:
    """The generations a READER must see: highest committed
    m-generation plus committed b-generations newer than it."""
    gens = [g for g in generations(root) if committed(root, g)]
    m_max = -1
    for g in gens:
        if g.startswith("gen=m"):
            m_max = max(m_max, int(g[len("gen=m"):]))
    return [
        g for g in gens
        if (g.startswith("gen=m") and int(g[len("gen=m"):]) == m_max)
        or (g.startswith("gen=b") and int(g[len("gen=b"):]) > m_max)
    ]


def read_live(spark: SparkSession, root: str) -> DataFrame:
    """Union of the live generations."""
    return spark.read.parquet(
        *[f"{root}/{g}" for g in live_generations(root)]
    )


def write_batch_generation(
    df: DataFrame, root: str, batch_id: int, buckets: int, key: str
) -> None:
    """OVERWRITE this batch's generation, key-bucketed and
    within-partition sorted (read locality for key-filtered scans)."""
    df.repartition(buckets, F.col(key)).sortWithinPartitions(
        key
    ).write.mode("overwrite").parquet(f"{root}/gen=b{int(batch_id)}")


def compact_generations(
    spark: SparkSession,
    root: str,
    buckets: int,
    key: str,
    max_generations: int = 3,
    force: bool = False,
) -> bool:
    """Fold the live generations into one ``gen=m<k>`` by pure
    concatenation (merge-then-GC; idempotent — the fold set is
    re-derived from disk and rows are untouched). Returns True when a
    merge ran."""
    live = live_generations(root)
    if len(live) <= 1 or (not force and len(live) <= max_generations):
        return False
    for g in generations(root):  # GC partial merge attempts
        if g.startswith("gen=m") and not committed(root, g):
            shutil.rmtree(Path(root) / g, ignore_errors=True)
    k = max(
        int(g[len("gen=m"):]) if g.startswith("gen=m")
        else int(g[len("gen=b"):])
        for g in live
    )
    merged = read_live(spark, root).localCheckpoint()
    merged.repartition(buckets, F.col(key)).sortWithinPartitions(
        key
    ).write.mode("overwrite").parquet(f"{root}/gen=m{k}")
    for g in live:
        if g != f"gen=m{k}":
            shutil.rmtree(Path(root) / g, ignore_errors=True)
    return True
