"""Snapshot-to-snapshot diffing — the reference records
``previous_snapshot`` in every manifest precisely to enable this but
never implemented it (/root/reference/pipelines/fetch.py:181-190,
PLANNING.md:66-68). Here it is as one full-outer-join plan per table.

At scale: both sides are parquet scans pruned to (key + compared
columns); the single shuffle is the full-outer join on the key. Row
hashes compare all non-key columns without materializing wide rows
through the wire twice (hash pushes to the map side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_ADDED = "added"
CHANGE_REMOVED = "removed"
CHANGE_MODIFIED = "modified"


def table_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Per-key change log between two versions of a table.

    Returns (key, change) where change in {added, removed, modified};
    unchanged keys are dropped. Comparison = xxhash64 over all non-key
    columns in schema order (computed map-side, joined narrow).
    """
    cols = [c for c in new.columns if c != key]
    o = old.select(
        F.col(key), F.xxhash64(*[F.col(c) for c in cols]).alias("__h_old")
    )
    n = new.select(
        F.col(key), F.xxhash64(*[F.col(c) for c in cols]).alias("__h_new")
    )
    joined = o.join(n, key, "full_outer")
    return (
        joined.withColumn(
            "change",
            F.when(F.col("__h_old").isNull(), F.lit(CHANGE_ADDED))
            .when(F.col("__h_new").isNull(), F.lit(CHANGE_REMOVED))
            .when(F.col("__h_old") != F.col("__h_new"), F.lit(CHANGE_MODIFIED)),
        )
        .filter(F.col("change").isNotNull())
        .select(key, "change")
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """MERGE-style upsert expressed as plain DataFrames: rows in
    ``updates`` replace target rows with the same key (insert if new);
    ``deletes`` (a key column) drops rows. Composition law (tested):
    ``merge_upsert(old, changed_rows_of(new), removed_keys_of(new))``
    reconstructs ``new`` exactly — so a snapshot diff can be shipped and
    applied instead of re-publishing the full table.

    At scale: two left_anti joins + a union, all shuffling on the key
    once; on a Delta/Iceberg table this same plan is ``MERGE INTO``.
    """
    changed_keys = updates.select(key).distinct()
    survivors = target.join(changed_keys, key, "left_anti")
    if deletes is not None:
        survivors = survivors.join(
            deletes.select(key).distinct(), key, "left_anti"
        )
    return survivors.unionByName(updates)


def snapshot_diff(
    spark: SparkSession,
    old_parquet_dir: str,
    new_parquet_dir: str,
    tables: tuple[str, ...] = ("aircraft", "registrations", "owners"),
    keys: dict[str, str] | None = None,
) -> DataFrame:
    """Change log across table versions in two normalize output dirs.

    Returns (table, key, change) — e.g. which aircraft appeared,
    deregistered, or changed between two FAA snapshots.
    """
    keys = keys or {"aircraft": "n_number", "registrations": "n_number", "owners": "owner_id"}
    parts = []
    for t in tables:
        old = spark.read.parquet(f"{old_parquet_dir}/{t}.parquet")
        new = spark.read.parquet(f"{new_parquet_dir}/{t}.parquet")
        k = keys[t]
        parts.append(
            table_diff(old, new, k).select(
                F.lit(t).alias("table"),
                F.col(k).cast("string").alias("key"),
                "change",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
