"""Deterministic sampling / splitting for training-data pipelines.

Random sampling (``df.sample``) is seed-and-partitioning dependent —
resplitting after a repartition reshuffles examples between train and
validation, which silently leaks data. The deterministic alternative
buckets every row by a content hash of its key: stable across runs,
partitionings, engines, and incremental loads (a new row lands in the
same split forever).

Bucket = first two hex digits of md5(key) -> 0..255, built from string
primitives with identical semantics in DuckDB so splits are
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"
N_BUCKETS = 256


def hash_bucket_expr(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket 0..255 from md5 of the (salted) key string."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), k.cast("string")))
    d1 = F.instr(F.lit(HEX_DIGITS), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(HEX_DIGITS), F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2).cast("int")


def o_hash_bucket(key_sql: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket_expr`."""
    h = f"md5('{salt}' || CAST({key_sql} AS VARCHAR))"
    return (
        f"CAST((strpos('{HEX_DIGITS}', substr({h}, 1, 1)) - 1) * 16 + "
        f"(strpos('{HEX_DIGITS}', substr({h}, 2, 1)) - 1) AS INTEGER)"
    )


def split_expr(
    key: Column | str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    salt: str = "",
) -> Column:
    """'train' / 'val' / 'test' label from the hash bucket.

    Fractions are quantized to 1/256 (the bucket resolution)."""
    bucket = hash_bucket_expr(key, salt)
    train_hi = int(train_frac * N_BUCKETS)
    val_hi = train_hi + int(val_frac * N_BUCKETS)
    return (
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def deterministic_sample(
    df: DataFrame, key: str, frac: float, salt: str = ""
) -> DataFrame:
    """Stable ~frac sample: keeps rows whose bucket falls below the
    quantized threshold. Same rows survive any re-run or repartition."""
    return df.filter(hash_bucket_expr(key, salt) < int(frac * N_BUCKETS))
