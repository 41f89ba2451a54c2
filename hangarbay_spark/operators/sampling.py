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


# Poisson(1) inverse-CDF ladder on the exact u16 integer scale
# (thresholds = cumulative Poisson(1) mass x 65536, fixed constants —
# pure integer compares, identical on both engines).
POISSON1_U16_LADDER = (
    "CASE WHEN u16 < 24109 THEN 0 WHEN u16 < 48219 THEN 1 "
    "WHEN u16 < 60273 THEN 2 WHEN u16 < 64292 THEN 3 "
    "WHEN u16 < 65296 THEN 4 WHEN u16 < 65497 THEN 5 "
    "WHEN u16 < 65531 THEN 6 WHEN u16 < 65535 THEN 7 ELSE 8 END"
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


def epoch_mixture(
    df: DataFrame,
    key: str,
    source_col: str,
    weights: dict[str, float],
    default: float = 1.0,
    salt: str = "epoch",
) -> DataFrame:
    """LLaMA-style epoch-weighted corpus mixing: each source is seen
    ``weights[source]`` epochs per training pass — rows are emitted
    ``floor(w)`` times plus one more for a deterministic
    hash-bucketed ``frac(w)`` of the source (quantized to 1/256, same
    bucket discipline as :func:`deterministic_sample`, so membership
    in the fractional epoch is stable across runs/engines/partitions).

    Output = input rows with ``repeat_idx`` (0-based copy number);
    rows whose copy count is 0 (w < 1 and outside the kept fraction)
    are dropped. The explode is a zero-shuffle row expansion — at
    100 TB the emitted corpus streams straight to the sink with cost
    proportional to output rows.
    """
    src = F.col(source_col)
    base = None
    thr = None
    for s, w in weights.items():
        b, t = int(w), round((w - int(w)) * N_BUCKETS)
        base = (F.when(src == s, b) if base is None else base.when(src == s, b))
        thr = (F.when(src == s, t) if thr is None else thr.when(src == s, t))
    db, dt = int(default), round((default - int(default)) * N_BUCKETS)
    base = F.lit(db) if base is None else base.otherwise(db)
    thr = F.lit(dt) if thr is None else thr.otherwise(dt)
    n_copies = base + F.when(
        hash_bucket_expr(key, salt) < thr, 1
    ).otherwise(0)
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "repeat_idx",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)),
        )
        .drop("__n")
    )


def es_key_expr(key: Column | str, weight: Column | str, seed: str = "ws1") -> Column:
    """Efraimidis-Spirakis A-ES ranking key: ln(u)/w with u drawn
    uniformly from a seeded md5 of the key (first 8 hex chars + 1, so
    u is in (0, 1] and ln never sees 0). The global top-k by this key
    (descending) is an exact weighted sample without replacement —
    heavier rows win proportionally more often — computed as one
    distributed TakeOrderedAndProject: no global sort, rerun-stable,
    reseedable via ``seed``. ln is pinned to integer micros so the key
    is cross-engine identical (see queries/llmops.py:
    sample_weighted_topk for the DuckDB twin)."""
    k = F.col(key) if isinstance(key, str) else key
    w = F.col(weight) if isinstance(weight, str) else weight
    hex8 = F.substring(
        F.md5(F.concat(F.lit(seed + ":"), k.cast("string"))), 1, 8
    )
    v = F.conv(hex8, 16, 10).cast("bigint")
    u = (v + 1) / F.lit(4294967297.0)
    lnu_m = F.round(F.log(u) * F.lit(1e6)).cast("bigint")
    return lnu_m / w.cast("double")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "ws1",
) -> DataFrame:
    """Exact k-item weighted sample without replacement (A-ES): input
    rows plus ``__es_key``, top-k by the key. Rows with non-positive
    weight are excluded (they can never be drawn)."""
    scored = df.filter(F.col(weight_col) > 0).withColumn(
        "__es_key", es_key_expr(key_col, weight_col, seed)
    )
    return scored.orderBy(F.col("__es_key").desc(), key_col).limit(k)
