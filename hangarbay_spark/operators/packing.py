"""First-fit-decreasing (FFD) sequence packing: assign documents to
fixed-token-budget training packs, wasting less budget than the
cumulative-offset packing of ``text_pack_sequences``.

Bin packing is inherently sequential — no SQL/window formulation exists
(and none is attempted: this is the documented escape hatch for
genuinely iterative per-group logic, SURVEY §2.8). The scale answer is
SHARDED packing: documents are hash-bucketed into independent shards,
each shard packs locally via ``applyInPandas`` (one Arrow batch per
shard, pure-numpy inner loop), and pack ids are made globally unique by
shard offset. Packing quality loses nothing material: FFD's 11/9·OPT+1
guarantee applies per shard, and shards are statistically identical.

Determinism contract (tested): shard = md5 bucket of the id (stable
across runs/partitioning, same construction as operators/sampling),
items sorted (token_count DESC, id ASC) before first-fit — so the
assignment is a pure function of the input set.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hangarbay_spark.operators.sampling import hash_bucket_expr

PACK_SCHEMA = (
    "id bigint, shard int, pack_id bigint, n_tokens bigint"
)
_SHARD_STRIDE = 1 << 40  # pack_id = shard * stride + local index


def ffd_pack(counts: list[tuple[int, int]], budget: int) -> list[int]:
    """Pure-Python FFD reference: ``counts`` is [(id, n_tokens)...];
    returns the pack index per input position after sorting by
    (-n_tokens, id). Oversized items (> budget) get their own pack."""
    order = sorted(range(len(counts)), key=lambda i: (-counts[i][1], counts[i][0]))
    loads: list[int] = []
    assign = [0] * len(counts)
    for i in order:
        n = counts[i][1]
        for p, load in enumerate(loads):
            if load + n <= budget:
                loads[p] = load + n
                assign[i] = p
                break
        else:
            loads.append(n)
            assign[i] = len(loads) - 1
    return assign


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """Distributed FFD packing. Returns (id, shard, pack_id, n_tokens)
    with globally-unique pack ids; ``n_shards`` bounds both parallelism
    and per-task memory (a shard's (id, count) pairs — two ints per
    doc — must fit in one task)."""
    shards = n_shards

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        counts = list(zip(pdf["id"].astype(int), pdf["n_tokens"].astype(int)))
        assign = ffd_pack(counts, budget)
        return pd.DataFrame(
            {
                "id": pdf["id"].astype("int64"),
                "shard": shard,
                "pack_id": [shard * _SHARD_STRIDE + a for a in assign],
                "n_tokens": pdf["n_tokens"].astype("int64"),
            }
        )

    narrow = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        (hash_bucket_expr(id_col) % shards).cast("int").alias("shard"),
        F.col(token_count_col).cast("bigint").alias("n_tokens"),
    )
    return narrow.groupBy("shard").applyInPandas(pack, schema=PACK_SCHEMA)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack utilization summary of a :func:`pack_sequences_ffd`
    result: (pack_id, n_docs, tokens_used, utilization)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_used"),
        (F.sum("n_tokens") / F.lit(float(budget))).alias("utilization"),
    )
