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
- near-dup pairs: banded random-hyperplane LSH (Charikar's SRP, the
  cosine analog of MinHash banding). ``HYPERPLANE_BITS`` Rademacher
  (±1) hyperplanes -> sign bits -> ``HYPERPLANE_BANDS`` band values;
  candidate pairs share >=1 exact band, verified with exact cosine.
  Per-band bucket domain is 2^(bits/bands) ≫ the old 2^4 global
  buckets, so within-bucket self-join cost stays near-linear; a
  hot-bucket guard (same idea as ``dedup.prune_frequent``) bounds the
  worst case. Hyperplane coefficients are data-independent
  compile-time constants (seeded md5 -> ±1), embedded as literals in
  both the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

import pandas as pd  # module-level: pandas_udf type hints resolve in module globals

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


def centroid_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
) -> DataFrame:
    """Assign every corpus vector to its max-cosine centroid (ties ->
    smallest centroid id): broadcast the centroid table, one corpus
    scan, per-vector argmax window. This is the assignment step of
    Lloyd's k-means and the coarse-quantizer step of IVF training —
    cost is one pass over the corpus per call, no corpus shuffle."""
    c = centroids.select(
        F.col(cid_col), F.col(vec_col).alias("__cvec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(c)
    ).select(
        F.col(id_col),
        F.col(cid_col),
        cosine_expr(F.col(vec_col), F.col("__cvec")).alias("cosine"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("cosine"), cid_col)
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, cid_col, "cosine")
    )


def centroid_update(
    assigned: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
) -> DataFrame:
    """Element-wise mean of each cluster's vectors -> new centroid
    table. posexplode + (cluster, dim) aggregation: the sum is decimal-
    cast so partial-aggregation order cannot perturb the mean, then the
    array is reassembled in dimension order. One shuffle on
    (cluster, dim) — never collects vectors to the driver."""
    j = assigned.select(F.col(id_col), cid_col).join(
        corpus.select(F.col(id_col), F.col(vec_col)), id_col
    )
    pos = j.select(
        F.col(cid_col), F.posexplode(F.col(vec_col)).alias("i", "x")
    )
    means = pos.groupBy(cid_col, "i").agg(
        (
            F.sum(F.col("x").cast("decimal(30,9)")) / F.count(F.lit(1))
        )
        .cast("float")
        .alias("m")
    )
    return means.groupBy(cid_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("m")))
            ),
            lambda s: s.getField("m"),
        ).alias(vec_col)
    )


def centroid_update_pandas(
    assigned: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "centroid_id",
) -> DataFrame:
    """GROUPED_AGG ``pandas_udf`` twin of :func:`centroid_update`: one
    numpy column-stack mean per cluster instead of the posexplode +
    (cluster, dim) shuffle. Arrow ships each cluster's vectors to ONE
    Python worker as a batch — a partial-agg-free full shuffle on the
    cluster id, so prefer the native path when clusters are huge or
    skewed; this path wins when dimensionality is high (the explode
    multiplies rows by dim) and clusters are balanced.

    Float caveat: numpy's pairwise summation differs from the native
    path's decimal-exact sum in the last ulp; the test pins elementwise
    agreement to 1e-6. Completes the UDF taxonomy's GROUPED_AGG slot
    (see :func:`brute_force_topk_pandas` for the inventory).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, FloatType

    @pandas_udf(ArrayType(FloatType()))
    def mean_vec(vecs: pd.Series) -> list:
        return (
            np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            .mean(axis=0)
            .tolist()
        )

    j = assigned.select(F.col(id_col), cid_col).join(
        corpus.select(F.col(id_col), F.col(vec_col)), id_col
    )
    return j.groupBy(cid_col).agg(mean_vec(F.col(vec_col)).alias(vec_col))


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means on cosine affinity, expressed as DataFrame ops:
    deterministic init (the k smallest-id vectors), then
    assign -> decimal-exact mean -> reassign. Centroids are tiny and
    localCheckpoint-ed each round so plans do not grow across
    iterations; corpus cost is one scan per iteration. Returns the
    final (id, centroid_id, cosine) assignment."""
    centroids = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number()
            .over(W.orderBy(id_col))
            .alias("centroid_id"),
            F.col(vec_col),
        )
        .localCheckpoint()
    )
    assigned = centroid_assign(corpus, centroids, id_col, vec_col)
    for _ in range(iters - 1):
        centroids = centroid_update(
            assigned, corpus, id_col, vec_col
        ).localCheckpoint()
        assigned = centroid_assign(corpus, centroids, id_col, vec_col)
    return assigned


def hyperplane_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    nbits: int = 64,
    bands: int = 8,
    seed: str = "hplsh",
    fast: bool = False,
    fast_cosine: bool = False,
    n_nodes: int | None = None,
) -> DataFrame:
    """Multi-probe ANN: candidates = corpus vectors sharing >=1 of the
    probe's hyperplane band values, scored with exact cosine, per-probe
    top-k. Recall is far higher than single-bucket IVF (a neighbor is
    missed only if it disagrees on ALL ``bands`` bands) at a cost of
    ~bands matched buckets per probe — still a tiny fraction of a corpus
    scan. Probe-side band rows are broadcast (probe sets are small).
    ``fast=True`` computes signatures with the Arrow matmul kernel
    (see :func:`hyperplane_signatures`) — safe for oracle-compared
    queries (band values are pinned equal). ``fast_cosine=True`` also
    scores with the einsum kernel, whose pairwise summation can differ
    from the oracle's sequential accumulation at a 9-dp rounding
    boundary — keep it off when the cosine column feeds a hash-compared
    result (ADVICE r3).

    Regime switch (the NSW_KERNEL_MAX_NODES discipline): corpora at or
    below the bound replay the whole pipeline in one Arrow task
    (:func:`hyperplane_topk_kernel`, bit-identical to the expr path —
    pinned in tests); the distributed pipeline below is the path above
    the gate."""
    if n_nodes is None:
        n_nodes = corpus.count()
    if n_nodes <= NSW_KERNEL_MAX_NODES:
        return hyperplane_topk_kernel(
            corpus, probes, id_col, vec_col,
            k=k, dim=dim, nbits=nbits, bands=bands, seed=seed,
        )

    def buckets(df: DataFrame, out_id: str, use_fast: bool) -> DataFrame:
        sigs = hyperplane_signatures(
            df, id_col, vec_col, dim, nbits, bands, seed, fast=use_fast
        )
        return _bucket_rows(sigs, id_col, bands).withColumnRenamed(
            id_col, out_id
        )

    # Probe sets are small by contract: the expr path skips a second
    # Python-worker roundtrip (band values are pinned equal either way).
    cand = (
        buckets(corpus, "neighbor_id", fast)
        .join(F.broadcast(buckets(probes, "probe_id", False)), ["blk", "val"])
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    pv = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        cand.join(F.broadcast(pv), "probe_id")
        .join(cv, "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            _cosine_pair_col(
                F.col("probe_vec"), F.col("vec"), fast_cosine
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


HYPERPLANE_BITS = 64
HYPERPLANE_BANDS = 8  # 8 bands x 8 bits: ~99% recall at cosine 0.95
HYPERPLANE_SEED = "hplsh"


def auto_hyperplane_nbits(n: int, bands: int = HYPERPLANE_BANDS) -> int:
    """Corpus-scaled band width: band bits ~ log2(n) - 3, i.e. expected
    uniform-worst-case occupancy ~8 ids per band bucket, floored at the
    8-bit default. On structureless corpora the fixed 256-value band
    domain saturates once n >> 2^8 (every bucket goes quadratic — the
    sf1 16-89 s pathology in BENCH_NOTES); scaling bits with log2(n)
    keeps candidate generation near-linear while ``bands`` stays fixed.
    Deliberate tradeoff: wider bands lower collision probability at a
    given cosine (at 12 bits a 0.95-cosine pair collides in a band with
    p≈0.9^12≈0.28, recall ≈ 1-(1-0.28)^8 ≈ 0.93 vs 0.99 at 8 bits) —
    a few recall points bought back the corpus-quadratic hot-bucket
    blowup (16-89 s run-to-run at sf1, BENCH_NOTES); callers needing
    the old recall at scale pass bands/nbits explicitly. All
    driver-compared scale factors have n <= 2048, where this returns
    exactly the fixed 64-bit geometry the oracle SQL embeds."""
    import math

    bits = max(8, math.ceil(math.log2(max(n, 2))) - 3)
    return bands * bits


def _geometry_fs(gp: str):
    """(hadoop FileSystem, Path) for a geometry side-file path, via the
    active session — the SAME storage layer the signature parquet uses,
    so the side file travels with the table on any Spark-supported FS
    (local, HDFS, s3a, ...), not just the driver's local disk."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return None, None
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(gp)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _write_side_json(sp: str, payload: dict) -> None:
    """Write a JSON side file next to a persisted artifact through the
    Hadoop FS API — the SAME storage layer as the artifact parquet, so
    the side file travels with the table on any Spark-supported FS
    (ADVICE r5: a driver-local open() strands it on non-local
    filesystems, recreating exactly the probe-vs-corpus mismatch the
    side file exists to prevent)."""
    import json as _json

    txt = _json.dumps(payload)
    fs, hpath = _geometry_fs(sp)
    if fs is None:  # no active session: driver-local fallback
        with open(sp, "w") as f:
            f.write(txt)
        return
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(txt.encode("utf-8")))
    finally:
        out.close()


def _read_side_json(sp: str) -> dict | None:
    """Read a JSON side file written by :func:`_write_side_json`;
    None when absent."""
    import json as _json

    fs, hpath = _geometry_fs(sp)
    if fs is not None and fs.exists(hpath):
        from pyspark.sql import SparkSession

        jvm = SparkSession.getActiveSession()._jvm
        stream = fs.open(hpath)
        try:
            txt = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return _json.loads(txt)
    import os as _os

    if fs is None and _os.path.exists(sp):  # no session: local fallback
        with open(sp) as f:
            return _json.load(f)
    return None


def _write_geometry(path: str, nbits: int, bands: int, seed: str) -> None:
    """Record a signature table's band geometry next to it so every
    reader (probe-side signature computation, band count) derives the
    SAME geometry the build used — auto-scaled tables stay
    self-describing."""
    _write_side_json(
        path.rstrip("/") + "_geometry.json",
        {"nbits": nbits, "bands": bands, "seed": seed},
    )


def _read_geometry(path: str) -> tuple[int, int, str]:
    """Geometry recorded at build time (see :func:`_write_geometry`).

    A missing side file falls back to the FIXED default geometry —
    correct for pre-side-file tables (which were always built with the
    defaults) — but warns loudly: for an auto-scaled table a lost side
    file silently mismatches probe vs corpus bucketing (CLAUDE.md
    invariant), and the caller should rebuild or restore it."""
    import warnings as _warnings

    gp = path.rstrip("/") + "_geometry.json"
    g = _read_side_json(gp)
    if g is not None:
        return int(g["nbits"]), int(g["bands"]), str(g["seed"])
    _warnings.warn(
        f"no geometry side file at {gp}; assuming the fixed default "
        f"{HYPERPLANE_BANDS}x{HYPERPLANE_BITS // HYPERPLANE_BANDS}-bit "
        "geometry — WRONG for auto-scaled builds (rebuild the table or "
        "restore the side file)",
        stacklevel=2,
    )
    return HYPERPLANE_BITS, HYPERPLANE_BANDS, HYPERPLANE_SEED


def rademacher_coefs(
    nbits: int = HYPERPLANE_BITS,
    dim: int = 64,
    seed: str = HYPERPLANE_SEED,
) -> list[list[float]]:
    """Deterministic ±1 hyperplane coefficients (seeded md5 parity).
    Rademacher vectors are a valid sign-random-projection family for
    cosine LSH, and ±1 multiplication is IEEE-exact, so signatures are
    bit-identical across engines."""
    return [
        [
            1.0
            if hashlib.md5(f"{seed}|{h}|{i}".encode()).digest()[0] & 1
            else -1.0
            for i in range(dim)
        ]
        for h in range(nbits)
    ]


def hyperplane_band_cols(
    vec_col: Column | str,
    dim: int,
    nbits: int = HYPERPLANE_BITS,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
) -> list[Column]:
    """One integer band-value column per band: sign bits of the
    Rademacher projections, packed ``bits_per_band`` at a time.

    The projection is a sequential array-order double accumulation
    (zip_with + aggregate), the same cross-engine-exact discipline as
    :func:`cosine_expr` — so the sign, and hence every bucket id, is
    engine-independent.
    """
    vec_sql = vec_col if isinstance(vec_col, str) else vec_col._jc.toString()
    coefs = rademacher_coefs(nbits, dim, seed)
    rpb = nbits // bands

    # Built as SQL text, one F.expr per band: constructing 64 x dim
    # literal nodes through py4j costs seconds of driver time per query;
    # a single parsed string is milliseconds for the identical tree.
    def proj(h: int) -> str:
        arr = ", ".join(f"{c}D" for c in coefs[h])
        return (
            f"aggregate(zip_with({vec_sql}, array({arr}), "
            f"(x, c) -> cast(x as double) * c), "
            f"cast(0.0 as double), (acc, p) -> acc + p)"
        )

    out = []
    for b in range(bands):
        terms = " + ".join(
            f"if({proj(b * rpb + r)} >= 0, {1 << r}, 0)" for r in range(rpb)
        )
        out.append(F.expr(f"cast({terms} as int)"))
    return out


def hyperplane_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = HYPERPLANE_BITS,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
    fast: bool = False,
) -> DataFrame:
    """(id, b0..b{bands-1}) hyperplane signature rows.

    ``fast=False`` (default): the oracle-exact expression path —
    sequential array-order double accumulation, sign behavior identical
    to the DuckDB twin. ``fast=True``: the Arrow ``mapInPandas`` kernel
    (one BLAS matmul per batch instead of interpreted HOF lambdas —
    Spark does not codegen lambda bodies, so every row on the expr path
    pays nbits×dim interpreted ops). The two are asserted band-for-band
    equal on the test corpora
    (tests/test_operators.py::test_hyperplane_fast_kernel_matches_expr);
    they can differ only when a projection lands exactly at the float64
    summation-order boundary of 0 — measure-zero for real embeddings.
    """
    if fast:
        from pyspark.sql import types as T

        schema = T.StructType(
            [df.schema[id_col]]
            + [T.StructField(f"b{b}", T.IntegerType()) for b in range(bands)]
        )
        return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
            hyperplane_band_kernel(id_col, vec_col, dim, nbits, bands, seed),
            schema,
        )
    band_vals = hyperplane_band_cols(vec_col, dim, nbits, bands, seed)
    return df.select(
        F.col(id_col),
        *[band_vals[b].alias(f"b{b}") for b in range(bands)],
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    nbits: int | None = None,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
    max_bucket: int | None = None,
    fast: bool = False,
    fast_cosine: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    ``nbits=None`` (default) auto-scales the band width with the corpus
    count (:func:`auto_hyperplane_nbits`) — identical to the fixed
    64-bit geometry for n <= 2048 (every oracle-compared scale factor),
    wider bands beyond so structureless corpora cannot saturate the
    band domain.

    Candidates = pairs sharing >=1 exact band value (equi-join on
    (band_idx, band_value) — never an all-pairs comparison), then exact
    cosine filters at ``threshold``. Per-band bucket domain is
    2^(nbits/bands) (256 at the defaults), so the within-bucket
    self-join is near-linear; ``max_bucket`` drops degenerate buckets
    (e.g. a zero-vector pile-up) before they go quadratic — the
    embedding twin of ``dedup.prune_frequent``. ``fast`` selects the
    Arrow matmul signature kernel (:func:`hyperplane_signatures`;
    band-exact, safe under an oracle); ``fast_cosine`` additionally
    scores verification with the einsum kernel — off by default so the
    oracle-compared cosine keeps sequential-accumulation parity
    (ADVICE r3).
    """
    if nbits is None:
        n_nodes = corpus.count()
        nbits = auto_hyperplane_nbits(n_nodes, bands)
        # Regime switch (the NSW_KERNEL_MAX_NODES discipline): small
        # corpora replay band values + hot-bucket guard + pair
        # expansion + cosine verify in ONE Arrow task.  Only taken when
        # ``max_bucket`` bounds buckets (our callers always pass it) —
        # the distributed path below keeps the _COLLECT_BUCKET_CAP
        # join fallback for unguarded degenerate buckets.
        if n_nodes <= NSW_KERNEL_MAX_NODES and max_bucket is not None:
            return embedding_near_dup_kernel(
                corpus, id_col, vec_col, threshold, dim,
                nbits=nbits, bands=bands, seed=seed, max_bucket=max_bucket,
            )
    # The signature subtree has a single consumer (the bucket pipeline:
    # explode -> hot-bucket window -> grouped pair expansion), so the
    # projections run exactly once per query — no checkpoint needed;
    # the durable variant is write_hyperplane_signature_table.
    sigs = hyperplane_signatures(
        corpus, id_col, vec_col, dim, nbits, bands, seed, fast=fast
    )
    cand = _banded_candidate_pairs(sigs, id_col, bands, max_bucket)
    return _cosine_verify(
        cand, corpus, id_col, vec_col, threshold, fast=fast_cosine
    )


def _bucket_rows(sigs: DataFrame, id_col: str, bands: int) -> DataFrame:
    """Explode a signature table (id, b0..b{bands-1}) into
    (id, blk, val) bucket rows."""
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"), F.col(f"b{b}").alias("val")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.blk"), F.col("bk.val"))


# Largest bucket the collect_list expansion may materialize in one task:
# the expanded struct array is ~n^2/2 entries, so 2048 ids ≈ 2M pairs ≈
# tens of MB — comfortably inside an executor task. Bigger buckets fall
# back to the join-based expansion, which shuffles/spills instead of
# building the whole O(n^2) array in task memory (ADVICE r3).
#
# Deliberately NOT corpus-scaled (unlike band bits / nlist): the cap
# bounds PER-TASK memory for the O(cap^2) in-task pair expansion — a
# property of the executor, not of the corpus. Scaling it up with n
# would grow the single-task quadratic exactly where big corpora make
# buckets hottest; the join fallback already handles oversized buckets
# with shuffle/spill semantics at any scale, so completeness never
# depends on the cap.
_COLLECT_BUCKET_CAP = 2048


def _banded_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int, max_bucket: int | None
) -> DataFrame:
    """(id_a, id_b) pairs sharing >=1 band value, from a signature table
    with columns b0..b{bands-1}; optional hot-bucket guard.

    One shuffle on (blk, val) + the output distinct: the hot-bucket
    window filter and the per-bucket collect_list reuse the same hash
    partitioning, and within-bucket pairs are expanded JVM-side from
    the collected id list — versus the previous count-agg + anti-join +
    bucket self-join, which paid four exchanges for the same pair set.
    The collect_list path is capped at ``_COLLECT_BUCKET_CAP`` ids per
    bucket: when ``max_bucket`` doesn't bound buckets below that (or is
    None), oversized buckets — e.g. a zero-vector pile-up — are expanded
    via an equi-self-join instead, preserving completeness without a
    single-task O(n^2) array."""
    buckets = _bucket_rows(sigs, id_col, bands)
    capped = max_bucket is not None and max_bucket <= _COLLECT_BUCKET_CAP
    c = F.count(F.lit(1)).over(W.partitionBy("blk", "val"))
    buckets = buckets.withColumn("c", c)
    if max_bucket is not None:
        buckets = buckets.filter(F.col("c") <= max_bucket)

    def _collect_expand(b: DataFrame) -> DataFrame:
        grouped = (
            b.groupBy("blk", "val")
            .agg(F.collect_list(F.col(id_col)).alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        return grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(least(x, y) AS id_a, "
                    "greatest(x, y) AS id_b))))"
                )
            ).alias("p")
        ).select("p.id_a", "p.id_b")

    if capped:
        # every bucket is provably small: single-path plan, unchanged
        # from the pre-guard formulation
        return _collect_expand(buckets.drop("c")).distinct()
    small = _collect_expand(
        buckets.filter(F.col("c") <= _COLLECT_BUCKET_CAP).drop("c")
    )
    big = buckets.filter(F.col("c") > _COLLECT_BUCKET_CAP).drop("c")
    a = big.select(F.col(id_col).alias("id_a"), "blk", "val")
    b = big.select(F.col(id_col).alias("id_b"), "blk", "val")
    big_pairs = (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return small.unionByName(big_pairs).distinct()


def cosine_pair_udf():
    """Scalar Arrow ``pandas_udf`` computing the RAW rowwise cosine of
    two equal-length array columns — one einsum per batch instead of
    interpreted zip_with/aggregate lambdas. Rounding stays in Spark
    (``F.round``, HALF_UP) so the fast and expr paths share one
    rounding mode; they agree except when numpy's pairwise summation
    and sequential accumulation straddle a 0.5e-9 rounding boundary —
    asserted equal on the test corpora
    (tests/test_operators.py::test_cosine_pair_udf_matches_expr)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def cos_pair(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        # x/0 must be NULL, not IEEE inf/nan: both Spark and DuckDB
        # return NULL for double division by zero, and a NaN cosine
        # would (unlike NULL) PASS >= filters under Spark's NaN-is-
        # largest ordering — a silent cross-engine divergence.
        with np.errstate(divide="ignore", invalid="ignore"):
            res = num / den
        return pd.Series(pd.arrays.FloatingArray(res, den == 0.0))

    return cos_pair


def cosine_pair_seq_udf():
    """Arrow ``pandas_udf`` computing the RAW rowwise cosine with
    SEQUENTIAL accumulation: one fused ``acc += A[:,j]*B[:,j]`` pass
    per dimension, so every element's dot/norm folds left-to-right in
    array order — the identical IEEE-754 op sequence to
    :func:`cosine_expr`'s ``aggregate`` fold and the DuckDB oracle
    (mul, add, sqrt, div are all correctly rounded; numpy applies them
    as separate array ops, no FMA contraction). Bit-identical to the
    expr path by construction — not merely within rounding noise like
    the pairwise-summing einsum kernel — at ~dim vectorized passes per
    batch instead of per-row interpreted lambdas (Spark does not
    codegen HOF lambda bodies). Asserted equal on the test corpora
    (tests/test_operators.py::test_cosine_seq_udf_matches_expr)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def cos_seq(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        n, dim = A.shape
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for j in range(dim):  # left-to-right: the expr fold's op order
            dot += A[:, j] * B[:, j]
            na += A[:, j] * A[:, j]
            nb += B[:, j] * B[:, j]
        den = np.sqrt(na) * np.sqrt(nb)
        # x/0 -> NULL (Spark/DuckDB double-division semantics), never
        # IEEE inf/nan — see cosine_pair_udf.
        with np.errstate(divide="ignore", invalid="ignore"):
            res = dot / den
        return pd.Series(pd.arrays.FloatingArray(res, den == 0.0))

    return cos_seq


def _cosine_pair_col(a: Column, b: Column, fast: bool) -> Column:
    # Both paths round in Spark (one rounding mode). The default scorer
    # is the sequential-exact kernel: oracle-parity of the expr path,
    # Arrow-batch speed of the einsum one (ADVICE r3).
    if fast:
        return F.round(cosine_pair_udf()(a, b), COSINE_SCALE)
    return F.round(cosine_pair_seq_udf()(a, b), COSINE_SCALE)


def _cosine_verify(
    cand: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    fast: bool = False,
) -> DataFrame:
    """Exact-cosine verification of candidate pairs; vectors fetched
    per-candidate by id join — wide arrays never ride the bucket
    shuffle (same shape as the persisted-minhash path)."""
    va = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    vb = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            _cosine_pair_col(
                F.col("vec_a"), F.col("vec_b"), fast
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_band_kernel(
    id_col: str,
    vec_col: str,
    dim: int,
    nbits: int = HYPERPLANE_BITS,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
):
    """Arrow-batched numpy twin of :func:`hyperplane_band_cols` for
    ``mapInPandas`` — one BLAS matmul per batch instead of interpreted
    per-element lambdas (~100× faster per vector), with CERTIFIED
    signs: every sign bit (hence every band value and candidate set)
    is guaranteed equal to the expression path's sequential
    ``aggregate`` fold and the DuckDB oracle, not merely asserted on
    the test corpora. The matmul's pairwise summation could in
    principle flip a projection that lands exactly on the 0 boundary
    (real for quantized/sparse embeddings with dyadic values); a
    rigorous forward-error bound identifies every entry whose sign the
    matmul cannot certify — |proj| within gamma_dim * sum|v_i c_i| of
    0 — and only those rows are recomputed with the exact sequential
    fold (zero rows on continuous data, so the fast path keeps matmul
    cost)."""
    import numpy as np
    import pandas as pd

    C = np.array(rademacher_coefs(nbits, dim, seed))  # nbits x dim
    rpb = nbits // bands
    weights = (1 << np.arange(rpb)).astype(np.int64)

    # forward-error bound for a dim-term float64 dot product under ANY
    # summation order: |fl(x.y) - exact| <= gamma_dim * sum|x_i y_i|
    # with gamma_dim = dim*eps/(1-dim*eps) (Higham, Accuracy and
    # Stability of Numerical Algorithms, eq. 3.5). 4x covers matmul and
    # sequential fold drifting to opposite sides, with slack.
    eps = np.finfo(np.float64).eps
    guard = 4.0 * dim * eps

    def kernel(batches):
        for pdf in batches:
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            proj = V @ C.T  # fast path: one BLAS matmul
            # certify signs: an entry can disagree with the sequential
            # fold only if |proj| is within the error bound of 0
            risky = np.abs(proj) <= guard * (np.abs(V) @ np.abs(C).T)
            if risky.any():
                rows = np.unique(np.nonzero(risky)[0])
                Vr = V[rows]
                sub = np.zeros((len(rows), nbits))
                for d in range(dim):  # left-to-right: the expr fold
                    sub += Vr[:, d : d + 1] * C[:, d][None, :]
                proj[rows] = sub
            bits = proj >= 0  # n x nbits
            out = {id_col: pdf[id_col]}
            for b in range(bands):
                out[f"b{b}"] = (
                    bits[:, b * rpb : (b + 1) * rpb] @ weights
                ).astype(np.int32)
            yield pd.DataFrame(out)

    return kernel


def write_hyperplane_signature_table(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int | None = None,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
    buckets: int = 32,
    fast: bool = False,
) -> None:
    """One-time hyperplane signature build: (id, b0..b{bands-1}) to
    id-bucketed parquet. The projection runs once at build time; every
    subsequent near-dup or ANN run reads tiny fixed-width rows — the
    embedding twin of ``dedup.write_minhash_signature_table``.
    ``nbits=None`` auto-scales band width with the corpus count
    (:func:`auto_hyperplane_nbits`); the geometry used is recorded in a
    side file so readers always probe with the build's geometry.

    ``fast=True`` computes signatures with the Arrow/numpy kernel
    (matmul; the production path for 10^9-vector builds). The default
    expression path is the oracle-exact one: numpy's pairwise-summed
    dot can, in principle, flip a sign on a projection that is exactly
    0 under sequential summation."""
    if nbits is None:
        nbits = auto_hyperplane_nbits(corpus.count(), bands)
    sigs = hyperplane_signatures(
        corpus, id_col, vec_col, dim, nbits, bands, seed, fast=fast
    )
    sigs.repartition(buckets, F.col(id_col)).write.mode(
        "overwrite"
    ).parquet(path)
    _write_geometry(path, nbits, bands, seed)


def hyperplane_pairs_from_signature_table(
    spark,
    path: str,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bands: int | None = None,
    max_bucket: int | None = None,
    fast_cosine: bool = False,
) -> DataFrame:
    """Near-dup pairs from persisted hyperplane signatures: candidates
    from the signature parquet only (no projection recompute), exact
    cosine fetched per-candidate from ``corpus``. Band count defaults
    to the table's recorded geometry. ``fast_cosine`` uses
    the einsum scoring kernel — off by default for oracle parity
    (ADVICE r3)."""
    if bands is None:
        _, bands, _ = _read_geometry(path)
    sigs = spark.read.parquet(path)
    cand = _banded_candidate_pairs(sigs, id_col, bands, max_bucket)
    return _cosine_verify(
        cand, corpus, id_col, vec_col, threshold, fast=fast_cosine
    )


def hyperplane_topk_from_signature_table(
    spark,
    path: str,
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    nbits: int | None = None,
    bands: int | None = None,
    seed: str | None = None,
) -> DataFrame:
    """Multi-probe ANN against a PERSISTED corpus signature table: the
    corpus-side band buckets come from fixed-width parquet rows (the 64
    projections per vector — the dominant cost of
    :func:`hyperplane_topk` — never recompute at query time); probe
    signatures are computed inline on the expr path (probe sets are
    small by contract) with the TABLE'S recorded geometry and
    broadcast — probe and corpus band values always agree, even for
    auto-scaled builds. Scoring fetches candidate vectors by id join
    and uses the sequential-exact cosine kernel — results identical to
    the inline formulation, same oracle."""
    g_nbits, g_bands, g_seed = _read_geometry(path)
    nbits = g_nbits if nbits is None else nbits
    bands = g_bands if bands is None else bands
    seed = g_seed if seed is None else seed
    sigs = spark.read.parquet(path)
    corpus_b = _bucket_rows(sigs, id_col, bands).withColumnRenamed(
        id_col, "neighbor_id"
    )
    probe_sigs = hyperplane_signatures(
        probes, id_col, vec_col, dim, nbits, bands, seed, fast=False
    )
    probe_b = _bucket_rows(probe_sigs, id_col, bands).withColumnRenamed(
        id_col, "probe_id"
    )
    cand = (
        corpus_b.join(F.broadcast(probe_b), ["blk", "val"])
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    pv = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        cand.join(F.broadcast(pv), "probe_id")
        .join(cv, "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            _cosine_pair_col(F.col("probe_vec"), F.col("vec"), False).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Vectorized twin of :func:`brute_force_topk` using a scalar Arrow
    ``@pandas_udf`` — one fused vector op per dimension per batch
    instead of interpreted zip_with/aggregate lambdas, accumulated
    SEQUENTIALLY in index order so every cosine is bit-identical to
    the expression path and the DuckDB oracle (the same op-order
    guarantee as :func:`cosine_pair_seq_udf`; a pairwise-summed matmul
    could flip a 9-dp rounding boundary and change a top-k rank).

    The probe set is collected to the driver and shipped in the UDF
    closure (the broadcast analog; probes are small by contract). The
    kernel returns RAW cosines; rounding happens in Spark (`F.round`,
    HALF_UP) so both paths share one rounding mode — asserted equal on
    the test corpora
    (tests/test_operators.py::test_pandas_udf_topk_matches_expr).

    The engine's UDF taxonomy: native column exprs (default), scalar
    Arrow pandas_udf (this), GROUPED_AGG pandas_udf
    (:func:`centroid_update_pandas`), mapInPandas (multimodal,
    signature builds), applyInPandas (FFD packing),
    applyInPandasWithState (streaming totals), UDTF (PII span audit).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    pr = probes.select(id_col, vec_col).collect()
    probe_ids = [r[id_col] for r in pr]
    P = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in pr])
    # probe norms: sequential fold in index order (matches _norm_exact)
    p_sq = np.zeros(len(pr))
    for d in range(P.shape[1] if len(pr) else 0):
        p_sq += P[:, d] * P[:, d]
    p_norm = np.sqrt(p_sq)
    p_zero = p_norm == 0.0

    @pandas_udf(ArrayType(DoubleType()))
    def cos_all(vecs: pd.Series) -> pd.Series:
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        n, dim = V.shape
        # sequential left-to-right accumulation per dimension — the
        # exact IEEE-754 op order of cosine_expr / the DuckDB oracle
        # (see cosine_pair_seq_udf); a pairwise-summed matmul could
        # flip a 9-dp rounding boundary and change a top-k rank the
        # hash-compared twin doesn't.
        dots = np.zeros((n, len(probe_ids)))
        v_sq = np.zeros(n)
        for d in range(dim):
            dots += V[:, d : d + 1] * P[:, d][None, :]
            v_sq += V[:, d] * V[:, d]
        v_norm = np.sqrt(v_sq)
        with np.errstate(divide="ignore", invalid="ignore"):
            M = dots / (v_norm[:, None] * p_norm[None, :])
        v_zero = v_norm == 0.0
        if not v_zero.any() and not p_zero.any():
            return pd.Series(list(M))
        # zero-norm on either side -> NULL element (Spark/DuckDB
        # double-div-by-zero semantics; see cosine_pair_udf)
        out = []
        for i, row in enumerate(M):
            out.append(
                [
                    None if (v_zero[i] or p_zero[j]) else float(x)
                    for j, x in enumerate(row)
                ]
            )
        return pd.Series(out)

    probe_id_arr = F.array(*[F.lit(int(i)) for i in probe_ids])
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), cos_all(F.col(vec_col)).alias("cs")
        )
        .select(
            "neighbor_id",
            F.posexplode("cs").alias("pidx", "raw"),
        )
        .select(
            F.element_at(probe_id_arr, F.col("pidx") + 1).alias("probe_id"),
            "neighbor_id",
            F.round(F.col("raw"), COSINE_SCALE).alias("cosine"),
        )
        .filter(F.col("neighbor_id") != F.col("probe_id"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def quantize_int8_expr(vec_col: Column | str) -> Column:
    """Per-vector symmetric int8 quantization: scale = 127/max|x|,
    q_i = floor(x_i*scale + 0.5). ``floor(x+0.5)`` (not ``round``) so
    the halfway rule is identical across engines — every quantized
    value, and hence every downstream integer dot product, is exact
    cross-engine. The zero vector quantizes to zeros via the epsilon
    guard."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sc = F.lit(127.0) / F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),
    )
    return F.transform(
        v, lambda x: F.floor(x.cast("double") * sc + F.lit(0.5)).cast("int")
    )


def _q_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (bigint accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, p: acc + p,
    )


def quantized_cosine_expr(a: Column, b: Column) -> Column:
    """Cosine of two int8-quantized vectors: integer dot and norms
    (exact), one double divide + sqrt rounded to COSINE_SCALE — the
    only float ops are the final scalar ones."""
    raw = _q_dot(a, b).cast("double") / (
        F.sqrt(_q_dot(a, a).cast("double")) * F.sqrt(_q_dot(b, b).cast("double"))
    )
    return F.round(raw, COSINE_SCALE)


def quantized_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors — the quantized
    ANN memory path (4x smaller vectors than float32; at 10^9-vector
    scale the quantized corpus fits where the float one does not).
    Same join shape as :func:`brute_force_topk`; all pairwise
    arithmetic is integer-exact, so the oracle twin matches bit for
    bit rather than modulo float summation order."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        quantize_int8_expr(vec_col).alias("probe_q"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_int8_expr(vec_col).alias("q"),
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            quantized_cosine_expr(
                F.col("probe_q"), F.col("q")
            ).alias("qcosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("qcosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def jl_project_expr(
    vec_col: Column | str,
    out_dim: int = 16,
    dim: int = 64,
    seed: str = "jlproj",
) -> Column:
    """Johnson-Lindenstrauss random projection to ``out_dim`` dims via
    a seeded Rademacher (±1) matrix — the standard reduction step
    before large-scale ANN (Achlioptas 2001 shows ±1 entries satisfy
    the JL lemma). Cosine is scale-invariant so the 1/sqrt(out_dim)
    factor is omitted; each output component is the same sequential
    array-order double accumulation as :func:`hyperplane_band_cols`,
    so projected vectors are bit-identical across engines. Built as
    one SQL string (the wide-literal driver-time rule)."""
    vec_sql = vec_col if isinstance(vec_col, str) else vec_col._jc.toString()
    coefs = rademacher_coefs(out_dim, dim, seed)

    def proj(h: int) -> str:
        arr = ", ".join(f"{c}D" for c in coefs[h])
        return (
            f"aggregate(zip_with({vec_sql}, array({arr}), "
            f"(x, c) -> cast(x as double) * c), "
            f"cast(0.0 as double), (acc, p) -> acc + p)"
        )

    return F.expr(
        "array(" + ", ".join(proj(h) for h in range(out_dim)) + ")"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC) — the memory-bounded 100 TB ANN path
# ---------------------------------------------------------------------------


def _normsq_exact(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.aggregate(sq, F.lit(0.0), lambda acc, p: acc + p)


def _collect_codebook(cent: DataFrame) -> tuple[list[int], list[list[int]]]:
    """Driver-side copy of one tiny codebook, cid-ascending. Bounded by
    contract: ksub <= 256 rows of sub-dim micro-unit integers — the
    same category as the probe/vocab/argmax collects. Book frames built
    by :func:`pq_train` / :func:`pq_topk_from_index` carry the literals
    as an attribute so steady-state search launches no collect jobs."""
    cached = getattr(cent, "_hb_lits", None)
    if cached is not None:
        return cached
    rows = sorted(
        cent.select("cid", "cvec").collect(), key=lambda r: r["cid"]
    )
    cids = [int(r["cid"]) for r in rows]
    cvecs = [[int(x) for x in r["cvec"]] for r in rows]
    return cids, cvecs


def _mk_book(spark, cids: list[int], cvecs: list[list[int]]) -> DataFrame:
    """Materialize one micro-unit integer codebook as a tiny local
    relation with the literal lists attached (so downstream
    encode/search never pays a collect job for it)."""
    b = spark.createDataFrame(
        [(c, [int(x) for x in v]) for c, v in zip(cids, cvecs)],
        "cid int, cvec array<bigint>",
    )
    b._hb_lits = (list(cids), [[int(x) for x in v] for v in cvecs])
    return b


#: Micro-unit scale for PQ/IVF centroids: codebooks store
#: round(mean * PQ_SCALE) as exact integers, so every assignment and
#: ADC score in the family is an exact int64 — order-independent,
#: map-side combinable, and replayable verbatim by the DuckDB oracle
#: (the sim_kmeans_train quantized-Lloyd precedent, promoted to the
#: whole PQ family in round 10).
PQ_SCALE = 1_000_000


def _half_away(a: int, n: int) -> int:
    """round(a / n) half-away-from-zero in pure integer ops (n > 0) —
    the shared centroid rounding rule. DuckDB twin (queries/llmops
    ``_o_pq_chain``): ``CASE WHEN a >= 0 THEN (2*a + n) // (2*n)
    ELSE -((-2*a + n) // (2*n)) END`` — abs-magnitude form so trunc
    vs floor division can never differ across engines."""
    if a >= 0:
        return (2 * a + n) // (2 * n)
    return -((-2 * a + n) // (2 * n))


def _quantize_py(x: list[float]) -> list[int]:
    """Driver-side twin of :func:`quantize_int8_expr` (identical IEEE
    double ops: scale = 127/max|x|, floor(x*scale + 0.5)) — proven
    engine-exact by the int8-ANN oracle family."""
    import math

    sc = 127.0 / max(max(abs(v) for v in x), 1e-30)
    return [int(math.floor(v * sc + 0.5)) for v in x]


def _pq_codes_kernel(
    lits: list[tuple[list[int], list[list[int]]]],
    sub: int,
    id_col: str,
    qv_col: str,
    with_norm: bool,
    keep_vec: bool,
    cell_lits: tuple[list[int], list[list[int]]] | None = None,
    residual: bool = False,
    emit_residual: bool = False,
):
    """Arrow-batched PQ assignment kernel (mapInPandas) over QUANTIZED
    int8 vectors: one vectorized numpy call per PARTITION computes
    every subspace's argmin code (and optionally the vector norm) —
    zero exchanges, no crossJoin row expansion, no window.

    Why not a literal-SQL projection: at m=4/ksub=16/sub=16 the inlined
    codebooks are ~4k literals; parsing that ``F.expr`` text measured
    2.9 s of driver time PER projection build (and Lloyd training
    rebuilds it every iteration) — the parse dominates any realistic
    corpus scan. The kernel closes over plain Python lists instead and
    its per-row cost is a handful of fused numpy ops.

    Cross-engine exactness (what lets the family's queries carry
    hash-compared DuckDB oracles): vectors are int8, codebooks are
    micro-unit integers (:data:`PQ_SCALE`), and the min-L2 argmin is
    the argmax of ``2*PQ_SCALE*dot(x, C) - |C|^2`` — an exact int64
    (|score| < 3.2e18 at dim=64: dot <= 64*127*127e6 ~ 1.03e12, so
    2e6*dot <= 2.1e18 and |C|^2 <= 64*(127e6)^2 ~ 1.03e18; no float
    accumulation order to defend anywhere). ``np.argmax`` takes the
    FIRST max, matching the oracle's (desc score, cid asc) tie-break
    since centroids are cid-ascending. ``norm`` is sqrt of the exact
    integer |x|^2 — a single correctly-rounded IEEE op both engines
    agree on.

    ``residual=True`` (FAISS IVFADC proper, Jegou et al. 2011 §V-A):
    the subspace assignment runs over ``PQ_SCALE*x - C_cell`` (the
    micro-unit residual, still exact integers; |r| <= 2*127e6, so the
    scale-1 score ``2*dot(r, B) - |B|^2`` stays under 3.2e18 at
    sub=16) — the code domain concentrates around the cell centroid,
    buying recall at the same m/ksub. Requires ``cell_lits``.
    ``emit_residual=True`` additionally yields the residual vector as
    ``__res`` (array<bigint>) — the training loop's update pass needs
    it."""
    import numpy as np

    if residual and cell_lits is None:
        raise ValueError("residual encoding requires cell_lits")

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf[qv_col]]
            )
            cols = {id_col: pdf[id_col].to_numpy()}
            if with_norm:
                cols["norm"] = np.sqrt(
                    (X * X).sum(axis=1).astype(np.float64)
                )
            Xs = X
            scale = PQ_SCALE  # books micro vs int8 x
            if cell_lits is not None:
                # coarse-quantizer cell over the FULL vector (IVF
                # routing) — same exact-integer score as the subspace
                # assignment below.
                ccids, ccvecs = cell_lits
                C = np.asarray(ccvecs, dtype=np.int64)
                scores = (
                    2 * PQ_SCALE * (X @ C.T)
                    - (C * C).sum(axis=1)[None, :]
                )
                ci = np.argmax(scores, axis=1)  # first max = cid-asc tie
                cols["cell"] = np.asarray(ccids, dtype=np.int32)[ci]
                if residual:
                    Xs = PQ_SCALE * X - C[ci]  # micro residuals, exact
                    scale = 1  # residual books micro vs micro x
                    if emit_residual:
                        res_lists = [r.tolist() for r in Xs]
            for j, (cids, cvecs) in enumerate(lits):
                Sj = Xs[:, j * sub : (j + 1) * sub]
                B = np.asarray(cvecs, dtype=np.int64)  # (k, sub)
                scores = (
                    2 * scale * (Sj @ B.T)
                    - (B * B).sum(axis=1)[None, :]
                )
                cols[f"code_{j}"] = np.asarray(cids, dtype=np.int32)[
                    np.argmax(scores, axis=1)
                ]
            out = pd.DataFrame(cols)
            if residual and emit_residual:
                out["__res"] = res_lists
            if keep_vec:
                out[qv_col] = pdf[qv_col].to_numpy()
            yield out

    return kernel


def _lits_from_sums(rows, m: int, scale: int):
    """Shared Lloyd update: collected (j, cid, i, s, n) component sums
    -> cid-ascending micro-unit integer codebooks via the
    :func:`_half_away` rounding rule (``scale`` = PQ_SCALE when the
    summed components are int8, 1 when they are already micro
    residuals). Empty clusters simply drop out (no row -> no cid),
    identically on both engines."""
    by: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
    for r in rows:
        by.setdefault((int(r["j"]), int(r["cid"])), []).append(
            (int(r["i"]), int(r["s"]), int(r["n"]))
        )
    lits = []
    for j in range(m):
        cids = sorted(c for (jj, c) in by if jj == j)
        cvecs = []
        for c in cids:
            vals = sorted(by[(j, c)])
            cvecs.append([_half_away(s * scale, n) for _, s, n in vals])
        lits.append((cids, cvecs))
    return lits


# Below this many corpus rows the Lloyd training loops collapse into
# ONE Arrow task replaying every iteration in-executor (the
# CC_KERNEL_MAX_EDGES / PAGERANK_KERNEL_MAX_EDGES regime-switch
# discipline): each distributed iteration costs an assignment-scan job
# plus a sum-collect job of scheduler latency, which dominates wall
# time on bounded training corpora (sf0.1: 2000 vectors). Everything
# the loops compute is an exact integer, and the fast path calls the
# SAME _pq_codes_kernel / _lits_from_sums / _route_cells helpers the
# distributed loops use, so the books are bit-identical by
# construction (pinned by test_pq_train_kernel_matches_loop).
# Cluster-scale corpora keep the distributed per-iteration shape.
PQ_TRAIN_KERNEL_MAX_ROWS = 100_000


def _train_books_single_task(
    qbase: DataFrame,
    id_col: str,
    dim: int,
    m: int,
    sub: int,
    ksub: int,
    nlist: int,
    iters: int,
    mode: str,
):
    """Single-task replay of the Lloyd trainers over a SMALL quantized
    corpus: ``mode`` in {'pq', 'joint', 'residual'}. Returns
    (cell_lits | None, lits) — the same literal structures the
    distributed loops produce, via one collect of bounded codebook
    rows."""
    import numpy as np  # noqa: F401  (kernel import)

    def kern(batches):
        import numpy as np

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pdfs[0] if len(pdfs) == 1 else pd.concat(
            pdfs, ignore_index=True
        )
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")  # ids unique
        kmax = max(ksub, nlist)
        init_qv = [
            [int(x) for x in pdf["__qv"].iloc[i]] for i in order[:kmax]
        ]

        def book_init(rows):
            return [
                (
                    list(range(1, min(ksub, len(rows)) + 1)),
                    [r[j * sub : (j + 1) * sub] for r in rows[:ksub]],
                )
                for j in range(m)
            ]

        def sums_for(vals, codes, j):
            rows = []
            for cid in np.unique(codes):
                mask = codes == cid
                s = vals[mask].sum(axis=0)
                n = int(mask.sum())
                rows.extend(
                    {
                        "j": j,
                        "cid": int(cid),
                        "i": i,
                        "s": int(s[i]),
                        "n": n,
                    }
                    for i in range(vals.shape[1])
                )
            return rows

        def run(lits, cell_lits, residual, emit_residual, keep_vec):
            fn = _pq_codes_kernel(
                lits,
                sub,
                id_col,
                "__qv",
                with_norm=False,
                keep_vec=keep_vec,
                cell_lits=cell_lits,
                residual=residual,
                emit_residual=emit_residual,
            )
            return next(fn(iter([pdf])))

        cell_lits = None
        if mode == "pq":
            lits = book_init(
                [[x * PQ_SCALE for x in qv] for qv in init_qv]
            )
            for _ in range(iters):
                coded = run(lits, None, False, False, True)
                X = np.asarray(
                    [
                        np.asarray(v, dtype=np.int64)
                        for v in coded["__qv"]
                    ]
                )
                rows = []
                for j in range(m):
                    rows += sums_for(
                        X[:, j * sub : (j + 1) * sub],
                        coded[f"code_{j}"].to_numpy(),
                        j,
                    )
                lits = _lits_from_sums(rows, m, scale=PQ_SCALE)
        elif mode == "joint":
            lits = book_init(
                [[x * PQ_SCALE for x in qv] for qv in init_qv]
            )
            cell_lits = (
                list(range(1, min(nlist, len(init_qv)) + 1)),
                [
                    [x * PQ_SCALE for x in qv]
                    for qv in init_qv[:nlist]
                ],
            )
            for _ in range(iters):
                coded = run(lits, cell_lits, False, False, True)
                X = np.asarray(
                    [
                        np.asarray(v, dtype=np.int64)
                        for v in coded["__qv"]
                    ]
                )
                rows = []
                for j in range(m):
                    rows += sums_for(
                        X[:, j * sub : (j + 1) * sub],
                        coded[f"code_{j}"].to_numpy(),
                        j,
                    )
                rows += sums_for(X, coded["cell"].to_numpy(), m)
                sel = _lits_from_sums(rows, m + 1, scale=PQ_SCALE)
                lits, cell_lits = sel[:m], sel[m]
        else:  # residual: phase 1 cells alone, phase 2 books on x - C
            cell_lits = (
                list(range(1, min(nlist, len(init_qv)) + 1)),
                [
                    [x * PQ_SCALE for x in qv]
                    for qv in init_qv[:nlist]
                ],
            )
            for _ in range(iters):
                coded = run([], cell_lits, False, False, True)
                X = np.asarray(
                    [
                        np.asarray(v, dtype=np.int64)
                        for v in coded["__qv"]
                    ]
                )
                rows = sums_for(X, coded["cell"].to_numpy(), 0)
                cell_lits = _lits_from_sums(rows, 1, scale=PQ_SCALE)[0]
            init_res = []
            for qv in init_qv[:ksub]:
                _, _, cv = _route_cells(qv, cell_lits, nprobe=1)[0]
                init_res.append(
                    [PQ_SCALE * a - int(b) for a, b in zip(qv, cv)]
                )
            lits = [
                (
                    list(range(1, len(init_res) + 1)),
                    [rv[j * sub : (j + 1) * sub] for rv in init_res],
                )
                for j in range(m)
            ]
            for _ in range(iters):
                coded = run(lits, cell_lits, True, True, False)
                R = np.asarray(
                    [
                        np.asarray(v, dtype=np.int64)
                        for v in coded["__res"]
                    ]
                )
                rows = []
                for j in range(m):
                    rows += sums_for(
                        R[:, j * sub : (j + 1) * sub],
                        coded[f"code_{j}"].to_numpy(),
                        j,
                    )
                lits = _lits_from_sums(rows, m, scale=1)
        out = []
        if cell_lits is not None:
            out += [
                (m, int(c), [int(x) for x in v])
                for c, v in zip(*cell_lits)
            ]
        for j, (cids, cvecs) in enumerate(lits):
            out += [
                (j, int(c), [int(x) for x in v])
                for c, v in zip(cids, cvecs)
            ]
        yield pd.DataFrame(
            {
                "j": [o[0] for o in out],
                "cid": [o[1] for o in out],
                "cvec": [o[2] for o in out],
            }
        )

    rows = (
        qbase.coalesce(1)
        .mapInPandas(kern, "j int, cid int, cvec array<bigint>")
        .collect()
    )
    by: dict[int, list] = {}
    for r in rows:
        by.setdefault(int(r["j"]), []).append(
            (int(r["cid"]), [int(x) for x in r["cvec"]])
        )

    def mk(j):
        entries = sorted(by.get(j, []))
        return [c for c, _ in entries], [v for _, v in entries]

    lits = [mk(j) for j in range(m)]
    cells = mk(m) if mode != "pq" else None
    return cells, lits


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    iters: int = 3,
) -> list[DataFrame]:
    """Per-subspace product-quantizer codebooks (Jegou et al. 2011):
    int8-quantize vectors (:func:`quantize_int8_expr`), slice into
    ``m`` contiguous subspaces and run L2 Lloyd iterations in each —
    deterministic init (ksub smallest-id subvectors, lifted to
    micro-units), zero-shuffle exact-integer argmin assignment, exact
    integer component sums + the shared :func:`_half_away` rounding
    rule for the means. Everything the loop computes is an exact
    integer (order-independent, map-side combinable), which is what
    lets the family's queries carry hash-compared DuckDB oracles
    (queries/llmops ``_o_pq_chain``). Returns ``m`` tiny (cid, cvec)
    micro-unit local-relation DataFrames with the literal lists
    attached. Corpus cost: one kernel scan + one combined integer-sum
    shuffle per iteration; only codebooks (bounded) reach the
    driver."""
    sub = dim // m
    spark = corpus.sparkSession
    idt = dict(corpus.dtypes)[id_col]
    qbase = corpus.select(
        F.col(id_col), quantize_int8_expr(vec_col).alias("__qv")
    )
    # Regime switch on corpus rows (see PQ_TRAIN_KERNEL_MAX_ROWS):
    # bounded training corpora replay every Lloyd iteration in one
    # Arrow task instead of iters x (assignment job + sum-collect job).
    if qbase.count() <= PQ_TRAIN_KERNEL_MAX_ROWS:
        _, lits = _train_books_single_task(
            qbase, id_col, dim, m, sub, ksub, 0, iters, "pq"
        )
        return [_mk_book(spark, c, v) for c, v in lits]

    # Deterministic init: the ksub smallest-id vectors, sliced
    # driver-side — per subspace, the same ksub smallest-id subvectors
    # the per-subspace init picked.
    init = sorted(
        qbase.orderBy(id_col).limit(ksub).collect(),
        key=lambda r: r[id_col],
    )
    lits = [
        (
            list(range(1, len(init) + 1)),
            [
                [int(x) * PQ_SCALE for x in r["__qv"][j * sub : (j + 1) * sub]]
                for r in init
            ],
        )
        for j in range(m)
    ]

    code_schema = (
        f"{id_col} {idt}, "
        + ", ".join(f"code_{j} int" for j in range(m))
        + ", __qv array<int>"
    )
    for _ in range(iters):
        # Assignment: all m argmins in ONE Arrow-batched kernel pass —
        # every Lloyd step touches all subspaces in a single job
        # instead of m separate per-subspace job chains (the m*iters
        # tiny-job scheduler overhead dominated wall time on bounded
        # training samples).
        coded = qbase.mapInPandas(
            _pq_codes_kernel(
                lits, sub, id_col, "__qv", with_norm=False, keep_vec=True
            ),
            code_schema,
        )
        # Update: explode every (subspace, cluster, subvector) triple
        # at once; exact bigint per-(j, cid, dim) component sums in ONE
        # map-side-combined shuffle; the bounded (m*ksub*sub)-row sum
        # table is collected and rounded driver-side with the shared
        # integer rule.
        ex = coded.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.col(f"code_{j}").alias("cid"),
                            F.slice(
                                F.col("__qv"), j * sub + 1, sub
                            ).alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("e")
        )
        pos = ex.select(
            F.col("e.j").alias("j"),
            F.col("e.cid").alias("cid"),
            F.posexplode(F.col("e.sv")).alias("i", "x"),
        )
        rows = (
            pos.groupBy("j", "cid", "i")
            .agg(
                F.sum(F.col("x").cast("bigint")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        lits = _lits_from_sums(rows, m, scale=PQ_SCALE)

    # Materialize the trained books as tiny local DataFrames (the
    # contract callers expect); micro-unit integers round-trip exactly.
    # The literal lists ride along so downstream encode/search never
    # pays a collect job for them.
    return [_mk_book(spark, cids, cvecs) for cids, cvecs in lits]


def pq_encode(
    corpus: DataFrame,
    books: list[DataFrame],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Corpus -> (id, norm, code_0..code_{m-1}): each vector stored as m
    small centroid ids (m bytes at ksub<=256 — the 4-byte-per-vector
    memory path that lets a 100 TB corpus's index fit a cluster) plus
    its quantized norm (sqrt of the exact int |qv|^2) for ADC cosine
    denominators.

    ONE corpus scan, ZERO exchanges: the quantize projection is JVM
    column expressions, and the m tiny codebooks are collected
    driver-side (bounded: m*ksub rows) and closed over by an
    Arrow-batched ``mapInPandas`` kernel that computes the norm and all
    m argmins per partition in vectorized integer numpy
    (:func:`_pq_codes_kernel` — see its docstring for why the kernel
    beats an inlined-literal SQL projection and for the exact-integer
    score construction the DuckDB oracle replays). Replaces the former
    per-subspace crossJoin(ksub-row expansion) + row_number window + m
    join-backs, ~2m corpus-scale shuffles that dominated at 100 TB
    scale."""
    m = len(books)
    sub = dim // m
    lits = [_collect_codebook(cent) for cent in books]
    idt = dict(corpus.dtypes)[id_col]
    schema = f"{id_col} {idt}, norm double, " + ", ".join(
        f"code_{j} int" for j in range(m)
    )
    qb = corpus.select(
        F.col(id_col), quantize_int8_expr(vec_col).alias("__qv")
    )
    return qb.mapInPandas(
        _pq_codes_kernel(
            lits, sub, id_col, "__qv", with_norm=True, keep_vec=False
        ),
        schema,
    )


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    rerank: int = 30,
) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank: score every coded
    vector against each probe through per-subspace dot LOOKUP TABLES
    (probe x subspace x centroid, ~m*ksub rows per probe — broadcast),
    keep the top ``rerank*k`` ADC candidates, then re-score those few
    with the exact cosine and emit the final top-k. ``rerank*k`` is an
    ABSOLUTE per-probe candidate count (default 150): generous on test
    corpora, a vanishing fraction at scale — the re-rank cost never
    grows with the corpus. The corpus-wide
    pass touches only codes + tables (no vectors), which is the entire
    point at 100 TB: the full-precision vectors are read for
    ``rerank*k`` rows per probe only. Output matches the other ANN
    paths: (probe_id, neighbor_id, cosine, rk)."""
    # Codebooks train on a bounded deterministic sample (the FAISS
    # convention): training cost is CONSTANT in corpus size; only
    # encode touches every vector, and it reads codes-worth of data.
    train = corpus.orderBy(id_col).limit(2048).localCheckpoint()
    books = pq_train(train, id_col, vec_col, dim, m, ksub, iters)
    codes = pq_encode(corpus, books, id_col, vec_col, dim).localCheckpoint()
    return pq_topk_from_codes(
        codes, books, corpus, probes, id_col, vec_col, k, dim, rerank
    )


def pq_topk_from_codes(
    codes: DataFrame,
    books: list[DataFrame],
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    rerank: int = 30,
) -> DataFrame:
    """ADC scoring + exact re-rank over PREBUILT codes/codebooks — the
    steady-state search path shared by the inline trainer
    (:func:`pq_topk`) and the persisted index
    (:func:`pq_topk_from_index`). ``corpus`` supplies full-precision
    vectors for the rerank*k candidate rows per probe only.

    The corpus-wide ADC pass is ONE projection: each probe's m dot
    tables are folded into a single (jk -> pdot) map broadcast with the
    probe row, and the per-vector score is m ``element_at`` lookups
    summed in fixed subspace order — no m-way posexplode, no
    (probe, vector) groupBy shuffle. The only corpus-scale exchange
    left is the per-probe top-rerank*k window. The tables themselves
    are computed driver-side from the collected probes + codebooks
    (both bounded by contract — nprobes * m * ksub dot products), so
    building them launches one probe-collect job, not a per-subspace
    crossJoin/union/groupBy chain.

    Cross-engine exactness: probes are int8-quantized driver-side
    (:func:`_quantize_py`), so each table entry is an exact integer dot
    (probe int8 x micro-unit book), the m-lookup sum is exact bigint
    addition, and the only float ops in ``approx_cos`` — one cast, one
    multiply of two sqrt's of exact ints, one divide — are single IEEE
    operations both engines compute identically. Candidate sets are
    therefore bit-reproducible by the DuckDB oracle."""
    import math

    m = len(books)
    sub = dim // m
    spark = codes.sparkSession
    lits = [_collect_codebook(cent) for cent in books]
    idt = dict(codes.dtypes)[id_col]

    prows = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    ).collect()
    # Per-probe ADC lookup map: key j*1024+cid -> dot(qv_j, c_{j,cid})
    # as exact Python ints.
    pt = []
    for r in prows:
        qv = _quantize_py([float(x) for x in r["probe_vec"]])
        qnorm = math.sqrt(sum(c * c for c in qv))
        tab = {}
        for j, (cids, cvecs) in enumerate(lits):
            qj = qv[j * sub : (j + 1) * sub]
            for cid, cv in zip(cids, cvecs):
                tab[j * 1024 + cid] = sum(
                    int(a) * int(b) for a, b in zip(qj, cv)
                )
        pt.append((r["probe_id"], qnorm, tab))
    ptab = spark.createDataFrame(
        pt, f"probe_id {idt}, qnorm double, tab map<int,bigint>"
    )

    # ADC: m map lookups per (vector, probe), summed as exact bigints;
    # one cast + one divide at the end (single IEEE ops).
    lookup = " + ".join(
        f"element_at(tab, {j} * 1024 + code_{j})" for j in range(m)
    )
    adc = (
        codes.crossJoin(F.broadcast(ptab))
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            (
                F.expr(f"CAST({lookup} AS DOUBLE)")
                / (F.col("qnorm") * F.col("norm"))
            ).alias("approx_cos"),
        )
    )
    wa = W.partitionBy("probe_id").orderBy(F.desc("approx_cos"), "neighbor_id")
    cand = (
        adc.withColumn("ark", F.row_number().over(wa))
        .filter(F.col("ark") <= rerank * k)
        .select("probe_id", "neighbor_id")
    )

    # Exact re-rank of the few surviving candidates. cand is bounded by
    # contract (rerank*k rows per probe, corpus-independent), so the
    # broadcast hint is safe and keeps the corpus un-shuffled. The
    # probe side reuses the collected rows (no second probe scan).
    vt = dict(corpus.dtypes)[vec_col]
    p = spark.createDataFrame(
        [(r["probe_id"], r["probe_vec"]) for r in prows],
        f"probe_id {idt}, probe_vec {vt}",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        c.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(p), "probe_id")
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


def _write_books(books: list[DataFrame], path: str) -> None:
    """Persist codebooks as one tiny (j, cid, cvec) parquet."""
    tagged = None
    for j, cent in enumerate(books):
        t = cent.select(F.lit(j).alias("j"), "cid", "cvec")
        tagged = t if tagged is None else tagged.unionByName(t)
    tagged.coalesce(1).write.mode("overwrite").parquet(path)


def _load_books(spark, books_path: str) -> list[DataFrame]:
    """One collect of the tiny (j, cid, cvec) books parquet (m*ksub
    rows); rebuild the per-subspace book frames as local relations with
    the literal lists attached — steady-state search/encode then
    launches no codebook collect jobs."""
    brows = spark.read.parquet(books_path).collect()
    m = max(r["j"] for r in brows) + 1
    books = []
    for j in range(m):
        sel = sorted(
            (r for r in brows if r["j"] == j), key=lambda r: r["cid"]
        )
        cids = [int(r["cid"]) for r in sel]
        cvecs = [[int(x) for x in r["cvec"]] for r in sel]
        books.append(_mk_book(spark, cids, cvecs))
    return books


def write_pq_index(
    corpus: DataFrame,
    codes_path: str,
    books_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    train_n: int = 2048,
    buckets: int = 32,
) -> None:
    """One-time PQ index build: codebooks (trained on the bounded
    deterministic sample — identical to the inline :func:`pq_topk`
    trainer, so persisted results match it row-for-row) written as one
    (j, cid, cvec) parquet, and the corpus codes
    (id, norm, code_0..code_{m-1}) written id-bucketed. The encode is
    the only corpus-wide pass and it happens here, at publish — the
    PQ twin of ``write_hyperplane_signature_table``."""
    train = corpus.orderBy(id_col).limit(train_n).localCheckpoint()
    books = pq_train(train, id_col, vec_col, dim, m, ksub, iters)
    _write_books(books, books_path)
    codes = pq_encode(corpus, books, id_col, vec_col, dim)
    codes.repartition(buckets, F.col(id_col)).write.mode(
        "overwrite"
    ).parquet(codes_path)


def pq_topk_from_index(
    spark,
    codes_path: str,
    books_path: str,
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    rerank: int = 30,
) -> DataFrame:
    """PQ/ADC top-k from the PERSISTED index: the timed search reads
    m-byte codes + tiny codebooks, never re-trains or re-encodes;
    full-precision vectors are touched only for the exact re-rank of
    rerank*k candidates per probe."""
    books = _load_books(spark, books_path)
    codes = spark.read.parquet(codes_path)
    return pq_topk_from_codes(
        codes, books, corpus, probes, id_col, vec_col, k, dim, rerank
    )


# ---------------------------------------------------------------------------
# IVF x PQ (FAISS IVFADC layout): coarse quantizer routes probes to
# nprobe of nlist cells; ADC scans only the probed cells' codes
# ---------------------------------------------------------------------------


def _probe_rows(probes: DataFrame, id_col: str, vec_col: str):
    """Collect the bounded probe set once: (probe_id, vec-as-floats,
    int8-quantized vec, qnorm = sqrt of the exact int |qv|^2)."""
    import math

    out = []
    for r in probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    ).collect():
        q = [float(x) for x in r["probe_vec"]]
        qv = _quantize_py(q)
        out.append(
            (r["probe_id"], q, qv, math.sqrt(sum(c * c for c in qv)))
        )
    return out


def _route_cells(
    qv: list[int],
    cell_lits: tuple[list[int], list[list[int]]],
    nprobe: int = 1,
) -> list[tuple[int, int, list[int]]]:
    """Top-``nprobe`` coarse cells for one quantized vector — the SAME
    exact-integer score (``2*PQ_SCALE*dot(qv, C) - |C|^2``) and
    tie-break (desc score, cid asc) as the kernel's assignment argmax,
    so driver-side routing and executor-side encoding always agree on
    a vector's cell. Returns [(cid, dot(qv, C), C)] best-first; the
    integer dot rides along because the residual ADC score needs it
    and the score already computed it."""
    ccids, ccvecs = cell_lits
    scored = []
    for cid, cv in zip(ccids, ccvecs):
        d = sum(int(a) * int(b) for a, b in zip(qv, cv))
        h = sum(int(c) * int(c) for c in cv)
        scored.append((-(2 * PQ_SCALE * d - h), cid, d, cv))
    scored.sort(key=lambda t: (t[0], t[1]))
    return [(cid, d, cv) for _, cid, d, cv in scored[:nprobe]]


def _adc_table(
    qv: list[int],
    lits: list[tuple[list[int], list[list[int]]]],
    sub: int,
) -> dict[int, int]:
    """Driver-side ADC lookup table for one quantized probe:
    j*1024+cid -> dot(qv_j, c_{j,cid}) as exact Python ints."""
    tab = {}
    for j, (cids, cvecs) in enumerate(lits):
        qj = qv[j * sub : (j + 1) * sub]
        for cid, cv in zip(cids, cvecs):
            tab[j * 1024 + cid] = sum(
                int(a) * int(b) for a, b in zip(qj, cv)
            )
    return tab


def ivfpq_encode(
    corpus: DataFrame,
    coarse: DataFrame,
    books: list[DataFrame],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    residual: bool = False,
) -> DataFrame:
    """Corpus -> (id, norm, cell, code_0..code_{m-1}): the IVF routing
    cell (nearest coarse centroid over the full vector) plus the m PQ
    codes, in the SAME single zero-exchange kernel scan as
    :func:`pq_encode`. ``cell`` doubles as the partition key for a
    cell-clustered codes layout at publish. ``residual=True`` encodes
    ``x - centroid(cell)`` against residual-trained books (same schema;
    the books/codes must agree on residual-ness — the persisted-index
    writers record it in a meta side file)."""
    m = len(books)
    sub = dim // m
    lits = [_collect_codebook(cent) for cent in books]
    cell_lits = _collect_codebook(coarse)
    idt = dict(corpus.dtypes)[id_col]
    schema = f"{id_col} {idt}, norm double, cell int, " + ", ".join(
        f"code_{j} int" for j in range(m)
    )
    qb = corpus.select(
        F.col(id_col), quantize_int8_expr(vec_col).alias("__qv")
    )
    return qb.mapInPandas(
        _pq_codes_kernel(
            lits,
            sub,
            id_col,
            "__qv",
            with_norm=True,
            keep_vec=False,
            cell_lits=cell_lits,
            residual=residual,
        ),
        schema,
    )


def ivfpq_topk_from_codes(
    codes: DataFrame,
    coarse: DataFrame,
    books: list[DataFrame],
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    nprobe: int = 4,
    rerank: int = 20,
    residual: bool = False,
) -> DataFrame:
    """IVFADC search over prebuilt cell-tagged codes: each probe routes
    to its ``nprobe`` best coarse cells (scored driver-side on the
    bounded probe set), and the ADC pass touches ONLY rows whose
    ``cell`` matches — an equi broadcast-hash join, ~nprobe/nlist of
    the flat :func:`pq_topk_from_codes` scan at scale. Exact re-rank of
    rerank*k candidates per probe, same output shape as every ANN
    path: (probe_id, neighbor_id, cosine, rk).

    ``residual=True`` scores residual-encoded codes: with
    ``x^ = c_cell + r^``, ``dot(q, x^) = dot(q, c_cell) + sum_j
    dot(q_j, r^_j)`` — the per-(probe, cell) ``dot(q, c_cell)`` term
    (``cdot``, already computed by the routing fold) is added to the
    subspace table sum; the tables themselves come from the residual
    books unchanged."""
    m = len(books)
    sub = dim // m
    spark = codes.sparkSession
    lits = [_collect_codebook(cent) for cent in books]
    cell_lits = _collect_codebook(coarse)
    idt = dict(codes.dtypes)[id_col]
    vt = dict(corpus.dtypes)[vec_col]

    pt = []
    prows = _probe_rows(probes, id_col, vec_col)
    for pid, _q, qv, qnorm in prows:
        # coarse routing: argmax of the exact-integer assignment score,
        # top nprobe cells (desc score, cid asc — the kernel tie-break)
        tab = _adc_table(qv, lits, sub)
        for cell, cdot, _ in _route_cells(qv, cell_lits, nprobe):
            pt.append(
                (pid, qnorm, cell, int(cdot) if residual else 0, tab)
            )
    ptab = spark.createDataFrame(
        pt,
        f"probe_id {idt}, qnorm double, cell int, cdot bigint, "
        "tab map<int,bigint>",
    )

    # Static probed-cell pushdown: the union of routed cells is known
    # driver-side, so the scan itself prunes to those cells BEFORE the
    # join — against the cell-PARTITIONED persisted layout
    # (write_ivfpq_index) this is parquet partition pruning (the
    # nprobe/nlist scan reduction happens at the file listing, pinned
    # in tests), and on unpartitioned codes it still row-group-filters.
    probed = sorted({row[2] for row in pt})
    codes = codes.filter(F.col("cell").isin(probed))

    lookup = " + ".join(
        f"element_at(tab, {j} * 1024 + code_{j})" for j in range(m)
    )
    adc = (
        codes.join(F.broadcast(ptab), "cell")
        .filter(F.col(id_col) != F.col("probe_id"))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            # exact bigint lookup sum (+ the routing dot for residual
            # codes), then one cast + one divide — single IEEE ops the
            # oracle reproduces bit-for-bit
            (
                F.expr(f"CAST({lookup} + cdot AS DOUBLE)")
                / (F.col("qnorm") * F.col("norm"))
            ).alias("approx_cos"),
        )
    )
    wa = W.partitionBy("probe_id").orderBy(F.desc("approx_cos"), "neighbor_id")
    cand = (
        adc.withColumn("ark", F.row_number().over(wa))
        .filter(F.col("ark") <= rerank * k)
        .select("probe_id", "neighbor_id")
    )
    p = spark.createDataFrame(
        [(pid, q) for pid, q, _qv, _n in prows],
        f"probe_id {idt}, probe_vec {vt}",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        c.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(p), "probe_id")
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


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    rerank: int = 20,
    residual: bool = False,
) -> DataFrame:
    """Composed IVF x PQ approximate top-k (the standard billion-vector
    serving layout — FAISS IVFADC; Jegou et al. 2011 §V): a coarse
    nlist-cell quantizer (trained as a 1-subspace product quantizer
    over the full dimension) routes each probe to its nprobe nearest
    cells, the flat PQ/ADC scan is restricted to those cells' codes,
    and the surviving rerank*k candidates are exactly re-scored. Both
    quantizers train on the same bounded deterministic sample —
    constant cost in corpus size, one JOINT Lloyd loop
    (:func:`ivfpq_train`); the one corpus-wide pass is the
    zero-exchange :func:`ivfpq_encode` kernel scan. ``residual=True``
    selects residual encoding throughout (IVFADC proper)."""
    train = corpus.orderBy(id_col).limit(2048).localCheckpoint()
    coarse, books = ivfpq_train(
        train, id_col, vec_col, dim, m, ksub, nlist, iters,
        residual=residual,
    )
    codes = ivfpq_encode(
        corpus, coarse, books, id_col, vec_col, dim, residual=residual
    ).localCheckpoint()
    return ivfpq_topk_from_codes(
        codes, coarse, books, corpus, probes, id_col, vec_col, k, dim,
        nprobe, rerank, residual=residual,
    )


# ---------------------------------------------------------------------------
# Incremental PQ index maintenance: frozen codebooks make appends a
# batch-only encode (parity with minhash/simhash/FTS incremental twins)
# ---------------------------------------------------------------------------


def pq_encode_new_batch(
    spark,
    new: DataFrame,
    books_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Encode ONLY a new batch against the PERSISTED frozen codebooks:
    reads the tiny books parquet plus the batch — never the corpus,
    never the existing codes. The plan is the same zero-exchange
    kernel scan as :func:`pq_encode`, so ingest cost scales with the
    batch alone."""
    books = _load_books(spark, books_path)
    return pq_encode(new, books, id_col, vec_col, dim)


def pq_append_to_index(
    spark,
    new: DataFrame,
    codes_path: str,
    books_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    guard_existing: bool = True,
) -> int:
    """Append a new batch's codes to the persisted PQ index.
    ``guard_existing`` anti-joins against ids already coded (a
    column-pruned id read of the codes parquet), making re-ingest a
    no-op — the idempotent at-least-once contract of
    ``fts.append_to_index`` / ``dedup`` signature appends. Returns the
    number of newly coded vectors."""
    batch = new
    if guard_existing:
        existing = spark.read.parquet(codes_path).select(F.col(id_col))
        batch = batch.join(existing, id_col, "left_anti")
    batch = batch.localCheckpoint(eager=True)
    n_new = batch.count()
    if n_new == 0:
        return 0
    pq_encode_new_batch(
        spark, batch, books_path, id_col, vec_col, dim
    ).write.mode("append").parquet(codes_path)
    return n_new


def auto_ivfpq_geometry(n: int) -> tuple[int, int, int]:
    """(nlist, nprobe, train_n) for a corpus of ``n`` vectors — the
    standard IVF sizing rule nlist ~ sqrt(n) (FAISS guidelines), rounded
    to a power of two and FLOORED at the fixed default 16 so every
    small/test-scale corpus keeps the documented geometry (the
    ``auto_hyperplane_nbits`` pattern). nprobe keeps the default probed
    fraction (4/16 = 1/4 of cells), so the scan-reduction story is
    scale-invariant while per-cell candidate lists shrink as sqrt(n);
    train_n grows to keep >=32 training points per coarse centroid."""
    import math

    nlist = max(16, 2 ** int(round(math.log2(max(1.0, math.sqrt(n))))))
    nlist = min(nlist, 4096)
    nprobe = max(4, nlist // 4)
    train_n = max(2048, 32 * nlist)
    return nlist, nprobe, train_n


def write_ivfpq_index(
    corpus: DataFrame,
    codes_path: str,
    coarse_path: str,
    books_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    nlist: int | None = None,
    iters: int = 2,
    train_n: int | None = None,
    residual: bool = False,
) -> None:
    """One-time IVFADC index build: coarse centroids + PQ codebooks
    (both trained on the bounded deterministic sample, identical to the
    inline :func:`ivfpq_topk` trainer) persisted as tiny parquets, and
    the corpus codes written PARTITIONED BY CELL — the serving layout
    where a search's probed cells prune at the parquet file listing, so
    the ADC pass reads ~nprobe/nlist of the index regardless of corpus
    size. The single corpus-wide pass is the zero-exchange
    :func:`ivfpq_encode` kernel scan (plus the layout write).

    Geometry (residual-ness, nlist, nprobe) RIDES WITH THE ARTIFACT
    (CLAUDE.md invariant: a reader assuming the build-time default
    silently mismatches): a ``_meta.json`` side file next to the books
    records it, and every reader (:func:`ivfpq_topk_from_index`,
    :func:`ivfpq_append_to_index`) derives it from there — never from
    a caller argument. ``nlist=None`` (the default) auto-scales
    nlist ~ sqrt(n) via :func:`auto_ivfpq_geometry`."""
    if nlist is None or train_n is None:
        a_nlist, _, a_train = auto_ivfpq_geometry(corpus.count())
        nlist = a_nlist if nlist is None else nlist
        train_n = a_train if train_n is None else train_n
    train = corpus.orderBy(id_col).limit(train_n).localCheckpoint()
    coarse, books = ivfpq_train(
        train, id_col, vec_col, dim, m, ksub, nlist, iters,
        residual=residual,
    )
    _write_books([coarse], coarse_path)
    _write_books(books, books_path)
    _write_side_json(
        books_path.rstrip("/") + "_meta.json",
        {"residual": bool(residual), "dim": dim, "m": m, "ksub": ksub,
         "nlist": int(nlist), "nprobe": max(4, int(nlist) // 4),
         "centroid_scale": PQ_SCALE},
    )
    codes = ivfpq_encode(
        corpus, coarse, books, id_col, vec_col, dim, residual=residual
    )
    codes.write.mode("overwrite").partitionBy("cell").parquet(codes_path)


def _ivfpq_index_meta(books_path: str) -> dict:
    """Geometry of a persisted IVFADC index, derived from its
    ``_meta.json`` side file; a missing side file means a pre-meta
    index, which was always built with the fixed defaults (backward
    compatible)."""
    meta = _read_side_json(books_path.rstrip("/") + "_meta.json")
    return meta if meta else {"residual": False, "nlist": 16, "nprobe": 4}


def _ivfpq_index_residual(books_path: str) -> bool:
    return bool(_ivfpq_index_meta(books_path).get("residual", False))


def ivfpq_topk_from_index(
    spark,
    codes_path: str,
    coarse_path: str,
    books_path: str,
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    nprobe: int | None = None,
    rerank: int = 20,
) -> DataFrame:
    """IVFADC search over the PERSISTED cell-partitioned index: routing
    + ADC tables come from the collected coarse/books parquets (tiny),
    the probed-cell filter prunes parquet partitions at the file
    listing, and full-precision vectors are read only for the exact
    re-rank. Results row-identical to the inline :func:`ivfpq_topk`
    (same bounded training sample). ALL geometry — residual-ness and
    (when ``nprobe`` is left None) the probe width matched to the
    build-time nlist — is derived from the index's meta side file,
    never assumed."""
    meta = _ivfpq_index_meta(books_path)
    if nprobe is None:
        nprobe = int(meta.get("nprobe", 4))
    coarse = _load_books(spark, coarse_path)[0]
    books = _load_books(spark, books_path)
    codes = spark.read.parquet(codes_path)
    return ivfpq_topk_from_codes(
        codes, coarse, books, corpus, probes, id_col, vec_col, k, dim,
        nprobe, rerank, residual=bool(meta.get("residual", False)),
    )


def write_quantized_table(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: int = 32,
) -> None:
    """One-time int8 quantization of the corpus to an id-bucketed
    parquet (4x smaller than the float32 vectors): the per-vector
    scale/floor pass — all of :func:`quantized_topk`'s projection
    cost — is paid once at publish, the int8-ANN twin of the
    signature/code tables."""
    q = corpus.select(
        F.col(id_col), quantize_int8_expr(vec_col).alias("q")
    )
    q.repartition(buckets, F.col(id_col)).write.mode("overwrite").parquet(
        path
    )


def quantized_topk_from_table(
    spark,
    path: str,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Int8 ANN top-k over the PERSISTED quantized corpus, scored by an
    Arrow-batched integer-matmul kernel (one ``Q @ P.T`` per partition
    instead of interpreted per-element HOF lambdas — the production
    pattern BENCH_NOTES promised for this query's linear-scan profile).

    Hash-identical to the inline :func:`quantized_topk` / its DuckDB
    oracle BY CONSTRUCTION, not by luck: every pairwise quantity the
    kernel computes (dots, norms) is an exact int64 — integer addition
    has no summation-order sensitivity — and the only float ops (the
    final divide / sqrt / 9 dp round) run JVM-side in the identical
    expression order as ``quantized_cosine_expr``. Probe vectors are
    quantized driver-side with the same double arithmetic
    (127/max|x| scale, floor(x*s+0.5))."""
    import math

    import numpy as np

    qt = spark.read.parquet(path)
    idt = dict(qt.dtypes)[id_col]

    prows = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("v")
    ).collect()
    pids, pqs, pnorms = [], [], []
    for r in prows:
        x = [float(v) for v in r["v"]]
        sc = 127.0 / max(max(abs(v) for v in x), 1e-30)
        qv = [math.floor(v * sc + 0.5) for v in x]
        pids.append(r["probe_id"])
        pqs.append(qv)
        pnorms.append(sum(c * c for c in qv))
    P = np.asarray(pqs, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]]
            )
            dots = Q @ P.T  # exact int64: |dot| <= 127^2 * dim
            nq = (Q * Q).sum(axis=1)
            n, p = dots.shape
            yield pd.DataFrame(
                {
                    "neighbor_id": np.repeat(
                        pdf[id_col].to_numpy(), p
                    ),
                    "pidx": np.tile(np.arange(p, dtype=np.int32), n),
                    "dot": dots.reshape(-1),
                    "nq": np.repeat(nq, p),
                }
            )

    scored_raw = qt.mapInPandas(
        kernel, f"neighbor_id {idt}, pidx int, dot bigint, nq bigint"
    )
    # Final float ops JVM-side, in quantized_cosine_expr's exact order:
    # sqrt(probe_norm) * sqrt(corpus_norm), divide, round 9 dp.
    pid_arr = F.array(*[F.lit(v) for v in pids])
    pn_arr = F.array(*[F.lit(float(v)) for v in pnorms])
    scored = (
        scored_raw.select(
            F.element_at(pid_arr, F.col("pidx") + 1).alias("probe_id"),
            "neighbor_id",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.element_at(pn_arr, F.col("pidx") + 1))
                    * F.sqrt(F.col("nq").cast("double"))
                ),
                COSINE_SCALE,
            ).alias("qcosine"),
        )
        .filter(F.col("neighbor_id") != F.col("probe_id"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("qcosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
    )


def ivfpq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    nlist: int = 16,
    iters: int = 2,
    residual: bool = False,
) -> tuple[DataFrame, list[DataFrame]]:
    """Joint Lloyd training of the IVF coarse quantizer AND the m
    subspace codebooks in ONE loop: every iteration is a single kernel
    assignment pass (cells + all subspace codes together) plus one
    combined (book, cid, dim) exact-integer-sum shuffle — half the
    tiny-job chatter of running two separate :func:`pq_train` loops.
    Bit-identical to the separate trainers (same deterministic
    smallest-id init, same exact-integer scores, same
    :func:`_half_away` integer means over int8-quantized vectors), so
    indexes built either way agree row-for-row — and the whole loop is
    replayable by the DuckDB oracle. Returns (coarse, books).

    ``residual=True`` trains FAISS IVFADC proper instead: the coarse
    quantizer is Lloyd-trained first (cells must be frozen before
    residuals mean anything), then the m subspace codebooks are trained
    on ``x - centroid(cell)`` — see :func:`_ivfpq_train_residual`."""
    if residual:
        return _ivfpq_train_residual(
            corpus, id_col, vec_col, dim, m, ksub, nlist, iters
        )
    sub = dim // m
    spark = corpus.sparkSession
    idt = dict(corpus.dtypes)[id_col]
    qbase = corpus.select(
        F.col(id_col), quantize_int8_expr(vec_col).alias("__qv")
    )
    # Regime switch on corpus rows (see PQ_TRAIN_KERNEL_MAX_ROWS).
    if qbase.count() <= PQ_TRAIN_KERNEL_MAX_ROWS:
        cells, lits = _train_books_single_task(
            qbase, id_col, dim, m, sub, ksub, nlist, iters, "joint"
        )
        return _mk_book(spark, *cells), [
            _mk_book(spark, c, v) for c, v in lits
        ]

    kmax = max(ksub, nlist)
    init = sorted(
        qbase.orderBy(id_col).limit(kmax).collect(),
        key=lambda r: r[id_col],
    )
    lits = [
        (
            list(range(1, min(ksub, len(init)) + 1)),
            [
                [
                    int(x) * PQ_SCALE
                    for x in r["__qv"][j * sub : (j + 1) * sub]
                ]
                for r in init[:ksub]
            ],
        )
        for j in range(m)
    ]
    cell_lits = (
        list(range(1, min(nlist, len(init)) + 1)),
        [[int(x) * PQ_SCALE for x in r["__qv"]] for r in init[:nlist]],
    )

    schema = (
        f"{id_col} {idt}, cell int, "
        + ", ".join(f"code_{j} int" for j in range(m))
        + ", __qv array<int>"
    )
    for _ in range(iters):
        coded = qbase.mapInPandas(
            _pq_codes_kernel(
                lits,
                sub,
                id_col,
                "__qv",
                with_norm=False,
                keep_vec=True,
                cell_lits=cell_lits,
            ),
            schema,
        )
        entries = [
            F.struct(
                F.lit(j).alias("j"),
                F.col(f"code_{j}").alias("cid"),
                F.slice(F.col("__qv"), j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ] + [
            F.struct(
                F.lit(m).alias("j"),
                F.col("cell").alias("cid"),
                F.slice(F.col("__qv"), 1, dim).alias("sv"),
            )
        ]
        ex = coded.select(F.explode(F.array(*entries)).alias("e"))
        pos = ex.select(
            F.col("e.j").alias("j"),
            F.col("e.cid").alias("cid"),
            F.posexplode(F.col("e.sv")).alias("i", "x"),
        )
        rows = (
            pos.groupBy("j", "cid", "i")
            .agg(
                F.sum(F.col("x").cast("bigint")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        sel = _lits_from_sums(rows, m + 1, scale=PQ_SCALE)
        lits = sel[:m]
        cell_lits = sel[m]

    coarse = _mk_book(spark, *cell_lits)
    books = [_mk_book(spark, *lit) for lit in lits]
    return coarse, books


def _ivfpq_train_residual(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    ksub: int,
    nlist: int,
    iters: int,
) -> tuple[DataFrame, list[DataFrame]]:
    """Two-phase IVFADC training (Jegou et al. 2011 §V-A; the FAISS
    IVFPQ layout): phase 1 Lloyd-trains the coarse quantizer alone
    (same deterministic smallest-id init and exact-integer means as the
    joint trainer); phase 2 freezes it and Lloyd-trains the m subspace
    codebooks on the micro-unit integer residuals
    ``PQ_SCALE*x - C_cell`` — the code domain concentrates around
    zero, buying recall at identical m/ksub geometry. Each phase-2
    iteration is still ONE kernel assignment scan (cell + residual +
    all subspace codes together) plus one combined integer-sum
    shuffle; residuals never persist anywhere — they exist only inside
    the kernel batch and the update explode. Every quantity in both
    phases is an exact integer, so the whole two-phase loop is
    replayable by the DuckDB oracle."""
    sub = dim // m
    spark = corpus.sparkSession
    idt = dict(corpus.dtypes)[id_col]
    qbase = corpus.select(
        F.col(id_col), quantize_int8_expr(vec_col).alias("__qv")
    )
    # Regime switch on corpus rows (see PQ_TRAIN_KERNEL_MAX_ROWS).
    if qbase.count() <= PQ_TRAIN_KERNEL_MAX_ROWS:
        cells, lits = _train_books_single_task(
            qbase, id_col, dim, m, sub, ksub, nlist, iters, "residual"
        )
        return _mk_book(spark, *cells), [
            _mk_book(spark, c, v) for c, v in lits
        ]

    kmax = max(ksub, nlist)
    init = sorted(
        qbase.orderBy(id_col).limit(kmax).collect(),
        key=lambda r: r[id_col],
    )
    cell_lits = (
        list(range(1, min(nlist, len(init)) + 1)),
        [[int(x) * PQ_SCALE for x in r["__qv"]] for r in init[:nlist]],
    )

    def _collect_sums(coded, entries):
        ex = coded.select(F.explode(F.array(*entries)).alias("e"))
        pos = ex.select(
            F.col("e.j").alias("j"),
            F.col("e.cid").alias("cid"),
            F.posexplode(F.col("e.sv")).alias("i", "x"),
        )
        return (
            pos.groupBy("j", "cid", "i")
            .agg(
                F.sum(F.col("x").cast("bigint")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )

    # ---- phase 1: coarse quantizer alone ------------------------------
    cell_schema = f"{id_col} {idt}, cell int, __qv array<int>"
    for _ in range(iters):
        coded = qbase.mapInPandas(
            _pq_codes_kernel(
                [], sub, id_col, "__qv",
                with_norm=False, keep_vec=True, cell_lits=cell_lits,
            ),
            cell_schema,
        )
        rows = _collect_sums(
            coded,
            [
                F.struct(
                    F.lit(0).alias("j"),
                    F.col("cell").alias("cid"),
                    F.slice(F.col("__qv"), 1, dim).alias("sv"),
                )
            ],
        )
        cell_lits = _lits_from_sums(rows, 1, scale=PQ_SCALE)[0]

    # ---- phase 2: subspace books over residuals (coarse frozen) -------
    # init: micro-unit residuals of the ksub smallest-id training
    # vectors, routed driver-side with the kernel's exact integer
    # score/tie-break
    init_res = []
    for r in init[:ksub]:
        qv = [int(x) for x in r["__qv"]]
        _, _, cv = _route_cells(qv, cell_lits, nprobe=1)[0]
        init_res.append(
            [PQ_SCALE * a - int(b) for a, b in zip(qv, cv)]
        )
    lits = [
        (
            list(range(1, len(init_res) + 1)),
            [rv[j * sub : (j + 1) * sub] for rv in init_res],
        )
        for j in range(m)
    ]
    res_schema = (
        f"{id_col} {idt}, cell int, "
        + ", ".join(f"code_{j} int" for j in range(m))
        + ", __res array<bigint>"
    )
    for _ in range(iters):
        coded = qbase.mapInPandas(
            _pq_codes_kernel(
                lits, sub, id_col, "__qv",
                with_norm=False, keep_vec=False, cell_lits=cell_lits,
                residual=True, emit_residual=True,
            ),
            res_schema,
        )
        rows = _collect_sums(
            coded,
            [
                F.struct(
                    F.lit(j).alias("j"),
                    F.col(f"code_{j}").alias("cid"),
                    F.slice(F.col("__res"), j * sub + 1, sub).alias("sv"),
                )
                for j in range(m)
            ],
        )
        # residual components are ALREADY micro-units -> scale=1
        lits = _lits_from_sums(rows, m, scale=1)

    return _mk_book(spark, *cell_lits), [
        _mk_book(spark, *lit) for lit in lits
    ]


def ivfpq_append_to_index(
    spark,
    new: DataFrame,
    codes_path: str,
    coarse_path: str,
    books_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    guard_existing: bool = True,
) -> int:
    """Append a new batch to the persisted IVFADC index: cells + codes
    come from the FROZEN coarse/books parquets (batch-only
    zero-exchange kernel scan), and rows land inside their cells'
    partition directories — the serving layout keeps pruning after
    every append. Idempotent under ``guard_existing`` (id anti-join),
    like :func:`pq_append_to_index`. Returns newly coded count.
    Residual-ness comes from the index's meta side file — an append
    can never encode against the wrong domain."""
    coarse = _load_books(spark, coarse_path)[0]
    books = _load_books(spark, books_path)
    batch = new
    if guard_existing:
        existing = spark.read.parquet(codes_path).select(F.col(id_col))
        batch = batch.join(existing, id_col, "left_anti")
    batch = batch.localCheckpoint(eager=True)
    n_new = batch.count()
    if n_new == 0:
        return 0
    (
        ivfpq_encode(
            batch, coarse, books, id_col, vec_col, dim,
            residual=_ivfpq_index_residual(books_path),
        )
        .write.mode("append")
        .partitionBy("cell")
        .parquet(codes_path)
    )
    return n_new


# --- NSW graph ANN (layer-0 navigable small world) -------------------------
#
# The graph member of the ANN menu (VERDICT r7 task #4) beside the
# IVF/PQ/LSH families: a bounded-degree k-NN graph built from the
# banded-LSH candidate pairs (never an all-pairs scan), augmented with
# a deterministic id-ring backbone for reachability, searched by a
# fixed-round beam expansion (frontier joins — the graph_bfs_hops loop
# discipline).  Reference (/root/reference) has no ANN surface at all;
# parity target is the industry-standard NSW/HNSW layer-0 shape
# (Malkov & Yashunin 2016) re-expressed as DataFrame joins.

NSW_DEGREE = 8  # bounded out-degree for knn edges (reader-enforced)
# Search budget tuned on the synthetic embeddings (near-random space —
# the hard case for graph ANN: true neighbors are rarely direct LSH
# edges, so recall comes from exploration): beam 16 x 5 rounds x 8
# entries measures recall 1.0 @ sf0.001 / 0.867 @ sf0.01 vs brute
# force (the ivfpq 0.867 precedent); beam 24 x 6 reaches 1.0/1.0 for
# callers who want it.  Per-probe work stays
# O(rounds * beam * degree) score joins regardless of corpus size.
NSW_BEAM = 16  # beam width per expansion round
NSW_ROUNDS = 5  # fixed rounds: bounded work, unrollable shape
NSW_ENTRIES = 8  # entry points = smallest corpus ids (deterministic)


def auto_nsw_beam(n: int, beam: int = NSW_BEAM) -> int:
    """Search-budget floor that scales with corpus size.  On
    STRUCTURELESS (near-random) embeddings graph navigation degrades
    toward sampling — there is no gradient to route along — so holding
    a recall floor requires the visited set to be a bounded FRACTION
    of the corpus (exactly the ivfpq nprobe/nlist = 1/4 scan-fraction
    precedent): beam = max(default, ~n/85) keeps the measured floors
    (1.0 @ n=500, 0.8 @ n=2000 with beam 24) on the synthetic
    embeddings, the worst case for any sublinear index.  Clustered
    real corpora route in few hops and just use the floor; an NND
    graph-improvement round was measured WORSE here (0.60 vs 0.80 at
    equal budget — tighter local graphs reduce exploration diversity
    when there is no cluster structure to exploit)."""
    return max(beam, n // 85 + 1)


def _nsw_score_edges(
    edges: DataFrame, corpus: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(src, dst) -> (src, dst, cos): fetch both endpoint vectors by id
    join and score with the sequential-exact cosine.

    Scorer = the Arrow sequential kernel (``_cosine_pair_col(fast=
    False)``), bit-identical to :func:`cosine_expr`'s interpreted HOF
    fold by construction (identical IEEE op order; pinned by
    tests/test_operators.py::test_cosine_seq_udf_matches_expr) — this
    is the bulk edge-scoring path, and the kernel measured 1.55 s ->
    0.58 s over the sf0.1 candidate set (guide §4.2: vectorized native
    batches beat interpreted per-row lambdas)."""
    a = corpus.select(
        F.col(id_col).alias("src"), F.col(vec_col).alias("__va")
    )
    b = corpus.select(
        F.col(id_col).alias("dst"), F.col(vec_col).alias("__vb")
    )
    return (
        edges.join(a, "src")
        .join(b, "dst")
        .select(
            "src",
            "dst",
            _cosine_pair_col(F.col("__va"), F.col("__vb"), False).alias(
                "cos"
            ),
        )
    )


def _nsw_ring_edges(corpus: DataFrame, id_col: str) -> DataFrame:
    """Deterministic connectivity backbone: each id links to its
    id-order successor (wrapping), both directions.  Successor ranks
    come from the DISTRIBUTED TeraSort rank (operators/ranks.range_rank
    — no global Sort+Window over the corpus id frame), so the backbone
    build is shuffle-parallel at any scale."""
    from hangarbay_spark.operators.ranks import range_rank

    rr = range_rank(
        corpus.select(id_col), [F.col(id_col).asc()], 32
    ).select(F.col(id_col).alias("src"), "rn", "__n")
    succ = rr.select(
        "src", (F.col("rn") % F.col("__n") + 1).alias("__rn2")
    )
    ring = succ.join(
        rr.select(F.col("src").alias("dst"), F.col("rn").alias("__rn2")),
        "__rn2",
    ).select("src", "dst")
    # DIRECTED successor pairs only (no mirror here): the caller scores
    # these once and mirrors the SCORED rows — cosine is bit-symmetric
    # (per-element multiply commutes, the accumulation order over i is
    # identical either way), so scoring each undirected ring edge once
    # halves the interpreted-HOF cosine work (the knn-half precedent).
    return ring.filter(F.col("src") != F.col("dst")).distinct()


def nsw_build_adjacency(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    degree: int = NSW_DEGREE,
    nbits: int | None = None,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
    max_bucket: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Edge table (src, dst, cos, kind) of the NSW graph: 'knn' edges =
    per-node top-``degree`` banded-LSH candidates by exact cosine
    (candidates from equi-joined band buckets — the
    embedding_near_dup_pairs machinery, never all-pairs), 'ring' edges
    = the id-successor backbone that keeps every node reachable even
    when its LSH buckets are empty.  Degree is READER-enforced
    (:func:`nsw_edges_view`): the table itself is idempotent edge
    postings, so incremental appends are crash-safe by set algebra
    (the Bloom-maintenance contrast to counts-shaped LSMs)."""
    if sigs is None:
        if nbits is None:
            nbits = auto_hyperplane_nbits(corpus.count(), bands)
        sigs = hyperplane_signatures(
            corpus, id_col, vec_col, dim, nbits, bands, seed
        )
    cand = _banded_candidate_pairs(sigs, id_col, bands, max_bucket)
    # score each undirected pair ONCE and mirror: the sequential-exact
    # cosine is bit-symmetric (per-element multiply commutes, the
    # accumulation order over i is identical either way), and the
    # zip_with/aggregate kernel is interpreted — halving evaluations
    # is the dominant build cost lever
    half = _nsw_score_edges(
        cand.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        corpus,
        id_col,
        vec_col,
    )
    # Mirror by ONE explode of a 2-struct array: unionByName's two
    # branches are differently-projected consumers of `half`, which
    # ReuseExchange does not dedup — the exact-cosine scoring (the
    # dominant build cost) would run TWICE (CLAUDE.md row-variant rule).
    knn = half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("src"),
                    F.col("dst").alias("dst"),
                    F.col("cos").alias("cos"),
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("cos").alias("cos"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.cos")
    w = W.partitionBy("src").orderBy(F.desc("cos"), "dst")
    knn_top = (
        knn.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= degree)
        .drop("rk")
        .select("src", "dst", "cos", F.lit("knn").alias("kind"))
    )
    # Ring edges: score the DIRECTED successor pairs once, mirror the
    # scored rows by one explode (cosine is bit-symmetric, so the
    # mirrored direction's cos is identical by construction), and
    # distinct to collapse 2-cycles (n=2 rings) the directed relation
    # already contains in both directions.
    ring_half = _nsw_score_edges(
        _nsw_ring_edges(corpus, id_col), corpus, id_col, vec_col
    )
    ring = (
        ring_half.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"),
                        F.col("dst").alias("dst"),
                        F.col("cos").alias("cos"),
                    ),
                    F.struct(
                        F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                        F.col("cos").alias("cos"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst", "e.cos")
        .distinct()
        .select("src", "dst", "cos", F.lit("ring").alias("kind"))
    )
    return knn_top.unionByName(ring)


def nsw_edges_view(adj: DataFrame, degree: int = NSW_DEGREE) -> DataFrame:
    """Reader-side view of an edge-postings table: dedup (src, dst)
    keeping the best kind/score, trim 'knn' edges to ``degree`` per
    src, keep every 'ring' edge (connectivity must survive append
    back-links outranking the backbone).  The kind-collapse keeps
    MAX(kind) — 'ring' sorts after 'knn', so a backbone edge that also
    arrives as a knn back-link stays 'ring' and is exempt from the
    degree trim (collapsing to 'knn' could drop a bucket-miss node's
    only guaranteed link; ADVICE r8).  Windows partition by src —
    bounded by construction."""
    d = adj.groupBy("src", "dst").agg(
        F.max("cos").alias("cos"), F.max("kind").alias("kind")
    )
    w = W.partitionBy("src").orderBy(F.desc("cos"), "dst")
    knn = (
        d.filter(F.col("kind") == "knn")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= degree)
        .drop("rk")
    )
    return knn.unionByName(d.filter(F.col("kind") == "ring"))


def nsw_topk(
    corpus: DataFrame,
    probes: DataFrame,
    adj: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    beam: int = NSW_BEAM,
    rounds: int = NSW_ROUNDS,
    entries: int = NSW_ENTRIES,
    degree: int = NSW_DEGREE,
    n_nodes: int | None = None,
) -> DataFrame:
    """Beam search over the NSW graph: start from the ``entries``
    smallest node ids, expand ``rounds`` fixed rounds (frontier x
    adjacency join -> anti-join visited -> score by id-join -> keep
    top-``beam`` per probe), answer top-k from everything visited.
    All per-probe frames are (probes x beam x degree)-bounded; the
    corpus is touched only by id-joins fetching candidate vectors
    (bucket-prunable against an id-bucketed vector table at cluster
    scale).  Output matches brute_force_topk:
    (probe_id, neighbor_id, cosine, rk) excluding self-matches.

    Regime switch (the PAGERANK_KERNEL_MAX_EDGES discipline): corpora
    at or below :data:`NSW_KERNEL_MAX_NODES` replay view+walk in one
    Arrow task (:func:`nsw_walk_kernel`, bit-identical — pinned in
    tests); the distributed loop below is the path above the gate.
    Pass ``n_nodes`` when the caller already knows the corpus count."""
    if n_nodes is None:
        n_nodes = corpus.count()
    if n_nodes <= NSW_KERNEL_MAX_NODES:
        return nsw_walk_kernel(
            corpus, probes, adj, id_col, vec_col,
            k=k, beam=beam, rounds=rounds, entries=entries, degree=degree,
        )
    edges = (
        nsw_edges_view(adj, degree)
        .select(F.col("src").alias("nid"), "dst")
        .localCheckpoint(eager=True)
    )
    pv = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    cv = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("vec")
    )
    ent = (
        edges.select("nid").distinct().orderBy("nid").limit(entries)
    )
    visited = (
        ent.crossJoin(F.broadcast(pv))
        .join(cv, "nid")
        .select(
            "probe_id",
            "nid",
            cosine_expr(F.col("probe_vec"), F.col("vec")).alias("cos"),
        )
        # Lazy: no action runs inside the loop, so every checkpoint
        # materializes exactly once inside the single final action —
        # eager=True paid one extra job launch per frame (A/B: walk
        # 2.78 s -> 2.32 s, identical rows).
        .localCheckpoint(eager=False)
    )
    frontier = visited
    wb = W.partitionBy("probe_id").orderBy(F.desc("cos"), "nid")
    for _ in range(rounds):
        cand = (
            frontier.select("probe_id", "nid")
            .join(edges, "nid")
            .select("probe_id", F.col("dst").alias("nid"))
            .distinct()
            .join(
                visited.select("probe_id", "nid"),
                ["probe_id", "nid"],
                "left_anti",
            )
        )
        scored = (
            cand.join(F.broadcast(pv), "probe_id")
            .join(cv, "nid")
            .select(
                "probe_id",
                "nid",
                cosine_expr(F.col("probe_vec"), F.col("vec")).alias("cos"),
            )
            .localCheckpoint(eager=False)  # see the visited note
        )
        # visited is a union chain of <= rounds checkpointed frames —
        # no checkpoint needed (each leg is already materialized)
        visited = visited.unionByName(scored)
        frontier = (
            scored.withColumn("rk", F.row_number().over(wb))
            .filter(F.col("rk") <= beam)
            .drop("rk")
        )
    return (
        visited.filter(F.col("nid") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("nid").alias("neighbor_id"),
            F.col("cos").alias("cosine"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(
                W.partitionBy("probe_id").orderBy(
                    F.desc("cosine"), "neighbor_id"
                )
            )
            .cast("bigint"),
        )
        .filter(F.col("rk") <= k)
    )


# --- NSW single-task replay kernels -----------------------------------------
#
# The distributed beam walk costs (rounds x ~6) tiny stages — 51-77
# jobs per query at bench scale, pure scheduling overhead once the
# corpus fits one task (the r10 32-core anti-scaling pathology; guide
# §2.2 right-size parallelism).  Below NSW_KERNEL_MAX_NODES the whole
# view+walk (and for the inline query, the graph build too) replays in
# ONE Arrow task with bit-identical arithmetic: sequential per-dim
# cosine accumulation (the cosine_pair_seq_udf op order), Spark-round
# parity via Decimal(repr(x)) HALF_UP with the +0.0 normalization
# (Spark's BigDecimal path never returns -0.0 — CLAUDE.md
# events_uplift_qini precedent), and (cos DESC NULLS LAST, id ASC)
# tie-breaks everywhere.  Equivalence with the distributed loop is
# pinned by tests (kernel == loop on the test corpora); the
# distributed implementations remain the path above the gate.
#
# Bound arithmetic: 50k nodes = 25 MB of float64 vectors in the task
# plus ~50k*9 adjacency rows; the in-kernel candidate generation at
# auto-scaled band bits stays ~tens of ids per bucket, so pair arrays
# are O(bands * n).  sf1 (20k vectors) replays in-kernel; larger
# corpora take the distributed build/walk unchanged.
NSW_KERNEL_MAX_NODES = 50_000


def _replay_round9(vals) -> list:
    """Spark ``round(double, 9)`` replay: Decimal(repr(x)) HALF_UP
    (BigDecimal.valueOf = shortest repr — the graph-kernel precedent),
    normalizing -0.0 to +0.0 (BigDecimal has no signed zero).  ``vals``
    is an iterable of float-or-None; returns the same shape."""
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1e-9")
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        r = float(Decimal(repr(float(v))).quantize(q9, ROUND_HALF_UP))
        out.append(0.0 if r == 0.0 else r)
    return out


def _replay_pair_cosines(A, B) -> list:
    """Rounded cosines for row-aligned vector stacks A, B — sequential
    per-dim accumulation (cosine_expr / cosine_pair_seq_udf op order),
    x/0 -> None (Spark double division by zero is NULL)."""
    import numpy as np

    n = A.shape[0]
    if n == 0:
        return []
    dot = np.zeros(n)
    na = np.zeros(n)
    nb = np.zeros(n)
    for j in range(A.shape[1]):
        dot += A[:, j] * B[:, j]
        na += A[:, j] * A[:, j]
        nb += B[:, j] * B[:, j]
    den = np.sqrt(na) * np.sqrt(nb)
    raw = [
        None if den[i] == 0.0 else float(dot[i] / den[i]) for i in range(n)
    ]
    return _replay_round9(raw)


def _replay_band_values(V, coefs, bands: int):
    """Replay of :func:`hyperplane_band_cols` over a vector stack:
    sequential per-dim projection fold (the expr path's zip_with/
    aggregate op order), sign -> ``rpb``-bit packed band values.
    Returns an int64 array of shape (n, bands)."""
    import numpy as np

    n = V.shape[0]
    nbits = len(coefs)
    rpb = nbits // bands
    C = np.asarray(coefs, dtype=np.float64)  # (nbits, dim)
    proj = np.zeros((n, nbits))
    for d in range(V.shape[1]):
        proj += V[:, d : d + 1] * C[None, :, d]
    bits = proj >= 0
    vals = np.zeros((n, bands), dtype=np.int64)
    for b in range(bands):
        for r in range(rpb):
            vals[:, b] += bits[:, b * rpb + r].astype(np.int64) << r
    return vals


def _nsw_sort_key(item):
    """(cos DESC NULLS LAST, id ASC) — the window orderBy of the
    distributed walk (F.desc is nulls-last in Spark)."""
    nid, cos = item
    return (cos is None, -(cos if cos is not None else 0.0), nid)


def _nsw_view_py(rows: dict, degree: int) -> dict:
    """Replay of :func:`nsw_edges_view` over collapsed postings
    ``{(src, dst): (cos, kind)}`` (already max-collapsed): trim 'knn'
    per src to ``degree`` by (cos desc, dst asc), keep every 'ring'.
    Returns adjacency ``{src: sorted tuple of dst}``."""
    per_src: dict = {}
    for (src, dst), (cos, kind) in rows.items():
        per_src.setdefault(src, []).append((dst, cos, kind))
    adj: dict = {}
    for src, lst in per_src.items():
        knn = [(d, c) for d, c, kd in lst if kd == "knn"]
        knn.sort(key=lambda t: (t[1] is None,
                                -(t[1] if t[1] is not None else 0.0), t[0]))
        keep = {d for d, _ in knn[:degree]}
        keep.update(d for d, _, kd in lst if kd == "ring")
        adj[src] = tuple(sorted(keep))
    return adj


def _nsw_walk_py(
    adj: dict,
    ids,
    V,
    probes: list,
    k: int,
    beam: int,
    rounds: int,
    entries: int,
) -> list:
    """Replay of the :func:`nsw_topk` beam loop over an adjacency map.
    ``ids``/``V``: corpus id list + row-aligned vector stack; ``probes``
    = [(probe_id, vec)].  Returns (probe_id, neighbor_id, cosine, rk)
    tuples in (probe, rk) order."""
    import numpy as np

    idx = {i: j for j, i in enumerate(ids)}
    ent = sorted(adj.keys())[:entries]
    out = []
    for pid, pvec in probes:
        P = np.asarray(pvec, dtype=np.float64)

        def score(nids):
            A = np.stack([P] * len(nids))
            B = np.stack([V[idx[n]] for n in nids])
            return _replay_pair_cosines(A, B)

        visited = dict(zip(ent, score(ent))) if ent else {}
        frontier = list(ent)
        for _ in range(rounds):
            cand = sorted(
                {
                    d
                    for nid in frontier
                    for d in adj.get(nid, ())
                }
                - visited.keys()
            )
            if not cand:
                frontier = []
                continue
            scored = list(zip(cand, score(cand)))
            visited.update(scored)
            scored.sort(key=_nsw_sort_key)
            frontier = [nid for nid, _ in scored[:beam]]
        res = sorted(
            ((nid, c) for nid, c in visited.items() if nid != pid),
            key=_nsw_sort_key,
        )[:k]
        out.extend(
            (pid, nid, c, rk + 1) for rk, (nid, c) in enumerate(res)
        )
    return out


def _nsw_out_schema(corpus: DataFrame, id_col: str):
    from pyspark.sql import types as T

    idt = corpus.schema[id_col].dataType
    return T.StructType(
        [
            T.StructField("probe_id", idt),
            T.StructField("neighbor_id", idt),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rk", T.LongType()),
        ]
    )


def _nsw_result_pdf(rows: list):
    import numpy as np

    cos = [r[2] for r in rows]
    return pd.DataFrame(
        {
            "probe_id": pd.array([r[0] for r in rows], dtype="Int64"),
            "neighbor_id": pd.array([r[1] for r in rows], dtype="Int64"),
            "cosine": pd.arrays.FloatingArray(
                np.asarray(
                    [0.0 if c is None else c for c in cos], dtype="float64"
                ),
                np.asarray([c is None for c in cos], dtype=bool),
            ),
            "rk": pd.array([r[3] for r in rows], dtype="Int64"),
        }
    )


def nsw_walk_kernel(
    corpus: DataFrame,
    probes: DataFrame,
    adj: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    beam: int = NSW_BEAM,
    rounds: int = NSW_ROUNDS,
    entries: int = NSW_ENTRIES,
    degree: int = NSW_DEGREE,
) -> DataFrame:
    """Single-task replay of ``nsw_edges_view(adj)`` + the beam walk:
    the adjacency postings fold into per-src arrays (one bounded
    shuffle), ride a left join onto the corpus vectors, and one Arrow
    task replays view-trim + walk with bit-identical arithmetic.
    Results equal :func:`nsw_topk`'s distributed loop (pinned in
    tests); callers gate on NSW_KERNEL_MAX_NODES."""
    pr = probes.select(id_col, vec_col).collect()
    probe_list = [(r[0], r[1]) for r in pr]
    ga = adj.groupBy("src").agg(
        F.collect_list(F.struct("dst", "cos", "kind")).alias("__adj")
    )
    inp = (
        corpus.select(
            F.col(id_col).alias("__nid"), F.col(vec_col).alias("__vec")
        )
        .join(ga.withColumnRenamed("src", "__nid"), "__nid", "left")
        .coalesce(1)
    )

    def kernel(it):
        import numpy as np

        ids, vecs, posted = [], [], {}
        for pdf in it:
            for nid, vec, al in zip(
                pdf["__nid"], pdf["__vec"], pdf["__adj"]
            ):
                nid = int(nid)
                ids.append(nid)
                vecs.append(np.asarray(vec, dtype=np.float64))
                if al is None:
                    continue
                for e in al:
                    key = (nid, int(e["dst"]))
                    c = e["cos"]
                    c = None if c is None or pd.isna(c) else float(c)
                    kd = e["kind"]
                    prev = posted.get(key)
                    if prev is None:
                        posted[key] = (c, kd)
                    else:
                        pc, pk = prev
                        mc = (
                            c
                            if pc is None
                            else pc
                            if c is None
                            else max(pc, c)
                        )
                        posted[key] = (mc, max(pk, kd))
        if not ids:
            yield _nsw_result_pdf([])
            return
        V = np.stack(vecs)
        adj_map = _nsw_view_py(posted, degree)
        yield _nsw_result_pdf(
            _nsw_walk_py(
                adj_map, ids, V, probe_list, k, beam, rounds, entries
            )
        )

    return inp.mapInPandas(kernel, _nsw_out_schema(corpus, id_col))


def nsw_build_walk_kernel(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    beam: int = NSW_BEAM,
    rounds: int = NSW_ROUNDS,
    entries: int = NSW_ENTRIES,
    degree: int = NSW_DEGREE,
    nbits: int | None = None,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
    n_nodes: int | None = None,
) -> DataFrame:
    """Single-task replay of the WHOLE inline NSW query — signatures,
    banded candidate pairs, per-src top-degree knn edges, id-ring
    backbone, reader view, beam walk — over one corpus scan.  Exact
    twin of ``nsw_topk(corpus, probes, nsw_build_adjacency(corpus))``
    (pinned in tests): signatures replay the sequential Rademacher
    projection fold, candidates are the same bucket pair set
    (max_bucket=None — the build default), and every cosine/round/
    tie-break follows the replay discipline above."""
    if n_nodes is None:
        n_nodes = corpus.count()
    if nbits is None:
        nbits = auto_hyperplane_nbits(n_nodes, bands)
    coefs = rademacher_coefs(nbits, dim, seed)
    pr = probes.select(id_col, vec_col).collect()
    probe_list = [(r[0], r[1]) for r in pr]
    inp = corpus.select(
        F.col(id_col).alias("__nid"), F.col(vec_col).alias("__vec")
    ).coalesce(1)

    def kernel(it):
        import numpy as np

        ids, vecs = [], []
        for pdf in it:
            for nid, vec in zip(pdf["__nid"], pdf["__vec"]):
                ids.append(int(nid))
                vecs.append(np.asarray(vec, dtype=np.float64))
        if not ids:
            yield _nsw_result_pdf([])
            return
        V = np.stack(vecs)
        n = len(ids)
        # signatures: sequential per-dim projection fold (the
        # hyperplane_band_cols op order), sign -> packed band values
        vals = _replay_band_values(V, coefs, bands)
        buckets: dict = {}
        for b in range(bands):
            for j in range(n):
                buckets.setdefault((b, int(vals[j, b])), []).append(ids[j])
        pairs = set()
        for members in buckets.values():
            if len(members) < 2:
                continue
            ms = members
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    a, b2 = ms[x], ms[y]
                    pairs.add((a, b2) if a < b2 else (b2, a))
        idx = {i: j for j, i in enumerate(ids)}
        plist = sorted(pairs)
        if plist:
            A = np.stack([V[idx[a]] for a, _ in plist])
            B = np.stack([V[idx[b2]] for _, b2 in plist])
            pcos = _replay_pair_cosines(A, B)
        else:
            pcos = []
        # mirrored knn postings; per-src top-degree trim
        knn_all: dict = {}
        for (a, b2), c in zip(plist, pcos):
            knn_all.setdefault(a, []).append((b2, c))
            knn_all.setdefault(b2, []).append((a, c))
        posted: dict = {}
        for src, lst in knn_all.items():
            lst.sort(
                key=lambda t: (
                    t[1] is None,
                    -(t[1] if t[1] is not None else 0.0),
                    t[0],
                )
            )
            for dst, c in lst[:degree]:
                posted[(src, dst)] = (c, "knn")
        # id-ring backbone: successor in sorted-id order, mirrored
        sid = sorted(ids)
        ring_pairs = set()
        for j in range(n):
            a, b2 = sid[j], sid[(j + 1) % n]
            if a != b2:
                ring_pairs.add((a, b2))
                ring_pairs.add((b2, a))
        rlist = sorted(ring_pairs)
        if rlist:
            A = np.stack([V[idx[a]] for a, _ in rlist])
            B = np.stack([V[idx[b2]] for _, b2 in rlist])
            rcos = _replay_pair_cosines(A, B)
        else:
            rcos = []
        for (a, b2), c in zip(rlist, rcos):
            prev = posted.get((a, b2))
            if prev is None:
                posted[(a, b2)] = (c, "ring")
            else:
                pc, _pk = prev
                mc = c if pc is None else pc if c is None else max(pc, c)
                posted[(a, b2)] = (mc, "ring")
        adj_map = _nsw_view_py(posted, degree)
        yield _nsw_result_pdf(
            _nsw_walk_py(
                adj_map, ids, V, probe_list, k, beam, rounds, entries
            )
        )

    return inp.mapInPandas(kernel, _nsw_out_schema(corpus, id_col))


def hyperplane_topk_kernel(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    nbits: int = 64,
    bands: int = 8,
    seed: str = "hplsh",
) -> DataFrame:
    """Single-task replay of :func:`hyperplane_topk` (the path below
    NSW_KERNEL_MAX_NODES): corpus + probe band values, >=1-shared-band
    candidates, exact sequential cosine, per-probe top-k — one corpus
    scan, one Arrow task, zero exchanges.  Bit-identical to the
    distributed pipeline (pinned in tests): band values replay the
    expr-path projection fold and every cosine/round/tie-break follows
    the replay discipline above."""
    coefs = rademacher_coefs(nbits, dim, seed)
    pr = probes.select(id_col, vec_col).collect()
    probe_list = [(r[0], r[1]) for r in pr]
    inp = corpus.select(
        F.col(id_col).alias("__nid"), F.col(vec_col).alias("__vec")
    ).coalesce(1)

    def kernel(it):
        import numpy as np

        ids, vecs = [], []
        for pdf in it:
            for nid, vec in zip(pdf["__nid"], pdf["__vec"]):
                ids.append(int(nid))
                vecs.append(np.asarray(vec, dtype=np.float64))
        if not ids or not probe_list:
            yield _nsw_result_pdf([])
            return
        V = np.stack(vecs)
        cvals = _replay_band_values(V, coefs, bands)
        P = np.stack(
            [np.asarray(v, dtype=np.float64) for _, v in probe_list]
        )
        pvals = _replay_band_values(P, coefs, bands)
        buckets: dict = {}
        for j in range(len(ids)):
            for b in range(bands):
                buckets.setdefault((b, int(cvals[j, b])), []).append(j)
        out = []
        for pi, (pid, _v) in enumerate(probe_list):
            cand_idx = sorted(
                {
                    j
                    for b in range(bands)
                    for j in buckets.get((b, int(pvals[pi, b])), ())
                    if ids[j] != pid
                }
            )
            if not cand_idx:
                continue
            A = np.stack([P[pi]] * len(cand_idx))
            B = V[cand_idx]
            cos = _replay_pair_cosines(A, B)
            scored = sorted(
                zip((ids[j] for j in cand_idx), cos), key=_nsw_sort_key
            )[:k]
            out.extend(
                (pid, nid, c, rk + 1) for rk, (nid, c) in enumerate(scored)
            )
        yield _nsw_result_pdf(out)

    return inp.mapInPandas(kernel, _nsw_out_schema(corpus, id_col))


def embedding_near_dup_kernel(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    nbits: int = HYPERPLANE_BITS,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
    max_bucket: int | None = None,
) -> DataFrame:
    """Single-task replay of :func:`embedding_near_dup_pairs` (the path
    below NSW_KERNEL_MAX_NODES): band values, hot-bucket guard, shared-
    band (id_a < id_b) candidate pairs, exact sequential cosine >=
    threshold — one corpus scan, one Arrow task.  Pass the RESOLVED
    ``nbits`` (the caller's auto_hyperplane_nbits result) so kernel and
    distributed paths bucket identically."""
    from pyspark.sql import types as T

    coefs = rademacher_coefs(nbits, dim, seed)
    inp = corpus.select(
        F.col(id_col).alias("__nid"), F.col(vec_col).alias("__vec")
    ).coalesce(1)
    idt = corpus.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id_a", idt),
            T.StructField("id_b", idt),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def kernel(it):
        import numpy as np

        ids, vecs = [], []
        for pdf in it:
            for nid, vec in zip(pdf["__nid"], pdf["__vec"]):
                ids.append(int(nid))
                vecs.append(np.asarray(vec, dtype=np.float64))
        if not ids:
            yield pd.DataFrame(
                {
                    "id_a": pd.array([], dtype="Int64"),
                    "id_b": pd.array([], dtype="Int64"),
                    "cosine": pd.array([], dtype="Float64"),
                }
            )
            return
        V = np.stack(vecs)
        vals = _replay_band_values(V, coefs, bands)
        buckets: dict = {}
        for j in range(len(ids)):
            for b in range(bands):
                buckets.setdefault((b, int(vals[j, b])), []).append(ids[j])
        pairs = set()
        for members in buckets.values():
            if len(members) < 2 or (
                max_bucket is not None and len(members) > max_bucket
            ):
                continue
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, b2 = members[x], members[y]
                    pairs.add((a, b2) if a < b2 else (b2, a))
        idx = {i: j for j, i in enumerate(ids)}
        plist = sorted(pairs)
        rows = []
        if plist:
            A = np.stack([V[idx[a]] for a, _ in plist])
            B = np.stack([V[idx[b2]] for _, b2 in plist])
            for (a, b2), c in zip(plist, _replay_pair_cosines(A, B)):
                if c is not None and c >= threshold:
                    rows.append((a, b2, c))
        yield pd.DataFrame(
            {
                "id_a": pd.array([r[0] for r in rows], dtype="Int64"),
                "id_b": pd.array([r[1] for r in rows], dtype="Int64"),
                "cosine": pd.array(
                    [r[2] for r in rows], dtype="Float64"
                ),
            }
        )

    return inp.mapInPandas(kernel, schema)


def write_nsw_index(
    corpus: DataFrame,
    adj_path: str,
    sigs_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    degree: int = NSW_DEGREE,
    nbits: int | None = None,
    bands: int = HYPERPLANE_BANDS,
    seed: str = HYPERPLANE_SEED,
    buckets: int = 32,
) -> None:
    """One-time NSW index build: its OWN signature table (so appends
    never mutate the shared hyperplane_sigs artifact) + the edge
    postings, both id-bucketed; band geometry and graph parameters
    ride in side files (CLAUDE.md: persisted geometry must travel WITH
    the artifact — every reader derives it from there)."""
    n = corpus.count()
    if nbits is None:
        nbits = auto_hyperplane_nbits(n, bands)
    sigs = hyperplane_signatures(
        corpus, id_col, vec_col, dim, nbits, bands, seed
    )
    sigs.repartition(buckets, F.col(id_col)).write.mode(
        "overwrite"
    ).parquet(sigs_path)
    _write_geometry(sigs_path, nbits, bands, seed)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    adj = nsw_build_adjacency(
        corpus,
        id_col,
        vec_col,
        dim,
        degree,
        sigs=spark.read.parquet(sigs_path),
        bands=bands,
    )
    adj.repartition(buckets, F.col("src")).write.mode(
        "overwrite"
    ).parquet(adj_path)
    _write_side_json(
        adj_path.rstrip("/") + "_nsw.json",
        {"degree": degree, "entries": NSW_ENTRIES,
         "beam": auto_nsw_beam(n), "rounds": NSW_ROUNDS},
    )


def nsw_topk_from_index(
    spark,
    adj_path: str,
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Beam search against the PERSISTED edge postings with the
    build's recorded graph parameters (side file — never the
    module defaults, which may drift).  A missing side file is an
    INCOMPLETE artifact and raises (the _read_geometry discipline,
    hardened per ADVICE r8: defaults here would silently search with
    the wrong beam/degree)."""
    sp = adj_path.rstrip("/") + "_nsw.json"
    meta = _read_side_json(sp)
    if meta is None:
        raise FileNotFoundError(
            f"NSW side file missing at {sp}: the persisted index is "
            "incomplete — rebuild it (graph parameters must ride with "
            "the artifact, never module defaults)"
        )
    return nsw_topk(
        corpus,
        probes,
        spark.read.parquet(adj_path),
        id_col,
        vec_col,
        k=k,
        beam=int(meta.get("beam", NSW_BEAM)),
        rounds=int(meta.get("rounds", NSW_ROUNDS)),
        entries=int(meta.get("entries", NSW_ENTRIES)),
        degree=int(meta.get("degree", NSW_DEGREE)),
    )


def nsw_append_to_index(
    spark,
    new: DataFrame,
    adj_path: str,
    sigs_path: str,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> int:
    """Incremental NSW insert: signatures for the NEW batch only (the
    persisted table's geometry), candidates = new-vs-all band-bucket
    equi-join (old signatures read from parquet — old vectors are
    touched only by the candidate id-join), per-new-node top-degree
    'knn' edges appended in BOTH directions (the back-links old nodes
    need to reach new ones; the reader view re-trims old nodes'
    degree), plus a 'ring' anchor to the global min id so a new node
    with empty buckets stays reachable.  Ids already in the signature
    table are skipped (idempotent at-least-once, the
    pq_append_to_index contract).  Returns newly inserted count.

    ``corpus`` need not contain the new batch: edge scoring runs
    against corpus ∪ batch (id-deduped), so a caller passing the OLD
    corpus cannot silently drop every new-node edge (ADVICE r8)."""
    nbits, bands, seed = _read_geometry(sigs_path)
    sp = adj_path.rstrip("/") + "_nsw.json"
    meta = _read_side_json(sp)
    if meta is None:
        raise FileNotFoundError(
            f"NSW side file missing at {sp}: the persisted index is "
            "incomplete — rebuild it (graph parameters must ride with "
            "the artifact, never module defaults)"
        )
    degree = int(meta.get("degree", NSW_DEGREE))
    old_sigs = spark.read.parquet(sigs_path)
    batch = new.join(
        old_sigs.select(F.col(id_col)), id_col, "left_anti"
    ).localCheckpoint(eager=True)
    n_new = batch.count()
    if n_new == 0:
        return 0
    corpus = (
        corpus.select(id_col, vec_col)
        .join(batch.select(id_col), id_col, "left_anti")
        .unionByName(batch.select(id_col, vec_col))
    )
    new_sigs = hyperplane_signatures(
        batch, id_col, vec_col, dim, nbits, bands, seed
    ).localCheckpoint(eager=True)
    nb = _bucket_rows(new_sigs, id_col, bands).withColumnRenamed(
        id_col, "src"
    )
    ab = (
        _bucket_rows(old_sigs, id_col, bands)
        .unionByName(_bucket_rows(new_sigs, id_col, bands))
        .withColumnRenamed(id_col, "dst")
    )
    cand = (
        nb.join(ab, ["blk", "val"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    scored = _nsw_score_edges(cand, corpus, id_col, vec_col)
    w = W.partitionBy("src").orderBy(F.desc("cos"), "dst")
    knn_new = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= degree)
        .drop("rk")
    )
    # Mirror by ONE explode (CLAUDE.md row-variant rule): a unionByName
    # of two selects would consume the scored+windowed subtree twice —
    # ReuseExchange does not dedup differently-projected consumers, so
    # the candidate scoring would run twice.
    edges = knn_new.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("src"),
                    F.col("dst").alias("dst"),
                    F.col("cos").alias("cos"),
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("cos").alias("cos"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.cos", F.lit("knn").alias("kind"))
    anchor_id = corpus.agg(F.min(id_col).alias("m")).first()["m"]
    anchors = _nsw_score_edges(
        batch.select(F.col(id_col).alias("src")).select(
            "src", F.lit(anchor_id).alias("dst")
        ),
        corpus,
        id_col,
        vec_col,
    ).filter(F.col("src") != F.col("dst"))
    anchors = anchors.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("src"),
                    F.col("dst").alias("dst"),
                    F.col("cos").alias("cos"),
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("cos").alias("cos"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.cos", F.lit("ring").alias("kind"))
    edges.unionByName(anchors).write.mode("append").parquet(adj_path)
    new_sigs.write.mode("append").parquet(sigs_path)
    return n_new
