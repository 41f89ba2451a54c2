"""Trained quality classifier machinery: distributed fixed-round
logistic regression over hashed token features (the DCLM/FineWeb-style
LEARNED corpus filter), shared by the declared queries
(queries/llmops.py), the durable model artifact
(pipelines/indexes.ensure_quality_model) and the streaming admission
maintenance (streaming/classifier_admission.py).

Design (the _o_unigram_train unrolled-EM discipline): everything
cross-engine-summed is an EXACT INTEGER in micro units (the
DECIMAL(38,0) moment rule) — features x = tf*1e6 DIV m, labels
y in {0, 1e6}, weights in micro units updated by integer-division
steps (sign/abs keeps Spark DIV == DuckDB // on the non-negative
operand). The only float op per round is the sigmoid — ONE shared
all-DOUBLE formula text rounded to integral micro-p (the ln/BM25
transcendental guard). Weights are feature-dim-bounded (34 rows — the
contract-bounded driver-scalar rule), so each GD round is ONE
map-side-combined corpus pass: per-doc z agg + per-bucket gradient
agg, never a driver-side feature matrix. Integer-overflow headroom:
|G| <= n*1e12, so the lr*|G| step term stays inside BIGINT through
n ~ 1e6 docs per training shard (gradients are sums — shards merge
exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.operators import text as X

QC_B = 32          # hashed token-feature buckets
QC_BIAS = 32       # bias feature id
QC_LENF = 33       # saturated-length feature id
QC_LR = 6          # integer learning-rate numerator
QC_ROUNDS = 6      # fixed full-batch GD rounds
QC_THR = 550000    # micro quality-gate threshold (0.55)

# sigmoid in micro units — shared formula text on both engines
QC_P = (
    "CAST(ROUND(CAST(1000000 AS DOUBLE) / (CAST(1 AS DOUBLE) + "
    "EXP(-(CAST({z} AS DOUBLE) / CAST(1000000000000 AS DOUBLE)))), 0) "
    "AS BIGINT)"
)


def qc_features(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(feats, labels): feats = (doc_id, bucket, x) integer micro-tf
    features (hashed buckets + bias + saturated length), labels =
    (doc_id, y) with y in {0, 1000000}.  Both localCheckpointed — the
    GD loop consumes them once per round (multi-consumer invariant).

    Repartitions first: the tokenizer + quality-score expressions are
    the CPU-heavy stage, and a small corpus parquet scans as ONE input
    split (the CLAUDE.md single-split rule) — without the spread the
    whole feature build runs single-threaded."""
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    tk = docs.select(
        "doc_id",
        X.tokens_expr("text").alias("t"),
        F.when(
            X.quality_score_expr("text") >= F.lit(0.55),
            F.lit(1000000),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("y"),
    ).localCheckpoint()
    tf = (
        tk.select("doc_id", F.size("t").alias("m"), F.explode("t").alias("tok"))
        .withColumn(
            "bucket",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) "
                f"% {QC_B}"
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(
            F.expr(
                "(COUNT(*) * CAST(1000000 AS BIGINT)) DIV MIN(m)"
            ).alias("x")
        )
    )
    feats = (
        tf.unionByName(
            tk.select(
                "doc_id",
                F.lit(QC_BIAS).cast("bigint").alias("bucket"),
                F.lit(1000000).cast("bigint").alias("x"),
            )
        )
        .unionByName(
            tk.select(
                "doc_id",
                F.lit(QC_LENF).cast("bigint").alias("bucket"),
                F.expr(
                    "CAST(LEAST(size(t), 100) * 10000 AS BIGINT)"
                ).alias("x"),
            )
        )
        .localCheckpoint()
    )
    return feats, tk.select("doc_id", "y").localCheckpoint()


def qc_train(feats: DataFrame, labels: DataFrame, n: int) -> dict[int, int]:
    """Fixed-round full-batch GD; returns the final micro-weight per
    feature id.  Weights live driver-side (34 values, contract-bounded)
    as exact Python ints — the update is the SAME integer formula the
    oracle runs (`sign(G) * (lr*|G|) // (n*1e6)`, floor == truncate on
    the non-negative operand)."""
    spark = feats.sparkSession
    w = {b: 0 for b in range(QC_B + 2)}
    for _ in range(QC_ROUNDS):
        wdf = spark.createDataFrame(
            [(b, wv) for b, wv in w.items()], "bucket bigint, w bigint"
        )
        z = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy("doc_id")
            .agg(
                F.expr(
                    "CAST(SUM(CAST(w * x AS DECIMAL(38,0))) AS BIGINT)"
                ).alias("z")
            )
        )
        p = z.select("doc_id", F.expr(QC_P.format(z="z")).alias("p"))
        grad = (
            feats.join(p.join(labels, "doc_id"), "doc_id")
            .groupBy("bucket")
            .agg(
                F.expr(
                    "CAST(SUM(CAST((p - y) * x AS DECIMAL(38,0))) AS BIGINT)"
                ).alias("g")
            )
        )
        for row in grad.collect():  # bounded: <= 34 feature cells
            gv = row["g"]
            b = int(row["bucket"])
            step = (1 if gv >= 0 else -1) * (
                (QC_LR * abs(gv)) // (n * 1000000)
            )
            w[b] = w[b] - step
    return w


def weights_df(spark: SparkSession, w: dict[int, int]) -> DataFrame:
    """The 34-row broadcastable model frame."""
    return spark.createDataFrame(
        sorted(w.items()), "bucket bigint, w bigint"
    )


def score_docs(docs: DataFrame, wdf: DataFrame) -> DataFrame:
    """(doc_id, p): micro-probability per document under a trained
    model — features rebuilt from text, one broadcast 34-row model
    join, one map-side-combined per-doc aggregate. The corpus-scale
    apply path (and the per-micro-batch path of the streaming
    admission maintenance)."""
    feats, _labels = qc_features(docs)
    z = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(SUM(CAST(w * x AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("z")
        )
    )
    return z.select("doc_id", F.expr(QC_P.format(z="z")).alias("p"))
