"""Deduplication operators for training-data pipelines, designed for the
100 TB path:

- **exact**: hash-groupBy on a normalized fingerprint. One shuffle on
  the 128-bit digest; no full-text comparisons cross the wire.
- **n-gram Jaccard**: inverted-index self-join on shingles (token ->
  doc postings), partial-agg'd pair counts, exact Jaccard. Shuffles
  scale with postings, not with |docs|² — the classic scalable design.
- **MinHash + LSH**: md5-based minhash signatures computed *inside the
  row* (array_min over transform — no explode, no shuffle), banded into
  buckets, candidate pairs from bucket joins only, then exact-Jaccard
  verification of candidates.
- **SimHash**: 64-bit fingerprint (majority vote over per-token md5
  bits), stored as four 16-bit words. Hamming-distance<=3 search by the
  block-pigeonhole method (Manku et al., WWW'07): any two fingerprints
  within distance d agree exactly on at least one of d+1 blocks, so
  candidates come from a bucket equi-join on (block_idx, block_value)
  — never an all-pairs comparison — and are verified with popcount.

Every construction uses only md5/string/list primitives with identical
semantics in DuckDB, so each stage is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hangarbay_spark.operators.text import fingerprint_expr, shingles_expr

DEFAULT_MINHASH_K = 8
DEFAULT_BANDS = 4  # rows-per-band = K / BANDS = 2


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.

    Returns (fingerprint, keep_id, n_dups): ``keep_id`` is the smallest
    id in the group — the canonical survivor.
    """
    return (
        df.select(F.col(id_col), fingerprint_expr(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized text (the min-id row)."""
    keep = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def shingle_postings(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Exploded (id, shingle) postings — the inverted index.

    Repartitions the documents first: parquet scan parallelism is
    file-split-granular, so a small input (one file) would otherwise
    run the CPU-heavy shingle/hash expressions in a SINGLE task. The
    pre-shuffle is one narrow pass over (id, text) and spreads the
    expensive stage across the cluster; with many input splits (the
    100 TB case) it is still correct, merely redundant.

    Tokens are materialized in their own projection before the gram
    transform — see :func:`~hangarbay_spark.operators.text.
    shingles_from_tokens` for why inlining is ~10x slower.
    """
    from hangarbay_spark.operators.text import shingles_from_tokens, tokens_expr

    return (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        .select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("shingle"),
        )
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_pct: int = 70,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard-threshold pairs via PREFIX FILTERING (Bayardo,
    Ma & Srikant 2007 "Scaling Up All Pairs" / the PPJoin candidate
    principle) — the exact-result counterpart of the banded-LSH
    candidate generators: order the shingle vocabulary rarest-first
    (df asc, shingle asc — ranks from the DISTRIBUTED TeraSort rank,
    operators/ranks.range_rank, so the vocabulary is never sorted
    through one task), keep each doc's first
    m - ceil(t*m) + 1 shingles in that order, and generate candidates
    only from PREFIX-to-PREFIX matches: any pair with J >= t must
    share a prefix shingle, so the pruning is lossless while hot
    common shingles (which explode a full postings self-join) never
    generate a candidate unless they are some doc's rare tail.
    Verification counts intersections candidate-driven (two id-keyed
    posting joins), and the threshold compare is pure integer
    arithmetic (100*inter >= pct*union) — ``threshold_pct`` is an
    integer percent so no float literal can parse differently across
    engines.  Output: (id_a, id_b, inter_sz, union_sz, jaccard@6dp).
    """
    from pyspark.sql.window import Window as W

    from hangarbay_spark.operators.ranks import range_rank

    post = (
        postings
        if postings is not None
        else shingle_postings(df, id_col, text_col, n)
    ).localCheckpoint(eager=True)  # consumers: df, sizes, prefix, verify x2
    dfreq = post.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("__df")
    )
    rnk = range_rank(
        dfreq, [F.col("__df").asc(), F.col("shingle").asc()], 32, out="__rnk"
    ).select("shingle", "__rnk")
    sizes = post.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__m")
    )
    t = int(threshold_pct)
    wd = W.partitionBy(id_col).orderBy("__rnk")
    prefix = (
        post.join(rnk, "shingle")
        .join(sizes, id_col)
        .withColumn("__pos", F.row_number().over(wd))
        .filter(
            F.col("__pos")
            <= F.col("__m") - F.expr(f"({t} * __m + 99) DIV 100") + 1
        )
        .select(F.col(id_col), "shingle", "__pos", "__m")
        # BOTH sides of the candidate self-join consume this frame —
        # without the checkpoint the rank-join + per-doc window chain
        # executes twice (ReuseExchange does not dedup
        # differently-aliased consumers); the frame is prefix-sized
        # (~m - ceil(t*m) + 1 shingles per doc).
        .localCheckpoint()
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"),
        "shingle",
        F.col("__pos").alias("__pa"),
        F.col("__m").alias("__ma"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"),
        "shingle",
        F.col("__pos").alias("__pb"),
        F.col("__m").alias("__mb"),
    )
    # PPJoin candidate pruning (guide §3.5), both filters LOSSLESS at
    # the threshold and in pure integer arithmetic:
    # - length filter: J <= min(ma,mb)/max(ma,mb), so J >= t needs
    #   100*min >= t*max;
    # - positional filter: for a shared shingle at (full-list) rank
    #   positions pa/pb, inter <= 1 + min(ma-pa, mb-pb); the pair's
    #   required overlap is alpha = ceil(t*(ma+mb)/(100+t)) (from
    #   100*inter >= t*(ma+mb-inter)).  The min-rank shared shingle of
    #   a qualifying pair is always a prefix-prefix match and its
    #   bound >= inter >= alpha, so keeping pairs where ANY prefix
    #   match passes drops no true pair — it only cuts the verification
    #   fan-in (the r10-measured 5.8x candidate-to-result ratio).
    alpha = f"({t} * (__ma + __mb) + {100 + t - 1}) DIV {100 + t}"
    cand = (
        pa.join(pb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.expr(f"100 * least(__ma, __mb) >= {t} * greatest(__ma, __mb)")
        )
        .filter(F.expr(f"1 + least(__ma - __pa, __mb - __pb) >= {alpha}"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = post.select(F.col(id_col).alias("id_a"), "shingle")
    fb = post.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(fa, "id_a")
        .join(fb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter_sz"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__m").alias("__ma"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__m").alias("__mb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "union_sz",
            (F.col("__ma") + F.col("__mb") - F.col("inter_sz")).cast(
                "bigint"
            ),
        )
        .filter(F.expr(f"100 * inter_sz >= {t} * union_sz"))
        .select(
            "id_a",
            "id_b",
            "inter_sz",
            "union_sz",
            F.expr(
                "round(CAST(inter_sz AS DOUBLE) / CAST(union_sz AS DOUBLE), 6)"
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    postings: DataFrame | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold.

    Inverted-index join: pairs are generated only for docs sharing at
    least one shingle, intersections come from a count over the join —
    never a |docs|² loop. At scale, hot shingles should be df'd away
    (drop shingles with document frequency > cutoff) — see
    ``prune_frequent``. ``postings`` lets a caller that also runs the
    MinHash pipeline share one (checkpointed) shingle scan.
    """
    post = (
        postings if postings is not None
        else shingle_postings(df, id_col, text_col, n)
    ).alias("p")
    sizes = post.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = post.select(F.col(id_col).alias("id_a"), "shingle")
    b = post.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Directed near-containment pairs: containment(src→dst) =
    |shingles(src) ∩ shingles(dst)| / |shingles(src)| >= threshold.

    The asymmetric complement of :func:`ngram_jaccard_pairs` — a short
    document quoted wholesale inside a long one has high containment
    but low Jaccard, the doc-in-doc duplication shape of web scrapes.
    Same inverted-index join asymptotics: intersections are computed
    ONCE per unordered pair, then both directions are derived by
    dividing by the respective source size (no second postings join).
    The ``prune_frequent`` df-guard applies identically at scale.
    """
    post = shingle_postings(df, id_col, text_col, n)
    sizes = post.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = post.select(F.col(id_col).alias("id_a"), "shingle")
    b = post.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    # Both directions come out of ONE pass via a 2-element explode — a
    # union of two selects would consume the expensive intersection
    # subtree twice (ReuseExchange does not dedup differently-projected
    # consumers; measured 233 s vs ~half at sf1). The threshold is
    # applied INSIDE the array before exploding: most co-occurring
    # pairs fail both directions, so the explode materializes (almost)
    # nothing instead of 2x the full pair set.
    directions = F.array(
        F.struct(
            F.col("id_a").alias("src_id"),
            F.col("id_b").alias("dst_id"),
            (
                F.col("inter").cast("double") / F.col("sz_a").cast("double")
            ).alias("containment"),
        ),
        F.struct(
            F.col("id_b").alias("src_id"),
            F.col("id_a").alias("dst_id"),
            (
                F.col("inter").cast("double") / F.col("sz_b").cast("double")
            ).alias("containment"),
        ),
    )
    kept = F.filter(directions, lambda x: x["containment"] >= F.lit(threshold))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(F.explode(kept).alias("p"))
        .select("p.*")
    )


def prune_frequent(postings: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df`` — the
    skew guard for the inverted-index join at scale (a stopword shingle
    appearing in 10^8 docs would otherwise create a 10^16-row join)."""
    hot = (
        postings.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    return postings.join(F.broadcast(hot), "shingle", "left_anti")


def _seeded_md5(seed: int):
    # Closure factory: a plain `lambda s, i=i:` would present arity 2 to
    # PySpark's lambda inspection and the seed would be shadowed by the
    # array-index argument.
    def fn(s):
        return F.md5(F.concat(F.lit(f"{seed}|"), s))

    return fn


def minhash_signature_cols(text_col: str, k: int = DEFAULT_MINHASH_K) -> list:
    """K minhash values as columns ``mh0..mh{k-1}``, computed without a
    shuffle: min over the shingle array of md5(seed || shingle).

    md5-lexicographic-min is a valid minwise hash family (each seed
    prefix is an independent "permutation"), and md5 is bit-identical
    in DuckDB — the whole signature is oracle-checkable.
    """
    sh = shingles_expr(text_col)
    return [
        F.array_min(F.transform(sh, _seeded_md5(i))).alias(f"mh{i}")
        for i in range(k)
    ]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_MINHASH_K
) -> DataFrame:
    return df.select(F.col(id_col), *minhash_signature_cols(text_col, k))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH band bucket.

    Band hash = md5 over the band's minhash values; bucket join only —
    candidate generation never compares documents pairwise.
    """
    rows_per_band = k // bands
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)
    buckets = banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.concat_ws(":", F.lit(str(b)), F.col(f"band{b}"))
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )
    a = buckets.select(F.col(id_col).alias("id_a"), "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> banded buckets
    -> candidate pairs -> exact-Jaccard verification >= threshold.

    Formulation notes (both learned by measuring, not guessing):

    - **Signatures via explode + groupBy-min**, not per-row array
      transforms: computing K minhashes as nested higher-order
      expressions over the (already large) shingle expression made
      Catalyst inline the shingle construction into every band hash —
      whole-stage codegen ballooned and a 500-doc run took minutes.
      The exploded form hashes each posting K times with tiny
      expressions and aggregates with map-side combine: one shuffle on
      the doc id, and the same plan shape scales to 100 TB.
    - **Verification via array_intersect on candidate pairs only** —
      cost scales with |candidates|, not the full co-occurrence matrix
      (the postings-join in :func:`ngram_jaccard_pairs` computes every
      co-occurring pair; LSH exists precisely to avoid that).
    """
    rows_per_band = k // bands
    post = (
        postings if postings is not None
        else shingle_postings(df, id_col, text_col)
    )
    # one pass: K minhash mins + the shingle set for verification,
    # materialized once — the banded bucket rows feed BOTH self-join
    # sides, and ReuseExchange does not dedup differently-projected
    # consumers, so without this the postings+groupBy runs twice
    sigs = post.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(
                f"mh{i}"
            )
            for i in range(k)
        ],
        F.collect_list("shingle").alias("sh"),
    ).localCheckpoint()
    # Candidate-then-lookup over the CHECKPOINTED sigs (r10): the band
    # explode and bucket self-join carry only (id, bucket) — the
    # shingle arrays never enter the bands-x-|sh| explode or cross the
    # bucket exchange (guide §2.3: project before the exchange; ~4x
    # fewer shuffled array bytes) — and verification re-attaches the
    # arrays by joining the candidate pairs back to sigs twice. The
    # historical hazard of this shape (postings+groupBy recomputed
    # four times — ReuseExchange does not dedup differently-projected
    # consumers) is gone because sigs is an eager localCheckpoint: all
    # three consumers scan the same materialized RDD. The build-once
    # path remains write_minhash_signature_table +
    # minhash_pairs_from_signature_table.
    band_hashes = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ),
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select(
        F.col(id_col), F.explode(band_hashes).alias("bucket")
    )
    a = buckets.select(F.col(id_col).alias("id_a"), "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs = cand.join(
        sigs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")),
        "id_a",
    ).join(
        sigs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn(
            "jaccard", inter.cast("double") / union.cast("double")
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature_frame(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_MINHASH_K
) -> DataFrame:
    """(id, mh0..mh{k-1}, sh) signature rows — the shared build step of
    the persisted table, the incremental path, and the streaming
    ingest."""
    post = shingle_postings(df, id_col, text_col)
    return post.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(
                f"mh{i}"
            )
            for i in range(k)
        ],
        F.collect_list("shingle").alias("sh"),
    )


def write_minhash_signature_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    k: int = DEFAULT_MINHASH_K,
    buckets: int = 32,
) -> None:
    """One-time signature build: (id, mh0..mh{k-1}, sh) persisted to
    parquet, id-bucketed. This is the real-deployment shape the inline
    ``minhash_lsh_dedup_pairs`` docstring promises: text is read ONCE at
    build time; every subsequent LSH run reads small fixed-width
    signature rows, and the banded bucket shuffle carries no shingle
    arrays at all (see :func:`minhash_pairs_from_signature_table`).
    """
    sigs = minhash_signature_frame(df, id_col, text_col, k)
    sigs.repartition(buckets, F.col(id_col)).write.mode("overwrite").parquet(
        path
    )


def minhash_pairs_from_signature_table(
    spark,
    path: str,
    id_col: str,
    threshold: float = 0.8,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Near-dup pairs from a persisted signature table: banded bucket
    join over (id, band-hash) rows ONLY — the shingle sets needed for
    exact-Jaccard verification are fetched per-candidate by joining back
    to the id-keyed signature table, so the wide arrays never ride the
    bucket shuffle (the 100 TB fix for the inline formulation's
    bands x |sh| shuffle weight)."""
    sigs = spark.read.parquet(path)
    cand = lsh_candidate_pairs(sigs, id_col, k, bands)
    sh_a = sigs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sigs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn(
            "jaccard", inter.cast("double") / union.cast("double")
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duplicated_span_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Per-document count of distinct ``n``-gram spans that also appear
    in other documents — the simplified form of substring-level dedup
    (detecting copied passages rather than whole-document near-dups;
    cf. the dedup-common-substrings approach of training-data curation;
    a full span-REMOVAL pass would keep the positions this count
    collapses).

    n-gram postings -> gram document-frequency -> grams occurring in
    >= ``min_df`` docs. All shuffles are postings-scaled (gram digest
    keys); nothing is quadratic in documents. Returns
    (id, n_dup_spans) for documents containing at least one such span.
    """
    from hangarbay_spark.operators.text import shingles_from_tokens, tokens_expr

    post = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        .select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.posexplode(
                shingles_from_tokens(F.col("__toks"), n)
            ).alias("pos", "gram"),
        )
        .select(F.col(id_col), "pos", F.md5("gram").alias("g"))
    )
    dfreq = post.groupBy("g").agg(
        F.countDistinct(id_col).alias("gdf")
    )
    hot = dfreq.filter(F.col("gdf") >= min_df).select("g")
    return (
        post.join(hot, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )


def positional_gram_postings(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, s, g): md5 of EVERY ``n``-gram occurrence with its 0-based
    token start — the positional (non-distinct) counterpart of
    :func:`shingle_postings`, shared by span removal and winnowing.
    Docs shorter than ``n`` tokens contribute no rows. Same
    repartition-to-spread-CPU rationale as ``shingle_postings``."""
    from hangarbay_spark.operators.text import tokens_expr

    toks_src = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        .select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    )
    sz = F.size("__toks")
    gram_arr = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    *[F.element_at(F.col("__toks"), i + j) for j in range(n)],
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_src.select(
        F.col(id_col), F.posexplode(gram_arr).alias("s", "g")
    )


def duplicated_span_removal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """ExactSubstr-style span REMOVAL (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): excise from every
    document the token spans covered by ``n``-grams that occur in
    ``min_df`` or more distinct documents, merging overlapping (and
    contiguous) hit windows into maximal intervals first. The rewrite
    step that :func:`duplicated_span_counts` only detects.

    Returns one row per input document —
    ``(id, n_spans, tokens_removed, tokens_kept, cleaned_text)`` —
    where ``cleaned_text`` is the kept tokens joined by single spaces
    (for an untouched document this equals the whitespace-normalized
    lowercased text) and ``tokens_removed + tokens_kept`` always equals
    the original token count (conservation, tested).

    Scale shape: positional grams are postings (one row per token
    start, exploded); "occurs in >=2 distinct docs" is decided with a
    single window over the gram key via ``min(id) != max(id)`` —
    constant state per gram, no COUNT(DISTINCT) and no gram-frequency
    self-join, so the whole duplicate test is ONE shuffle on the gram
    digest. Interval merging is the classic gaps-and-islands pair of
    windows partitioned by document (one shuffle on the doc key; the
    island and per-doc aggregations reuse that partitioning). The
    splice back into text happens inside a single projection —
    kept-range slices of the staged token array — so no token-level
    join ever materializes. ``min_df > 2`` falls back to a windowed
    distinct-count via the (gram, doc) dedup-then-count shape.
    """
    from pyspark.sql.window import Window as W

    from hangarbay_spark.operators.text import tokens_expr

    toks_src = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        .select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
        .localCheckpoint()  # two consumers: gram stage + splice stage
    )
    sz = F.size("__toks")
    gram_arr = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    *[F.element_at(F.col("__toks"), i + j) for j in range(n)],
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos_grams = toks_src.select(
        F.col(id_col), F.posexplode(gram_arr).alias("s", "g")
    )
    wg = W.partitionBy("g")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if min_df == 1:
        # degenerate semantics: every gram occurrence (df >= 1 always)
        # is a duplicated span — the min!=max fast path below would
        # silently skip single-doc grams, so handle it explicitly
        dup = pos_grams.select(id_col, "s")
    elif min_df == 2:
        # cross-doc iff the gram's occurrences span >1 distinct id:
        # min != max — O(1) window state, no distinct aggregation
        dup = (
            pos_grams.withColumn("__dmin", F.min(id_col).over(wg))
            .withColumn("__dmax", F.max(id_col).over(wg))
            .filter(F.col("__dmin") != F.col("__dmax"))
            .select(id_col, "s")
        )
    else:
        gdf = (
            pos_grams.select("g", id_col)
            .distinct()
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("__gdf"))
            .filter(F.col("__gdf") >= min_df)
            .select("g")
        )
        dup = pos_grams.join(gdf, "g").select(id_col, "s")

    # gaps-and-islands: an interval [s, s+n-1] starts a new island iff
    # it neither overlaps nor touches the running max end so far
    wd_prev = W.partitionBy(id_col).orderBy("s").rowsBetween(
        W.unboundedPreceding, -1
    )
    wd_cum = W.partitionBy(id_col).orderBy("s").rowsBetween(
        W.unboundedPreceding, 0
    )
    iv = dup.select(F.col(id_col), F.col("s"), (F.col("s") + (n - 1)).alias("e"))
    marked = iv.withColumn(
        "__new",
        (
            F.col("s")
            > F.coalesce(F.max("e").over(wd_prev), F.lit(-2)) + 1
        ).cast("int"),
    )
    merged = (
        marked.withColumn("__isl", F.sum("__new").over(wd_cum))
        .groupBy(id_col, "__isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    per_doc = merged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("tokens_removed"),
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__islands"),
    )

    staged = toks_src.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.col("__toks"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("tokens_removed", F.lit(0))
        .cast("bigint")
        .alias("tokens_removed"),
        # staged as a plain column: lambdas below re-evaluate complex
        # argument expressions per element (no CSE inside HOFs)
        F.coalesce(
            "__islands", F.array().cast("array<struct<s:int,e:int>>")
        ).alias("__islands"),
    )
    # complement of the islands = kept ranges; splice is O(n) slices
    starts_kept = F.concat(
        F.array(F.lit(0)),
        F.transform(F.col("__islands"), lambda i: i["e"] + 1),
    )
    ends_kept = F.concat(
        F.transform(F.col("__islands"), lambda i: i["s"] - 1),
        F.array(F.size("__toks") - 1),
    )
    empty = F.array().cast("array<string>")
    cleaned = F.flatten(
        F.zip_with(
            starts_kept,
            ends_kept,
            lambda a, b: F.when(
                b >= a, F.slice("__toks", a + 1, b - a + 1)
            ).otherwise(empty),
        )
    )
    return staged.select(
        F.col(id_col),
        "n_spans",
        "tokens_removed",
        cleaned.alias("__cleaned"),
    ).select(
        F.col(id_col),
        "n_spans",
        "tokens_removed",
        F.size("__cleaned").cast("bigint").alias("tokens_kept"),
        F.array_join("__cleaned", " ").alias("cleaned_text"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every ``k``-gram, slide a
    window of ``w`` consecutive hashes, keep each window's minimum —
    the selected hashes are the document's fingerprints. Guarantee: any
    shared token run of length >= ``k + w - 1`` contributes at least
    one SHARED fingerprint, while storage shrinks ~2/(w+1) of the full
    gram set — the storage/recall dial exact-gram postings lack.

    Relational form: one window pass per doc — ``min(enc)`` over
    ``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`` where ``enc`` is the
    hash with its zero-padded position appended, so the lexicographic
    min IS (min hash, leftmost position) — a deterministic tie-break
    with identical string semantics on both engines. Rows past the last
    full window start are dropped, EXCEPT that a doc with fewer than
    ``w`` grams keeps its position-0 row, whose partial frame spans the
    whole doc — the single-window fallback, so every doc with >= k
    tokens is fingerprinted. Returns distinct (id, fp)."""
    from pyspark.sql.window import Window as W

    post = positional_gram_postings(df, id_col, text_col, k)
    enc = F.concat(
        F.col("g"), F.lit("|"), F.lpad(F.col("s").cast("string"), 8, "0")
    )
    wd = W.partitionBy(id_col)
    wsel = (
        W.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(W.currentRow, w - 1)
    )
    sel = post.select(
        F.col(id_col),
        F.col("s"),
        F.count(F.lit(1)).over(wd).alias("__ng"),
        F.min(enc).over(wsel).alias("__sel"),
    )
    return (
        sel.filter(
            F.col("s") <= F.greatest(F.col("__ng") - w, F.lit(0))
        )
        .select(F.col(id_col), F.substring("__sel", 1, 32).alias("fp"))
        .distinct()
    )


WINNOW_MAX_DF_FLOOR = 1000
WINNOW_MAX_DF_FRAC = 0.005


def _prune_hot_fps(fps: DataFrame, id_col: str, max_df) -> DataFrame:
    """Drop fingerprints whose document frequency exceeds ``max_df`` —
    MOSS's own drop-over-common-fingerprints rule and the skew guard
    :func:`prune_frequent` gives the Jaccard twin (a boilerplate
    fingerprint shared by 10^8 docs would otherwise create a 10^16-row
    self-join). ``max_df=None`` derives the cap from the corpus:
    ``max(1000, ceil(0.005 * n_docs))`` — never binding at test scale
    (corpus max df << 1000), df-bounding at web scale. The cap is
    computed relationally (1-row aggregate broadcast), no driver
    action."""
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__fdf"))
    if max_df is None:
        n_docs = fps.select(
            F.countDistinct(F.col(id_col)).alias("__ndocs")
        )
        # bounded 1-row broadcast (BNLJ-allowlisted pattern)
        hot = dfreq.crossJoin(F.broadcast(n_docs)).filter(
            F.col("__fdf")
            > F.greatest(
                F.lit(WINNOW_MAX_DF_FLOOR),
                F.ceil(F.col("__ndocs") * WINNOW_MAX_DF_FRAC),
            )
        )
    else:
        hot = dfreq.filter(F.col("__fdf") > int(max_df))
    # the hot set is tiny by construction (df above the cap): checkpoint
    # it so BOTH self-join sides broadcast the same materialized frame
    # instead of recomputing the df aggregation per consumer
    hot = hot.select("fp").localCheckpoint()
    return fps.join(F.broadcast(hot), "fp", "left_anti")


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints,
    with the fingerprint-set resemblance |A∩B| / |A∪B| — the MOSS
    ranked-match readout. Inverted-index self-join on the fingerprint
    (postings-scaled, never |docs|^2), identical shape to
    :func:`ngram_jaccard_pairs` but over the winnowed ~2/(w+1)
    subsample of grams. Over-common fingerprints are dropped from the
    join by :func:`_prune_hot_fps` (``max_df``; None derives the cap
    from corpus size) — set sizes in the resemblance denominator stay
    UNPRUNED, so a binding cap can only lower a pair's score, never
    raise it."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w).localCheckpoint()
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    joinable = _prune_hot_fps(fps, id_col, max_df)
    a = joinable.select(F.col(id_col).alias("id_a"), "fp")
    b = joinable.select(F.col(id_col).alias("id_b"), "fp")
    inter = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("resemblance"),
        )
    )


def write_winnow_fingerprint_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    k: int = 5,
    w: int = 4,
    buckets: int = 32,
    max_df: int | None = None,
) -> None:
    """One-time winnowing fingerprint build: distinct (id, fp) rows
    persisted fp-bucketed (searches join on fp, so fingerprint locality
    is the read layout) — the MOSS twin of
    :func:`write_minhash_signature_table`. Geometry (k, w, max_df)
    rides with the artifact the same way band geometry does, so every
    reader prunes hot fingerprints with the SAME cutoff the corpus was
    built to expect (None = corpus-derived default)."""
    from hangarbay_spark.operators.similarity import _write_side_json

    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    fps.repartition(buckets, "fp").write.mode("overwrite").parquet(path)
    _write_side_json(
        path.rstrip("/") + "_geometry.json",
        {"k": k, "w": w, "max_df": max_df},
    )


def _winnow_geometry(path: str) -> tuple[int, int, int | None]:
    from hangarbay_spark.operators.similarity import _read_side_json

    g = _read_side_json(path.rstrip("/") + "_geometry.json")
    if not g:
        return (5, 4, None)
    md = g.get("max_df")
    return (int(g["k"]), int(g["w"]), None if md is None else int(md))


def winnow_pairs_incremental(
    spark,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    fp_path: str,
    min_shared: int = 2,
) -> DataFrame:
    """Fingerprint-sharing pairs involving a NEW batch against an
    existing persisted-fingerprint corpus — the winnowing twin of
    :func:`minhash_pairs_incremental`: old text is never re-tokenized;
    the corpus is touched only through its (id, fp) table, and the
    batch's (k, w, max_df) geometry is DERIVED from the artifact's
    side file so probe and corpus can never fingerprint (or prune)
    differently. Returns new-vs-old and new-vs-new pairs with
    fingerprint-set resemblance (old-vs-old pairs were found at build
    time; id spaces are disjoint across batches by contract). The hot-
    fingerprint cap is applied to the COMBINED (old+new) fingerprint
    frame — df is corpus-wide, matching the batch operator; sizes stay
    unpruned (same rule as :func:`winnow_pairs`)."""
    k, w, max_df = _winnow_geometry(fp_path)
    # single consumer (the union below, itself checkpointed) — no
    # checkpoint here; r7's hot-fp guard moved the probe side from
    # new_fps to the pruned union
    new_fps = winnow_fingerprints(new_df, id_col, text_col, k, w)
    old_fps = spark.read.parquet(fp_path)
    all_fps = old_fps.select(
        F.col(id_col), "fp", F.lit(False).alias("is_new")
    ).unionByName(
        new_fps.select(F.col(id_col), "fp", F.lit(True).alias("is_new"))
    )
    all_fps = all_fps.localCheckpoint()  # consumers: sizes, df-count,
    # probe side, corpus side — one materialized subtree
    sizes = all_fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    all_fps = _prune_hot_fps(all_fps, id_col, max_df)
    a = all_fps.filter("is_new").select(F.col(id_col).alias("id_a"), "fp")
    b = all_fps.select(F.col(id_col).alias("id_b"), "fp", "is_new")
    inter = (
        a.join(b, "fp")
        # new-new pairs counted once (ordered); new-old regardless of
        # order — the minhash_pairs_incremental dedup rule
        .filter((~F.col("is_new")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg((F.count(F.lit(1))).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("resemblance"),
        )
    )


def minhash_pairs_incremental(
    spark,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    sig_path: str,
    threshold: float = 0.8,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Near-dup pairs involving a NEW batch against an existing
    persisted-signature corpus — the incremental-ingest shape: the
    existing corpus is touched only through its signature table (no
    re-shingling of old text, cost scales with |new| + matched buckets,
    not |corpus|). Returns new-vs-old and new-vs-new pairs; old-vs-old
    pairs were found when the corpus was built. Id spaces must be
    disjoint across batches (they are, for snapshot ingest).
    """
    rows_per_band = k // bands
    new_sigs = minhash_signature_frame(
        new_df, id_col, text_col, k
    ).localCheckpoint()
    old_sigs = spark.read.parquet(sig_path)

    def buckets(sigs: DataFrame, is_new: bool) -> DataFrame:
        band_hashes = F.array(
            *[
                F.concat_ws(
                    ":",
                    F.lit(str(b)),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        )
                    ),
                )
                for b in range(bands)
            ]
        )
        return sigs.select(
            F.col(id_col),
            F.explode(band_hashes).alias("bucket"),
            F.lit(is_new).alias("is_new"),
        )
    all_b = buckets(new_sigs, True).unionByName(buckets(old_sigs, False))
    a = buckets(new_sigs, True).select(
        F.col(id_col).alias("id_a"), "bucket"
    )
    b = all_b.select(
        F.col(id_col).alias("id_b"), "bucket", "is_new"
    )
    cand = (
        a.join(b, "bucket")
        # new-new pairs once (ordered); new-old pairs regardless of order
        .filter(
            (~F.col("is_new")) | (F.col("id_a") < F.col("id_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    all_sh = new_sigs.select(F.col(id_col), "sh").unionByName(
        old_sigs.select(F.col(id_col), "sh")
    )
    sh_a = all_sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = all_sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn(
            "jaccard", inter.cast("double") / union.cast("double")
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# Below this many (symmetrized, distinct) edge rows the min-label loop
# is replaced by a single-task union-find kernel over the checkpointed
# edge list: the loop pays O(diameter) rounds of join+checkpoint+probe
# stage latency (~2.3 s for a 348-edge graph at sf0.1 — measured per
# round ~0.45 s on tiny data), while one Arrow task computes the
# identical min-reachable-id labels in one job. The guard is
# row-count-derived (the PIN_NODES/BCAST_EDGES regime-switch
# discipline), so cluster-scale pair graphs keep the distributed loop;
# 1M edges is ~seconds of single-core union-find, well under one loop
# round at that size.
CC_KERNEL_MAX_EDGES = 1_000_000


def _cc_union_find_labels(edges0: DataFrame) -> DataFrame:
    """Single-task exact connected components over a SMALL checkpointed
    symmetrized edge list: (id, cluster) with cluster = min id in the
    component — bit-identical to the min-label loop's fixpoint (both
    are the min reachable id; union-find just reaches it in one pass).
    """
    import pandas as pd

    id_type = edges0.schema["src"].dataType.simpleString()
    out_schema = f"id {id_type}, cluster {id_type}"

    def kernel(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"], pdf["dst"]):
                if s not in parent:
                    parent[s] = s
                if d not in parent:
                    parent[d] = d
                rs, rd = find(s), find(d)
                if rs != rd:
                    parent[rs] = rd
        if not parent:
            yield pd.DataFrame({"id": [], "cluster": []})
            return
        label: dict = {}
        for node in parent:
            r = find(node)
            if r not in label or node < label[r]:
                label[r] = node
        ids = list(parent)
        yield pd.DataFrame(
            {"id": ids, "cluster": [label[find(n)] for n in ids]}
        )

    return edges0.coalesce(1).mapInPandas(kernel, out_schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph: (id, cluster)
    where cluster = the minimum id reachable from ``id``.

    Iterative min-label propagation — the standard large-scale
    formulation (each round: join labels across edges, take the min;
    rounds needed = O(graph diameter), and near-dup graphs are shallow
    clusters, so 3-4 rounds in practice). Each round is one join + one
    groupBy on the id key; ``localCheckpoint`` truncates the lineage so
    plans don't grow exponentially across iterations.
    """
    # Materialize the edge list once: every iteration joins against it
    # (plus the convergence probe), and ``pairs`` is usually an entire
    # LSH pipeline — without this each of the O(diameter) rounds would
    # re-execute candidate generation + verification from scratch. The
    # pipeline runs under the CURRENT (adaptive) planner; the loop
    # below then runs with AQE scoped OFF so the checkpointed frames
    # keep their recorded partitioning (under AQE they report
    # UnknownPartitioning and every round re-shuffles the full edge
    # set — the pagerank() finding): edges pinned on dst, labels on
    # id, so each round's two joins need NO new exchange and the only
    # per-round shuffle is the neighbor-min groupBy on src.
    spark = pairs.sparkSession
    edges0 = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    # Regime switch on EDGE count (see CC_KERNEL_MAX_EDGES): small
    # graphs take the one-job union-find kernel over the checkpoint;
    # counting the materialized RDD is ~free.
    if edges0.count() <= CC_KERNEL_MAX_EDGES:
        return _cc_union_find_labels(edges0)
    from hangarbay_spark.operators.graph import PIN_NODES, loop_partitions

    labels0 = (
        edges0.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
    )
    # Regime switch on NODE count (graph.PIN_NODES): while the label
    # vector broadcasts, adaptive planning wins; beyond that, pin the
    # loop partitioning with AQE off so the checkpointed edge frame's
    # partitioning is reused instead of re-shuffled every round.
    n_nodes = labels0.count()
    pin = n_nodes > PIN_NODES
    prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if pin:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        if pin:
            p = loop_partitions(edges0.count(), spark)
            edges = (
                edges0.repartition(p, "dst")
                .sortWithinPartitions("dst")
                .localCheckpoint()
            )
        else:
            edges = edges0
        labels = labels0.localCheckpoint()
        for _ in range(max_iters):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("cluster").alias("nbr_cluster"))
            )
            # least(old, nbr) differs from old iff nbr < old, so the
            # convergence flag rides the same select — probing it on
            # the checkpointed frame costs a filter+limit over
            # materialized rows, not a second labels join per round.
            updated = (
                labels.join(
                    neighbor_min, labels.id == neighbor_min.src, "left"
                )
                .select(
                    "id",
                    F.least(
                        F.col("cluster"),
                        F.coalesce("nbr_cluster", F.col("cluster")),
                    ).alias("cluster"),
                    F.coalesce(
                        F.col("nbr_cluster") < F.col("cluster"), F.lit(False)
                    ).alias("chg"),
                )
                .localCheckpoint()
            )
            changed = updated.filter(F.col("chg")).limit(1).count()
            labels = updated.drop("chg")
            if changed == 0:
                break
        return labels
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


def near_dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Keep one row per near-dup cluster (the min-id member) plus all
    rows that belong to no cluster — the end-to-end dedup step."""
    comp = connected_components(pairs)
    drop = comp.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


HEX_DIGITS = "0123456789abcdef"

SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4  # 4 blocks of 16 bits: pigeonhole-complete for d<=3
SIMHASH_BLOCK_BITS = SIMHASH_BITS // SIMHASH_BLOCKS


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document as four 16-bit words ``w0..w3``
    (w0 = bits 0-15, low first) plus a display hex string ``simhash``.

    Bit g (0..63) is the majority vote over distinct tokens of bit
    ``g%4`` of md5 hex digit ``g//4`` — each token hashed ONCE, all 64
    vote counters derived from the single digest and carried packed
    (four 16-bit fields per long, see inline comment), then
    groupBy-sum: one shuffle on the doc id with map-side partial
    aggregation over 17 narrow columns. (A pure per-row expression
    with 64 nested higher-order ``aggregate`` calls analyzes/codegens
    pathologically and recomputes md5 64× per token; 64 UNPACKED sum
    columns codegen a pathological first compile.)
    Words stay under 2^16 so no signed-64 overflow games are needed,
    and the (block, value) pair IS the Hamming-search bucket key.
    Primitives (md5, strpos, >>, %) match DuckDB bit-for-bit.
    """
    toks = shingle_postings(df, id_col, text_col, n=1)
    # The 64 per-gram bit-counters ride PACKED, four 16-bit fields per
    # long (16 sum aggregates + a count instead of 64): per-token rows
    # contribute bit<<16f, and summing packed longs adds each field
    # independently as long as no field overflows — sound for up to
    # 65,535 DISTINCT tokens per document (the postings are distinct;
    # beyond that a document is not a document). Majority vote
    # 'sum(±1) > 0' is equivalently '2*count_ones > n_tokens'.
    # Measured: 1.0 s vs 1.7 s warm at sf0.1, and the narrow aggregate
    # fixes the pathological first-compile cost of 64 codegen'd sum
    # columns (5.4 s -> 1.2 s cold).
    # Both 64-term expression families are built as SQL TEXT in one
    # F.expr per column: the Column-by-Column construction made ~900
    # py4j roundtrips and cost ~1.9 s of DRIVER time per call
    # (measured; the CLAUDE.md wide-literal rule) — identical integer
    # expressions either way.
    fields_per_long = 4
    n_longs = SIMHASH_BITS // fields_per_long
    md5_sql = "md5(shingle)"
    packed = []
    for blk in range(n_longs):
        terms = ["CAST(0 AS BIGINT)"]
        for f in range(fields_per_long):
            g = blk * fields_per_long + f
            d = (
                f"(instr('{HEX_DIGITS}', "
                f"substr({md5_sql}, {g // 4 + 1}, 1)) - 1)"
            )
            bit = f"CAST((shiftright({d}, {g % 4}) % 2) AS BIGINT)"
            terms.append(f"shiftleft({bit}, {16 * f})")
        packed.append(F.expr(" + ".join(terms)).alias(f"p{blk}"))
    summed = (
        toks.select(F.col(id_col), *packed)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(f"p{b}").alias(f"s{b}") for b in range(n_longs)],
        )
    )
    words = []
    for j in range(SIMHASH_BLOCKS):
        terms = ["0"]
        for i in range(SIMHASH_BLOCK_BITS):
            g = j * SIMHASH_BLOCK_BITS + i
            cnt = (
                f"(shiftright(s{g // fields_per_long}, "
                f"{16 * (g % fields_per_long)}) % {1 << 16})"
            )
            terms.append(
                f"(CASE WHEN 2 * {cnt} > __n THEN {1 << i} ELSE 0 END)"
            )
        words.append(
            F.expr(f"CAST(({' + '.join(terms)}) AS INT)").alias(f"w{j}")
        )
    out = summed.select(F.col(id_col), *words)
    hex_str = F.lower(
        F.concat(
            *[
                F.lpad(F.hex(F.col(f"w{j}")), 4, "0")
                for j in range(SIMHASH_BLOCKS - 1, -1, -1)
            ]
        )
    )
    return out.withColumn("simhash", hex_str)


def write_simhash_fingerprint_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    buckets: int = 32,
) -> None:
    """One-time SimHash fingerprint build: (id, w0..w3, simhash)
    persisted to parquet, id-bucketed — the SimHash twin of
    :func:`write_minhash_signature_table`. The 64 per-token vote sums
    are the expensive stage (one shuffle over the token postings);
    persisting the 4 16-bit words turns every later Hamming search into
    reads of 5-int rows, text never touched again."""
    fp = simhash_fingerprints(df, id_col, text_col)
    fp.repartition(buckets, F.col(id_col)).write.mode("overwrite").parquet(
        path
    )


def simhash_pairs_from_fingerprints(
    fp: DataFrame, id_col: str, max_hamming: int = 3, checkpoint: bool = True
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within ``max_hamming`` bits, from a
    fingerprint table with word columns ``w0..w3``.

    Block-pigeonhole candidate generation: two 64-bit fingerprints
    within Hamming distance d<=3 must agree exactly on >=1 of the 4
    16-bit blocks, so candidates come from an equi-join on
    (block_idx, block_value) — the same bucketed shape as MinHash-LSH,
    shuffle weight 4 rows x 4 ints per doc (no arrays, no text).
    Verification is popcount over XOR-ed words on candidates only.
    """
    if max_hamming >= SIMHASH_BLOCKS:
        raise ValueError(
            f"block pigeonhole with {SIMHASH_BLOCKS} blocks is complete "
            f"only for max_hamming <= {SIMHASH_BLOCKS - 1}"
        )
    wcols = [f"w{j}" for j in range(SIMHASH_BLOCKS)]
    # The fingerprint subtree (64 vote sums over token postings) has two
    # consumers (join sides a and b); materialize it once — rows are 4
    # small ints + the id, the scale analog of a persisted fingerprint
    # table. A parquet-backed fp (write_simhash_fingerprint_table) is
    # already materialized: pass checkpoint=False and consumers re-read
    # the fixed-width parquet instead of copying it again.
    fp = fp.select(F.col(id_col), *wcols)
    if checkpoint:
        fp = fp.localCheckpoint()
    else:
        # parquet-backed fp: 5 small ints/doc compresses so well that a
        # corpus-scale table scans as ONE input partition (1.3 MB at
        # 500k docs) — and the block join's candidate EXPLOSION then
        # runs single-threaded on duplicate-heavy data. Spread the
        # fixed-width rows first; the shuffle is trivially cheap next
        # to the work it parallelizes (sf1 A/B: 135 s -> see notes).
        fp = fp.repartition(32, F.col(id_col))
    blocks = fp.select(
        F.col(id_col),
        *wcols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("blk"), F.col(f"w{j}").alias("val")
                    )
                    for j in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), *wcols, F.col("bk.blk"), F.col("bk.val"))
    a = blocks.select(F.col(id_col).alias("id_a"), "blk", "val")
    b = blocks.select(F.col(id_col).alias("id_b"), "blk", "val")
    # Dedup candidates as bare id pairs (a pair can share up to 4
    # blocks), then fetch both fingerprints by joining the materialized
    # fp table back — with near-dup-heavy data the candidate multiset is
    # orders of magnitude larger than the doc count, so keeping the
    # distinct() narrow beats carrying 2x4 word columns through it.
    cand = (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = fp.select(
        F.col(id_col).alias("id_a"),
        *[F.col(w).alias(f"{w}_a") for w in wcols],
    )
    fb = fp.select(
        F.col(id_col).alias("id_b"),
        *[F.col(w).alias(f"{w}_b") for w in wcols],
    )
    hamming = sum(
        F.bit_count(
            F.col(f"{w}_a").bitwiseXOR(F.col(f"{w}_b")).cast("bigint")
        )
        for w in wcols
    )
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs_incremental(
    spark,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    fp_path: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming<=d pairs involving a NEW batch against an existing
    persisted-fingerprint corpus — the SimHash twin of
    :func:`minhash_pairs_incremental`: old text is never re-tokenized
    and old vote sums never recompute; the corpus is touched only
    through its 5-int-per-doc fingerprint table. Returns new-vs-old and
    new-vs-new pairs (old-vs-old were found at corpus build). Id spaces
    must be disjoint across batches."""
    if max_hamming >= SIMHASH_BLOCKS:
        raise ValueError(
            f"block pigeonhole with {SIMHASH_BLOCKS} blocks is complete "
            f"only for max_hamming <= {SIMHASH_BLOCKS - 1}"
        )
    wcols = [f"w{j}" for j in range(SIMHASH_BLOCKS)]
    new_fp = (
        simhash_fingerprints(new_df, id_col, text_col)
        .select(F.col(id_col), *wcols)
        .localCheckpoint()  # two consumers: block rows + verify join
    )
    # spread the one-input-partition parquet scan before the block
    # join's candidate explosion (same rule as
    # simhash_pairs_from_fingerprints's checkpoint=False branch)
    old_fp = (
        spark.read.parquet(fp_path)
        .select(F.col(id_col), *wcols)
        .repartition(32, F.col(id_col))
    )

    def blocks(fp: DataFrame, is_new: bool) -> DataFrame:
        return fp.select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("blk"), F.col(f"w{j}").alias("val")
                        )
                        for j in range(SIMHASH_BLOCKS)
                    ]
                )
            ).alias("bk"),
            F.lit(is_new).alias("is_new"),
        ).select(F.col(id_col), F.col("bk.blk"), F.col("bk.val"), "is_new")

    new_b = blocks(new_fp, True)
    all_b = new_b.unionByName(blocks(old_fp, False))
    cand = (
        new_b.select(F.col(id_col).alias("id_a"), "blk", "val")
        .join(
            all_b.select(F.col(id_col).alias("id_b"), "blk", "val", "is_new"),
            ["blk", "val"],
        )
        # new-new pairs once (ordered); new-old pairs regardless of order
        .filter((~F.col("is_new")) | (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
    )
    all_fp = new_fp.unionByName(old_fp)
    fa = all_fp.select(
        F.col(id_col).alias("id_a"),
        *[F.col(w).alias(f"{w}_a") for w in wcols],
    )
    fb = all_fp.select(
        F.col(id_col).alias("id_b"),
        *[F.col(w).alias(f"{w}_b") for w in wcols],
    )
    hamming = sum(
        F.bit_count(
            F.col(f"{w}_a").bitwiseXOR(F.col(f"{w}_b")).cast("bigint")
        )
        for w in wcols
    )
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_hamming_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """End-to-end SimHash near-dup pairs: 64-bit fingerprints ->
    block-bucket candidates -> popcount-verified Hamming <= d."""
    fp = simhash_fingerprints(df, id_col, text_col)
    return simhash_pairs_from_fingerprints(fp, id_col, max_hamming)


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Documents grouped by identical 64-bit simhash — the distance-0
    clusters (token-set-identical docs); ``simhash_hamming_pairs`` is
    the distance<=d generalization."""
    return (
        simhash_fingerprints(df, id_col, text_col)
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def components_incremental(
    old_assign: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Connected-components maintenance under append — the clustering
    member of the incremental-ingest family (MinHash/SimHash/FTS/PQ all
    check a new batch against persisted state; this merges the
    resulting NEW PAIRS into a persisted cluster assignment without
    re-clustering the corpus).

    ``old_assign``: (id, cluster) rows from a previous
    :func:`connected_components` run (cluster = min reachable id, so
    every member id >= its label). ``new_pairs``: pairs involving at
    least one new id (new-vs-old and new-vs-new — the
    :func:`minhash_pairs_incremental` contract).

    Method: CONTRACTION. Each pair endpoint maps to its current label
    (old ids -> their cluster, new/unclustered ids -> themselves);
    min-label components then run on the contracted graph, whose size
    is bounded by the batch's pairs + touched clusters — never the
    corpus. A contracted component's min label equals the merged
    cluster's true min id (old labels are already their clusters'
    minima), so relabeling touched old rows through the label map and
    appending the contracted assignment for genuinely new ids
    reproduces EXACTLY what a full re-cluster over all pairs would
    emit — pinned in test_components_incremental_equals_full_rebuild,
    including the cluster-bridging case (one new doc merging two old
    clusters).

    Returns the updated full assignment (id, cluster). Pure function —
    callers persist it (or not) themselves, so replays are idempotent.
    """
    lbl = old_assign.select(
        F.col("id").alias("_m_id"), F.col("cluster").alias("_m_lbl")
    )
    # contracted edges: label-of(a) -- label-of(b)
    contracted = (
        new_pairs.select(id_a, id_b)
        .join(
            lbl.select(
                F.col("_m_id").alias(id_a), F.col("_m_lbl").alias("_la")
            ),
            id_a,
            "left",
        )
        .join(
            lbl.select(
                F.col("_m_id").alias(id_b), F.col("_m_lbl").alias("_lb")
            ),
            id_b,
            "left",
        )
        .select(
            F.coalesce("_la", F.col(id_a)).alias("id_a"),
            F.coalesce("_lb", F.col(id_b)).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    comp = connected_components(contracted)  # bounded contracted graph
    relabel = comp.select(
        F.col("id").alias("old_label"), F.col("cluster").alias("new_label")
    )
    updated_old = (
        old_assign.join(
            relabel, old_assign["cluster"] == relabel["old_label"], "left"
        )
        .select(
            "id",
            F.coalesce("new_label", "cluster").alias("cluster"),
        )
    )
    fresh = comp.join(old_assign.select("id"), "id", "anti").select(
        "id", "cluster"
    )
    return updated_old.unionByName(fresh)
