"""Full-text search as a token inverted index — the 100 TB-safe
substitute for the reference's SQLite FTS5 virtual table
(/root/reference/pipelines/publish.py:286-304; note FTS5 is dead code
there — every shipped search path LIKE-scans instead, SURVEY.md §2.6 Q5).

Design (SURVEY.md Q5b): ``build_inverted_index`` explodes documents
into (token, id) postings, optionally partitioned/bucketed by token on
write so a query term maps to one partition. ``match_all`` /
``match_any`` resolve query tokens against the postings with semi-join
semantics — per-term postings lookups + an intersection count for AND,
never a full corpus scan. At cluster scale the index is written once
(``save_index``) and each query touches only the partitions of its
terms; the LIKE-scan fallback stays available for parity with the
reference's shipped behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[^a-z0-9]+"


def tokenize_expr(c: Column | str) -> Column:
    """Lowercased alphanumeric tokens, empties removed."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), TOKEN_SPLIT),
        lambda t: t != "",
    )


def tokenize_query(text: str) -> list[str]:
    """Driver-side twin of :func:`tokenize_expr` for query strings."""
    import re

    return [t for t in re.split(TOKEN_SPLIT, text.lower()) if t]


def build_inverted_index(
    df: DataFrame, id_col: str, *text_cols: str
) -> DataFrame:
    """(token, id) postings over one or more text columns, deduplicated.

    One explode + one distinct (shuffle on token+id). Index size is
    O(total tokens) — the same asymptotics as FTS5's trigram-less index.
    """
    tokens = F.array_distinct(
        F.flatten(F.array(*[tokenize_expr(c) for c in text_cols]))
    )
    return (
        df.select(F.col(id_col), F.explode(tokens).alias("token"))
        .distinct()
    )


def build_positional_index(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(token, id, pos) postings — the positional index phrase search
    needs. One posexplode; size is O(total tokens) with positions,
    the same growth factor FTS5's detail=full index pays."""
    return df.select(
        F.col(id_col),
        F.posexplode(tokenize_expr(text_col)).alias("pos", "token"),
    )


def match_phrase(
    index: DataFrame, phrase: str, id_col: str
) -> DataFrame:
    """ids containing the exact token sequence of ``phrase``:
    per-token postings self-joined on (id, consecutive positions) —
    k-1 equi-joins on (id, pos), never a text rescan. Duplicate query
    tokens are fine (each join step uses its own positional offset)."""
    toks = tokenize_query(phrase)
    if not toks:
        return index.select(id_col).limit(0)
    out = (
        index.filter(F.col("token") == toks[0])
        .select(F.col(id_col), F.col("pos").alias("p0"))
    )
    for i, t in enumerate(toks[1:], start=1):
        nxt = index.filter(F.col("token") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("p0")
        )
        out = out.join(nxt, [id_col, "p0"])
    return out.select(id_col).distinct()


def save_index(index: DataFrame, path: str, buckets: int = 64) -> None:
    """Persist the postings partitioned by token hash so a query term
    resolves to one file group (the write-time analog of an index)."""
    (
        index.repartition(buckets, "token")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .parquet(path)
    )


def load_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def match_any(index: DataFrame, terms: list[str], id_col: str) -> DataFrame:
    """ids matching ANY query token (OR) — one pushdown-filtered
    postings scan + distinct."""
    toks = [t for q in terms for t in tokenize_query(q)]
    if not toks:
        return index.select(id_col).limit(0)
    return (
        index.filter(F.col("token").isin(toks)).select(id_col).distinct()
    )


def match_all(index: DataFrame, query: str, id_col: str) -> DataFrame:
    """ids containing ALL tokens of ``query`` (AND): per-token postings,
    then a count-equality check — set intersection without pairwise
    joins, one aggregation shuffle. Query tokens are deduplicated so a
    repeated word (e.g. "new york new") can still satisfy the
    distinct-count equality."""
    toks = list(dict.fromkeys(tokenize_query(query)))
    if not toks:
        return index.select(id_col).limit(0)
    return (
        index.filter(F.col("token").isin(toks))
        .groupBy(id_col)
        .agg(F.countDistinct("token").alias("n_hit"))
        .filter(F.col("n_hit") == len(toks))
        .select(id_col)
    )


def build_tf_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(token, id, tf) postings with term frequency — the ranked-search
    index (FTS5 stores the same per-(term,doc) counts for its bm25()).
    One explode + one groupBy shuffle on (token, id)."""
    return (
        df.select(F.col(id_col), F.explode(tokenize_expr(text_col)).alias("token"))
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def build_doclen(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl) total token count per document — BM25's length
    normalization table, built once alongside the tf postings."""
    return df.select(
        F.col(id_col),
        F.size(tokenize_expr(text_col)).cast("bigint").alias("dl"),
    )


# BM25 per-term score over columns (tf BIGINT, dl BIGINT, df DOUBLE,
# nd DOUBLE, sdl DOUBLE): Lucene-style positive idf, k1=1.2, b=0.75.
# This exact text is compiled by BOTH Spark (F.expr) and the DuckDB
# oracle so every IEEE op runs in the same order; the transcendental
# ln() and the final product are rounded at 6 dp (cross-engine libm /
# FMA-contraction guard — same convention as text_lm_surprisal).
BM25_TERM_SCORE = (
    "round(round(ln(1.0 + (nd - df + 0.5) / (df + 0.5)), 6)"
    " * (CAST(tf AS DOUBLE) * 2.2)"
    " / (CAST(tf AS DOUBLE)"
    "    + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd))), 6)"
)


def bm25_topk(
    tf_index: DataFrame,
    doclen: DataFrame,
    query: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """BM25-ranked top-k docs for ``query`` — the FTS5 ``ORDER BY rank``
    analog, entirely index-driven: per-term postings resolve via
    pushdown on the token-bucketed tf parquet (never a corpus scan),
    document frequencies come from those same filtered postings, the
    two corpus scalars (doc count, total length) are one tiny aggregate
    of the doclen table broadcast to every scored row, and per-doc
    scores sum exactly in DECIMAL before the top-k window."""
    from pyspark.sql.window import Window

    toks = list(dict.fromkeys(tokenize_query(query)))
    if not toks:
        return tf_index.select(id_col).limit(0)
    t = tf_index.filter(F.col("token").isin(toks))
    df_ = t.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum("dl").cast("double").alias("sdl"),
    )
    scored = (
        t.join(doclen, id_col)
        .join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("s", F.expr(BM25_TERM_SCORE))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum(F.col("s").cast("decimal(20,6)")).cast("double").alias("bm25")
    )
    # Distributed top-k (TakeOrderedAndProject) first; the rank window
    # then runs over only k rows — a global row_number over ALL matched
    # docs would funnel them through one task.
    top = per_doc.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return top.withColumn("rk", F.row_number().over(w).cast("bigint"))


def search(
    df: DataFrame,
    index: DataFrame,
    id_col: str,
    query: str,
    mode: str = "all",
) -> DataFrame:
    """Resolve a text query to full rows: index match -> semi-join back
    to the source table (the join key is the pushdown-friendly id)."""
    ids = (
        match_all(index, query, id_col)
        if mode == "all"
        else match_any(index, [query], id_col)
    )
    return df.join(ids, id_col, "left_semi")


def append_to_index(
    new_docs: DataFrame,
    path: str,
    id_col: str,
    *text_cols: str,
    buckets: int = 64,
    guard_existing: bool = True,
) -> int:
    """Incremental index maintenance: tokenize ONLY the new batch and
    append its postings to the persisted index — the FTS analog of
    ``dedup.minhash_pairs_incremental``'s build-once contract (old
    documents are never re-tokenized; ingest cost scales with the
    batch). ``guard_existing`` anti-joins the batch against the ids
    already indexed, making re-ingest of the same batch a no-op —
    idempotent at-least-once ingest. The ingested-id set is tracked in
    a per-append id MANIFEST (``<path>_ids``) independent of the
    postings: a document whose text tokenizes to zero tokens produces
    no postings rows but is still recorded as ingested, so it is not
    re-counted as 'new' on every re-ingest (postings ids from
    manifest-less pre-existing indexes are unioned in for backward
    compatibility). A not-yet-created index path is treated as an
    empty index rather than an error. Appended files use the same
    token repartition + within-partition sort as ``save_index``, so
    term locality and the reader layout are preserved across appends
    (periodic ``hangar compact`` merges small appended files). Returns
    the number of new documents ingested."""
    from pyspark.errors import AnalysisException

    spark = new_docs.sparkSession
    ids_path = path.rstrip("/") + "_ids"
    batch = new_docs
    if guard_existing:
        existing = None
        try:
            existing = load_index(spark, path).select(F.col(id_col))
        except AnalysisException:
            pass  # no index yet -> nothing indexed
        try:
            manifest = spark.read.parquet(ids_path).select(F.col(id_col))
            existing = (
                manifest
                if existing is None
                else existing.unionByName(manifest)
            )
        except AnalysisException:
            pass
        if existing is not None:
            batch = batch.join(existing.distinct(), id_col, "left_anti")
    batch = batch.localCheckpoint(eager=True)
    n_new = batch.count()
    if n_new == 0:
        return 0
    postings = build_inverted_index(batch, id_col, *text_cols)
    (
        postings.repartition(buckets, "token")
        .sortWithinPartitions("token")
        .write.mode("append")
        .parquet(path)
    )
    batch.select(F.col(id_col)).write.mode("append").parquet(ids_path)
    return n_new


def index_data_file_count(spark: SparkSession, path: str) -> int:
    """Number of parquet data files under ``path`` (Hadoop FS listing —
    any supported scheme; driver-side metadata only). 0 when the path
    does not exist yet."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return 0
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            n += 1
    return n


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jvm


def _swap_in(spark: SparkSession, tmp: str, dst: str) -> None:
    """Replace directory ``dst`` with the COMPLETE directory ``tmp``
    via two renames (dst -> dst__old, tmp -> dst, delete dst__old).
    Never a state where the data exists only in executor memory: every
    crash point leaves at least one complete on-disk copy that
    :func:`_recover_swap` puts back in place."""
    fs, jvm = _hadoop_fs(spark, dst)
    p_dst = jvm.org.apache.hadoop.fs.Path(dst)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_old = jvm.org.apache.hadoop.fs.Path(dst + "__old")
    fs.delete(p_old, True)
    # Hadoop FS rename signals failure by RETURN VALUE, not exception —
    # a swallowed false would discard the fold silently (and the next
    # compaction's recovery would then delete the complete tmp copy)
    if fs.exists(p_dst) and not fs.rename(p_dst, p_old):
        raise IOError(f"rename {dst} -> {dst}__old failed")
    if not fs.rename(p_tmp, p_dst):
        raise IOError(f"rename {tmp} -> {dst} failed")
    fs.delete(p_old, True)


def _recover_swap(spark: SparkSession, dst: str) -> None:
    """Finish an interrupted :func:`_swap_in`: if ``dst`` is missing,
    prefer the complete (``_SUCCESS``-marked) new copy at
    ``dst__compact_tmp``, else fall back to ``dst__old``; then clear
    leftovers so a fresh compaction starts clean."""
    fs, jvm = _hadoop_fs(spark, dst)
    P = jvm.org.apache.hadoop.fs.Path
    p_dst, p_tmp, p_old = P(dst), P(dst + "__compact_tmp"), P(dst + "__old")
    if not fs.exists(p_dst):
        if fs.exists(p_tmp) and fs.exists(P(dst + "__compact_tmp/_SUCCESS")):
            if not fs.rename(p_tmp, p_dst):
                raise IOError(f"recovery rename {dst}__compact_tmp failed")
        elif fs.exists(p_old):
            if not fs.rename(p_old, p_dst):
                raise IOError(f"recovery rename {dst}__old failed")
    fs.delete(p_tmp, True)
    fs.delete(p_old, True)


def compact_index(
    spark: SparkSession,
    path: str,
    id_col: str,
    buckets: int = 64,
    max_file_ratio: float = 2.0,
    force: bool = False,
) -> bool:
    """Fold appended postings generations back into ONE
    ``save_index``-layout generation — the LSM compaction step of the
    durable FTS index.

    Every :func:`append_to_index` leaves its own token-bucketed file
    generation, so after g appends a term's postings are spread over g
    files and the directory holds ~g * buckets small files; at scale
    the per-file open overhead and lost within-partition token sort
    dominate term-lookup cost. Compaction rewrites the postings into a
    single generation (token repartition + within-partition sort — the
    exact ``save_index`` layout) and folds the append-id manifest to
    one distinct generation.

    Triggered only once the directory exceeds ``max_file_ratio *
    buckets`` data files (or ``force``), so calling it after every
    batch is cheap — the size-ratio gate IS the LSM policy. Idempotent:
    a second call right after one compaction is a no-op (file count is
    back at ~buckets), and re-compacting anyway yields an identical
    index (pure re-layout, row set untouched). Returns True when a
    rewrite ran.

    Crash note (ADVICE r6): the rewrite is write-new-then-swap — the
    folded postings and manifest land COMPLETE in ``__compact_tmp``
    siblings before two renames swap each into place, so no crash
    point (or executor loss) can leave the only copy of the data in
    checkpoint blocks; :func:`_recover_swap` (run at the top of every
    compaction) finishes an interrupted swap from whichever complete
    on-disk copy survives. On a transactional table format the same
    operation is a metadata-only OPTIMIZE."""
    from pyspark.errors import AnalysisException

    ids_path = path.rstrip("/") + "_ids"
    _recover_swap(spark, path.rstrip("/"))
    _recover_swap(spark, ids_path)
    n_files = index_data_file_count(spark, path)
    if not force and n_files <= max_file_ratio * buckets:
        return False
    if n_files == 0:
        return False
    tmp_idx = path.rstrip("/") + "__compact_tmp"
    # distinct: self-heals the one at-least-once artifact — a crash
    # between a generation's postings append and its id-manifest append
    # makes the replay re-append those docs' (token, id) rows. Readers
    # already tolerate the duplicates (match_* dedup at read); the fold
    # removes them. No legitimate duplicates exist (build dedups).
    save_index(load_index(spark, path).distinct(), tmp_idx, buckets)
    tmp_ids = None
    try:
        ids = spark.read.parquet(ids_path).select(F.col(id_col)).distinct()
        tmp_ids = ids_path + "__compact_tmp"
        ids.coalesce(1).write.mode("overwrite").parquet(tmp_ids)
    except AnalysisException:
        pass  # no manifest (pre-manifest index): postings only
    _swap_in(spark, tmp_idx, path.rstrip("/"))
    if tmp_ids is not None:
        _swap_in(spark, tmp_ids, ids_path)
    return True


def proximity_topk(
    index: DataFrame,
    term_a: str,
    term_b: str,
    id_col: str,
    k: int = 15,
) -> DataFrame:
    """Term-proximity ranked retrieval: documents containing BOTH terms
    ranked by the minimal token gap between any occurrence pair — the
    'near' operator of classic IR engines, resolved entirely from the
    positional postings (two pushdown-filtered index scans, a per-doc
    pair join bounded by the terms' in-doc frequencies, never a text
    rescan). Returns (id, min_gap, n_pairs) for the k closest docs,
    ties broken by id; gaps are exact integers so ranking is
    engine-independent."""
    a = index.filter(F.col("token") == term_a).select(
        F.col(id_col), F.col("pos").alias("pa")
    )
    b = index.filter(F.col("token") == term_b).select(
        F.col(id_col), F.col("pos").alias("pb")
    )
    g = (
        a.join(b, id_col)
        .groupBy(id_col)
        .agg(
            F.min(F.abs(F.col("pa") - F.col("pb")))
            .cast("bigint")
            .alias("min_gap"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    return g.orderBy("min_gap", id_col).limit(k)
