"""Declared queries for the FTS inverted index, multimodal columns, and
the Structured Streaming surface.

The FTS queries exercise the 100 TB-safe substitute for the reference's
SQLite FTS5 index (/root/reference/pipelines/publish.py:286-304) — see
``operators/fts.py``. The multimodal query runs the real mapInPandas
plumbing with text-bytes payloads so even the Pandas-UDF path is
oracle-checked (sha256/byte-length are SQL-expressible; the fake
feature vector is covered by unit tests instead). The streaming query
is genuinely non-SQL-expressible -> rows-only check.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.operators import fts
from hangarbay_spark.operators import multimodal as M
from hangarbay_spark.pipelines import indexes
from hangarbay_spark.queries.base import load_events, load_table, register

O_TOKENS_FTS = r"str_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+')"


def persisted_fts_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token-bucketed on-disk postings index for ``sf_dir`` —
    durable under ``$HANGARBAY_INDEX_DIR`` (publish-time build,
    ``pipelines.indexes.publish_corpus_indexes``), else built once per
    process into a tempdir. Queries against the returned DataFrame scan
    ONLY the index parquet — the documents table is touched once at
    build time, never at query time."""
    return indexes.ensure_fts(spark, sf_dir)


@register(
    "fts_match_all",
    f"""
    SELECT doc_id FROM documents
    WHERE len(list_distinct(list_filter({O_TOKENS_FTS},
          t -> t IN ('spark', 'data')))) = 2
    """,
    "inverted-index AND search against the PERSISTED index: postings "
    "lookup for each term + count-equality intersection; the documents "
    "table is scanned once at index-build time, never at query time",
    "Q5 (FTS substitute), Q2",
)
def fts_match_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = persisted_fts_index(spark, sf_dir)
    return fts.match_all(idx, "spark data", "doc_id").select("doc_id")


@register(
    "fts_match_any",
    f"""
    SELECT doc_id FROM documents
    WHERE len(list_filter({O_TOKENS_FTS},
          t -> t IN ('vector', 'stream'))) >= 1
    """,
    "inverted-index OR search against the persisted index (one "
    "pushdown-filtered postings scan, no corpus scan)",
    "Q5 (FTS substitute), Q3",
)
def fts_match_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = persisted_fts_index(spark, sf_dir)
    return fts.match_any(idx, ["vector stream"], "doc_id").select("doc_id")


def persisted_positional_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once (token, id, pos) positional index — the phrase-search
    counterpart of :func:`persisted_fts_index`, same durable root."""
    return indexes.ensure_fts_pos(spark, sf_dir)


@register(
    "fts_match_phrase",
    f"""
    SELECT doc_id FROM documents
    WHERE ' ' || array_to_string(
            list_filter({O_TOKENS_FTS}, t -> t != ''), ' ') || ' '
          LIKE '% table hash %'
    """,
    "positional-index phrase search: per-token postings self-joined on "
    "(id, consecutive position) — FTS5 detail=full semantics without a "
    "text rescan; oracle is the LIKE over the space-joined token "
    "string, which is the same predicate",
    "Q5 (FTS substitute: phrase search)",
)
def fts_match_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = persisted_positional_index(spark, sf_dir)
    return fts.match_phrase(idx, "table hash", "doc_id").select("doc_id")


BM25_TERMS = ("spark", "hash", "window")


@register(
    "fts_bm25_topk",
    f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter({O_TOKENS_FTS}, t -> t != '') AS ts
      FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(len(ts)) AS DOUBLE) AS sdl
      FROM tok),
    q AS (SELECT unnest({list(BM25_TERMS)}) AS term),
    tf_rows AS (
      SELECT t.doc_id, q.term,
             CAST(len(list_filter(t.ts, x -> x = q.term)) AS BIGINT) AS tf,
             CAST(len(t.ts) AS BIGINT) AS dl
      FROM tok t CROSS JOIN q
      WHERE len(list_filter(t.ts, x -> x = q.term)) > 0),
    dfreq AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
      FROM tf_rows GROUP BY term),
    scored AS (
      SELECT tf_rows.doc_id, {fts.BM25_TERM_SCORE} AS s
      FROM tf_rows JOIN dfreq USING (term) CROSS JOIN stats),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(CAST(s AS DECIMAL(20,6))) AS DOUBLE) AS bm25
      FROM scored GROUP BY doc_id)
    SELECT doc_id, bm25, rk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rk
      FROM per_doc) t
    WHERE rk <= 20
    """,
    "BM25-ranked search (the FTS5 `ORDER BY rank` analog the boolean "
    "match_* queries lacked): per-term tf postings resolve by pushdown "
    "on the PERSISTED token-bucketed tf index, document frequencies "
    "come from those filtered postings, corpus scalars (doc count, "
    "total length) broadcast from the build-once doclen table, and the "
    "identical score-formula text compiles on both engines (ln and "
    "final product 6dp-rounded, per-doc sum decimal-exact) — no corpus "
    "scan at query time",
    "Q5 (FTS substitute: ranked retrieval)",
)
def fts_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tfi = indexes.ensure_fts_tf(spark, sf_dir)
    dls = indexes.ensure_fts_doclen(spark, sf_dir)
    return fts.bm25_topk(
        tfi, dls, " ".join(BM25_TERMS), "doc_id", k=20
    ).select("doc_id", "bm25", "rk")


@register(
    "multimodal_text_features",
    """
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
    "multimodal feature extraction through the real Arrow/mapInPandas "
    "path: documents' text bytes as binary payloads -> per-item "
    "byte-length + sha256 (the stub-decoded feature vector is unit-"
    "tested; this query proves the distributed plumbing end-to-end)",
    "multimodal extension (binary columns + Pandas-UDF kernel)",
)
def multimodal_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return M.extract_features(media).select("media_id", "n_bytes", "sha256")


FRAME_EVERY_MS = 250


@register(
    "multimodal_frame_fanout",
    f"""
    WITH m AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id,
             octet_length(encode(text)) AS plen,
             greatest(1, n_chars // {FRAME_EVERY_MS}) AS nf
      FROM documents),
    f AS (
      SELECT media_id, plen, nf,
             greatest(1, plen // nf) AS step,
             unnest(generate_series(0, nf - 1)) AS frame_idx
      FROM m)
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(greatest(0, least(plen, (frame_idx + 1) * step)
                            - frame_idx * step) AS BIGINT) AS n_bytes
    FROM f
    """,
    "multimodal FAN-OUT through the real mapInPandas generator "
    "(variable rows per input — the contract a PyAV frame extractor "
    "drops into): documents' bytes as fake video payloads, one row per "
    "sampled frame; the oracle reproduces the slice arithmetic with "
    "generate_series, so the Arrow-batched kernel's shape is "
    "hash-checked, not just unit-tested",
    "multimodal extension (mapInPandas fan-out)",
)
def multimodal_frame_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("video/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.col("n_chars").cast("long").alias("duration_ms"),
    )
    frames = M.sample_frames(media, every_ms=FRAME_EVERY_MS)
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame_payload").cast("bigint").alias("n_bytes"),
    )


@register(
    "streaming_hourly_rollup",
    """
    SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "Structured Streaming hourly rollup drained with availableNow over "
    "a file source (events re-staged to a directory), complete output "
    "mode — promoted to a FULL oracle in r7 (was rows-only): with the "
    "whole source drained the watermarked tumbling windows equal the "
    "batch GROUP BY hour exactly (events_tumbling_hourly's own oracle "
    "shape), so the streaming result is hash-compared; the stream== "
    "batch equality stays pinned in tests/test_streaming.py",
    "streaming §2.7 extension (oracle-verified)",
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.streaming import events as SE

    stage_dir = tempfile.mkdtemp(prefix="hb_stream_")
    load_events(spark, sf_dir).write.mode("overwrite").parquet(stage_dir)
    stream = SE.read_events_stream(spark, stage_dir, max_files_per_trigger=8)
    name = "q_streaming_hourly_rollup"
    return SE.run_to_memory(SE.hourly_rollup(stream), name, spark)


_DEDUP_INGEST_DIRS: dict[str, str] = {}


def _o_streaming_dedup_admission() -> str:
    """DuckDB twin of the streaming greedy admission (VERDICT r6 task
    #2 — promoted from rows-only): the pair relation is the SAME
    verified-MinHash-pair SQL every batch dedup oracle uses (band-
    bucket candidacy is a property of the two docs alone, so the
    incremental candidate sets equal the full-corpus pair set
    restricted to each stage), and the four micro-batch admission
    stages unroll exactly: batch b admits a doc iff it pairs with NO
    already-admitted doc from earlier batches and NO smaller-id doc of
    its own batch (the in-batch rule rejects against smaller ids
    regardless of their own fate — ingest_batch's greatest() rule)."""
    from hangarbay_spark.queries.llmops import _o_minhash_parts

    ctes, select = _o_minhash_parts()
    stages = []
    for b in range(4):
        cross = ""
        if b:
            prev = " UNION ALL ".join(
                f"SELECT doc_id FROM adm{j}" for j in range(b)
            )
            cross = (
                f"AND NOT EXISTS (SELECT 1 FROM e WHERE e.x = dd.doc_id"
                f" AND e.y IN ({prev}))"
            )
        stages.append(f"""
    adm{b} AS (
      SELECT dd.doc_id FROM d dd WHERE dd.bi = {b}
      {cross}
      AND NOT EXISTS (SELECT 1 FROM e JOIN d d2 ON e.y = d2.doc_id
                      WHERE e.x = dd.doc_id AND d2.bi = {b}
                        AND d2.doc_id < dd.doc_id))""")
    admitted = " UNION ALL ".join(
        f"SELECT doc_id FROM adm{b}" for b in range(4)
    )
    return f"""
    WITH {ctes},
    pairs AS ({select}),
    e AS (SELECT id_a AS x, id_b AS y FROM pairs
          UNION ALL SELECT id_b AS x, id_a AS y FROM pairs),
    d AS (SELECT doc_id, doc_id % 4 AS bi FROM documents),
    {",".join(stages)},
    admitted AS ({admitted})
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_admitted
    FROM documents JOIN admitted USING (doc_id)
    GROUP BY source
    """


@register(
    "streaming_dedup_ingest",
    _o_streaming_dedup_admission(),
    "streaming near-dup-rejecting ingest with a FULL oracle (was "
    "rows-only through round 6): documents staged as 4 deterministic "
    "micro-batch files, drained with availableNow through "
    "foreachBatch; each batch is MinHash-checked against the persisted "
    "signature table of everything admitted so far (old text never "
    "re-shingled) and survivors append rows + signatures. The DuckDB "
    "oracle unrolls the four admission stages over the same verified-"
    "pair relation, so the admitted per-source counts are hash-"
    "compared; greedy admission semantics + exactly-once replay stay "
    "pinned in tests/test_streaming.py::test_streaming_dedup_ingest",
    "streaming §2.7 extension (ingest-time dedup, oracle-verified)",
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.streaming import dedup_ingest as DI

    docs = load_table(spark, sf_dir, "documents")
    key = f"{sf_dir}|dedup_ingest"
    dirs = _DEDUP_INGEST_DIRS.get(key)
    if dirs is None:
        from hangarbay_spark.queries.base import stage_micro_batches

        # 4 deterministic micro-batches: batch order — and thus greedy
        # admission — must be reproducible for the unrolled oracle
        stage = stage_micro_batches(
            docs, F.col("doc_id") % 4, 4, "hb_ingest_src_"
        )
        corpus_dir = tempfile.mkdtemp(prefix="hb_ingest_corpus_")
        ckpt = tempfile.mkdtemp(prefix="hb_ingest_ckpt_")
        _DEDUP_INGEST_DIRS[key] = f"{stage}|{corpus_dir}|{ckpt}"
    stage, corpus_dir, ckpt = _DEDUP_INGEST_DIRS[key].split("|")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stage}/*")
    )
    q = DI.dedup_ingest_stream(stream, corpus_dir, checkpoint_dir=ckpt)
    q.awaitTermination()
    # replays of already-applied batches no-op (exactly-once), so
    # repeat executions return the identical admitted corpus
    return (
        DI.read_admitted(spark, corpus_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_admitted"))
    )


_FTS_STREAM_DIRS: dict[str, tuple[str, str, str]] = {}


def _register_streaming_fts_bm25() -> None:
    """Registered via a setter so the oracle can be COMPOSED from the
    batch BM25 query's own SQL (the search_hybrid_rrf precedent): the
    streamed-and-compacted index must serve byte-identical BM25
    results to a batch build, so the one-shot batch oracle IS the
    streaming oracle."""
    from hangarbay_spark.queries.base import REGISTRY as _R

    @register(
        "streaming_fts_bm25",
        _R["fts_bm25_topk"].oracle,
        "streaming FTS maintenance promoted to a FULL oracle (VERDICT "
        "r6 task #2, the streaming_span_screening pattern): documents "
        "drained as 4 micro-batches through the FTS LSM sink — boolean "
        "postings appended + size-ratio compacted, tf and doclen "
        "landed as crash-safe per-batch OVERWRITE generations with "
        "merge-then-GC compaction — then BM25 top-20 is answered "
        "ENTIRELY from the maintained artifacts. Term frequencies and "
        "doc lengths are per-doc quantities and batches are disjoint, "
        "so the streamed index serves bit-identical scores to a batch "
        "build: hash-compared against the same DuckDB oracle as "
        "fts_bm25_topk",
        "streaming §2.7 extension (FTS LSM maintenance, "
        "oracle-verified BM25)",
    )
    def streaming_fts_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
        from hangarbay_spark.streaming import fts_maintenance as FM

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        key = f"{sf_dir}|fts_stream"
        dirs = _FTS_STREAM_DIRS.get(key)
        if dirs is None:
            from hangarbay_spark.queries.base import stage_micro_batches

            stage = stage_micro_batches(
                docs, F.col("doc_id") % 4, 4, "hb_ftsq_src_"
            )
            index_dir = tempfile.mkdtemp(prefix="hb_ftsq_idx_")
            ckpt = tempfile.mkdtemp(prefix="hb_ftsq_ckpt_")
            _FTS_STREAM_DIRS[key] = (stage, index_dir, ckpt)
        stage, index_dir, ckpt = _FTS_STREAM_DIRS[key]
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stage}/*")
        )
        FM.fts_maintenance_stream(
            stream, index_dir, checkpoint_dir=ckpt, buckets=8,
            max_file_ratio=2.0,
        ).awaitTermination()
        return fts.bm25_topk(
            FM.read_maintained_tf(spark, index_dir),
            FM.read_maintained_doclen(spark, index_dir),
            " ".join(BM25_TERMS),
            "doc_id",
            k=20,
        ).select("doc_id", "bm25", "rk")


_register_streaming_fts_bm25()


# Reciprocal-rank fusion of a missing arm contributes 0.0; constant 60
# is the standard RRF damping (Cormack et al. 2009). Identical formula
# text compiles on both engines.
RRF_EXPR = (
    "round(COALESCE(1.0 / (60.0 + CAST(rk_lex AS DOUBLE)), 0.0)"
    " + COALESCE(1.0 / (60.0 + CAST(rk_sem AS DOUBLE)), 0.0), 9)"
)


def _o_hybrid_rrf() -> str:
    """Hybrid-retrieval oracle composed from the BM25 query's own
    oracle SQL plus a k=20 brute-force cosine arm for probe vector 0."""
    from hangarbay_spark.queries.base import REGISTRY
    from hangarbay_spark.queries.llmops import _o_cosine

    lex = REGISTRY["fts_bm25_topk"].oracle
    cos = _o_cosine("c.embedding", "p.pv")
    return f"""
    WITH lex AS (SELECT doc_id, rk AS rk_lex FROM ({lex}) t0),
    p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id AS doc_id, rk AS rk_sem FROM (
        SELECT c.vec_id, CAST(ROW_NUMBER() OVER (
          ORDER BY {cos} DESC, c.vec_id) AS BIGINT) AS rk
        FROM embeddings c CROSS JOIN p WHERE c.vec_id <> 0) t1
      WHERE rk <= 20),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             {RRF_EXPR} AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
    SELECT doc_id, rrf, rk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk
      FROM fused) t2
    WHERE rk <= 10
    """


@register(
    "search_hybrid_rrf",
    _o_hybrid_rrf(),
    "HYBRID retrieval with reciprocal-rank fusion: the BM25 lexical "
    "top-20 (persisted tf/doclen artifacts) fused with an exact-cosine "
    "semantic top-20 (probe vector 0 standing in for the encoded "
    "query) via 1/(60+rank) RRF — the standard lexical+vector fusion "
    "a RAG retrieval stack runs; arms join full-outer on doc id, a "
    "missing arm contributes 0, distributed top-10 before the rank "
    "window; oracle composed from the BM25 query's own SQL",
    "Q5 extension (hybrid lexical+semantic retrieval, RRF)",
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators import similarity as S
    from hangarbay_spark.queries.search import BM25_TERMS  # noqa: PLW0127

    tfi = indexes.ensure_fts_tf(spark, sf_dir)
    dls = indexes.ensure_fts_doclen(spark, sf_dir)
    lex = fts.bm25_topk(
        tfi, dls, " ".join(BM25_TERMS), "doc_id", k=20
    ).select("doc_id", F.col("rk").alias("rk_lex"))
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0)
    sem = S.brute_force_topk(emb, probe, k=20).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rk").alias("rk_sem")
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select("doc_id", F.expr(RRF_EXPR).alias("rrf"))
    )
    from pyspark.sql.window import Window

    top = fused.orderBy(F.col("rrf").desc(), F.col("doc_id")).limit(10)
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return top.withColumn("rk", F.row_number().over(w).cast("bigint"))


@register(
    "multimodal_format_sniff",
    """
    WITH m AS (
      SELECT CASE
               WHEN doc_id % 4 = 0 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB || encode(text)
               WHEN doc_id % 4 = 1 THEN '\\x89PNG'::BLOB || encode(text)
               WHEN doc_id % 4 = 2 THEN 'RIFF'::BLOB || encode(text)
               ELSE encode(text)
             END AS payload
      FROM documents),
    s AS (
      -- DuckDB has no BLOB substring: hex the payload and take the
      -- first 4 bytes' worth of hex chars (same value as Spark's
      -- hex(substring(payload, 1, 4)))
      SELECT payload, left(upper(hex(payload)), 8) AS sig FROM m)
    SELECT CASE
             WHEN sig LIKE 'FFD8FF%' THEN 'jpeg'
             WHEN sig = '89504E47' THEN 'png'
             WHEN sig = '52494646' THEN 'riff'
             ELSE 'unknown'
           END AS fmt,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes
    FROM s
    GROUP BY 1
    ORDER BY fmt
    """,
    "multimodal format sniffing from MAGIC BYTES — the codec-FREE "
    "multimodal operation (unlike decode, header inspection needs no "
    "image/audio library, so this path is fully real, not stubbed): "
    "payloads synthesized with genuine JPEG/PNG/RIFF headers, format "
    "detected from upper(hex(substring(payload, 1, 4))) entirely "
    "JVM-side, per-format counts + byte totals. The intake triage "
    "every multimodal crawl runs before routing payloads to decoders",
    "multimodal extension (magic-byte format detection, codec-free)",
)
def multimodal_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hdr = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(bytes.fromhex("FFD8FFE0")))
        .when(F.col("doc_id") % 4 == 1, F.lit(b"\x89PNG"))
        .when(F.col("doc_id") % 4 == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b""))
    )
    m = docs.select(
        F.concat(hdr, F.encode("text", "utf-8")).alias("payload")
    )
    s = m.select(
        "payload",
        F.upper(F.hex(F.substring(F.col("payload"), 1, 4))).alias("sig"),
    )
    fmt = (
        F.when(F.col("sig").startswith("FFD8FF"), "jpeg")
        .when(F.col("sig") == "89504E47", "png")
        .when(F.col("sig") == "52494646", "riff")
        .otherwise("unknown")
    )
    return (
        s.groupBy(fmt.alias("fmt"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_media"),
            F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        )
        .orderBy("fmt")
    )


# Image dimensions parsed from HEADER BYTES — codec-free like the
# format sniff: PNG IHDR stores width/height as big-endian uint32 at
# bytes 17-24; GIF87a as little-endian uint16 at bytes 7-10; BMP
# (BITMAPINFOHEADER) as little-endian int32 at bytes 19-26. Parsing is
# hex-string arithmetic over substring(hex(payload)) — all integers,
# exact on both engines (Spark conv(s,16,10) / DuckDB CAST('0x'||s)).
# Synthesized dimensions stay < 65536 so little-endian fields need only
# their low two bytes.


def _o_image_dims() -> str:
    le16 = lambda v: (  # noqa: E731 — LE byte swap of a 4-hex-char int
        f"substr(lpad(hex({v}), 4, '0'), 3, 2)"
        f" || substr(lpad(hex({v}), 4, '0'), 1, 2)"
    )
    return f"""
    WITH m AS (
      SELECT doc_id,
             100 + doc_id % 900 AS w0,
             100 + (doc_id * 7) % 900 AS h0,
             doc_id % 3 AS k,
             encode(text) AS body
      FROM documents),
    p AS (
      SELECT doc_id,
        CASE
          WHEN k = 0 THEN
            unhex('89504E470D0A1A0A0000000D49484452')
            || unhex(lpad(hex(w0), 8, '0')) || unhex(lpad(hex(h0), 8, '0'))
            || unhex('0806000000') || body
          WHEN k = 1 THEN
            unhex('474946383761')
            || unhex({le16("w0")}) || unhex({le16("h0")}) || body
          ELSE
            unhex('424D000000000000000036000000' || '28000000')
            || unhex({le16("w0")} || '0000')
            || unhex({le16("h0")} || '0000') || body
        END AS payload
      FROM m),
    hx AS (SELECT doc_id, upper(hex(payload)) AS h FROM p)
    SELECT doc_id,
      CASE WHEN left(h, 8) = '89504E47' THEN 'png'
           WHEN left(h, 6) = '474946' THEN 'gif'
           WHEN left(h, 4) = '424D' THEN 'bmp'
           ELSE 'unknown' END AS fmt,
      CAST(CASE
        WHEN left(h, 8) = '89504E47'
          THEN CAST('0x' || substr(h, 33, 8) AS BIGINT)
        WHEN left(h, 6) = '474946'
          THEN CAST('0x' || substr(h, 15, 2) || substr(h, 13, 2) AS BIGINT)
        ELSE CAST('0x' || substr(h, 39, 2) || substr(h, 37, 2) AS BIGINT)
      END AS BIGINT) AS width,
      CAST(CASE
        WHEN left(h, 8) = '89504E47'
          THEN CAST('0x' || substr(h, 41, 8) AS BIGINT)
        WHEN left(h, 6) = '474946'
          THEN CAST('0x' || substr(h, 19, 2) || substr(h, 17, 2) AS BIGINT)
        ELSE CAST('0x' || substr(h, 47, 2) || substr(h, 45, 2) AS BIGINT)
      END AS BIGINT) AS height
    FROM hx
    """


@register(
    "multimodal_image_dimensions",
    _o_image_dims(),
    "image dimensions parsed from HEADER BYTES — the second fully-real "
    "codec-free multimodal operation: payloads synthesized with "
    "genuine PNG IHDR / GIF87a / BMP BITMAPINFOHEADER layouts "
    "(byte-identical to what PIL would emit for those headers, pinned "
    "against Python struct.pack in tests), then width/height recovered "
    "per doc from substring(hex(payload)) integer arithmetic — "
    "big-endian uint32 for PNG, little-endian uint16/int32 for "
    "GIF/BMP — entirely JVM-side, no image library. The metadata-"
    "extraction step every multimodal intake runs before resize "
    "routing; at 100 TB this is one projection over the payload scan",
    "multimodal extension (header dimension parse, codec-free)",
)
def multimodal_image_dimensions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w0 = (100 + F.col("doc_id") % 900).cast("int")
    h0 = (100 + (F.col("doc_id") * 7) % 900).cast("int")

    def le16(v):  # little-endian byte swap of a 4-hex-char value
        hx4 = F.lpad(F.hex(v), 4, "0")
        return F.concat(F.substring(hx4, 3, 2), F.substring(hx4, 1, 2))

    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")),
        F.unhex(F.lpad(F.hex(w0), 8, "0")),
        F.unhex(F.lpad(F.hex(h0), 8, "0")),
        F.unhex(F.lit("0806000000")),
        F.encode("text", "utf-8"),
    )
    gif = F.concat(
        F.unhex(F.lit("474946383761")),
        F.unhex(le16(w0)),
        F.unhex(le16(h0)),
        F.encode("text", "utf-8"),
    )
    bmp = F.concat(
        F.unhex(F.lit("424D00000000000000003600000028000000")),
        F.unhex(F.concat(le16(w0), F.lit("0000"))),
        F.unhex(F.concat(le16(h0), F.lit("0000"))),
        F.encode("text", "utf-8"),
    )
    payload = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, gif)
        .otherwise(bmp)
    )
    hx = docs.select(
        "doc_id", F.upper(F.hex(payload)).alias("h")
    )
    is_png = F.substring("h", 1, 8) == "89504E47"
    is_gif = F.substring("h", 1, 6) == "474946"
    is_bmp = F.substring("h", 1, 4) == "424D"

    def hex2int(c):
        return F.conv(c, 16, 10).cast("bigint")

    width = (
        F.when(is_png, hex2int(F.substring("h", 33, 8)))
        .when(
            is_gif,
            hex2int(
                F.concat(F.substring("h", 15, 2), F.substring("h", 13, 2))
            ),
        )
        .otherwise(
            hex2int(
                F.concat(F.substring("h", 39, 2), F.substring("h", 37, 2))
            )
        )
    )
    height = (
        F.when(is_png, hex2int(F.substring("h", 41, 8)))
        .when(
            is_gif,
            hex2int(
                F.concat(F.substring("h", 19, 2), F.substring("h", 17, 2))
            ),
        )
        .otherwise(
            hex2int(
                F.concat(F.substring("h", 47, 2), F.substring("h", 45, 2))
            )
        )
    )
    fmt = (
        F.when(is_png, "png")
        .when(is_gif, "gif")
        .when(is_bmp, "bmp")
        .otherwise("unknown")
    )
    return hx.select(
        "doc_id",
        fmt.alias("fmt"),
        width.cast("bigint").alias("width"),
        height.cast("bigint").alias("height"),
    )


def _o_wav_meta() -> str:
    """DuckDB twin of multimodal_audio_metadata. LE32/LE16 fields are
    byte-pair-reversed hex; values are exact integers throughout
    (duration via integer division)."""

    def le(v: str, nbytes: int) -> str:
        width = nbytes * 2
        pairs = " || ".join(
            f"substr(lpad(hex({v}), {width}, '0'), {width - 1 - 2 * i}, 2)"
            for i in range(nbytes)
        )
        return pairs

    def rd(pos: int, nbytes: int) -> str:
        # payload hex chars for bytes [pos, pos+nbytes), reversed pairs
        pairs = " || ".join(
            f"substr(h, {2 * (pos + i) - 1}, 2)"
            for i in reversed(range(nbytes))
        )
        return f"CAST('0x' || {pairs} AS BIGINT)"

    return f"""
    WITH m AS (
      SELECT doc_id,
             1 + doc_id % 2 AS ch,
             CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                             ELSE 44100 END AS rate,
             octet_length(encode(text)) AS ds
      FROM documents),
    b AS (
      SELECT doc_id, ch, rate, ds, ch * 2 AS blk, rate * ch * 2 AS br
      FROM m),
    p AS (
      SELECT doc_id,
             unhex('52494646') || unhex({le("36 + ds", 4)})
             || unhex('57415645666D7420') || unhex({le("16", 4)})
             || unhex({le("1", 2)}) || unhex({le("ch", 2)})
             || unhex({le("rate", 4)}) || unhex({le("br", 4)})
             || unhex({le("blk", 2)}) || unhex({le("16", 2)})
             || unhex('64617461') || unhex({le("ds", 4)})
               AS payload
      FROM b),
    hx AS (SELECT doc_id, upper(hex(payload)) AS h FROM p)
    SELECT doc_id,
           CAST({rd(23, 2)} AS BIGINT) AS channels,
           CAST({rd(25, 4)} AS BIGINT) AS sample_rate,
           CAST({rd(35, 2)} AS BIGINT) AS bits,
           CAST({rd(41, 4)} * 1000 // {rd(29, 4)} AS BIGINT) AS duration_ms
    FROM hx
    """


@register(
    "multimodal_audio_metadata",
    _o_wav_meta(),
    "audio metadata parsed from WAV/RIFF HEADER BYTES — codec-free "
    "like the image-dimension parse: canonical 44-byte PCM WAV headers "
    "synthesized per doc (RIFF/WAVE/fmt/data chunks, little-endian "
    "fields, struct.pack-pinned in tests), then channels, sample rate, "
    "bit depth and duration (data bytes * 1000 // byte rate — exact "
    "integer division) recovered from byte-pair-reversed hex substrings "
    "entirely JVM-side. The duration/sample-rate triage an audio "
    "pipeline runs before routing to decoders; one projection over the "
    "payload scan",
    "multimodal extension (WAV header metadata, codec-free)",
)
def multimodal_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ch = (1 + F.col("doc_id") % 2).cast("bigint")
    rate = (
        F.when(F.col("doc_id") % 3 == 0, 8000)
        .when(F.col("doc_id") % 3 == 1, 16000)
        .otherwise(44100)
        .cast("bigint")
    )
    ds = F.length(F.encode("text", "utf-8")).cast("bigint")
    blk = (ch * 2).cast("bigint")
    br = (rate * ch * 2).cast("bigint")

    def le(v, nbytes):  # little-endian hex of an integer column
        width = nbytes * 2
        hx = F.lpad(F.hex(v), width, "0")
        return F.concat(
            *[F.substring(hx, width - 1 - 2 * i, 2) for i in range(nbytes)]
        )

    payload = F.concat(
        F.unhex(F.lit("52494646")),
        F.unhex(le(ds + 36, 4)),
        F.unhex(F.lit("57415645666D7420")),
        F.unhex(le(F.lit(16), 4)),
        F.unhex(le(F.lit(1), 2)),
        F.unhex(le(ch, 2)),
        F.unhex(le(rate, 4)),
        F.unhex(le(br, 4)),
        F.unhex(le(blk, 2)),
        F.unhex(le(F.lit(16), 2)),
        F.unhex(F.lit("64617461")),
        F.unhex(le(ds, 4)),
    )
    hx = docs.select("doc_id", F.upper(F.hex(payload)).alias("h"))

    def rd(pos, nbytes):  # read LE field at 1-based byte pos
        pairs = [
            F.substring("h", 2 * (pos + i) - 1, 2)
            for i in reversed(range(nbytes))
        ]
        return F.conv(F.concat(*pairs), 16, 10).cast("bigint")

    return hx.select(
        "doc_id",
        rd(23, 2).alias("channels"),
        rd(25, 4).alias("sample_rate"),
        rd(35, 2).alias("bits"),
        # integer division (Spark `div` = DuckDB `//` on positive ints);
        # a double `/` + cast could round across an integer boundary
        (rd(41, 4) * 1000).alias("__num"),
        rd(29, 4).alias("__den"),
    ).select(
        "doc_id",
        "channels",
        "sample_rate",
        "bits",
        F.expr("CAST(__num DIV __den AS BIGINT)").alias("duration_ms"),
    )


def _o_jpeg_dims() -> str:
    """DuckDB twin of multimodal_jpeg_dimensions: the SAME variable-
    length payloads, walked by a RECURSIVE CTE (off' = off + 4 + 2*L in
    hex-char coordinates) until an SOF0/SOF2 marker — the oracle
    genuinely parses the marker chain, it does not recompute the
    synthesized dimensions analytically."""
    return """
    WITH RECURSIVE m AS (
      SELECT doc_id,
             100 + doc_id % 900 AS w0,
             100 + (doc_id * 7) % 900 AS h0,
             CAST(doc_id % 17 AS INT) AS cn,
             doc_id % 2 AS sofk,
             encode(text) AS body
      FROM documents),
    p AS (
      SELECT doc_id,
        unhex('FFD8' || 'FFE000104A46494600010100004800480000'
          || 'FFFE' || lpad(hex(2 + cn), 4, '0') || repeat('78', cn)
          || 'FFDB' || '0006' || '00112233'
          || CASE WHEN sofk = 0 THEN 'FFC0' ELSE 'FFC2' END
          || '000B' || '08' || lpad(hex(h0), 4, '0')
          || lpad(hex(w0), 4, '0') || '01' || '011100'
          || 'FFDA') || body AS payload
      FROM m),
    hx AS (SELECT doc_id, upper(hex(payload)) AS h FROM p),
    walk(doc_id, h, off, depth) AS (
      SELECT doc_id, h, 5, 0 FROM hx
      UNION ALL
      SELECT doc_id, h,
             off + 4 + 2 * CAST('0x' || substr(h, off + 4, 4) AS BIGINT),
             depth + 1
      FROM walk
      WHERE depth < 24
        AND substr(h, off, 2) = 'FF'
        AND substr(h, off, 4) NOT IN ('FFC0', 'FFC2', 'FFDA', 'FFD9'))
    SELECT doc_id,
           CASE WHEN substr(h, off, 4) = 'FFC0' THEN 'sof0'
                ELSE 'sof2' END AS sof,
           CAST('0x' || substr(h, off + 14, 4) AS BIGINT) AS width,
           CAST('0x' || substr(h, off + 10, 4) AS BIGINT) AS height
    FROM walk
    WHERE substr(h, off, 4) IN ('FFC0', 'FFC2')
    """


@register(
    "multimodal_jpeg_dimensions",
    _o_jpeg_dims(),
    "JPEG dimensions via a REAL SOF marker walk (VERDICT r6 task #5 — "
    "the format multimodal_image_dimensions couldn't cover with fixed-"
    "offset hex arithmetic, because every segment before SOF0/SOF2 is "
    "variable-length): payloads synthesized with genuine ISO 10918-1 "
    "layout — JFIF APP0, a COM segment whose length VARIES per doc, a "
    "DQT stub, then SOF0 (even docs) or SOF2 progressive (odd) — and "
    "the Spark side walks markers in an Arrow mapInPandas kernel "
    "(jpeg_sof_dims, struct.pack-pinned in tests) while the DuckDB "
    "oracle walks the SAME chain with a recursive CTE, so the hash "
    "compare verifies two independent parser implementations against "
    "each other. 100 TB shape: one payload-projected scan, no shuffle",
    "multimodal extension (JPEG SOF marker walk, codec-free)",
)
def multimodal_jpeg_dimensions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w0 = (100 + F.col("doc_id") % 900).cast("int")
    h0 = (100 + (F.col("doc_id") * 7) % 900).cast("int")
    cn = (F.col("doc_id") % 17).cast("int")
    hdr = F.concat(
        F.lit("FFD8FFE000104A46494600010100004800480000FFFE"),
        F.lpad(F.hex(cn + 2), 4, "0"),
        F.repeat(F.lit("78"), cn),
        F.lit("FFDB000600112233"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("FFC0")).otherwise(
            F.lit("FFC2")
        ),
        F.lit("000B08"),
        F.lpad(F.hex(h0), 4, "0"),
        F.lpad(F.hex(w0), 4, "0"),
        F.lit("01011100FFDA"),
    )
    payload = F.concat(F.unhex(hdr), F.encode("text", "utf-8"))
    return docs.select("doc_id", payload.alias("payload")).mapInPandas(
        M.jpeg_dims_kernel,
        "doc_id long, sof string, width long, height long",
    )


# The unity transform matrix + reserved/predefined tail of an mvhd v0
# box (rate 1.0, volume 1.0, 8 reserved bytes, 36-byte matrix, 24-byte
# predefined, next_track_id 2) — fixed bytes shared by the Spark and
# oracle payload constructions.
_MVHD_TAIL_HEX = (
    "00010000" "0100" "0000" + "00" * 8
    + "0001000000000000000000000000000000010000000000000000000000000000"
    + "40000000" + "00" * 24 + "00000002"
)


def _o_mp4_meta() -> str:
    """DuckDB twin of multimodal_mp4_metadata: the SAME variable-length
    payloads, walked by a RECURSIVE CTE over top-level boxes (off' =
    off + 2*size in hex-char coordinates) until the moov box — the
    oracle genuinely parses the box chain and reads ftyp's brand and
    mvhd's timescale/duration from their walked offsets."""
    return f"""
    WITH RECURSIVE m AS (
      SELECT doc_id,
             600 + doc_id % 9000 AS ts0,
             (doc_id * 37) % 1000000 AS dur0,
             CAST(doc_id % 23 AS INT) AS fn,
             CAST((doc_id * 3) % 11 AS INT) AS sn,
             CASE WHEN doc_id % 2 = 0 THEN '69736F6D'
                  ELSE '6D703432' END AS brand0,
             encode(text) AS body
      FROM documents),
    p AS (
      SELECT doc_id,
        upper('00000010' || '66747970' || brand0 || '00000000'
          || lpad(hex(fn + 8), 8, '0') || '66726565' || repeat('00', fn)
          || lpad(hex(sn + 8), 8, '0') || '736B6970' || repeat('00', sn)
          || '00000074' || '6D6F6F76'
          || '0000006C' || '6D766864' || '00000000'
          || '00000000' || '00000000'
          || lpad(hex(ts0), 8, '0') || lpad(hex(dur0), 8, '0')
          || '{_MVHD_TAIL_HEX}'
          || '00000000' || '6D646174') || hex(body) AS h
      FROM m),
    walk(doc_id, h, off, depth) AS (
      SELECT doc_id, h, 1, 0 FROM p
      UNION ALL
      SELECT doc_id, h,
             off + 2 * CAST('0x' || substr(h, off, 8) AS BIGINT),
             depth + 1
      FROM walk
      WHERE depth < 12
        AND substr(h, off + 8, 8) <> '6D6F6F76'
        AND CAST('0x' || substr(h, off, 8) AS BIGINT) >= 8),
    ftyp AS (
      SELECT doc_id, decode(unhex(substr(h, off + 16, 8))) AS brand
      FROM walk WHERE substr(h, off + 8, 8) = '66747970'),
    moov AS (
      SELECT doc_id,
             CAST('0x' || substr(h, off + 56, 8) AS BIGINT) AS timescale,
             CAST('0x' || substr(h, off + 64, 8) AS BIGINT) AS duration
      FROM walk WHERE substr(h, off + 8, 8) = '6D6F6F76'
        AND substr(h, off + 24, 8) = '6D766864'
        AND substr(h, off + 32, 2) = '00')
    SELECT f.doc_id, f.brand, v.timescale, v.duration,
           CAST(v.duration * 1000 // v.timescale AS BIGINT) AS duration_ms
    FROM ftyp f JOIN moov v USING (doc_id)
    """


@register(
    "multimodal_mp4_metadata",
    _o_mp4_meta(),
    "MP4/ISO-BMFF movie metadata via a REAL top-level box walk "
    "(ISO/IEC 14496-12: [u32 size][type] length-prefixed boxes; "
    "moov/mvhd's offset depends on every variable-length box before "
    "it): payloads synthesized with genuine layout — ftyp with a "
    "per-doc major brand, free + skip padding boxes whose sizes VARY "
    "per doc, a 108-byte mvhd v0 carrying timescale/duration, then a "
    "size-0 to-EOF mdat — and the Spark side walks boxes in an Arrow "
    "mapInPandas kernel (mp4_moov_info, struct.pack-pinned in tests) "
    "while the DuckDB oracle walks the SAME chain with a recursive "
    "CTE, so the hash compare verifies two independent parsers "
    "against each other (the jpeg_dimensions discipline). 100 TB "
    "shape: one payload-projected scan, no shuffle",
    "multimodal extension (ISO-BMFF box walk, codec-free)",
)
def multimodal_mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts0 = (600 + F.col("doc_id") % 9000).cast("int")
    dur0 = ((F.col("doc_id") * 37) % 1000000).cast("int")
    fn = (F.col("doc_id") % 23).cast("int")
    sn = ((F.col("doc_id") * 3) % 11).cast("int")
    brand0 = F.when(F.col("doc_id") % 2 == 0, F.lit("69736F6D")).otherwise(
        F.lit("6D703432")
    )
    hdr = F.concat(
        F.lit("0000001066747970"),
        brand0,
        F.lit("00000000"),
        F.lpad(F.hex(fn + 8), 8, "0"),
        F.lit("66726565"),
        F.repeat(F.lit("00"), fn),
        F.lpad(F.hex(sn + 8), 8, "0"),
        F.lit("736B6970"),
        F.repeat(F.lit("00"), sn),
        F.lit("000000746D6F6F76"),
        F.lit("0000006C6D766864"),
        F.lit("00000000" "00000000" "00000000"),
        F.lpad(F.hex(ts0), 8, "0"),
        F.lpad(F.hex(dur0), 8, "0"),
        F.lit(_MVHD_TAIL_HEX),
        F.lit("000000006D646174"),
    )
    payload = F.concat(F.unhex(hdr), F.encode("text", "utf-8"))
    parsed = docs.select("doc_id", payload.alias("payload")).mapInPandas(
        M.mp4_kernel,
        "doc_id long, brand string, timescale long, duration long",
    )
    return parsed.select(
        "doc_id",
        "brand",
        "timescale",
        "duration",
        F.expr("CAST(duration * 1000 DIV timescale AS BIGINT)").alias(
            "duration_ms"
        ),
    )


_HH_STREAM_DIRS: dict[str, tuple[str, str, str]] = {}


@register(
    "streaming_heavy_hitters",
    None,  # genuinely non-SQL-expressible (bounded multi-batch sketch state)
    "streaming heavy-hitter maintenance: the documents token stream "
    "drained as 4 micro-batches through foreachBatch, each batch "
    "folded into a persisted <=200-row Misra-Gries summary (mergeable-"
    "summaries merge, idempotent batch-id commit — replays never "
    "double-count). Returns the candidate tokens above 1/200 of the "
    "stream with [cnt_lo, cnt_hi] brackets from the conservation-law "
    "undercount bound; the superset-of-batch-truth and bracket "
    "guarantees are pinned in "
    "tests/test_streaming.py::test_streaming_heavy_hitters",
    "streaming §2.7 extension (bounded-state frequency maintenance)",
)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.text import tokens_expr
    from hangarbay_spark.streaming import hh_maintenance as HH

    docs = load_table(spark, sf_dir, "documents")
    key = f"{sf_dir}|hh_stream"
    dirs = _HH_STREAM_DIRS.get(key)
    if dirs is None:
        from hangarbay_spark.queries.base import stage_micro_batches

        toks = docs.select(
            F.col("doc_id"), F.explode(tokens_expr("text")).alias("tok")
        )
        stage = stage_micro_batches(
            toks, F.col("doc_id") % 4, 4, "hb_hh_src_", keep=["tok"]
        )
        state = tempfile.mkdtemp(prefix="hb_hh_state_")
        ckpt = tempfile.mkdtemp(prefix="hb_hh_ckpt_")
        _HH_STREAM_DIRS[key] = (stage, state, ckpt)
    stage, state, ckpt = _HH_STREAM_DIRS[key]
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stage}/*")
    )
    q = HH.hh_maintenance_stream(stream, state, checkpoint_dir=ckpt)
    q.awaitTermination()
    return HH.heavy_hitters_from_state(spark, state, inv_phi=200)


@register(
    "multimodal_payload_dedup",
    """
    WITH m AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 4 = 0 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB || encode(text)
               WHEN doc_id % 4 = 1 THEN '\\x89PNG'::BLOB || encode(text)
               WHEN doc_id % 4 = 2 THEN 'RIFF'::BLOB || encode(text)
               ELSE encode(text)
             END AS payload
      FROM documents),
    h AS (SELECT doc_id, md5(upper(hex(payload))) AS digest,
                 octet_length(payload) AS n_bytes
          FROM m),
    g AS (SELECT digest, CAST(COUNT(*) AS BIGINT) AS n_copies,
                 CAST(MIN(doc_id) AS BIGINT) AS keeper_doc,
                 CAST(MAX(n_bytes) AS BIGINT) AS payload_bytes
          FROM h GROUP BY digest)
    SELECT digest, n_copies, keeper_doc, payload_bytes
    FROM g WHERE n_copies > 1
    ORDER BY n_copies DESC, digest LIMIT 20
    """,
    "exact BINARY payload dedup — the content-addressable-store "
    "intake step every multimodal crawl runs before decode: digest = "
    "md5 over the payload bytes (hex'd first: engine-portable and "
    "still injective), one map-side-combined groupBy(digest), "
    "duplicate groups keep the smallest doc id. Codec-free like the "
    "format sniffer, so the path is fully real; at 100 TB the only "
    "shuffle carries (digest, count) partials, never payloads",
    "multimodal extension (binary payload dedup by content digest)",
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hdr = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(bytes.fromhex("FFD8FFE0")))
        .when(F.col("doc_id") % 4 == 1, F.lit(b"\x89PNG"))
        .when(F.col("doc_id") % 4 == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b""))
    )
    h = docs.select(
        "doc_id",
        F.md5(F.upper(F.hex(F.concat(hdr, F.encode("text", "utf-8")))))
        .alias("digest"),
        F.length(F.concat(hdr, F.encode("text", "utf-8")))
        .cast("bigint")
        .alias("n_bytes"),
    )
    g = h.groupBy("digest").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("doc_id").cast("bigint").alias("keeper_doc"),
        F.max("n_bytes").cast("bigint").alias("payload_bytes"),
    )
    return (
        g.filter(F.col("n_copies") > 1)
        .orderBy(F.desc("n_copies"), "digest")
        .limit(20)
    )


@register(
    "multimodal_payload_chunking",
    r"""
    WITH m AS (
      SELECT doc_id,
             upper(hex(CASE
               WHEN doc_id % 4 = 0
                 THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
               WHEN doc_id % 4 = 1 THEN '\x89PNG'::BLOB || encode(text)
               WHEN doc_id % 4 = 2 THEN 'RIFF'::BLOB || encode(text)
               ELSE encode(text)
             END)) AS hx
      FROM documents),
    c AS (
      SELECT doc_id, hx, CAST(len(hx) AS BIGINT) AS hlen,
             unnest(generate_series(0,
                 CAST(ceil(len(hx) / 128.0) AS BIGINT) - 1)) AS idx
      FROM m),
    ch AS (
      SELECT doc_id, hlen, idx,
             substr(hx, CAST(idx * 128 + 1 AS BIGINT), 128) AS chunk
      FROM c),
    re AS (
      SELECT doc_id, MAX(hlen) AS hlen,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             string_agg(chunk, '' ORDER BY idx) AS rebuilt
      FROM ch GROUP BY doc_id),
    v AS (SELECT re.doc_id, re.n_chunks,
                 CAST(re.hlen / 2 AS BIGINT) AS n_bytes,
                 CASE WHEN md5(re.rebuilt) = md5(m.hx) THEN 1 ELSE 0 END
                   AS ok
          FROM re JOIN m USING (doc_id))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(ok) AS BIGINT) AS n_reassembly_ok
    FROM v
    """,
    "binary payload chunking + reassembly verification — the "
    "content-store shard step for blobs too large for one row/RPC "
    "(64-byte chunks here; MB-scale in production). Chunks explode "
    "from a sequence (no per-chunk self-join), reassembly "
    "concatenates in chunk order and digest-verifies against the "
    "original — n_reassembly_ok == n_docs is the integrity proof. "
    "Runs on the portable hex encoding (DuckDB has no BLOB "
    "substring), so the oracle checks the identical bytes",
    "multimodal extension (payload chunking + reassembly proof)",
)
def multimodal_payload_chunking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hdr = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(bytes.fromhex("FFD8FFE0")))
        .when(F.col("doc_id") % 4 == 1, F.lit(b"\x89PNG"))
        .when(F.col("doc_id") % 4 == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b""))
    )
    m = docs.select(
        "doc_id",
        F.upper(F.hex(F.concat(hdr, F.encode("text", "utf-8")))).alias("hx"),
    ).localCheckpoint(eager=True)
    c = m.select(
        "doc_id",
        F.length("hx").cast("bigint").alias("hlen"),
        "hx",
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr("CAST(ceil(length(hx) / 128.0) AS BIGINT) - 1"),
            )
        ).alias("idx"),
    )
    ch = c.select(
        "doc_id",
        "hlen",
        "idx",
        F.expr("substr(hx, CAST(idx * 128 + 1 AS BIGINT), 128)").alias(
            "chunk"
        ),
    )
    re = ch.groupBy("doc_id").agg(
        F.max("hlen").alias("hlen"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("chunk")))
                ),
                lambda s: s.getField("chunk"),
            ),
            "",
        ).alias("rebuilt"),
    )
    v = re.join(m, "doc_id").select(
        "n_chunks",
        F.expr("CAST(hlen / 2 AS BIGINT)").alias("n_bytes"),
        F.expr(
            "CASE WHEN md5(rebuilt) = md5(hx) THEN 1 ELSE 0 END"
        ).alias("ok"),
    )
    return v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chunks").cast("bigint").alias("n_chunks"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("ok").cast("bigint").alias("n_reassembly_ok"),
    )


PROX_TERMS = ("spark", "table")


@register(
    "fts_proximity_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({O_TOKENS_FTS}) AS t,
             generate_subscripts({O_TOKENS_FTS}, 1) AS pos
      FROM documents),
    a AS (SELECT doc_id, pos AS pa FROM toks WHERE t = '{PROX_TERMS[0]}'),
    b AS (SELECT doc_id, pos AS pb FROM toks WHERE t = '{PROX_TERMS[1]}')
    SELECT a.doc_id,
           CAST(MIN(abs(pa - pb)) AS BIGINT) AS min_gap,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM a JOIN b ON a.doc_id = b.doc_id
    GROUP BY a.doc_id
    ORDER BY min_gap, a.doc_id LIMIT 15
    """,
    "term-proximity ranked search (the classic IR NEAR operator): "
    "documents containing both query terms ranked by the minimal "
    "token gap between any occurrence pair, resolved ENTIRELY from "
    "the persisted positional postings — two pushdown-filtered index "
    "scans and a per-doc pair join bounded by in-doc term "
    "frequencies; the corpus is never rescanned at query time. Gaps "
    "are exact integers (gap is shift-invariant, so leading-empty "
    "tokenizer offsets cancel), making the ranking engine-"
    "independent without any float discipline",
    "Q5 (FTS substitute: proximity ranking)",
)
def fts_proximity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = persisted_positional_index(spark, sf_dir)
    return fts.proximity_topk(
        idx, PROX_TERMS[0], PROX_TERMS[1], "doc_id", k=15
    )


# --- multimodal perceptual near-dup (BMP dHash) ------------------------------
# Payload synthesis (shared SQL text — evaluated by BOTH engines so the
# bytes are identical): honest 9x8 24bpp bottom-up BMPs whose grayscale
# rows come from md5 hex of a FAMILY key (family = doc_id DIV 4), with
# members m in 1..3 perturbing exactly one pixel ((row m, col 0) ->
# 0xff). A perturbed pixel at column 0 touches only dHash bit (m, 0),
# so within-family Hamming distances are <= 2 — inside the d<=3
# pigeonhole guarantee — while cross-family fingerprints differ in ~32
# bits. Division is (doc_id - doc_id % 4) / 4 (exact-integer double on
# both engines), never DIV-vs-// drift.


def _mm_bmp_payload_sql() -> str:
    import struct

    w, h = 9, 8
    rowsz = (w * 3 + 3) // 4 * 4
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + rowsz * h, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, rowsz * h, 0, 0, 0, 0
        )
    )
    fam = "CAST(CAST((doc_id - (doc_id % 4)) / 4 AS BIGINT) AS STRING)"
    rows = []
    for r_file in range(h):  # file order is bottom-up
        r = h - 1 - r_file
        terms = []
        for c in range(w):
            base = f"substr(md5({fam} || '-{r}'), {2 * c + 1}, 2)"
            if c == 0 and 1 <= r <= 3:
                base = (
                    f"CASE WHEN (doc_id % 4) = {r} THEN 'ff' "
                    f"ELSE {base} END"
                )
            terms.append(f"repeat({base}, 3)")
        rows.append(" || ".join(terms) + " || '00'")
    body = " || ".join(rows)
    return f"unhex('{hdr.hex()}' || {body})"


def _o_multimodal_near_dup(max_hamming: int = 3) -> str:
    # dHash bit (r, c) reads gray bytes (r, c) and (r, c+1); in hex
    # coordinates of the whole file: byte k sits at substr position
    # k*2+1, and pixel (r, c)'s blue byte is k = 54 + (7-r)*28 + c*3
    # (bottom-up rows, 28-byte padded rows) -> pos = 109+(7-r)*56+c*6.
    block_rows = "\n      UNION ALL ".join(
        f"SELECT media_id, {j} AS blk, w{j} AS val FROM fp" for j in range(4)
    )
    ham = " + ".join(
        f"bit_count(CAST(xor(fa.w{j}, fb.w{j}) AS BIGINT))" for j in range(4)
    )
    return f"""
    WITH m AS (SELECT doc_id AS media_id,
                      {_mm_bmp_payload_sql()} AS payload
               FROM documents),
    hx AS MATERIALIZED (SELECT media_id, hex(payload) AS h FROM m),
    bits AS (
      SELECT media_id, r, c,
             CASE WHEN CAST('0x' || substr(h, 109 + (7 - r) * 56 + c * 6, 2)
                            AS BIGINT)
                     < CAST('0x' || substr(h, 115 + (7 - r) * 56 + c * 6, 2)
                            AS BIGINT)
                  THEN 1 ELSE 0 END AS bit
      FROM hx, generate_series(0, 7) rs(r), generate_series(0, 7) cs(c)),
    fp AS MATERIALIZED (
      SELECT media_id,
             CAST(SUM(CASE WHEN (r * 8 + c) // 16 = 0
                           THEN bit * (1 << ((r * 8 + c) % 16))
                           ELSE 0 END) AS INT) AS w0,
             CAST(SUM(CASE WHEN (r * 8 + c) // 16 = 1
                           THEN bit * (1 << ((r * 8 + c) % 16))
                           ELSE 0 END) AS INT) AS w1,
             CAST(SUM(CASE WHEN (r * 8 + c) // 16 = 2
                           THEN bit * (1 << ((r * 8 + c) % 16))
                           ELSE 0 END) AS INT) AS w2,
             CAST(SUM(CASE WHEN (r * 8 + c) // 16 = 3
                           THEN bit * (1 << ((r * 8 + c) % 16))
                           ELSE 0 END) AS INT) AS w3
      FROM bits GROUP BY media_id),
    blocks AS ({block_rows}),
    cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
             FROM blocks a JOIN blocks b
               ON a.blk = b.blk AND a.val = b.val
              AND a.media_id < b.media_id)
    SELECT id_a, id_b, CAST({ham} AS BIGINT) AS hamming
    FROM cand
    JOIN fp fa ON fa.media_id = id_a
    JOIN fp fb ON fb.media_id = id_b
    WHERE {ham} <= {max_hamming}
    """


@register(
    "multimodal_near_dup",
    _o_multimodal_near_dup(3),
    "multimodal PERCEPTUAL near-dup over decodable image payloads: "
    "honest 24bpp BMP parse (pixel offset/width/height/padding from "
    "the real headers) -> dHash difference fingerprints (64 bits as "
    "four 16-bit words) via an Arrow mapInPandas kernel, then the "
    "SimHash block-pigeonhole machinery verbatim: candidates from a "
    "(block, value) equi-join, popcount verification on candidates "
    "only. Closes the gap between payload-EXACT dedup (sha256) and "
    "text near-dup — pixels nearly match even when bytes differ. "
    "Oracle replays the pixel walk in hex-string coordinates (the "
    "JPEG SOF-walk discipline), certifying the kernel bit-for-bit",
    "multimodal extension (perceptual-hash near-dup)",
)
def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(_mm_bmp_payload_sql()).alias("payload"),
    )
    fp = M.bmp_dhash_fingerprints(media)
    return DD.simhash_pairs_from_fingerprints(
        fp, "media_id", max_hamming=3
    )


def _o_multimodal_near_dup_clusters() -> str:
    """Recursive-CTE closure over the perceptual-hash pair set — the
    cluster-level variant every near-dup family ships (the
    _o_semantic_dedup shape): reachability -> min-label clusters ->
    per-cluster member counts."""
    # reuse the pair chain up to the verified pair set
    pair_sql = _o_multimodal_near_dup(3)
    head, tail = pair_sql.split("SELECT id_a, id_b,", 1)
    body = "SELECT id_a, id_b," + tail
    return f"""{head.replace("WITH m AS", "WITH RECURSIVE m AS", 1)}
    , vp AS MATERIALIZED ({body}),
    eg AS (SELECT id_a AS s, id_b AS d FROM vp
           UNION SELECT id_b, id_a FROM vp),
    reach AS (SELECT s AS id, d AS r FROM eg
              UNION
              SELECT reach.id, eg.d FROM reach JOIN eg ON reach.r = eg.s),
    lab AS (SELECT id, least(id, MIN(r)) AS cluster FROM reach GROUP BY id)
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM lab GROUP BY cluster
    ORDER BY n_members DESC, cluster LIMIT 25
    """


@register(
    "multimodal_near_dup_clusters",
    _o_multimodal_near_dup_clusters(),
    "cluster-level variant of the perceptual-hash near-dup search "
    "(the pair-enumeration alternative every near-dup family ships): "
    "connected components over the Hamming<=3 dHash pairs, min-label "
    "cluster ids, member counts — the groups a dedup pass keeps one "
    "representative from. Oracle replays pixels -> fingerprints -> "
    "pairs -> recursive reachability closure",
    "multimodal extension (perceptual near-dup clusters)",
)
def multimodal_near_dup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hangarbay_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(_mm_bmp_payload_sql()).alias("payload"),
    )
    fp = M.bmp_dhash_fingerprints(media)
    pairs = DD.simhash_pairs_from_fingerprints(fp, "media_id", max_hamming=3)
    comp = DD.connected_components(pairs.select("id_a", "id_b"))
    return (
        comp.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .select(F.col("cluster").cast("bigint").alias("cluster"), "n_members")
        .orderBy(F.desc("n_members"), "cluster")
        .limit(25)
    )
