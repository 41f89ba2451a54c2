"""Corpus-filter queries: Gopher-style repetition/cleanliness features,
C4-style line-level dedup, and PII detection/redaction — the cheap
document-filter pass of an LLM training-data pipeline, declared as
oracle-checked queries over ``documents``.

The synthetic corpus is single-line and digit-free, so the line-dedup
and PII queries build their firing input DETERMINISTICALLY inside the
query (identical construction on both engines) — the operators do real
work and the oracle checks real redactions/dedups, not vacuous zeros.
Unit tests in tests/test_operators.py cover the operators on handwritten
multi-line / PII-bearing strings as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hangarbay_spark.operators import filters as FL
from hangarbay_spark.operators import text as X
from hangarbay_spark.queries.base import load_table, register

O_TOKENS = r"str_split_regex(lower(trim(text)), '\s+')"


def _o_toks(col: str) -> str:
    return rf"str_split_regex(lower(trim({col})), '\s+')"


_EN = "|".join(X.LANG_STOPWORDS["en"])


def _o_quality(c: str) -> str:
    """DuckDB twin of text.quality_score_expr over column ``c``."""
    toks = _o_toks(c)
    return f"""
      0.4 * least(CAST(len({toks}) AS DOUBLE) / 100.0, 1.0)
      + 0.2 * least(((CAST(LENGTH({c}) AS DOUBLE)
                      - (CAST(len({toks}) AS DOUBLE) - 1.0))
                     / CAST(len({toks}) AS DOUBLE)) / 8.0, 1.0)
      + 0.2 * least((CAST(len(regexp_extract_all(lower({c}), '\\b({_EN})\\b')) AS DOUBLE)
                     / CAST(len({toks}) AS DOUBLE)) * 3.0, 1.0)
      + 0.2 * (1.0 - least((CAST(LENGTH({c})
                             - LENGTH(regexp_replace({c}, '[.,;:!?]', '', 'g')) AS DOUBLE)
                            / CAST(LENGTH({c}) AS DOUBLE)) * 10.0, 1.0))
    """


def _o_lang_case(c: str) -> str:
    """DuckDB twin of text.lang_id_expr over column ``c``."""
    scores = {
        lang: rf"len(regexp_extract_all(lower({c}), '\b({'|'.join(ws)})\b'))"
        for lang, ws in X.LANG_STOPWORDS.items()
    }
    clauses = [
        f"WHEN len(regexp_extract_all({c}, '{X.CJK_PATTERN}')) > 0 THEN 'zh'"
    ]
    for lang in X.LANG_ORDER:
        others = ", ".join(scores[o] for o in X.LANG_ORDER if o != lang)
        clauses.append(
            f"WHEN {scores[lang]} > 0 AND {scores[lang]} = "
            f"greatest({scores[lang]}, {others}) THEN '{lang}'"
        )
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"

# Gopher §A1.1 thresholds used for the keep flag.
TOP_BIGRAM_MAX = 0.18
DUP_BIGRAM_MAX = 0.30
ALPHA_WORD_MIN = 0.80
MEAN_WORD_LEN_RANGE = (3.0, 10.0)


@register(
    "text_repetition_filter",
    f"""
    WITH t AS (SELECT doc_id, {O_TOKENS} AS toks FROM documents),
    d AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS alpha_word_frac,
             CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS mean_word_len
      FROM t),
    g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1])
             ELSE [array_to_string(toks, ' ')] END AS grams
      FROM t),
    e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
    r AS (SELECT doc_id, SUM(cnt) AS total, MAX(cnt) AS top, COUNT(*) AS nd
          FROM c GROUP BY 1)
    SELECT d.doc_id, d.n_tokens,
           CAST(r.top AS DOUBLE) / CAST(r.total AS DOUBLE) AS top_bigram_frac,
           CAST(r.total - r.nd AS DOUBLE) / CAST(r.total AS DOUBLE)
             AS dup_bigram_frac,
           d.alpha_word_frac, d.mean_word_len,
           (CAST(r.top AS DOUBLE) / CAST(r.total AS DOUBLE) <= {TOP_BIGRAM_MAX}
            AND CAST(r.total - r.nd AS DOUBLE) / CAST(r.total AS DOUBLE)
                <= {DUP_BIGRAM_MAX}
            AND d.alpha_word_frac >= {ALPHA_WORD_MIN}
            AND d.mean_word_len BETWEEN {MEAN_WORD_LEN_RANGE[0]}
                AND {MEAN_WORD_LEN_RANGE[1]}) AS keep
    FROM d JOIN r USING (doc_id)
    """,
    "Gopher-style repetition filter: top-/duplicate-bigram fractions via "
    "distributed explode+count (one shuffle, linear in corpus — not a "
    "per-row O(k^2) HOF scan), alpha-word fraction, mean word length, "
    "and the composite keep flag",
    "LLM-pipeline extension (repetition/quality document filters)",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition-to-spread-CPU: the gram transforms below are per-row
    # compute; a one-split corpus scan would serialize them
    toks = (
        load_table(spark, sf_dir, "documents")
        .repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
        .select("doc_id", X.tokens_expr("text").alias("toks"))
    )
    docfeat = toks.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        FL.alpha_word_fraction_expr(F.col("toks")).alias("alpha_word_frac"),
        FL.mean_word_length_expr(F.col("toks")).alias("mean_word_len"),
    )
    grams = toks.select(
        "doc_id", F.explode(FL.ngrams_expr(F.col("toks"), 2)).alias("gram")
    )
    rep = (
        grams.groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("total"),
            F.max("count").alias("top"),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    top_frac = F.col("top").cast("double") / F.col("total").cast("double")
    dup_frac = (F.col("total") - F.col("nd")).cast("double") / F.col(
        "total"
    ).cast("double")
    return docfeat.join(rep, "doc_id").select(
        "doc_id",
        "n_tokens",
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_bigram_frac"),
        "alpha_word_frac",
        "mean_word_len",
        (
            (top_frac <= TOP_BIGRAM_MAX)
            & (dup_frac <= DUP_BIGRAM_MAX)
            & (F.col("alpha_word_frac") >= ALPHA_WORD_MIN)
            & F.col("mean_word_len").between(*MEAN_WORD_LEN_RANGE)
        ).alias("keep"),
    )


# Deterministic multi-line construction: two 40-char slices plus a
# repeated first slice (twice on odd doc_ids) — yields per-doc-varying
# duplicate-line fractions of 1/3 and 2/4.
_O_AUG_LINES = (
    "CASE WHEN doc_id % 2 = 1 THEN "
    "l1 || chr(10) || l2 || chr(10) || l1 || chr(10) || l1 "
    "ELSE l1 || chr(10) || l2 || chr(10) || l1 END"
)


@register(
    "text_line_dedup",
    f"""
    WITH b AS (SELECT doc_id, substr(text, 1, 40) AS l1,
                      substr(text, 41, 40) AS l2 FROM documents),
    a AS (SELECT doc_id, {_O_AUG_LINES} AS aug FROM b),
    l AS (SELECT doc_id, str_split(aug, chr(10)) AS lines FROM a),
    o AS (SELECT doc_id, lines,
                 list_filter(lines, (x, i) -> list_position(lines, x) = i)
                   AS clean
          FROM l)
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
             / CAST(len(lines) AS DOUBLE) AS dup_line_frac,
           CAST(len(clean) AS BIGINT) AS n_clean_lines,
           md5(array_to_string(clean, chr(10))) AS clean_md5
    FROM o
    """,
    "C4-style line-level dedup: duplicate-line fraction plus "
    "first-occurrence line dedup (order preserved), verified via md5 of "
    "the cleaned document; multi-line input built deterministically in "
    "the query (corpus is single-line)",
    "LLM-pipeline extension (line-level dedup / C4 cleaning)",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    l1 = F.substring("text", 1, 40)
    l2 = F.substring("text", 41, 40)
    base = F.concat_ws("\n", l1, l2, l1)
    aug = F.when(
        F.col("doc_id") % 2 == 1, F.concat_ws("\n", base, l1)
    ).otherwise(base)
    lined = docs.select("doc_id", FL.lines_expr(aug).alias("lines"))
    clean = FL.dedup_lines_expr(F.col("lines"))
    return lined.select(
        "doc_id",
        F.size("lines").cast("bigint").alias("n_lines"),
        FL.duplicate_line_fraction_expr(F.col("lines")).alias("dup_line_frac"),
        F.size(clean).cast("bigint").alias("n_clean_lines"),
        F.md5(F.array_join(clean, "\n")).alias("clean_md5"),
    )


# Deterministic PII injection appended to each document: one email, one
# IPv4, one phone — all derived from doc_id, so both engines construct
# byte-identical input and the oracle checks real redactions.
_O_AUG_PII = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' ph 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "text_pii_redact",
    f"""
    WITH a AS (SELECT doc_id, {_O_AUG_PII} AS aug FROM documents),
    r AS (SELECT doc_id, aug,
                 regexp_replace(regexp_replace(regexp_replace(aug,
                   '{FL.PII_EMAIL}', '<EMAIL>', 'g'),
                   '{FL.PII_IP}', '<IP>', 'g'),
                   '{FL.PII_PHONE}', '<PHONE>', 'g') AS red
          FROM a)
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '{FL.PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(aug, '{FL.PII_IP}')) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(aug, '{FL.PII_PHONE}')) AS BIGINT)
             AS n_phones,
           md5(red) AS redacted_md5,
           red LIKE '%<EMAIL>%' AND red NOT LIKE '%@%' AS email_gone
    FROM r
    """,
    "PII detect + redact: email/IPv4/phone counts and ordered "
    "regexp_replace redaction (emails, then IPs, then phones — order is "
    "part of the contract), verified by md5 of the redacted text; PII "
    "injected deterministically from doc_id (corpus is digit-free)",
    "LLM-pipeline extension (PII detection / redaction)",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" ph 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    a = docs.select("doc_id", aug.alias("aug"))
    red = FL.redact_pii_expr(F.col("aug"))
    return a.select(
        "doc_id",
        FL.pii_count_expr(F.col("aug"), FL.PII_EMAIL).alias("n_emails"),
        FL.pii_count_expr(F.col("aug"), FL.PII_IP).alias("n_ips"),
        FL.pii_count_expr(F.col("aug"), FL.PII_PHONE).alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
        (red.like("%<EMAIL>%") & ~red.like("%@%")).alias("email_gone"),
    )


# ---------------------------------------------------------------------------
# The full composed cleaning pipeline: every filter stage in ONE plan
# ---------------------------------------------------------------------------

_O_PII_LINE = (
    "'contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' ph 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

QUALITY_MIN = 0.3


def _o_corpus_clean_full() -> str:
    red = (
        "regexp_replace(regexp_replace(regexp_replace("
        f"array_to_string(clean, chr(10)), '{FL.PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{FL.PII_IP}', '<IP>', 'g'), '{FL.PII_PHONE}', '<PHONE>', 'g')"
    )
    n_pii = (
        f"len(regexp_extract_all(array_to_string(clean, chr(10)), '{FL.PII_EMAIL}'))"
        f" + len(regexp_extract_all(array_to_string(clean, chr(10)), '{FL.PII_IP}'))"
        f" + len(regexp_extract_all(array_to_string(clean, chr(10)), '{FL.PII_PHONE}'))"
    )
    from hangarbay_spark.operators.sampling import o_hash_bucket

    toks = _o_toks("ctext")
    return f"""
    WITH b AS (SELECT doc_id, substr(text, 1, 40) AS l1,
                      substr(text, 41, 40) AS l2 FROM documents),
    a AS (SELECT doc_id, ({_O_AUG_LINES}) || chr(10) || {_O_PII_LINE} AS aug
          FROM b),
    l AS (SELECT doc_id, str_split(aug, chr(10)) AS lines FROM a),
    c AS (SELECT doc_id, lines,
                 list_filter(lines, (x, i) -> list_position(lines, x) = i)
                   AS clean
          FROM l),
    s AS (SELECT doc_id,
                 CAST(len(lines) - len(clean) AS BIGINT) AS n_dup_lines,
                 CAST({n_pii} AS BIGINT) AS n_pii,
                 {red} AS ctext
          FROM c),
    surv AS (SELECT MIN(doc_id) AS doc_id FROM s
             GROUP BY md5(regexp_replace(lower(trim(ctext)), '\\s+', ' ', 'g'))),
    sd AS (SELECT s.* FROM s JOIN surv USING (doc_id)),
    t AS (SELECT doc_id, {toks} AS tk FROM sd),
    g AS (SELECT doc_id,
                 CASE WHEN len(tk) >= 2 THEN
                   list_transform(generate_series(1, len(tk) - 1),
                                  i -> tk[i] || ' ' || tk[i+1])
                 ELSE [array_to_string(tk, ' ')] END AS grams
          FROM t),
    e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cg AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
    r AS (SELECT doc_id, SUM(cnt) AS total, MAX(cnt) AS top, COUNT(*) AS nd
          FROM cg GROUP BY 1),
    feats AS (
      SELECT t.doc_id,
             CAST(r.top AS DOUBLE) / CAST(r.total AS DOUBLE) AS topf,
             CAST(r.total - r.nd AS DOUBLE) / CAST(r.total AS DOUBLE) AS dupf,
             CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))
                  AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS alphaf,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
               / CAST(len(tk) AS DOUBLE) AS mwl
      FROM t JOIN r USING (doc_id)),
    gated AS (
      SELECT sd.doc_id, sd.n_dup_lines, sd.n_pii, sd.ctext
      FROM sd JOIN feats USING (doc_id)
      WHERE feats.topf <= {TOP_BIGRAM_MAX} AND feats.dupf <= {DUP_BIGRAM_MAX}
        AND feats.alphaf >= {ALPHA_WORD_MIN}
        AND feats.mwl BETWEEN {MEAN_WORD_LEN_RANGE[0]} AND {MEAN_WORD_LEN_RANGE[1]}
        AND ({_o_quality("sd.ctext")}) >= {QUALITY_MIN})
    SELECT {_o_lang_case("ctext")} AS lang_pred,
           CASE WHEN {o_hash_bucket("doc_id")} < 204 THEN 'train'
                WHEN {o_hash_bucket("doc_id")} < 229 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({toks})) AS BIGINT) AS total_tokens,
           CAST(SUM(n_dup_lines) AS BIGINT) AS dup_lines_removed,
           CAST(SUM(n_pii) AS BIGINT) AS pii_redacted
    FROM gated GROUP BY 1, 2
    """


@register(
    "pipeline_corpus_clean_full",
    _o_corpus_clean_full(),
    "the FULL corpus-cleaning DAG in one declarative plan: line-level "
    "dedup -> PII redaction -> exact near-dedup survivors -> Gopher "
    "repetition gate + quality gate -> lang-ID -> deterministic split "
    "-> per-(lang, split) cohort stats with dup-lines-removed and "
    "pii-redacted audit sums. Input augmented deterministically (the "
    "corpus is single-line and PII-free) so every stage does real, "
    "oracle-checked work; the survivors subtree is localCheckpoint'd "
    "(two differently-projected consumers)",
    "pipeline composition (line dedup + PII + dedup + filters + split)",
)
def pipeline_corpus_clean_full(spark, sf_dir):
    from hangarbay_spark.operators import dedup as D
    from hangarbay_spark.operators.sampling import split_expr

    docs = load_table(spark, sf_dir, "documents")
    l1 = F.substring("text", 1, 40)
    l2 = F.substring("text", 41, 40)
    base = F.concat_ws("\n", l1, l2, l1)
    multiline = F.when(
        F.col("doc_id") % 2 == 1, F.concat_ws("\n", base, l1)
    ).otherwise(base)
    pii_line = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" ph 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    aug = F.concat_ws("\n", multiline, pii_line)

    lined = docs.select("doc_id", FL.lines_expr(aug).alias("lines"))
    clean = FL.dedup_lines_expr(F.col("lines"))
    joined = F.array_join(clean, "\n")
    n_pii = (
        FL.pii_count_expr(joined, FL.PII_EMAIL)
        + FL.pii_count_expr(joined, FL.PII_IP)
        + FL.pii_count_expr(joined, FL.PII_PHONE)
    )
    staged = lined.select(
        "doc_id",
        (F.size("lines") - F.size(clean)).cast("bigint").alias("n_dup_lines"),
        n_pii.cast("bigint").alias("n_pii"),
        FL.redact_pii_expr(joined).alias("ctext"),
    )
    # survivors feed two differently-projected consumers (repetition
    # aggregate + the gated join): materialize once
    surv = D.exact_dedup(staged, "doc_id", "ctext").localCheckpoint()

    toks = surv.select("doc_id", X.tokens_expr("ctext").alias("tk"))
    rep = (
        toks.select("doc_id", F.explode(FL.ngrams_expr(F.col("tk"), 2)).alias("gram"))
        .groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("total"),
            F.max("count").alias("top"),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    feats = toks.join(rep, "doc_id").select(
        "doc_id",
        (F.col("top").cast("double") / F.col("total").cast("double")).alias("topf"),
        (
            (F.col("total") - F.col("nd")).cast("double")
            / F.col("total").cast("double")
        ).alias("dupf"),
        FL.alpha_word_fraction_expr(F.col("tk")).alias("alphaf"),
        FL.mean_word_length_expr(F.col("tk")).alias("mwl"),
    )
    gated = (
        surv.join(feats, "doc_id")
        .filter(
            (F.col("topf") <= TOP_BIGRAM_MAX)
            & (F.col("dupf") <= DUP_BIGRAM_MAX)
            & (F.col("alphaf") >= ALPHA_WORD_MIN)
            & F.col("mwl").between(*MEAN_WORD_LEN_RANGE)
            & (X.quality_score_expr("ctext") >= QUALITY_MIN)
        )
        .select("doc_id", "n_dup_lines", "n_pii", "ctext")
    )
    return (
        gated.select(
            X.lang_id_expr("ctext").alias("lang_pred"),
            split_expr("doc_id").alias("split"),
            X.token_count_expr("ctext").alias("n_tokens"),
            "n_dup_lines",
            "n_pii",
        )
        .groupBy("lang_pred", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_dup_lines").cast("bigint").alias("dup_lines_removed"),
            F.sum("n_pii").cast("bigint").alias("pii_redacted"),
        )
    )


# Benchmark-decontamination parameters. Production pipelines match
# 8-13-token n-grams against eval benchmarks; this corpus's ~40-word
# vocabulary makes 3-grams the statistically meaningful analog (longer
# grams are near-unique per doc here).
DECON_N = 3
DECON_MOD = 50  # doc_id % DECON_MOD == 0 -> the held-out "benchmark" set


def _o_decontaminate() -> str:
    from hangarbay_spark.queries.llmops import o_shingles

    return f"""
    WITH toks AS (SELECT doc_id, {O_TOKENS} AS t FROM documents),
    sh AS (SELECT doc_id, {o_shingles(DECON_N)} AS g FROM toks),
    bg AS (SELECT DISTINCT unnest(g) AS gram FROM sh
           WHERE doc_id % {DECON_MOD} = 0),
    cg AS (SELECT doc_id, unnest(g) AS gram FROM sh
           WHERE doc_id % {DECON_MOD} != 0)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
    FROM cg JOIN bg USING (gram)
    GROUP BY doc_id
    """


@register(
    "text_decontaminate",
    _o_decontaminate(),
    "benchmark decontamination: flag corpus documents sharing >=1 "
    "word n-gram with a held-out benchmark set (the eval-leakage scrub "
    "of a training-data pipeline). Benchmark n-gram set is distinct-"
    "deduped and broadcast; corpus postings join against it — cost "
    "scales with corpus postings, never pairwise",
    "LLM-pipeline extension (benchmark decontamination)",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", X.tokens_expr("text").alias("t")
    )
    grams = toks.select(
        "doc_id",
        F.explode(X.shingles_from_tokens(F.col("t"), DECON_N)).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") % DECON_MOD == 0)
        .select("gram")
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") % DECON_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminated_grams"))
    )


@register(
    "quality_constraint_audit",
    """
    WITH m AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS dup_ids,
        CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_ids,
        CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
        CAST(SUM(CASE WHEN length(text) < 20 THEN 1 ELSE 0 END)
          AS BIGINT) AS short_text,
        CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
          AS BIGINT) AS bad_n_chars,
        CAST(SUM(CASE WHEN lang IS NULL OR length(lang) <> 2
                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
        CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_source
      FROM documents)
    SELECT metric, value FROM (
      SELECT 'bad_lang' AS metric, bad_lang AS value FROM m
      UNION ALL SELECT 'bad_n_chars', bad_n_chars FROM m
      UNION ALL SELECT 'dup_ids', dup_ids FROM m
      UNION ALL SELECT 'empty_text', empty_text FROM m
      UNION ALL SELECT 'n_rows', n_rows FROM m
      UNION ALL SELECT 'null_ids', null_ids FROM m
      UNION ALL SELECT 'null_source', null_source FROM m
      UNION ALL SELECT 'short_text', short_text FROM m)
    ORDER BY metric
    """,
    "data-quality constraint audit (the Deequ/Great-Expectations "
    "pattern for training-data intake gates): completeness, "
    "uniqueness, emptiness, length floors, derived-column consistency "
    "(n_chars == length(text)) and domain checks (2-letter lang) "
    "computed in ONE map-side-combined pass over the corpus and "
    "unpivoted to (metric, value) rows — the report a pipeline "
    "asserts on before admitting a crawl batch. At 100 TB this is "
    "one scan; every check is a conditional sum riding the same "
    "aggregate",
    "filters extension (data-quality constraint audit)",
)
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id"))
        .cast("bigint")
        .alias("dup_ids"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_ids"),
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length("text") == 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("empty_text"),
        F.sum(F.when(F.length("text") < 20, 1).otherwise(0))
        .cast("bigint")
        .alias("short_text"),
        F.sum(F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0))
        .cast("bigint")
        .alias("bad_n_chars"),
        F.sum(
            F.when(
                F.col("lang").isNull() | (F.length("lang") != 2), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_lang"),
        F.sum(F.when(F.col("source").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_source"),
    )
    metrics = [
        "bad_lang",
        "bad_n_chars",
        "dup_ids",
        "empty_text",
        "n_rows",
        "null_ids",
        "null_source",
        "short_text",
    ]
    stack = ", ".join(f"'{c}', {c}" for c in metrics)
    return m.selectExpr(
        f"stack({len(metrics)}, {stack}) AS (metric, value)"
    ).orderBy("metric")


_SKEW_RATIO = (
    "round(CAST(max_cnt AS DOUBLE) * CAST(n_distinct AS DOUBLE)"
    " / CAST(n_rows AS DOUBLE), 6)"
)


@register(
    "quality_key_skew_report",
    f"""
    WITH s AS (
      SELECT 'l_orderkey' AS key_name, l_orderkey AS key_val FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
    c AS (SELECT key_name, key_val, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
    a AS (SELECT key_name,
                 CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(MAX(cnt) AS BIGINT) AS max_cnt
          FROM c GROUP BY key_name)
    SELECT key_name, n_rows, n_distinct, max_cnt,
           {_SKEW_RATIO} AS skew_ratio
    FROM a ORDER BY key_name
    """,
    "join-key SKEW diagnosis report — the measurement behind every "
    "salting / AQE-skew-join decision (plans/skew.py): for each "
    "candidate join key of the fact table, distinct-key count, hottest-"
    "key count and the skew ratio max_cnt/(n/n_distinct) (1.0 = "
    "uniform; >>1 = a hot key that will straggle a shuffle join). One "
    "scan: the three key columns stack into (key_name, key_val) rows "
    "JVM-side (zero-shuffle row expansion), one map-side-combined "
    "count onto the key domain, then a 3-row rollup; ratio from exact "
    "integers via shared formula text",
    "quality extension (join-key skew / hot-key audit)",
)
def quality_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.selectExpr(
        "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, "
        "'l_suppkey', l_suppkey) AS (key_name, key_val)"
    )
    a = (
        s.groupBy("key_name", "key_val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("key_name")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("cnt").cast("bigint").alias("max_cnt"),
        )
    )
    return a.select(
        "key_name",
        "n_rows",
        "n_distinct",
        "max_cnt",
        F.expr(_SKEW_RATIO).alias("skew_ratio"),
    ).orderBy("key_name")


# k below which an equivalence class is a re-identification risk.
_KANON_K = 5


@register(
    "quality_k_anonymity",
    f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM customer GROUP BY 1, 2, 3),
    s AS (
      SELECT CAST(COUNT(CASE WHEN k < {_KANON_K} THEN 1 END) AS BIGINT)
               AS small_classes,
             CAST(COALESCE(SUM(CASE WHEN k < {_KANON_K} THEN k END), 0)
               AS BIGINT) AS rows_at_risk
      FROM cls)
    SELECT c.c_nationkey, c.c_mktsegment, c.bal_bucket, c.k,
           s.small_classes, s.rows_at_risk
    FROM cls c, s
    WHERE c.k < {_KANON_K}
    ORDER BY c.k, c.c_nationkey, c.c_mktsegment, c.bal_bucket
    LIMIT 20
    """,
    "k-anonymity privacy audit over quasi-identifiers (nation, market "
    "segment, account-balance bucket): equivalence-class sizes from "
    "one map-side-combined GROUP BY on the bounded QI domain, the 20 "
    "smallest classes below k=5 plus global risk counts (classes at "
    "risk, rows at risk) carried on every row via a 1-row broadcast "
    "scalar — the release gate a training-data pipeline runs before "
    "shipping records containing personal attributes",
    "data-governance extension (k-anonymity audit)",
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cls = (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").alias(
                "bal_bucket"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
        .localCheckpoint()  # class frame feeds the summary + the listing
    )
    s = cls.agg(
        F.expr(
            f"CAST(COUNT(CASE WHEN k < {_KANON_K} THEN 1 END) AS BIGINT)"
        ).alias("small_classes"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN k < {_KANON_K} THEN k END), 0)"
            " AS BIGINT)"
        ).alias("rows_at_risk"),
    )
    return (
        cls.filter(F.col("k") < _KANON_K)
        .crossJoin(F.broadcast(s))
        .orderBy("k", "c_nationkey", "c_mktsegment", "bal_bucket")
        .limit(20)
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bucket",
            "k",
            "small_classes",
            "rows_at_risk",
        )
    )


@register(
    "quality_l_diversity",
    """
    WITH cls AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
      FROM customer GROUP BY 1, 2)
    SELECT c_nationkey, bal_bucket, k, l
    FROM cls WHERE l < 3
    ORDER BY l, k DESC, c_nationkey, bal_bucket
    LIMIT 20
    """,
    "l-diversity audit, the k-anonymity complement: per quasi-"
    "identifier class (nation, balance bucket), the count of DISTINCT "
    "sensitive values (market segment) — a class can be large (k-"
    "anonymous) yet still leak if everyone in it shares one sensitive "
    "value. One grouped distinct-count pass on the bounded QI domain; "
    "worst classes = low diversity with many members first",
    "data-governance extension (l-diversity audit)",
)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cls = cust.groupBy(
        "c_nationkey",
        F.expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").alias(
            "bal_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("l"),
    )
    return (
        cls.filter(F.col("l") < 3)
        .orderBy("l", F.desc("k"), "c_nationkey", "bal_bucket")
        .limit(20)
    )


@register(
    "quality_referential_integrity",
    """
    WITH cust_c AS (SELECT c_custkey FROM customer
                    WHERE c_custkey % 97 != 0),
    part_c AS (SELECT p_partkey FROM part WHERE p_partkey % 97 != 0),
    nat_c AS (SELECT n_nationkey FROM nation WHERE n_nationkey % 7 != 0),
    checks AS (
      SELECT 'orders.o_custkey->customer' AS relation,
             CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_child,
             CAST((SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
                   (SELECT 1 FROM cust_c c
                    WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
               AS n_orphans
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
             CAST((SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM part_c p
                    WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
             CAST((SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
                   (SELECT 1 FROM nat_c n
                    WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    )
    SELECT relation, n_child, n_orphans,
           round(CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE), 6)
             AS orphan_rate
    FROM checks ORDER BY relation
    """,
    "referential-integrity audit (Deequ-style FK checks): orphaned "
    "child rows per relation as count + rate. The parent sides are "
    "deterministically corrupted in-query (every 97th/7th key "
    "dropped) because the synthetic data is fully covered — the same "
    "augmentation discipline as pipeline_corpus_clean, so the "
    "anti-join path is exercised with real violations and the counts "
    "are hash-verified non-zeros. Each check is one LEFT ANTI count "
    "against a pruned single-column parent scan (broadcast at dim "
    "scale; at 100 TB the anti-join shuffles on the FK like any "
    "equi-join)",
    "quality extension (referential-integrity audit)",
)
def quality_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    def check(relation, child, fk, parent, pk, mod):
        par = parent.filter(F.col(pk) % mod != 0).select(pk)
        n_child = child.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child")
        )
        n_orph = (
            child.join(par, child[fk] == par[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        return (
            n_child.crossJoin(n_orph)
            .select(
                F.lit(relation).alias("relation"),
                "n_child",
                "n_orphans",
            )
        )

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    rows = check(
        "orders.o_custkey->customer", orders, "o_custkey",
        customer, "c_custkey", 97,
    ).unionByName(
        check(
            "lineitem.l_partkey->part", lineitem, "l_partkey",
            part, "p_partkey", 97,
        )
    ).unionByName(
        check(
            "customer.c_nationkey->nation",
            customer.select("c_nationkey"), "c_nationkey",
            nation, "n_nationkey", 7,
        )
    )
    return rows.select(
        "relation",
        "n_child",
        "n_orphans",
        F.expr(
            "round(CAST(n_orphans AS DOUBLE) / CAST(n_child AS DOUBLE), 6)"
        ).alias("orphan_rate"),
    ).orderBy("relation")


_PROFILE_COLS = (
    "c_custkey",
    "c_name",
    "c_nationkey",
    "c_acctbal",
    "c_mktsegment",
)


@register(
    "quality_schema_profile",
    f"""
    WITH w AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             {", ".join(
                f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS nulls_{c}, "
                f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS dist_{c}"
                for c in _PROFILE_COLS)}
      FROM customer)
    SELECT u.col AS column_name, w.n_rows, u.n_nulls, u.n_distinct,
           round(CAST(w.n_rows - u.n_nulls AS DOUBLE)
                 / CAST(w.n_rows AS DOUBLE), 6) AS completeness
    FROM w, (
      {" UNION ALL ".join(
        f"SELECT '{c}' AS col, nulls_{c} AS n_nulls, dist_{c} AS n_distinct "
        f"FROM w" for c in _PROFILE_COLS)}
    ) u
    ORDER BY column_name
    """,
    "one-pass schema/data profiling (the DESCRIBE-EXTENDED / Deequ "
    "profile shape): per column null count, exact distinct count and "
    "completeness ratio for the customer table — one wide aggregate "
    "over a single scan (Spark plans the multi-distinct via expand, "
    "still one pass), unpivoted to a row per column. The pre-flight "
    "every ingestion job runs before trusting a new feed",
    "quality extension (schema/data profiling)",
)
def quality_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nulls_{c}")
        )
        aggs.append(
            F.countDistinct(c).cast("bigint").alias(f"dist_{c}")
        )
    w = cust.agg(*aggs)
    arr = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.col(f"dist_{c}").alias("n_distinct"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        w.select("n_rows", F.explode(arr).alias("u"))
        .select(
            F.col("u.col").alias("column_name"),
            "n_rows",
            F.col("u.n_nulls").alias("n_nulls"),
            F.col("u.n_distinct").alias("n_distinct"),
            F.expr(
                "round(CAST(n_rows - u.n_nulls AS DOUBLE) "
                "/ CAST(n_rows AS DOUBLE), 6)"
            ).alias("completeness"),
        )
        .orderBy("column_name")
    )


# t-closeness term: per (class, sensitive value), |p - q| between the
# class share and the global share — both shares 6 dp-rounded before
# the subtraction, the term re-rounded, TVD = 0.5 * exact decimal sum.
_TCLOSE_TERM = (
    "round(abs(round(CAST(n AS DOUBLE) / CAST(k AS DOUBLE), 6) "
    "- round(CAST(g AS DOUBLE) / CAST(nt AS DOUBLE), 6)), 6)"
)


@register(
    "quality_t_closeness",
    f"""
    WITH cell AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3),
    cls AS (SELECT c_nationkey, bal_bucket, CAST(SUM(n) AS BIGINT) AS k
            FROM cell GROUP BY 1, 2),
    seg AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS g
            FROM customer GROUP BY 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM customer),
    grid AS (
      SELECT cls.c_nationkey, cls.bal_bucket, cls.k,
             seg.c_mktsegment, seg.g, nn.nt, COALESCE(cell.n, 0) AS n
      FROM cls CROSS JOIN seg CROSS JOIN nn
      LEFT JOIN cell ON cls.c_nationkey = cell.c_nationkey
                    AND cls.bal_bucket = cell.bal_bucket
                    AND seg.c_mktsegment = cell.c_mktsegment),
    t AS (
      SELECT c_nationkey, bal_bucket, k, {_TCLOSE_TERM} AS term
      FROM grid),
    tv AS (
      SELECT c_nationkey, bal_bucket, CAST(MAX(k) AS BIGINT) AS k,
             round(0.5 * CAST(SUM(CAST(term AS DECIMAL(20,6)))
                              AS DOUBLE), 6) AS tvd
      FROM t GROUP BY 1, 2)
    SELECT c_nationkey, bal_bucket, k, tvd
    FROM tv ORDER BY tvd DESC, c_nationkey, bal_bucket LIMIT 20
    """,
    "t-closeness audit — the third leg of the privacy trio with "
    "k-anonymity and l-diversity: per QI class, the total-variation "
    "distance between its sensitive-value (market segment) "
    "distribution and the global one; a class can be large AND "
    "diverse yet still leak if its mix is skewed. Shares computed "
    "on the bounded class x segment grid (never the raw rows), TVD "
    "from 6 dp-guarded terms with an exact decimal sum; 20 worst "
    "classes surface",
    "data-governance extension (t-closeness audit)",
)
def quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bb = F.expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").alias(
        "bal_bucket"
    )
    cell = cust.groupBy("c_nationkey", bb, "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cls = cell.groupBy("c_nationkey", "bal_bucket").agg(
        F.sum("n").cast("bigint").alias("k")
    )
    seg = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("g")
    )
    nn = cust.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    grid = (
        cls.crossJoin(F.broadcast(seg))
        .crossJoin(F.broadcast(nn))
        .join(
            F.broadcast(cell),
            ["c_nationkey", "bal_bucket", "c_mktsegment"],
            "left",
        )
        .select(
            "c_nationkey",
            "bal_bucket",
            "k",
            "g",
            "nt",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    t = grid.select(
        "c_nationkey", "bal_bucket", "k", F.expr(_TCLOSE_TERM).alias("term")
    )
    tv = t.groupBy("c_nationkey", "bal_bucket").agg(
        F.max("k").cast("bigint").alias("k"),
        F.expr(
            "round(0.5 * CAST(SUM(CAST(term AS DECIMAL(20,6))) "
            "AS DOUBLE), 6)"
        ).alias("tvd"),
    )
    return (
        tv.select("c_nationkey", "bal_bucket", "k", "tvd")
        .orderBy(F.desc("tvd"), "c_nationkey", "bal_bucket")
        .limit(20)
    )


# Functional-dependency candidates audited: (table, lhs -> rhs).
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("lineitem", "l_orderkey", "l_returnflag"),
)


def _o_fd() -> str:
    arms = []
    for t, lhs, rhs in _FD_CANDIDATES:
        arms.append(
            f"""
    SELECT '{t}.{lhs} -> {t}.{rhs}' AS dependency,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_lhs,
           CAST(MAX(nd) AS BIGINT) AS max_rhs_per_lhs,
           CASE WHEN MAX(nd) = 1 THEN 1 ELSE 0 END AS holds
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd
          FROM {t} GROUP BY {lhs})"""
        )
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(arms)
        + ") ORDER BY dependency"
    )


@register(
    "quality_functional_dependencies",
    _o_fd(),
    "functional-dependency discovery (the Metanome/profiling "
    "workload): for each candidate lhs -> rhs, count lhs values "
    "mapping to more than one distinct rhs — zero violations proves "
    "the dependency (key discovery, denormalization safety, "
    "dimension-hierarchy validation). Each candidate is one "
    "map-side-combined (lhs, distinct-rhs) rollup collapsed to a "
    "1-row verdict; all counts exact integers, no float discipline. "
    "Candidates on one table SHARE a scan (struct-array explode, "
    "grouping-sets style): 3 table scans serve 6 audits — at 100 TB "
    "the scan is the cost",
    "quality extension (functional-dependency / key discovery)",
)
def quality_functional_dependencies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Candidates on the same table share ONE scan (VERDICT r6 task #6)
    # via GROUPING SETS ((lhs1,rhs1),(lhs2,rhs2),...): the big shuffle
    # keys keep their NATIVE types (an A/B against the struct-explode
    # form with string-cast keys measured 1.65 s vs 2.9 s at sf0.1),
    # and the output is already the distinct (lhs, rhs) CELL set per
    # candidate — nd per lhs is then a count of non-null-rhs cells
    # (count(distinct rhs) ignores nulls; a null-rhs cell must not
    # count) and every downstream step runs on aggregated cells.
    by_table: dict[str, list[tuple[int, str, str]]] = {}
    for i, (t, lhs, rhs) in enumerate(_FD_CANDIDATES):
        by_table.setdefault(t, []).append((i, lhs, rhs))
    label = F.lit(None).cast("string")
    for i, (t, lhs, rhs) in enumerate(_FD_CANDIDATES):
        label = F.when(
            F.col("cid") == i, F.lit(f"{t}.{lhs} -> {t}.{rhs}")
        ).otherwise(label)
    out = None
    for t, cands in by_table.items():
        # grouping_id identifies a candidate by its column SET, so two
        # same-table candidates over the same {lhs, rhs} (a dependency
        # and its reverse) would collide and silently mislabel both —
        # refuse rather than corrupt the audit
        sets = [frozenset((lhs, r)) for _, lhs, r in cands]
        if len(set(sets)) != len(sets):
            raise ValueError(
                f"{t}: two FD candidates share a column set — "
                "grouping_id cannot distinguish a dependency from its "
                "reverse; audit them in separate queries"
            )
        # nb: an EMPTY table yields zero verdict rows here while the
        # per-candidate oracle aggregate yields one all-zero row — the
        # audited tables are never empty (enforced upstream by
        # quality_constraint_audit's row-count floors)
        tbl = load_table(spark, sf_dir, t)
        cols = sorted({c for _, l, r in cands for c in (l, r)})
        cells = tbl.groupingSets(
            [[F.col(l), F.col(r)] for _, l, r in cands],
            *[F.col(c) for c in cols],
        ).agg(F.grouping_id().alias("gid"))
        # grouping_id: bit j (MSB-first over ``cols``) set = column NOT
        # grouped in this set — identifies which candidate a cell
        # belongs to; data-level nulls don't perturb it
        cid_e = F.lit(None).cast("int")
        lhs_e = F.lit(None).cast("string")
        rhs_nn = F.lit(None).cast("int")
        for i, l, r in cands:
            gid = 0
            for j, c in enumerate(cols):
                if c not in (l, r):
                    gid |= 1 << (len(cols) - 1 - j)
            cond = F.col("gid") == gid
            cid_e = F.when(cond, F.lit(i)).otherwise(cid_e)
            lhs_e = F.when(cond, F.col(l).cast("string")).otherwise(lhs_e)
            rhs_nn = F.when(
                cond, F.col(r).isNotNull().cast("int")
            ).otherwise(rhs_nn)
        per_lhs = (
            cells.select(
                cid_e.alias("cid"), lhs_e.alias("lhs"), rhs_nn.alias("rnn")
            )
            .groupBy("cid", "lhs")
            .agg(F.sum("rnn").alias("nd"))
        )
        verdict = per_lhs.groupBy("cid").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lhs"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("violating_lhs"),
            F.max("nd").cast("bigint").alias("max_rhs_per_lhs"),
            F.when(F.max("nd") == 1, 1).otherwise(0).alias("holds"),
        )
        out = verdict if out is None else out.unionByName(verdict)
    return out.select(
        label.alias("dependency"),
        "n_lhs",
        "violating_lhs",
        "max_rhs_per_lhs",
        "holds",
    ).orderBy("dependency")


# per-cell MI term: p_xy * ln(p_xy / (p_x p_y)) with the ln 6 dp-rounded
# (transcendental guard) and the product 9 dp-rounded, decimal-summed.
_MI_LNR = (
    "round(ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE) "
    "/ (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 6)"
)
_MI_TERM = f"round(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE) * {_MI_LNR}, 9)"
# label entropy term (for the normalized readout)
_MI_HTERM = (
    "round(-(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)) "
    "* round(ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 6), 9)"
)

_MI_FEATURES = ("o_orderpriority", "c_mktsegment", "c_nationkey")


def _o_mutual_information() -> str:
    arms = []
    for f in _MI_FEATURES:
        arms.append(
            f"""
    SELECT '{f}' AS feature, nxy, nx, ny, n FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS nxy,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY {f}) AS BIGINT) AS nx,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY o_orderstatus)
               AS BIGINT) AS ny,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      FROM j GROUP BY {f}, o_orderstatus)"""
        )
    return f"""
    WITH j AS (
      SELECT o.o_orderpriority, o.o_orderstatus,
             c.c_mktsegment, c.c_nationkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cells AS ({" UNION ALL ".join(arms)}),
    mi AS (
      SELECT feature,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(CAST({_MI_TERM} AS DECIMAL(20,9))) AS DOUBLE)
               AS mutual_info
      FROM cells GROUP BY feature),
    lab AS (
      SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS ny,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      FROM j GROUP BY o_orderstatus),
    h AS (
      SELECT CAST(SUM(CAST({_MI_HTERM} AS DECIMAL(20,9))) AS DOUBLE)
        AS h_label
      FROM lab)
    SELECT feature, n_cells, mutual_info,
           round(mutual_info / h_label, 6) AS normalized_mi
    FROM mi CROSS JOIN h
    WHERE h_label > 0.0
    ORDER BY mutual_info DESC, feature
    """


@register(
    "quality_mutual_information",
    _o_mutual_information(),
    "mutual-information feature ranking (information-gain feature "
    "selection): MI(feature; order status) for three candidate "
    "features from exact contingency counts — which columns actually "
    "predict the label, before anyone trains on them. Each feature's "
    "cell/marginal counts come from ONE grouped pass with window "
    "marginals; ln terms are 6 dp-guarded, per-cell products 9 dp, "
    "sums exact decimals; normalized by the exact label entropy. At "
    "100 TB: one fact-dim join + one grouped pass per feature over "
    "bounded category domains",
    "quality extension (mutual information / feature relevance)",
)
def quality_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(
        "o_orderpriority", "o_orderstatus", "c_mktsegment", "c_nationkey"
    ).localCheckpoint()  # one pass per feature + the label entropy
    cells = None
    for f in _MI_FEATURES:
        g = j.groupBy(f, "o_orderstatus").agg(
            F.count(F.lit(1)).cast("bigint").alias("nxy")
        )
        arm = g.select(
            F.lit(f).alias("feature"),
            "nxy",
            F.sum("nxy").over(W.partitionBy(f)).cast("bigint").alias("nx"),
            F.sum("nxy")
            .over(W.partitionBy("o_orderstatus"))
            .cast("bigint")
            .alias("ny"),
            F.sum("nxy")
            .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .cast("bigint")
            .alias("n"),
        )
        cells = arm if cells is None else cells.unionByName(arm)
    mi = cells.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.expr(_MI_TERM).cast("decimal(20,9)"))
        .cast("double")
        .alias("mutual_info"),
    )
    lab = j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("ny")
    ).select(
        "ny",
        F.sum("ny")
        .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("bigint")
        .alias("n"),
    )
    h = lab.agg(
        F.sum(F.expr(_MI_HTERM).cast("decimal(20,9)"))
        .cast("double")
        .alias("h_label")
    )
    return (
        mi.crossJoin(F.broadcast(h))
        .filter(F.col("h_label") > 0.0)
        .select(
            "feature",
            "n_cells",
            "mutual_info",
            F.expr("round(mutual_info / h_label, 6)").alias(
                "normalized_mi"
            ),
        )
        .orderBy(F.desc("mutual_info"), "feature")
    )


@register(
    "quality_duplicate_transactions",
    """
    WITH o0 AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS d
      FROM orders),
    o AS (
      SELECT * FROM o0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_totalprice, d + 3
      FROM o0 WHERE o_orderkey % 97 = 0),
    b AS (
      SELECT o_orderkey, o_custkey, o_totalprice, d,
             CAST(d // 7 AS BIGINT) AS wk
      FROM o),
    exp AS (
      SELECT o_orderkey, o_custkey, o_totalprice, d, wk + off AS wk
      FROM b CROSS JOIN (SELECT unnest([0, 1]) AS off) t),
    pairs AS (
      SELECT a.o_orderkey AS order_a, bb.o_orderkey AS order_b,
             a.o_custkey AS custkey, a.o_totalprice AS amount,
             CAST(abs(a.d - bb.d) AS BIGINT) AS day_gap
      FROM exp a JOIN b bb
        ON a.wk = bb.wk
       AND a.o_custkey = bb.o_custkey
       AND a.o_totalprice = bb.o_totalprice
       AND a.o_orderkey < bb.o_orderkey
      WHERE abs(a.d - bb.d) <= 7)
    SELECT DISTINCT order_a, order_b, custkey, amount, day_gap
    FROM pairs
    ORDER BY custkey, order_a, order_b
    """,
    "forensic duplicate-transaction detection: same customer, "
    "IDENTICAL amount, within 7 days — the double-charge / duplicate-"
    "invoice audit. Amounts are near-unique in the synthetic data, so "
    "duplicates are injected deterministically in-query (every 97th "
    "order re-posted 3 days later under an offset key — the "
    "referential-integrity-audit precedent) so the detection path is "
    "exercised with non-zero hash-verified matches. Non-equi time window via the 1D-binned pattern: "
    "each order expands into its own and the NEXT week bin (points "
    "expand, never pairs), candidates equi-join on (bin, customer, "
    "amount), the exact day-gap predicate verifies, a<b + DISTINCT "
    "canonicalize double-counted bin matches. All integers/exact "
    "doubles. At 100 TB: candidates are bounded by per-(customer, "
    "amount) frequency — no cross join anywhere",
    "quality extension (duplicate-transaction forensics)",
)
def quality_duplicate_transactions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o0 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    )
    o = o0.unionByName(
        o0.filter(F.col("o_orderkey") % 97 == 0).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            (F.col("d") + 3).alias("d"),
        )
    )
    b = o.select(
        "*", (F.col("d") / 7).cast("bigint").alias("wk")
    ).localCheckpoint()  # expanded left side + bare right side
    exp = b.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "d",
        F.explode(F.array(F.col("wk"), F.col("wk") + 1)).alias("wk"),
    )
    right = b.select(
        F.col("o_orderkey").alias("order_b"),
        F.col("o_custkey").alias("o_custkey"),
        F.col("o_totalprice").alias("o_totalprice"),
        F.col("d").alias("db"),
        "wk",
    )
    pairs = (
        exp.join(right, ["wk", "o_custkey", "o_totalprice"])
        .filter(
            (F.col("o_orderkey") < F.col("order_b"))
            & (F.abs(F.col("d") - F.col("db")) <= 7)
        )
        .select(
            F.col("o_orderkey").alias("order_a"),
            "order_b",
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("amount"),
            F.abs(F.col("d") - F.col("db")).cast("bigint").alias("day_gap"),
        )
        .distinct()
    )
    return pairs.orderBy("custkey", "order_a", "order_b")


@register(
    "quality_snapshot_diff",
    """
    WITH v1 AS (SELECT doc_id, source, text FROM documents),
    v2 AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT -(doc_id + 1), source,
             'new doc ' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 151 = 0),
    j AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN md5(a.source || '|' || a.text)
                       <> md5(b.source || '|' || b.text) THEN 'changed'
                  ELSE 'unchanged' END AS kind
      FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM j GROUP BY kind ORDER BY kind
    """,
    "table-snapshot DIFF (the lakehouse version-audit every "
    "Delta/Iceberg rollout runs before swapping a table pointer): v2 "
    "is derived deterministically in-query (every 97th doc deleted, "
    "every 13th text revised, every 151st re-inserted under a negated "
    "key — disjoint from the non-negative id domain at ANY scale), "
    "rows are keyed full-outer-joined and classified "
    "added/removed/changed/unchanged by a row-content fingerprint "
    "md5(source || text) — content comparison, not column-by-column "
    "drift-prone equality. One key shuffle; the fingerprint is a scan-"
    "side projection, so at 100 TB the diff costs one sort-merge join "
    "over the two snapshots regardless of column count",
    "quality extension (snapshot diff / version audit)",
)
def quality_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", "source", "text")
    v2 = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select(
            "doc_id",
            "source",
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 151 == 0).select(
                (-(F.col("doc_id") + 1)).alias("doc_id"),
                "source",
                F.concat(
                    F.lit("new doc "), F.col("doc_id").cast("string")
                ).alias("text"),
            )
        )
    )
    fp = lambda s, t: F.md5(F.concat(s, F.lit("|"), t))  # noqa: E731
    a = v1.select(
        F.col("doc_id").alias("id_a"),
        fp(F.col("source"), F.col("text")).alias("fp_a"),
    )
    b = v2.select(
        F.col("doc_id").alias("id_b"),
        fp(F.col("source"), F.col("text")).alias("fp_b"),
    )
    j = a.join(b, a["id_a"] == b["id_b"], "full_outer").select(
        F.coalesce("id_a", "id_b").alias("doc_id"),
        F.when(F.col("id_a").isNull(), "added")
        .when(F.col("id_b").isNull(), "removed")
        .when(F.col("fp_a") != F.col("fp_b"), "changed")
        .otherwise("unchanged")
        .alias("kind"),
    )
    return (
        j.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
        .orderBy("kind")
    )


# Flesch reading-ease, every operand forced to DOUBLE in ONE shared
# formula text (the decimal-literal-typing guard): 206.835 - 1.015*
# (words/sentences) - 84.6*(syllables/words), rounded at 6 dp.
_FLESCH_TEXT = (
    "round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents) "
    "- 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 6)"
)


@register(
    "quality_readability_flesch",
    f"""
    WITH c AS (
      SELECT doc_id, lang,
             CAST(len(str_split_regex(lower(trim(text)), '\\s+'))
                  AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syll,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sents
      FROM documents)
    SELECT doc_id, lang, n_words, n_sents, n_syll,
           {_FLESCH_TEXT} AS flesch
    FROM c WHERE n_words > 0
    ORDER BY flesch ASC, doc_id
    LIMIT 30
    """,
    "Flesch reading-ease scoring (Flesch 1948; the readability gate in "
    "classic quality-filter stacks next to stopword/length ratios): "
    "words = whitespace tokens, syllables approximated as vowel-group "
    "runs ([aeiouy]+ — the standard regex proxy), sentences = "
    "terminal-punctuation runs floored at 1. All three counts are "
    "exact integers from JVM-side regex projections (zero shuffle "
    "before the top-k); the formula is one shared DOUBLE-cast text "
    "rounded at 6 dp. Returns the 30 hardest-to-read docs — the "
    "low-readability tail a corpus triage inspects first",
    "quality extension (Flesch readability scoring)",
)
def quality_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition-to-spread-CPU: two regexp_extract_all passes over the
    # full text are the cost, and a single-file corpus scans as ONE
    # split (sf1 A/B: 2.8 s single-split vs 1.5 s spread)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    c = docs.select(
        "doc_id",
        "lang",
        X.token_count_expr("text").alias("n_words"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
        )
        .cast("bigint")
        .alias("n_syll"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
            F.lit(1),
        )
        .cast("bigint")
        .alias("n_sents"),
    )
    return (
        c.filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "lang",
            "n_words",
            "n_sents",
            "n_syll",
            F.expr(_FLESCH_TEXT).alias("flesch"),
        )
        .orderBy(F.asc("flesch"), "doc_id")
        .limit(30)
    )
