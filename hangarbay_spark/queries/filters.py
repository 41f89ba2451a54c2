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
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", X.tokens_expr("text").alias("toks")
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
