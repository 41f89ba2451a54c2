"""Corpus-filtering operators for LLM training-data pipelines:
repetition features, cleanliness ratios, line-level dedup, and PII
detection/redaction.

These are the standard cheap document filters described in public
training-data literature (Rae et al. 2021 "Gopher" §A1.1 repetition
filters; Raffel et al. 2020 "C4" cleaning heuristics) re-expressed as
pure Column expressions — JVM-side, codegen'd, zero shuffle per
document — so they stream through a 100 TB `documents` scan. Every
function has a DuckDB-expressible twin (queries/filters.py), keeping
the whole family oracle-checkable.

The one intentionally-distributed operator is top-n-gram counting
(queries/filters.py:text_repetition_filter): per-document mode of an
n-gram multiset is computed by explode → groupBy(doc_id, gram) →
max(count) — one shuffle, linear in corpus size — instead of an O(k²)
per-row higher-order-function scan, because at 100 TB the shuffle
formulation is the one that parallelizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Line-level features (C4 operates line-by-line; Gopher drops docs whose
# duplicate-line fraction exceeds 0.30)
# --------------------------------------------------------------------------


def lines_expr(text: Column | str) -> Column:
    """Text split into lines (keeps empties — blank lines are real lines)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(t, "\n")


def duplicate_line_fraction_expr(lines: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line
    (0.0 for the empty document). Takes an ALREADY-PROJECTED line-array
    column — same HOF subexpression-elimination rule as
    text.shingles_from_tokens."""
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    return F.when(n > 0, (n - nd).cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def dedup_lines_expr(lines: Column) -> Column:
    """Lines with later duplicates removed, first occurrence kept, order
    preserved — the line-level dedup pass of a C4-style cleaner.
    Spark's filter lambda index is 0-based while array_position is
    1-based, hence the ``i + 1``."""
    return F.filter(lines, lambda x, i: F.array_position(lines, x) == i + 1)


# --------------------------------------------------------------------------
# Word-level cleanliness ratios (Gopher §A1.1)
# --------------------------------------------------------------------------


def alpha_word_fraction_expr(toks: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter (Gopher
    drops docs where < 0.80). Takes the materialized token array."""
    n = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    return F.when(n > 0, n_alpha.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def mean_word_length_expr(toks: Column) -> Column:
    """Mean token length in characters (Gopher keeps 3..10). Exact
    bigint sum / bigint count — no FP accumulation order issues."""
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def symbol_word_ratio_expr(text: Column | str, toks: Column) -> Column:
    """Symbol-to-word ratio: occurrences of #, …, or ... per token
    (Gopher drops > 0.10)."""
    t = F.col(text) if isinstance(text, str) else text
    n_sym = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), 0))
    n = F.size(toks)
    return F.when(n > 0, n_sym.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


# --------------------------------------------------------------------------
# N-gram arrays for repetition counting (duplicates KEPT — these feed
# multiset counts, unlike text.shingles_from_tokens which is distinct-set)
# --------------------------------------------------------------------------


def ngrams_expr(toks: Column, n: int = 2) -> Column:
    """Word n-grams over a materialized token array, duplicates kept
    (1-indexed element_at, identical to the DuckDB list_transform twin).
    Short documents fall back to the whole text as one gram."""
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(sz >= n, grams).otherwise(F.array(F.array_join(toks, " ")))


# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------
# Regex subset chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround, ASCII classes only.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

# Redaction order matters and is part of the contract: emails first
# (their local part may contain digits that would half-match the phone
# pattern), then IPs (dotted digits would otherwise partially match
# phones), then phones.
_PII_ORDER = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_IP, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def pii_count_expr(text: Column | str, pattern: str) -> Column:
    """Number of matches of one PII pattern (BIGINT)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(pattern), 0)).cast("bigint")


def redact_pii_expr(text: Column | str) -> Column:
    """Text with emails, IPv4s, and phone numbers replaced by typed
    placeholder tags, applied in _PII_ORDER."""
    out = F.col(text) if isinstance(text, str) else text
    for pat, tag in _PII_ORDER:
        out = F.regexp_replace(out, pat, tag)
    return out
