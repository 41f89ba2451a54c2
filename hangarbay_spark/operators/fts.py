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
