"""Scalable fuzzy string matching via deletion neighborhoods.

The FastSS / SymSpell family (Bocek et al., "Fast Similarity Search in
Large Dictionaries", 2007 — public algorithm): every string generates
its 1-deletion neighborhood (the string itself plus each
single-character deletion). Two strings within Levenshtein distance 1
MUST share at least one neighborhood member:

- equal strings share the string itself,
- a substitution at position i makes both 1-deletions at i equal,
- an insertion/deletion makes one string's 1-deletion equal the other
  string itself.

So an equi-join on exploded neighborhood members is a COMPLETE candidate
generator for distance <= 1, and ``levenshtein() <= 1`` verification
makes it exact. At 100 TB this is the scalable shape of a fuzzy
self-join: the O(n^2) distance matrix becomes one explode (x(L+1) rows)
plus one hash shuffle on short variant strings, with per-bucket work
bounded by neighborhood collisions instead of corpus size — the same
inverted-index discipline as the n-gram Jaccard dedup path
(operators/dedup.py).

Reference parity: the reference engine exposes only a scalar
edit-distance probe filter (see queries/relational.py:
scalar_levenshtein_fuzzy); this extends it to the pairwise
entity-resolution join its data-cleaning pipelines would need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood_expr(s: Column | str) -> Column:
    """Array of the string plus each single-character deletion,
    de-duplicated (array_union) so repeated characters don't emit the
    same variant twice. 1-indexed substring arithmetic keeps the
    construction textually parallel to the DuckDB oracle's
    ``substr(s,1,i-1) || substr(s,i+1)``."""
    c = F.col(s) if isinstance(s, str) else s
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            c.substr(F.lit(1), i - 1), c.substr(i + 1, F.length(c)),
        ),
    )
    return F.array_union(F.array(c), dels)


def deletion_join(
    df: DataFrame, id_col: str, text_col: str, max_dist: int = 1
) -> DataFrame:
    """Exact fuzzy self-join: all unordered pairs with
    ``levenshtein(a, b) <= max_dist`` (only ``max_dist=1`` is supported
    — the 1-deletion neighborhood is complete for distance 1 only).

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``. One explode +
    one equi-join shuffle on variant strings; candidates are verified
    with the exact DP distance so false positives never survive.
    """
    if max_dist != 1:
        raise ValueError("deletion_join supports max_dist=1 only")
    # POSITIONED FastSS: candidates come from two composite-key
    # equi-joins instead of one join on the bare variant. A lev<=1 pair
    # is always found by one of them:
    #   - substitution at p (or equal strings): both 1-deletions at the
    #     SAME position p are equal -> join deletions on (hash, pos);
    #   - insertion/deletion: the longer string's 1-deletion equals the
    #     shorter string itself -> join identities against deletions on
    #     the hash alone.
    # The position in the key is what makes this linear in corpus size:
    # a (variant, pos) bucket holds only strings that reconstruct by
    # inserting SOME character at pos — at most |alphabet| of them — so
    # candidates are O(n * L * |alphabet|), where bare-variant buckets
    # grow with the corpus (sequential zero-padded keys measured 218M
    # candidate enumerations at sf1 vs ~22M positioned). Hashing the
    # variant keeps the shuffle key 8 bytes; collisions only add
    # candidates and the DP verify removes them.
    c = F.col(text_col)
    # sequence(1, 0) counts DOWN — guard empty strings (they have no
    # deletions; the identity side still posts them, so ""-vs-"x"
    # pairs are found through "x"'s deletion).
    positioned = F.when(
        F.length(c) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.struct(
                F.concat(
                    c.substr(F.lit(1), i - 1), c.substr(i + 1, F.length(c))
                ).alias("var"),
                i.alias("pos"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<var:string,pos:int>>"))
    dels = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__s"),
        F.explode(positioned).alias("__v"),
    ).select(
        "__id",
        "__s",
        F.xxhash64("__v.var").alias("__vh"),
        F.col("__v.pos").alias("__pos"),
    )
    # THREE consumers (both sides of the substitution join + the
    # deletion side of the indel join) re-derived the explode+hash off
    # a single-row-group scan (serial; ReuseExchange does not dedup
    # differently-aliased consumers) — materialize it once, spread
    # (multi-consumer + single-split rules).
    dels = dels.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "__vh"
    ).localCheckpoint()
    idents = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__s"),
        F.xxhash64(text_col).alias("__vh"),
    )

    def verified(cand: DataFrame) -> DataFrame:
        # Thresholded levenshtein (Spark 3.5+): banded DP with early
        # termination, O(k*n) per candidate — returns -1 above the
        # threshold, the exact distance otherwise. Verify BEFORE the
        # distinct so the dedup shuffle carries bare id/dist triples.
        dist = F.levenshtein("__sa", "__sb", max_dist)
        return cand.filter(dist >= 0).select(
            "id_a", "id_b", dist.cast("bigint").alias("dist")
        )

    a, b = dels.alias("a"), dels.alias("b")
    subs = (
        a.join(
            b,
            (F.col("a.__vh") == F.col("b.__vh"))
            & (F.col("a.__pos") == F.col("b.__pos")),
        )
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__s").alias("__sa"),
            F.col("b.__s").alias("__sb"),
        )
    )
    i, d = idents.alias("i"), dels.alias("d")
    indels = (
        i.join(d, F.col("i.__vh") == F.col("d.__vh"))
        .filter(F.col("i.__id") != F.col("d.__id"))
        .select(
            F.least("i.__id", "d.__id").alias("id_a"),
            F.greatest("i.__id", "d.__id").alias("id_b"),
            F.col("i.__s").alias("__sa"),
            F.col("d.__s").alias("__sb"),
        )
    )
    return verified(subs).unionByName(verified(indels)).distinct()
