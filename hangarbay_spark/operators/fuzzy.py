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
    # Join on the 64-bit hash of the variant, not the string: an 8-byte
    # shuffle key instead of |s|-byte strings. Hash collisions can only
    # ADD candidates, and every candidate is verified with the exact DP
    # distance — completeness and exactness are both preserved. (A
    # positioned-FastSS variant — join also on deletion position — was
    # measured SLOWER here: dropping the array_union dedup to keep
    # positions inflates postings on equal-character runs more than the
    # position predicate prunes.)
    posts = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__s"),
        F.explode(deletion_neighborhood_expr(text_col)).alias("__var"),
    ).select("__id", "__s", F.xxhash64("__var").alias("__vh"))
    a, b = posts.alias("a"), posts.alias("b")
    # Thresholded levenshtein (Spark 3.5+): banded DP with early
    # termination, O(k*n) per candidate instead of O(n^2) — measured 2x
    # faster than the unbounded DP on ~1M candidates. Returns -1 above
    # the threshold, the exact distance (<= max_dist) otherwise.
    dist = F.levenshtein(F.col("a.__s"), F.col("b.__s"), max_dist)
    # Verify BEFORE the distinct: the DP on candidate multiplicity is
    # codegen'd and cheap, and the dedup shuffle then carries only the
    # verified (id_a, id_b, dist) triples instead of full name pairs.
    return (
        a.join(b, F.col("a.__vh") == F.col("b.__vh"))
        .filter((F.col("a.__id") < F.col("b.__id")) & (dist >= 0))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            dist.cast("bigint").alias("dist"),
        )
        .distinct()
    )
