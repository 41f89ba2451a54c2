"""Bounded-state frequent-items (heavy hitters) over arbitrary streams.

The 100 TB problem: "which tokens exceed phi of the corpus" via a plain
GROUP BY shuffles the full token stream (corpus-scale exchange) and the
group-by state is the whole vocabulary. The classic two-pass answer
(Misra-Gries / "Frequent" algorithm; Misra & Gries 1982, and the merge
analysis of Agarwal et al., "Mergeable Summaries", PODS 2012):

1. **Candidates** — each partition maintains at most ``k`` counters via
   weighted Misra-Gries (constant memory, one pass, no shuffle). A
   partition guarantees every item with partition frequency
   > n_p/(k+1) survives. By pigeonhole, an item with GLOBAL frequency
   > n/(k+1) exceeds that bar in at least one partition, so with
   ``k + 1 >= 1/phi`` the union of partition candidates contains every
   true phi-heavy hitter — **no false negatives**. Output is
   <= k * num_partitions rows: broadcast-sized by construction.
2. **Exact verify** — a second scan counts ONLY the candidate items
   (broadcast semi join; the groupBy shuffles candidate rows only) and
   the exact threshold test removes false positives.

The composition is therefore EXACT — identical to the quadratic-state
GROUP BY oracle — while per-executor state stays O(k) and the only
shuffle carries candidate-item rows. This is the candidates->verify
pattern the repo uses for every near-dup family, applied to frequency.

Why mapInPandas (the slow path): the bounded-counter contract — "evict
the minimum and decrement on overflow" — is inherently sequential
per-partition state that no DataFrame op expresses; the kernel is
Arrow-batched and pre-aggregates each batch with vectorized
``value_counts`` before touching the dict, so Python-loop work is
O(distinct-per-batch), not O(rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def misra_gries_summary(
    df: DataFrame, col: str, k: int, weight_col: str | None = None
) -> DataFrame:
    """Per-partition weighted Misra-Gries summaries of ``df[col]``.

    Returns (item, cnt) rows, at most ``k`` per partition; cnt is the
    MG lower-bound counter (undercounts by at most that partition's
    decrement mass, which the n_p/(k+1) bound prices — with weights,
    n is the total WEIGHT mass and the guarantee covers every item
    whose mass exceeds n/(k+1)). ``weight_col`` must hold positive
    integers (exact arithmetic; decimal weights should be pre-scaled
    to integer units, e.g. cents). The item set is a SUPERSET of every
    item whose frequency/mass exceeds n/(k+1) (see module docstring).
    Output is bounded (k rows/partition), so downstream merges may
    treat it as a by-contract-small frame.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # vectorized batch pre-aggregation: the dict sees one
            # (item, weight) update per DISTINCT item in the batch
            agg = (
                pdf.groupby(col)[weight_col].sum()
                if weight_col is not None
                else pdf[col].value_counts()
            )
            for item, cnt in agg.items():
                c = int(cnt)
                if item in counters:
                    counters[item] += c
                    continue
                if len(counters) < k:
                    counters[item] = c
                    continue
                # weighted decrement: subtract d from every counter
                # (d = min zeroes at least one slot or absorbs the
                # arrival); total decrement mass across the run is
                # what the n/(k+1) error bound prices
                d = min(c, min(counters.values()))
                counters = {
                    i: v - d for i, v in counters.items() if v > d
                }
                if c > d:
                    counters[item] = c - d
        yield pd.DataFrame(
            {
                col: list(counters.keys()),
                "cnt": pd.Series(list(counters.values()), dtype="int64"),
            }
        )

    cols = [col] if weight_col is None else [col, weight_col]
    # item field keeps its source type — a hardcoded `string` would make
    # the Arrow conversion fail (or silently coerce) for int/long items
    item_type = df.schema[col].dataType.simpleString()
    return df.select(*cols).mapInPandas(
        kernel, f"`{col}` {item_type}, cnt long"
    )


def misra_gries_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Membership-only view of :func:`misra_gries_summary` for the
    candidates->exact-verify composition (counts are recounted exactly
    downstream, so only the item set matters)."""
    return misra_gries_summary(df, col, k).select(col)


def mg_merge(counts: dict, k: int) -> tuple[dict, int]:
    """Merge step of the mergeable-summaries algorithm (Agarwal et al.
    2012): given summed counters from any number of MG summaries,
    restore capacity ``k`` by subtracting the (k+1)-th largest counter
    from every counter and dropping non-positives. Returns the pruned
    counters and the decrement applied (the caller accumulates it as
    the summary's undercount bound). Input is bounded by contract
    (k rows per merged summary), so this is driver-side fair game."""
    if len(counts) <= k:
        return dict(counts), 0
    d = sorted(counts.values(), reverse=True)[k]
    return {i: v - d for i, v in counts.items() if v > d}, d


def heavy_hitters_exact(
    df: DataFrame,
    col: Column | str,
    inv_phi: int,
    alias: str = "item",
) -> DataFrame:
    """Items whose frequency strictly exceeds n / ``inv_phi``, with
    EXACT counts — equal to ``GROUP BY HAVING cnt * inv_phi > n`` but
    with bounded executor state and a candidates-only shuffle.

    The threshold is the integer comparison ``cnt * inv_phi > n``
    (exact on both engines — no float boundary). Capacity k =
    ``inv_phi`` satisfies k + 1 > 1/phi, the no-false-negative bar.
    Output: (item, cnt, n) ordered cnt desc.
    """
    c = F.col(col) if isinstance(col, str) else col
    items = df.select(c.alias(alias))
    cand = misra_gries_candidates(items, alias, k=inv_phi).distinct()
    total = items.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    exact = (
        items.join(F.broadcast(cand), alias)
        .groupBy(alias)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * inv_phi > F.col("n"))
        .orderBy(F.col("cnt").desc(), alias)
    )


def heavy_hitters_exact_weighted(
    df: DataFrame,
    col: str,
    weight_col: str,
    inv_phi: int,
    alias: str = "item",
) -> DataFrame:
    """Weighted twin of :func:`heavy_hitters_exact`: items whose total
    integer WEIGHT mass strictly exceeds n / ``inv_phi`` (n = total
    mass), exact by the same candidates->verify construction — the MG
    guarantee is mass-based, so capacity k = inv_phi still makes the
    candidate union a superset of every true mass-heavy item.
    Output: (item, mass, n) ordered mass desc."""
    items = df.select(F.col(col).alias(alias), F.col(weight_col).alias("w"))
    cand = (
        misra_gries_summary(items, alias, k=inv_phi, weight_col="w")
        .select(alias)
        .distinct()
    )
    total = items.agg(F.sum("w").cast("bigint").alias("n"))
    exact = (
        items.join(F.broadcast(cand), alias)
        .groupBy(alias)
        .agg(F.sum("w").cast("bigint").alias("mass"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("mass") * inv_phi > F.col("n"))
        .orderBy(F.col("mass").desc(), alias)
    )


# --- GK-style mergeable quantile summary -------------------------------------
# (Greenwald & Khanna, SIGMOD 2001; merge semantics per Agarwal et al.,
# "Mergeable Summaries", PODS 2012; the equi-spaced per-partition
# construction is the classic one-pass summary of Manku, Rajagopalan &
# Lindsay, SIGMOD 1998.) The summary is GK's tuple algebra — kept
# values v with a coverage count g (number of source items the tuple
# accounts for, i.e. rmin increments) and implicit rank slack bounded
# by the per-partition spacing — but the CONSTRUCTION is deliberately
# order-independent: each deterministic hash partition keeps its
# items at exact local ranks 1, 1+s_p, 1+2*s_p, ..., n_p (s_p =
# max(1, n_p div err_div), i.e. s_p <= eps*n_p/2 for eps = 2/err_div),
# so the summary is a pure function of the data MULTISET. GK's
# insertion-order compress cannot be replayed by another engine;
# this construction can, which is what makes the ESTIMATE itself
# oracle-verifiable bit for bit (the HLL/CMS/AMS discipline applied
# to quantiles). Spark's own approx_percentile is the insertion-order
# GK variant and stays rows-only for exactly that reason.
#
# Guarantee: within a partition every unkept item sits between two
# kept ranks < s_p apart, so a query rank t has a kept tuple whose
# true global rank differs by at most max_p(s_p) + sum_p(s_p - 1)
# <= (2/err_div)*n = eps*n. Summary size is bounded by construction:
# <= 2*err_div + 2 tuples per partition (s_p = floor(n_p/err_div) >=
# n_p/(2*err_div) once n_p >= err_div), independent of n_p.
# Mergeability: the summary of a batch UNION equals the union of
# per-batch summaries when partitions are kept distinct (ranks, n_p
# and s_p are all per-(batch, p) quantities) — pinned in tests.
#
# Cost trade, stated plainly: the exact local ranks cost a per-hash-
# partition SORT of the data — more than streaming GK's O(1/eps) state,
# less than a global sort (32-way spillable partition sorts are Spark's
# bread and butter), and it buys the multiset-purity that makes the
# estimate verifiable. Where the sort matters, amortize it: the
# streaming maintenance (streaming/gk_maintenance.py) sorts each batch
# once into a bounded generation and every later quantile query reads
# ONLY summaries; one-shot unsorted paths can still use Spark's own
# approx_percentile (rows-only, agg_approx_sketches).


def gk_summary(
    df: DataFrame,
    value_col: str,
    id_col: str,
    partitions: int = 32,
    err_div: int = 100,
    batch: str = "",
    batch_col: str | None = None,
) -> DataFrame:
    """Bounded GK-style quantile summary tuples of ``df[value_col]``:
    one row per KEPT item — ``(p, v, tb, r, g)`` where ``p`` is the
    deterministic md5 hash partition (prefixed with ``batch``, or the
    per-row ``batch_col`` value, so summaries from disjoint batches
    union-merge without rank collisions; building with ``batch_col``
    in ONE pass is bit-identical to building each batch separately and
    unioning — ranks, n_p and s_p are all per-(batch, p) quantities),
    ``r`` the exact local rank under the total order ``(v, tb)``
    (``id_col`` must be a unique tie-break), and ``g`` the GK coverage
    count (gap to the previous kept rank; sums to n). At most
    ``2*err_div + 2`` rows per partition; eps = 2/err_div. All
    arithmetic is exact integers — cross-engine reproducible."""
    from pyspark.sql.window import Window as W

    from hangarbay_spark.operators.sampling import hash_bucket_expr

    tag = (
        F.col(batch_col).cast("string")
        if batch_col is not None
        else F.lit(batch)
    )
    cols = [F.col(value_col).alias("v"), F.col(id_col).alias("tb")]
    if batch_col is not None:
        cols.append(F.col(batch_col))
    base = df.select(*cols).select(
        "v",
        "tb",
        F.concat_ws(
            "|",
            tag,
            (hash_bucket_expr(F.col("tb")) % partitions).cast("string"),
        ).alias("p"),
    )
    wp = W.partitionBy("p")
    ranked = base.select(
        "p",
        "v",
        "tb",
        F.row_number().over(wp.orderBy("v", "tb")).alias("r"),
        F.count(F.lit(1)).over(wp).alias("np"),
    ).withColumn(
        "sp", F.greatest(F.lit(1), F.expr(f"np div {int(err_div)}"))
    )
    kept = ranked.filter(
        ((F.col("r") - 1) % F.col("sp") == 0) | (F.col("r") == F.col("np"))
    )
    return kept.select(
        "p",
        "v",
        "tb",
        "r",
        (
            F.col("r")
            - F.coalesce(
                F.lag("r").over(wp.orderBy("r")), F.lit(0)
            )
        ).cast("bigint").alias("g"),
    )


def gk_quantile_estimates(
    kept: DataFrame,
    quantiles_pm: tuple[int, ...] = (250, 500, 750, 900, 990),
) -> DataFrame:
    """Quantile answers from a (merged) GK summary: global rmin by a
    running sum of ``g`` over the total order (the summary is bounded
    — <= partitions*(2*err_div+2) rows — so the single-partition window
    is by-contract small), target rank t = ceil(q*n) in exact integer
    arithmetic (permille quantiles: (q_pm*n + 999) div 1000), answer =
    the kept value whose rmin is nearest t (ties to the smaller
    value). Returns (q_pm, quantile, target_rank, est, est_rmin, n)."""
    from pyspark.sql.window import Window as W

    # materialize the bounded summary once: rmin and the n scalar are
    # differently-projected consumers, and without this each re-runs
    # the full per-partition window/sort build of the source (the
    # CLAUDE.md multi-consumer rule; the frame is summary-sized)
    g = kept.select("v", "tb", "g").localCheckpoint()
    rmin = g.select(
        "v",
        "tb",
        F.sum("g")
        .over(
            W.orderBy("v", "tb").rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("rmin"),
    )
    n_row = g.agg(F.sum("g").cast("bigint").alias("n"))
    tq = n_row.select(
        F.explode(
            F.array(*[F.lit(int(q)) for q in quantiles_pm])
        ).alias("q_pm"),
        "n",
    ).select(
        "q_pm",
        "n",
        F.expr("(q_pm * n + 999) div 1000").cast("bigint").alias("t"),
    )
    cand = rmin.crossJoin(F.broadcast(tq)).select(
        "q_pm",
        "n",
        "t",
        "v",
        "rmin",
        F.row_number()
        .over(
            W.partitionBy("q_pm").orderBy(
                F.abs(F.col("rmin") - F.col("t")), "v", "tb"
            )
        )
        .alias("rn"),
    )
    return cand.filter(F.col("rn") == 1).select(
        "q_pm",
        (F.col("q_pm").cast("double") / F.lit(1000.0)).alias("quantile"),
        F.col("t").alias("target_rank"),
        F.col("v").alias("est"),
        F.col("rmin").alias("est_rmin"),
        "n",
    )


def gk_grouped_quantile_estimates(
    kept: DataFrame,
    quantiles_pm: tuple[int, ...] = (500, 900),
) -> DataFrame:
    """Per-GROUP quantile answers from a group-tagged GK summary — the
    distributed ``GROUP BY approx_percentile`` workload, deterministic
    and oracle-verifiable: build the summary with
    ``gk_summary(..., batch_col=<group>)`` so every partition key is
    ``<group>|<bucket>``, then each group's rmin runs over ITS OWN
    kept tuples (window partitioned by the group prefix) against its
    own target ranks t_grp = ceil(q * n_grp). Returns (grp, q_pm,
    quantile, target_rank, est, est_rmin, n) — one row per group and
    quantile. Summary-sized input by contract; the group count only
    widens the window partitioning."""
    from pyspark.sql.window import Window as W

    # group = the partition key minus its trailing '|<bucket>' (greedy
    # match keeps group values containing '|' intact); materialize the
    # bounded summary once for its three consumers (rmin, n_grp, cand)
    g = kept.select(
        F.regexp_extract(F.col("p"), r"^(.*)\|", 1).alias("grp"),
        "v",
        "tb",
        "g",
    ).localCheckpoint()
    rmin = g.select(
        "grp",
        "v",
        "tb",
        F.sum("g")
        .over(
            W.partitionBy("grp")
            .orderBy("v", "tb")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("rmin"),
    )
    n_grp = g.groupBy("grp").agg(F.sum("g").cast("bigint").alias("n"))
    tq = n_grp.select(
        "grp",
        "n",
        F.explode(
            F.array(*[F.lit(int(q)) for q in quantiles_pm])
        ).alias("q_pm"),
    ).select(
        "grp",
        "q_pm",
        "n",
        F.expr("(q_pm * n + 999) div 1000").cast("bigint").alias("t"),
    )
    cand = rmin.join(F.broadcast(tq), "grp").select(
        "grp",
        "q_pm",
        "n",
        "t",
        "v",
        "rmin",
        F.row_number()
        .over(
            W.partitionBy("grp", "q_pm").orderBy(
                F.abs(F.col("rmin") - F.col("t")), "v", "tb"
            )
        )
        .alias("rn"),
    )
    return cand.filter(F.col("rn") == 1).select(
        "grp",
        "q_pm",
        (F.col("q_pm").cast("double") / F.lit(1000.0)).alias("quantile"),
        F.col("t").alias("target_rank"),
        F.col("v").alias("est"),
        F.col("rmin").alias("est_rmin"),
        "n",
    )


def gk_weighted_summary(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    id_col: str,
    partitions: int = 32,
    err_div: int = 100,
    batch: str = "",
) -> DataFrame:
    """WEIGHTED GK-style summary: quantiles of the value distribution
    where each row carries an integer weight (mass) — the mergeable
    twin of the exact two-pass weighted quantiles. Same construction
    as :func:`gk_summary` with ranks replaced by RUNNING WEIGHT: a row
    is kept iff its cumulative weight crosses a multiple of
    s_p = max(1, W_p div err_div) (a heavy row always crosses at least
    one boundary, so no single weight can hide), plus the partition
    maximum; ``g`` is the weight mass the tuple covers (sums to W).
    Uncovered mass between consecutive kept tuples is < s_p, so a
    query mass t has a kept tuple whose true weighted rank differs by
    at most max_p(s_p) + sum_p(s_p - 1) <= (2/err_div)*W = eps*W.
    Weights must be positive integers (exact arithmetic — pre-scale
    decimals). Output (p, v, tb, g) feeds
    :func:`gk_quantile_estimates` unchanged (its n is then W and
    targets are mass ranks)."""
    from pyspark.sql.window import Window as W

    from hangarbay_spark.operators.sampling import hash_bucket_expr

    base = df.select(
        F.col(value_col).alias("v"),
        F.col(weight_col).cast("bigint").alias("w"),
        F.col(id_col).alias("tb"),
    ).select(
        "v",
        "w",
        "tb",
        F.concat_ws(
            "|",
            F.lit(batch),
            (hash_bucket_expr(F.col("tb")) % partitions).cast("string"),
        ).alias("p"),
    )
    wp = W.partitionBy("p")
    run = base.select(
        "p",
        "v",
        "w",
        "tb",
        F.sum("w")
        .over(wp.orderBy("v", "tb").rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cumw"),
        F.sum("w").over(wp).cast("bigint").alias("wp"),
    ).withColumn(
        "sp", F.greatest(F.lit(1), F.expr(f"wp div {int(err_div)}"))
    )
    kept = run.filter(
        (
            F.expr("cumw div sp") > F.expr("(cumw - w) div sp")
        )
        | (F.col("cumw") == F.col("wp"))
    )
    return kept.select(
        "p",
        "v",
        "tb",
        (
            F.col("cumw")
            - F.coalesce(
                F.lag("cumw").over(wp.orderBy("v", "tb")), F.lit(0)
            )
        ).cast("bigint").alias("g"),
    )
