"""Incremental aggregate maintenance: keep a materialized GROUP BY
up to date from CDC deltas without rescanning the base table — the
materialized-view maintenance pattern every 100 TB warehouse needs
(rescanning the base per refresh is the thing that does not scale;
the delta is usually 10^-4 of it).

Maintains the distributive aggregates (COUNT, SUM). MIN/MAX are not
delta-maintainable under deletes without re-reading the affected
groups, so they are deliberately out of scope.

Exactness contract: maintained sums are stored as DECIMAL, never
DOUBLE. Delta maintenance requires associative arithmetic — a
floating-point running sum drifts from a fresh recompute as update
order varies, so the maintained table would slowly diverge from the
truth it claims to cache. Decimal sums make
``delta_agg_update(build_agg(old), signed_delta(old, new))``
EQUAL ``build_agg(new)`` bit for bit (the composition law, tested in
tests/test_skew_diff.py and oracle-checked by the
``incremental_agg_maintenance`` query).

Reference parity: the reference's manifest records
``previous_snapshot`` for delta workflows it never implemented
(/root/reference/pipelines/fetch.py:181-190); pipelines/diff.py covers
the detect/apply half, this module covers derived-state maintenance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIGN_COL = "__sign"
COUNT_COL = "n"
_DEC = "decimal(30,{scale})"


def signed_delta(
    old: DataFrame, new: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """CDC delta between two versions of a keyed table as signed full
    rows: -1 for rows present only in ``old`` (removed, or the old image
    of a modification), +1 for rows present only in ``new``. Unchanged
    rows (identical xxhash64 over non-key columns) produce nothing.

    Two anti-joins on (key..., row-hash) — hashes computed map-side;
    both inputs are scanned once.

    Contract: ``key`` is unique within each version (the standard CDC
    assumption). Duplicate keys would make the anti-join drop whole
    multiplicity classes instead of the count difference.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = [c for c in new.columns if c not in keys]
    h = F.xxhash64(*[F.col(c) for c in cols])
    o = old.withColumn("__h", h)
    n = new.withColumn("__h", h)
    removed = o.join(
        n.select(*keys, "__h"), [*keys, "__h"], "left_anti"
    ).withColumn(SIGN_COL, F.lit(-1))
    added = n.join(
        o.select(*keys, "__h"), [*keys, "__h"], "left_anti"
    ).withColumn(SIGN_COL, F.lit(1))
    return removed.unionByName(added).drop("__h")


def build_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_specs: dict[str, tuple[str, int]],
) -> DataFrame:
    """Initial materialized aggregate: ``group_cols``, row count ``n``
    (BIGINT), and one exact DECIMAL(30, scale) sum per
    ``alias -> (source_col, scale)`` spec."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias(COUNT_COL)]
    for alias, (col, scale) in sum_specs.items():
        aggs.append(
            F.sum(F.col(col).cast(_DEC.format(scale=scale))).alias(alias)
        )
    return df.groupBy(*group_cols).agg(*aggs)


def delta_agg_update(
    prev_agg: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_specs: dict[str, tuple[str, int]],
) -> DataFrame:
    """Merge a signed delta (from :func:`signed_delta`) into a
    materialized aggregate built by :func:`build_agg`.

    The delta is aggregated first (tiny vs the maintained table), then
    full-outer-joined on the group key: new groups appear, counts and
    decimal sums adjust exactly, groups whose count reaches zero are
    dropped. Cost: one shuffle of the DELTA plus one join against the
    maintained table — the base table is never read.
    """
    gcols = list(group_cols)
    daggs = [
        F.sum(F.col(SIGN_COL)).cast("bigint").alias(f"__d_{COUNT_COL}")
    ]
    for alias, (col, scale) in sum_specs.items():
        daggs.append(
            F.sum(
                F.col(SIGN_COL) * F.col(col).cast(_DEC.format(scale=scale))
            ).alias(f"__d_{alias}")
        )
    d = delta.groupBy(*gcols).agg(*daggs)

    merged = prev_agg.join(d, gcols, "full_outer")
    zero = F.lit(0)
    out_cols = [
        (
            F.coalesce(F.col(COUNT_COL), zero.cast("bigint"))
            + F.coalesce(F.col(f"__d_{COUNT_COL}"), zero.cast("bigint"))
        ).alias(COUNT_COL)
    ]
    for alias, (_, scale) in sum_specs.items():
        dec_zero = zero.cast(_DEC.format(scale=scale))
        # sum-of-decimals widens precision by engine rule; cast back to
        # the declared type so chained updates keep a stable schema
        out_cols.append(
            (
                F.coalesce(F.col(alias), dec_zero)
                + F.coalesce(F.col(f"__d_{alias}"), dec_zero)
            )
            .cast(_DEC.format(scale=scale))
            .alias(alias)
        )
    return (
        merged.select(*gcols, *out_cols)
        .filter(F.col(COUNT_COL) > 0)
    )


def signed_join_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: str | Sequence[str],
) -> DataFrame:
    """Signed delta of an inner equi-join from the inputs' signed
    deltas — the join half of incremental view maintenance:

        Δ(A ⋈ B) = (ΔA ⋈ B_old) ⊎ (A_old ⋈ ΔB) ⊎ (ΔA ⋈ ΔB)

    with each contribution's sign the product of its inputs' signs
    (+1 base rows count as sign 1). Feeding the result to
    :func:`delta_agg_update` maintains any aggregate OVER the join
    without recomputing it — the composition law
    ``update(agg(A_old ⋈ B_old), signed_join_delta(...)) ==
    agg(A_new ⋈ B_new)`` holds as exact multiset algebra and is
    oracle-checked by the ``incremental_join_maintenance`` query.

    Cost at scale: the deltas are tiny (CDC-sized), so the two
    delta-vs-base joins broadcast the delta side and the delta-delta
    join is negligible; the old join result is never rescanned and
    the base tables are touched only by delta-keyed joins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    da2 = da.withColumnRenamed(SIGN_COL, "__sa")
    db2 = db.withColumnRenamed(SIGN_COL, "__sb")
    c1 = (
        da2.join(b_old, keys)
        .withColumn(SIGN_COL, F.col("__sa"))
        .drop("__sa")
    )
    c2 = (
        a_old.join(db2, keys)
        .withColumn(SIGN_COL, F.col("__sb"))
        .drop("__sb")
    )
    c3 = (
        da2.join(db2, keys)
        .withColumn(SIGN_COL, F.col("__sa") * F.col("__sb"))
        .drop("__sa", "__sb")
    )
    return c1.unionByName(c2).unionByName(c3)
