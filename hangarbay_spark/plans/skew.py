"""Skew-mitigation helpers for joins AQE can't fix.

AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew at runtime, but two shapes still need explicit salting at 100 TB:

- joining a huge fact against a *medium* table on a hot key (too big
  to broadcast, hot partitions too large to split effectively);
- aggregations over a power-law key (one key = 10% of rows).

``salted_join`` spreads each hot key over ``salt`` sub-keys: the big
side gets a random salt per row, the small side is replicated
``salt``x. Shuffle partitions for hot keys shrink by the salt factor
at the cost of replicating the (bounded-size) small side.

``two_phase_agg`` does salted partial aggregation: group on
(key, salt) first — map-side combine shrinks the hot key early — then
re-aggregate by key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Output columns = big's columns + small's non-key columns (as in a
    plain ``join(small, key)``).

    Only ``inner``/``left``/``left_semi`` are supported: the
    salt-and-replicate scheme is correct only when rows are emitted from
    the big side. A right/full-outer would emit each unmatched
    small-side key ``salt`` times, and left_anti inverts wrongly.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1))
    ).alias("__salt")
    replicated = small.select(F.col("*"), salts)
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for power-law keys.

    ``aggs`` maps output-column -> (input-column, fn) where fn is one of
    sum/count/min/max (the re-aggregatable functions; avg must be
    decomposed by the caller into sum+count).
    """
    refn = {"count": "sum"}  # counts re-aggregate by summing
    partial = df.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    ).groupBy(key, "__salt")
    phase1 = partial.agg(
        *[
            getattr(F, fn)(col).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(key).agg(
        *[
            getattr(F, refn.get(fn, fn))(name).alias(name)
            for name, (_, fn) in aggs.items()
        ]
    )
    return phase2
