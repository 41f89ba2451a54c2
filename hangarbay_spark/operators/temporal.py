"""Temporal joins Spark lacks as built-ins: as-of join (each left row
matched to the latest right row at-or-before its timestamp) and range
join helpers.

The as-of join uses the union-tag formulation: tag both sides, union,
sort within each key partition by (ts, tag), and carry the right side's
values forward with ``last(..., ignorenulls=True)``. ONE shuffle on the
join key — no per-row lookups, no broadcast requirement, no skew beyond
the key distribution; the same plan shape TimescaleDB/kdb-style engines
execute natively, expressed in windows. Right-side ties on (key, ts)
are resolved deterministically (max tie-break key wins) before the
union.

The carried value is a single STRUCT of all requested right columns —
one ``last(ignorenulls=True)`` over the struct, then unpack. Carrying
each column independently would stitch together values from different
right rows whenever right columns contain genuine nulls; the struct
guarantees every ``asof_`` column comes from the same matched row,
matching DuckDB ASOF JOIN semantics (which return the row wholesale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row: columns of the latest right row with
    ``right.ts <= left.ts`` and the same key (null if none precede it).

    ``direction="forward"`` flips the match to the EARLIEST right row
    with ``right.ts >= left.ts`` (time-to-next-event joins) — same
    single-shuffle carry plan, scanning the key's timeline in reverse.

    Right columns come back prefixed ``asof_``. ``tie_break`` (a right
    column; required if (key, ts) isn't unique on the right) picks the
    winner among equal-ts right rows — the max survives.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, not {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    r = right
    if tie_break is not None:
        w_dedup = W.partitionBy(on, right_ts).orderBy(F.desc(tie_break))
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    r_struct_type = T.StructType(
        [T.StructField(c, r.schema[c].dataType) for c in right_cols]
    )
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = r.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tag.schema["__l"].dataType
        ).alias("__l"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols]
        ).cast(r_struct_type).alias("__r"),
    )
    # right rows (tag 0) sort before left rows (tag 1) at equal ts, so
    # an exactly-simultaneous right row IS visible to the left row
    # (inclusive <=/>= matching DuckDB ASOF JOIN semantics). Forward
    # mode scans the timeline in reverse: descending ts, rights first.
    order = (
        [F.col("__ts").asc(), F.col("__is_left").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__is_left").asc()]
    )
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__is_left",
        "__l",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    return carried.filter(F.col("__is_left") == 1).select(
        *out_cols,
        *[F.col(f"__r.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    start: str,
    end: str,
    bin_width: int,
) -> DataFrame:
    """Point-in-interval join: each ``points`` row matched to every
    ``intervals`` row with the same key and ``start <= ts <= end``.

    A naive non-equi join degenerates to BroadcastNestedLoopJoin (or an
    O(n*m) sort-merge) — the classic Spark range-join trap. The scale
    formulation bins the time axis: every interval is exploded into the
    ``bin_width``-sized bins it overlaps, a point lands in exactly one
    bin, and the join becomes an equi-join on (key, bin) followed by the
    exact BETWEEN verification — the same binned-range-join strategy
    Databricks' range-join hint implements natively. Shuffle cost scales
    with points + interval-spans/bin_width; pick ``bin_width`` near the
    typical interval length so each interval explodes into O(1) bins.

    Timestamps are compared as epoch values (``point_ts``/``start``/
    ``end`` must be numeric — cast upstream); output = all point columns
    plus the interval's columns (key column not duplicated).
    """
    p_bin = (F.col(point_ts) / bin_width).cast("bigint")
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(start) / bin_width).cast("bigint"),
                (F.col(end) / bin_width).cast("bigint"),
            )
        ),
    )
    out = (
        points.withColumn("__bin", p_bin)
        .join(i, [on, "__bin"])
        .filter(
            (F.col(point_ts) >= F.col(start))
            & (F.col(point_ts) <= F.col(end))
        )
        .drop("__bin")
    )
    return out


def as_of_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Cogrouped-``applyInPandas`` twin of :func:`as_of_join`: both
    sides are cogrouped on the key and each key's (left, right) frames
    are ``pd.merge_asof``-ed in one Arrow batch — the canonical cogroup
    use case, completing that slot of the engine's UDF taxonomy.

    Same semantics as the window formulation (inclusive ``<=`` match;
    among equal-ts right rows the max ``tie_break`` wins) and pinned
    row-equal to it in tests. One shuffle per side on the key — the
    same exchange count as the union-tag plan — but per-key groups
    materialize in Python-worker memory, so prefer :func:`as_of_join`
    when a single key's rows can be huge; this path wins when per-row
    width is large (struct carry-forward of wide rows is expensive
    JVM-side) or downstream logic is already pandas-shaped.

    Unlike :func:`as_of_join`, the matched right timestamp is always
    exported as ``asof_{right_ts}`` (``merge_asof`` yields it for
    free).
    """
    import pandas as pd

    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # Both sides often derive from ONE source DataFrame (e.g. two
    # filters of the same events table), so left and right columns can
    # share exprIds; Catalyst's self-cogroup dedup then points the
    # right frame's duplicates at the LEFT's attributes and column
    # pruning drops them from the right child — the Python kernel
    # would receive a right frame missing those columns. Re-aliasing
    # every column mints fresh exprIds and makes the frames disjoint.
    left = left.select(*[F.col(c).alias(c) for c in left.columns])
    right = right.select(*[F.col(c).alias(c) for c in right.columns])
    out_schema = T.StructType(
        list(left.schema.fields)
        + [
            T.StructField(f"asof_{c}", right.schema[c].dataType, True)
            for c in right_cols
        ]
        + [
            T.StructField(
                f"asof_{right_ts}", right.schema[right_ts].dataType, True
            )
        ]
    )
    left_cols = list(left.columns)
    asof_cols = [f"asof_{c}" for c in right_cols] + [f"asof_{right_ts}"]
    # pandas upcasts int columns with misses to float64; convert to the
    # nullable Int64 extension dtype so Arrow hands Spark proper NULLs
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    int_asof = {
        f"asof_{c}"
        for c in right_cols + [right_ts]
        if isinstance(right.schema[c].dataType, int_types)
    }

    def kernel(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty:
            return pd.DataFrame(columns=left_cols + asof_cols)
        r2 = rf.sort_values(
            [right_ts] + ([tie_break] if tie_break else [])
        )
        if tie_break is not None:
            r2 = r2.drop_duplicates(subset=[right_ts], keep="last")
        r2 = r2[[right_ts] + right_cols].rename(
            columns={c: f"asof_{c}" for c in right_cols}
        )
        r2 = r2.rename(columns={right_ts: "__rts"})
        merged = pd.merge_asof(
            lf.sort_values(left_ts),
            r2,
            left_on=left_ts,
            right_on="__rts",
            direction="backward",
        ).rename(columns={"__rts": f"asof_{right_ts}"})
        for c in int_asof:
            merged[c] = merged[c].astype("Int64")
        return merged

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(kernel, out_schema)
    )


def as_of_join_arrow(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Partition-batched Arrow as-of join: tag + union both sides (the
    same single shuffle on the key as :func:`as_of_join`), then ONE
    vectorized ``pd.merge_asof(by=key)`` per partition via
    ``mapInPandas`` — ~numPartitions Python calls total, versus one per
    key for :func:`as_of_join_cogrouped` (which at 20K keys pays 20K
    kernel invocations; this path ran 7× faster on the events corpus).
    Same semantics as both twins (inclusive ``<=``; max ``tie_break``
    wins among equal-ts right rows; matched right ts exported as
    ``asof_{right_ts}``) and pinned row-equal in tests.

    A partition's rows are concatenated in worker memory (mapInPandas
    hands the partition as an iterator of Arrow batches), so the
    shuffle partition count must keep partitions memory-sized — the
    same sizing rule every exchange in the engine already follows.
    """
    import pandas as pd

    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_cols = list(left.columns)
    u_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"l_{c}") for c in l_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}")
            for c in right_cols
        ],
        F.lit(None)
        .cast(right.schema[right_ts].dataType)
        .alias("__rts"),
        *(
            [F.lit(None).cast(right.schema[tie_break].dataType).alias("__tb")]
            if tie_break
            else []
        ),
    )
    u_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}")
            for c in l_cols
        ],
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
        F.col(right_ts).alias("__rts"),
        *([F.col(tie_break).alias("__tb")] if tie_break else []),
    )
    unioned = u_left.unionByName(u_right).repartition(
        left.sparkSession.sparkContext.defaultParallelism, "__k"
    )

    out_schema = T.StructType(
        [
            T.StructField(c, left.schema[c].dataType, True)
            for c in l_cols
        ]
        + [
            T.StructField(f"asof_{c}", right.schema[c].dataType, True)
            for c in right_cols
        ]
        + [
            T.StructField(
                f"asof_{right_ts}", right.schema[right_ts].dataType, True
            )
        ]
    )
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    int_out = {
        f.name for f in out_schema.fields if isinstance(f.dataType, int_types)
    }
    r_renames = {f"r_{c}": f"asof_{c}" for c in right_cols}
    r_renames["__rts"] = f"asof_{right_ts}"
    l_renames = {f"l_{c}": c for c in l_cols}

    def kernel(batches):
        # an explicit-N key spread can hand a task ZERO Arrow batches
        # (fewer keys than partitions) — pd.concat raises on []
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        lf = pdf[pdf["__is_left"] == 1]
        if lf.empty:
            return
        rf = pdf[pdf["__is_left"] == 0]
        rf = rf.sort_values(
            ["__k", "__ts"] + (["__tb"] if tie_break else [])
        )
        if tie_break is not None:
            rf = rf.drop_duplicates(subset=["__k", "__ts"], keep="last")
        lf = lf[["__k", "__ts"] + [f"l_{c}" for c in l_cols]]
        rf = rf[["__k", "__ts", "__rts"] + [f"r_{c}" for c in right_cols]]
        merged = pd.merge_asof(
            lf.sort_values("__ts", kind="stable"),
            rf.sort_values("__ts", kind="stable"),
            on="__ts",
            by="__k",
            direction="backward",
        )
        merged = merged.rename(columns={**l_renames, **r_renames})
        merged = merged[
            l_cols
            + [f"asof_{c}" for c in right_cols]
            + [f"asof_{right_ts}"]
        ]
        for c in int_out:
            if c in merged and merged[c].dtype.kind == "f":
                merged[c] = merged[c].astype("Int64")
        yield merged

    return unioned.mapInPandas(kernel, out_schema)


def as_of_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Nearest-direction as-of (pandas ``merge_asof
    direction='nearest'``): per left row the closer of its backward
    (latest at-or-before) and forward (earliest at-or-after) matches;
    equal distances resolve to the BACKWARD match (documented, not
    engine-dependent). Two carry passes over the same key shuffle
    class; columns come back ``asof_``-prefixed like the directional
    variants. Left rows must be unique across their full column set
    (carry an id column) — the direction-combining join keys on all
    left columns, with NULL-SAFE equality so rows containing NULLs
    keep the left-join contract."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    rc = list(right_cols)
    if right_ts not in rc:
        # the chooser needs the matched row's timestamp
        rc_b = rc + ["__rts"]
        right = right.withColumn("__rts", F.col(right_ts))
    else:
        rc_b = rc
    b = as_of_join(
        left, right, on, left_ts, right_ts, rc_b, tie_break, "backward"
    )
    f = as_of_join(
        left, right, on, left_ts, right_ts, rc_b, tie_break, "forward"
    )
    ts_col = "__rts" if right_ts not in rc else right_ts
    join_keys = [on, left_ts] + [
        c for c in left.columns if c not in (on, left_ts)
    ]
    fb = f.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"asof_{c}").alias(f"__f_{c}") for c in rc_b],
    )
    # Null-SAFE equality on every left column: a left row containing
    # NULL anywhere must still pair its backward and forward matches
    # (null-unsafe keys silently dropped it, breaking the left-join
    # contract the directional variants honor). <=> keys still plan as
    # a hash join.
    ba, fa = b.alias("__asof_b"), fb.alias("__asof_f")
    cond = None
    for kcol in join_keys:
        c = F.col(f"__asof_b.{kcol}").eqNullSafe(F.col(f"__asof_f.{kcol}"))
        cond = c if cond is None else cond & c
    both = ba.join(fa, cond).select(
        *[F.col(f"__asof_b.{c}") for c in b.columns],
        *[F.col(f"__asof_f.__f_{c}") for c in rc_b],
    )
    # distance works for timestamp AND numeric ts columns
    ts_type = dict(both.dtypes)[f"asof_{ts_col}"]
    if ts_type.startswith("timestamp"):
        def _t(c):
            return F.unix_micros(c)
    else:
        def _t(c):
            return c.cast("double")
    d_b = _t(F.col(left_ts)) - _t(F.col(f"asof_{ts_col}"))
    d_f = _t(F.col(f"__f_{ts_col}")) - _t(F.col(left_ts))
    use_b = F.col(f"asof_{ts_col}").isNotNull() & (
        F.col(f"__f_{ts_col}").isNull() | (d_b <= d_f)
    )
    out = both.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(use_b, F.col(f"asof_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(f"asof_{c}")
            for c in rc_b
        ],
    )
    if right_ts not in rc:
        out = out.drop("asof___rts")
    return out
