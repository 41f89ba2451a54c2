"""Structured Streaming surface over the ``events`` stream — the
incremental twins of the batch queries in
``hangarbay_spark/queries/events.py``.

The reference has no streaming at all (SURVEY.md §2.7); this is the
north-star extension. Each builder takes any streaming DataFrame with
the events schema (ts timestamp, event_id, user_id, event_type, value,
props) and returns a streaming result:

- ``hourly_rollup``: watermarked tumbling-window counts/sums — late
  rows beyond the watermark are dropped, state is bounded.
- ``sliding_rollup``: overlapping windows (trend surfaces).
- ``sessionize``: native ``session_window`` with a 30-min gap —
  Spark merges/extends window state per key incrementally.
- ``dedup_events``: exact duplicate-event suppression inside the
  watermark horizon (``dropDuplicates`` with event_id + ts).

All builders are pure plan constructors — they work identically on a
file/kafka/rate source; tests drive them with a file source over the
driver's events parquet and ``availableNow`` triggers.

Scale notes: state store size is bounded by (watermark horizon ×
key cardinality); shuffles are on the grouping keys only; no Python
UDFs anywhere in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "2 hours"
SESSION_GAP = "30 minutes"


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over an events parquet directory
    (schema inferred from the existing files). A ns-long ``ts`` (from
    the nanosAsLong read path, see session.py) is normalized to
    TimestampType so watermarks/windows apply."""
    from hangarbay_spark.queries.base import normalize_ns_ts

    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )
    return normalize_ns_ts(stream, "ts")


def hourly_rollup(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Watermarked tumbling 1-hour window per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Overlapping sliding windows per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
            "event_type",
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-user session windows with a dynamic gap — the incremental
    twin of the batch gaps-and-islands query (events_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
            "session_value",
        )
    )


def dedup_events(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Exactly-once event stream: duplicates of (event_id) within the
    watermark horizon are suppressed; state expires with the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def purchase_signup_window_join(
    purchases: DataFrame,
    signups: DataFrame,
    window: str = "2 hours",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-stream inner join with a time-interval condition: each
    purchase matched to same-user signups with
    ``signup.ts <= purchase.ts <= signup.ts + window`` — the streaming
    twin of the batch binned range join
    (``queries/events.py:events_range_join_purchase_window``).

    Both sides carry watermarks, and the interval condition bounds how
    long each side's rows are buffered: Spark derives the state-eviction
    horizon from (watermark + window), so join state is bounded — the
    one requirement for an unbounded stream-stream join at scale.
    """
    p = purchases.withWatermark("ts", watermark).alias("p")
    s = signups.withWatermark("ts", watermark).alias("s")
    return p.join(
        s,
        F.expr(
            f"p.user_id = s.user_id AND p.ts >= s.ts "
            f"AND p.ts <= s.ts + INTERVAL {window}"
        ),
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("s.event_id").alias("signup_id"),
        (F.unix_millis("p.ts") - F.unix_millis("s.ts")).alias("lag_ms"),
    )


def purchase_signup_window_join_outer(
    purchases: DataFrame,
    signups: DataFrame,
    window: str = "2 hours",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the variant the inner
    join can't express: purchases with NO qualifying signup still emit
    (with null signup columns) once the watermark passes their
    eviction horizon. Matched rows stream out exactly like the inner
    join; the null rows are held in state until Spark can PROVE no
    future signup can match (watermark + interval), which is why both
    watermarks are mandatory here rather than just state-bounding.
    Rows near the end of a drained finite stream may stay unflushed —
    the watermark never advances past them; the test asserts exact
    parity for every purchase older than the final eviction horizon.
    """
    p = purchases.withWatermark("ts", watermark).alias("p")
    s = signups.withWatermark("ts", watermark).alias("s")
    return p.join(
        s,
        F.expr(
            f"p.user_id = s.user_id AND p.ts >= s.ts "
            f"AND p.ts <= s.ts + INTERVAL {window}"
        ),
        "leftOuter",
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.unix_millis("p.ts").alias("purchase_ms"),
        F.col("s.event_id").alias("signup_id"),
        (F.unix_millis("p.ts") - F.unix_millis("s.ts")).alias("lag_ms"),
    )


USER_TOTALS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double"
)
USER_TOTALS_STATE = "n bigint, total decimal(30,4)"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (event count, decimal-exact value total), emitting the
    updated totals for every user seen in each micro-batch.

    This is the escape hatch for stateful logic Spark's built-in
    windows can't express (per-key accumulators, custom eviction,
    model-ish state). State is one tiny row per user; decimal
    accumulation keeps totals exact so the drained stream agrees with
    the batch aggregate bit-for-bit.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = (
            state.get if state.exists else (0, Decimal("0.0000"))
        )
        total = Decimal(total)
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf["value"]:
                # quantized decimal addition — associative, batch-exact
                # (HALF_UP matches Spark's double->decimal cast)
                total += Decimal(str(v)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [float(total)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=USER_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream: DataFrame,
    query_name: str,
    spark: SparkSession,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain a stream with availableNow into an in-memory sink and
    return the materialized result (test/bench harness). Use
    ``output_mode="append"`` for non-aggregating streams (dedup)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def enrich_with_dim(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a static
    dimension table. The static side is broadcast fresh per micro-batch
    (Spark re-plans it each trigger, so a dim refresh between batches is
    picked up automatically) and needs no watermark — only stream-stream
    joins buffer state. The canonical lookup-enrichment shape for a
    100 TB/day event feed against a small dimension."""
    return events.join(F.broadcast(dim), on, "left")


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`running_user_totals` — Spark 4's arbitrary-state API
    (StatefulProcessor + typed state handles, the successor to
    applyInPandasWithState, adding list/map state and timers for
    custom eviction). Same per-user (count, decimal-exact total)
    semantics, pinned equal to both the old-API stream and the batch
    aggregate in tests. Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``), which is how
    a 100 TB-keyspace deployment would run it anyway — state spills
    to disk instead of living on the JVM heap. Runtime requirement:
    ``google.protobuf`` (the TWS Python driver worker's state-server
    protocol) — absent in minimal containers, so the test skips
    rather than fails there; ``running_user_totals`` is the
    dependency-free fallback."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # decimal total carried as a string: exact, schema-stable
            self._state = handle.getValueState(
                "totals", "n bigint, total string"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total_s = self._state.get()
                total = Decimal(total_s)
            else:
                n, total = 0, Decimal("0.0000")
            for pdf in rows:
                n += len(pdf)
                for v in pdf["value"]:
                    total += Decimal(str(v)).quantize(
                        Decimal("0.0001"), rounding=ROUND_HALF_UP
                    )
            self._state.update((n, str(total)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [float(total)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        Totals(),
        outputStructType=USER_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def purchase_signup_window_join_full(
    purchases: DataFrame,
    signups: DataFrame,
    window: str = "2 hours",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """FULL OUTER stream-stream interval join — both directions of the
    left-outer variant: unmatched purchases AND unmatched signups each
    emit with nulls once their own side's eviction horizon passes.
    Surfaces both event times so consumers (and the batch-parity test)
    can reason about which rows the final watermark has closed."""
    p = purchases.withWatermark("ts", watermark).alias("p")
    s = signups.withWatermark("ts", watermark).alias("s")
    return p.join(
        s,
        F.expr(
            f"p.user_id = s.user_id AND p.ts >= s.ts "
            f"AND p.ts <= s.ts + INTERVAL {window}"
        ),
        "fullOuter",
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.coalesce(F.col("p.user_id"), F.col("s.user_id")).alias("user_id"),
        F.unix_millis("p.ts").alias("purchase_ms"),
        F.col("s.event_id").alias("signup_id"),
        F.unix_millis("s.ts").alias("signup_ms"),
    )


LAST_TOUCH_SCHEMA = "event_id bigint, user_id bigint, channel string, value double"
LAST_TOUCH_STATE = "channel string, tms bigint"
_TOUCH_TYPES = frozenset({"view", "click", "signup"})


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """Stateful streaming last-touch attribution — the incremental twin
    of ``queries/events.py:events_last_touch_attribution``. State per
    user is one tiny row: (channel, epoch-ms) of the latest touch seen.
    Each micro-batch's rows are replayed in (ts, event_id) order:
    view/click/signup advance the state, each purchase emits one
    attributed row ('none' when no touch is at-or-before it). Output
    mode is append (a purchase is attributed exactly once, when its
    batch drains), so downstream channel rollups are incremental sums.
    Exact vs the batch query under per-user time-ordered delivery (the
    file-sequence harness in tests); a touch arriving late, behind a
    purchase already emitted, cannot retro-attribute it — the same
    trade every streaming attribution system makes."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        channel, tms = state.get if state.exists else (None, -1)
        rows = []
        for pdf in pdfs:
            rows.extend(pdf.itertuples(index=False))
        rows.sort(key=lambda r: (r.tms, r.event_id))
        out_eid, out_ch, out_val = [], [], []
        for r in rows:
            if r.event_type in _TOUCH_TYPES:
                if r.tms >= tms:
                    channel, tms = r.event_type, int(r.tms)
            elif r.event_type == "purchase":
                ch = (
                    channel
                    if channel is not None and tms <= r.tms
                    else "none"
                )
                out_eid.append(int(r.event_id))
                out_ch.append(ch)
                out_val.append(r.value)
        state.update((channel, tms))
        if out_eid:
            yield pd.DataFrame(
                {
                    "event_id": out_eid,
                    "user_id": key[0],
                    "channel": out_ch,
                    "value": out_val,
                }
            )

    prepped = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_millis("ts").alias("tms"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=LAST_TOUCH_SCHEMA,
        stateStructType=LAST_TOUCH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CEP_SCHEMA = "user_id bigint, event_id bigint, tus bigint"
CEP_STATE = "p2 string, p1 string"


def sequence_pattern_matches(events: DataFrame) -> DataFrame:
    """Streaming CEP: detect completed contiguous view->click->purchase
    runs per user — the incremental twin of the contiguous-run count in
    ``queries/events.py:events_sequence_pattern``. State per user is
    the last TWO event-type initials (a 2-char sliding window); each
    event shifts the window and a purchase closing a ('v','c') window
    emits one match row (its event_id + exact µs timestamp) in append
    mode. 'vcp' has no proper prefix that is also a suffix, so
    overlapping and non-overlapping counts coincide — the emitted
    stream aggregates to exactly the batch substring-elimination count
    under per-user time-ordered delivery, with the window carrying
    across micro-batch boundaries (a run split 'v|cp' or 'vc|p' across
    batches still fires). State is O(1) per user — the minimal NFA
    state for a fixed pattern, the applyInPandasWithState shape any
    regex-over-streams compiles to."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        p2, p1 = state.get if state.exists else (None, None)
        rows = []
        for pdf in pdfs:
            rows.extend(pdf.itertuples(index=False))
        # exact µs ordering (unix_micros) — the same (ts, event_id)
        # order the batch journey string sorts by
        rows.sort(key=lambda r: (r.tus, r.event_id))
        out_eid, out_tus = [], []
        for r in rows:
            ch = r.event_type[:1]
            if ch == "p" and p2 == "v" and p1 == "c":
                out_eid.append(int(r.event_id))
                out_tus.append(int(r.tus))
            p2, p1 = p1, ch
        state.update((p2, p1))
        if out_eid:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "event_id": out_eid,
                    "tus": out_tus,
                }
            )

    prepped = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=CEP_SCHEMA,
        stateStructType=CEP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
