"""Event/time-series operators over the ``events`` table — the batch
twins of the Structured Streaming surface in
``hangarbay_spark/streaming/`` (same logical windows; the streaming
module adds watermarks + incremental state).

Timestamps are surfaced as epoch milliseconds (BIGINT) for exact
cross-engine comparison (Spark TimestampType is µs, DuckDB is µs, the
parquet source is ns — truncation to ms is identical on both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hangarbay_spark.queries.base import REGISTRY, load_events, register

SESSION_GAP_MS = 30 * 60 * 1000


@register(
    "events_tumbling_hourly",
    """
    SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "tumbling-window aggregation (batch twin of the streaming hourly "
    "rollup; F.window in streaming/events.py)",
    "streaming §2.7 extension (batch twin)",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("window_start_ms"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "events_sessionize",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, value,
             epoch_ms(ts) AS ts_ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ms
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_ms IS NULL
                       OR ts_ms - prev_ms > {SESSION_GAP_MS} THEN 1 ELSE 0 END
                  AS is_new
      FROM ordered
    ), sess AS (
      SELECT user_id, ts_ms, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts_ms) AS session_start_ms,
           MAX(ts_ms) AS session_end_ms,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, session_id
    """,
    "sessionization (gaps-and-islands): lag + cumulative-sum windows + "
    "agg; batch twin of session_window in streaming",
    "streaming §2.7 extension (sessionization)",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "value",
        F.unix_millis("ts").alias("ts_ms"),
    )
    order_w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_ms").over(order_w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(order_w) > SESSION_GAP_MS),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new")
        .over(order_w.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.sum(F.col("value").cast("decimal(30,4)"))
        .cast("double")
        .alias("session_value"),
    )


@register(
    "events_sliding_quarter_hour",
    """
    WITH e AS (SELECT epoch_ms(ts) AS tm, event_type FROM events),
    w AS (SELECT ((tm // 900000) - j) * 900000 AS window_start_ms, event_type
          FROM e, (SELECT unnest([0, 1, 2, 3]) AS j) s)
    SELECT window_start_ms,
           window_start_ms + 3600000 AS window_end_ms,
           event_type,
           COUNT(*) AS n_events
    FROM w GROUP BY 1, 2, 3
    """,
    "sliding-window aggregation (1h window, 15min slide): each event "
    "lands in 4 overlapping windows (F.window fan-out in Spark; "
    "explicit slide-index unnest in the oracle); batch twin of "
    "streaming sliding_rollup",
    "streaming §2.7 extension (sliding windows, batch twin)",
)
def events_sliding_quarter_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
            "event_type",
            "n_events",
        )
    )


@register(
    "events_asof_purchase_signup",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    r0 AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'signup'),
    r AS (SELECT user_id, ts, MAX(event_id) AS sid FROM r0 GROUP BY 1, 2)
    SELECT l.event_id, l.user_id,
           epoch_ms(l.ts) AS purchase_ms,
           r.sid AS signup_id,
           epoch_ms(l.ts) - epoch_ms(r.ts) AS signup_lag_ms
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "as-of join: each purchase matched to the user's latest "
    "at-or-before signup (union-tag + ordered window carry-forward — "
    "one shuffle on the key; oracle uses DuckDB's native ASOF JOIN)",
    "temporal-join extension (as-of join)",
)
def events_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.temporal import as_of_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("sid"))
        .withColumn("rts", F.col("ts"))
    )
    joined = as_of_join(
        purchases, signups, on="user_id", right_cols=["sid", "rts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.col("asof_sid").alias("signup_id"),
        (F.unix_millis("ts") - F.unix_millis("asof_rts")).alias(
            "signup_lag_ms"
        ),
    )


@register(
    "events_asof_arrow",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    r0 AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'signup'),
    r AS (SELECT user_id, ts, MAX(event_id) AS sid FROM r0 GROUP BY 1, 2)
    SELECT l.event_id, l.user_id,
           epoch_ms(l.ts) AS purchase_ms,
           r.sid AS signup_id,
           epoch_ms(l.ts) - epoch_ms(r.ts) AS signup_lag_ms
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "as-of join through the partition-batched Arrow path (tag+union, "
    "one shuffle on the key, ONE vectorized pd.merge_asof(by=key) per "
    "partition — not per key: the per-key cogroup twin pays ~20K "
    "kernel calls on this corpus and runs 7x slower); identical "
    "semantics and oracle to events_asof_purchase_signup",
    "temporal-join extension (as-of join, Arrow partition-batched twin)",
)
def events_asof_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.temporal import as_of_join_arrow

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("sid"))
    )
    joined = as_of_join_arrow(
        purchases, signups, on="user_id", right_cols=["sid"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.col("asof_sid").alias("signup_id"),
        (F.unix_millis("ts") - F.unix_millis("asof_ts")).alias(
            "signup_lag_ms"
        ),
    )


@register(
    "events_funnel_view_click_purchase",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             epoch_ms(ts) AS ts_ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ms
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_ms IS NULL
                       OR ts_ms - prev_ms > {SESSION_GAP_MS} THEN 1 ELSE 0 END
                  AS is_new
      FROM ordered
    ), sess AS (
      SELECT user_id, event_type, ts_ms,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM marked
    ), s1 AS (
      SELECT user_id, session_id,
             MIN(CASE WHEN event_type = 'view' THEN ts_ms END) AS t_view
      FROM sess GROUP BY 1, 2
    ), s2 AS (
      SELECT s.user_id, s.session_id, s1.t_view,
             MIN(CASE WHEN s.event_type = 'click'
                       AND s.ts_ms >= s1.t_view THEN s.ts_ms END) AS t_click
      FROM sess s JOIN s1 USING (user_id, session_id)
      GROUP BY 1, 2, 3
    ), s3 AS (
      SELECT s.user_id, s.session_id, s2.t_view, s2.t_click,
             MIN(CASE WHEN s.event_type = 'purchase'
                       AND s.ts_ms >= s2.t_click THEN s.ts_ms END) AS t_buy
      FROM sess s JOIN s2 USING (user_id, session_id)
      GROUP BY 1, 2, 3, 4
    )
    SELECT COUNT(*) AS n_sessions,
           COUNT(t_view) AS n_view,
           COUNT(t_click) AS n_view_then_click,
           COUNT(t_buy) AS n_full_funnel
    FROM s3
    """,
    "ordered funnel over sessionized events: per session, first view, "
    "first click at-or-after that view, first purchase at-or-after "
    "that click; conditional-min aggregations joined on the session "
    "key (co-partitioned shuffles) — the product-analytics shape on "
    "top of gaps-and-islands sessionization",
    "streaming §2.7 extension (sessionized funnel)",
)
def events_funnel_view_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("ts"),
    )
    w_lag = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sess = (
        ev.withColumn("prev_ms", F.lag("ts_ms").over(w_lag))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ms").isNull()
                | (F.col("ts_ms") - F.col("prev_ms") > SESSION_GAP_MS),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id", F.sum("is_new").over(w_cum).cast("bigint")
        )
        .select("user_id", "session_id", "event_type", "ts_ms")
    )
    key = ["user_id", "session_id"]
    s1 = sess.groupBy(*key).agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts_ms"))
        ).alias("t_view")
    )
    s2 = (
        sess.join(s1, key)
        .groupBy(*key, "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_ms") >= F.col("t_view")),
                    F.col("ts_ms"),
                )
            ).alias("t_click")
        )
    )
    s3 = (
        sess.join(s2, key)
        .groupBy(*key, "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_ms") >= F.col("t_click")),
                    F.col("ts_ms"),
                )
            ).alias("t_buy")
        )
    )
    return s3.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_then_click"),
        F.count("t_buy").alias("n_full_funnel"),
    )


@register(
    "events_quality_flags",
    """
    SELECT COUNT(*) AS total,
           CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_event_id,
           CAST(SUM(CASE WHEN event_type NOT IN
                      ('view','click','purchase','signup','error')
                    THEN 1 ELSE 0 END) AS BIGINT) AS unknown_type,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS negative_value,
           CAST(SUM(CASE WHEN epoch_ms(ts) < 1704067200000
                      OR epoch_ms(ts) >= 1706745600000
                    THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_range,
           CAST(SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS empty_props
    FROM events
    """,
    "data-quality rule pass (pipelines/verify.py pattern on the "
    "declared surface): every rule a conditional flag summed in ONE "
    "column-pruned aggregation pass — no per-rule rescans",
    "data-quality verification extension",
)
def events_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return ev.agg(
        F.count(F.lit(1)).alias("total"),
        flag(F.col("event_id").isNull()).alias("null_event_id"),
        flag(
            ~F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            )
        ).alias("unknown_type"),
        flag(F.col("value") < 0).alias("negative_value"),
        flag(
            (F.unix_millis("ts") < F.lit(1704067200000))
            | (F.unix_millis("ts") >= F.lit(1706745600000))
        ).alias("ts_out_of_range"),
        flag(
            F.col("props").isNull() | (F.col("props") == "")
        ).alias("empty_props"),
    )


@register(
    "events_range_join_purchase_window",
    """
    WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
               FROM events WHERE event_type = 'purchase'),
    s AS (SELECT event_id AS sid, user_id, epoch_ms(ts) AS st_ms,
                 epoch_ms(ts) + 7200000 AS en_ms
          FROM events WHERE event_type = 'signup')
    SELECT p.event_id AS purchase_id, p.user_id, s.sid AS signup_id,
           p.ts_ms - s.st_ms AS lag_ms
    FROM p JOIN s ON p.user_id = s.user_id
                 AND p.ts_ms >= s.st_ms AND p.ts_ms <= s.en_ms
    """,
    "range/interval join: purchases inside [signup, signup+2h] windows "
    "of the same user. Spark side uses the binned formulation "
    "(operators/temporal.py:range_join — intervals exploded into 1h "
    "bins, equi-join on (user, bin) + exact BETWEEN verify) instead of "
    "the non-equi-join BroadcastNestedLoop trap; oracle is the plain "
    "BETWEEN join",
    "temporal-join extension (binned range join)",
)
def events_range_join_purchase_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hangarbay_spark.operators.temporal import range_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"),
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sid"),
        "user_id",
        F.unix_millis("ts").alias("st_ms"),
        (F.unix_millis("ts") + F.lit(7200000)).alias("en_ms"),
    )
    joined = range_join(
        purchases,
        signups,
        on="user_id",
        point_ts="ts_ms",
        start="st_ms",
        end="en_ms",
        bin_width=3600000,
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("sid").alias("signup_id"),
        (F.col("ts_ms") - F.col("st_ms")).alias("lag_ms"),
    )


@register(
    "events_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
    "semi-structured JSON column extraction + agg (props is a JSON "
    "string; get_json_object in Spark, json_extract in DuckDB)",
    "semi-structured extension",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_user_activity_topk",
    """
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           epoch_ms(MIN(ts)) AS first_ms,
           epoch_ms(MAX(ts)) AS last_ms
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 20
    """,
    "per-entity activity profile + tie-broken top-k (heavy-hitter scan)",
    "A4,A5 over events",
)
def events_user_activity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.unix_millis(F.min("ts")).alias("first_ms"),
            F.unix_millis(F.max("ts")).alias("last_ms"),
        )
        .orderBy(F.desc("n_events"), "user_id")
        .limit(20)
    )


Z_THRESHOLD = 2.5


@register(
    "events_value_outliers",
    f"""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS sq
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s / n) / sqrt(sq / n - (s / n) * (s / n)), 9) AS z
    FROM events e JOIN stats USING (event_type)
    WHERE abs(round((e.value - s / n) / sqrt(sq / n - (s / n) * (s / n)), 9))
          > {Z_THRESHOLD}
    """,
    "per-type z-score anomaly detection: mean/variance from exact "
    "decimal sums (value is 2 dp, value^2 is 4 dp — both exact), cast "
    "to double only for the final scalar arithmetic so both engines "
    "compute bit-identical z; tiny stats table broadcast back onto the "
    "event scan",
    "2.4 aggregations + analytics extension (anomaly detection)",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,4)"))
        .cast("double")
        .alias("sq"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    mean = F.col("s") / F.col("n")
    var = F.col("sq") / F.col("n") - mean * mean
    z = F.round((F.col("value") - mean) / F.sqrt(var), 9)
    return j.select(
        "event_id", "event_type", "value", z.alias("z")
    ).filter(F.abs(F.col("z")) > Z_THRESHOLD)


@register(
    "events_gap_fill_hourly",
    """
    WITH b AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY event_type),
    grid AS (
      SELECT event_type,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM b),
    c AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS tv
      FROM events GROUP BY 1, 2)
    SELECT grid.event_type,
           epoch_ms(grid.h) AS hour_ms,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events,
           COALESCE(c.tv, 0.0) AS total_value
    FROM grid LEFT JOIN c
      ON grid.event_type = c.event_type AND grid.h = c.h
    """,
    "time-series gap fill / densification: per-type hourly counts with "
    "EMPTY hours materialized as zero rows — the dense grid comes from "
    "sequence() over each type's [min,max] hour exploded per key (grid "
    "size is bounded by time span, never row count, so the explode is "
    "safe at any corpus scale), then a left join re-attaches the "
    "sparse aggregates",
    "2.5 extension (time-series densification / gap fill)",
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hourly_dense_grid(spark, sf_dir).select(
        "event_type",
        F.unix_millis("h").alias("hour_ms"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("tv", F.lit(0.0)).alias("total_value"),
    )


def _hourly_dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-type hourly grid (event_type, h, n, tv) with NULL
    n/tv on empty hours — shared by the gap-fill and fill-forward
    queries. Grid size is bounded by time span, never row count."""
    ev = load_events(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h"), "value"
    )
    counts = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("tv"),
    )
    grid = (
        ev.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    return grid.join(counts, ["event_type", "h"], "left")


@register(
    "events_fill_forward_hourly",
    """
    WITH b AS (
      SELECT event_type,
             date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY event_type),
    grid AS (
      SELECT event_type,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM b),
    c AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS tv
      FROM events GROUP BY 1, 2)
    SELECT event_type, hour_ms, is_gap, filled_value FROM (
      SELECT grid.event_type,
             epoch_ms(grid.h) AS hour_ms,
             (c.tv IS NULL) AS is_gap,
             last_value(c.tv IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value
      FROM grid LEFT JOIN c
        ON grid.event_type = c.event_type AND grid.h = c.h) t
    """,
    "fill-forward imputation (last-observation-carried-forward) over "
    "the densified hourly grid: empty hours inherit the most recent "
    "observed hourly total per type via last_value IGNORE NULLS with "
    "a running ROWS frame — one window shuffle on the type key, "
    "carried values bit-identical because the observed totals are "
    "decimal-exact sums",
    "2.5 extension (imputation / LOCF)",
)
def events_fill_forward_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _hourly_dense_grid(spark, sf_dir)
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.select(
        "event_type",
        F.unix_millis("h").alias("hour_ms"),
        F.col("tv").isNull().alias("is_gap"),
        F.last("tv", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "events_rolling_wau",
    """
    WITH du AS (
      SELECT DISTINCT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             user_id
      FROM events),
    b AS (SELECT event_type, MAX(d) AS d1 FROM du GROUP BY event_type),
    contrib AS (
      SELECT event_type, user_id,
             CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                    CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                    INTERVAL 1 DAY)) AS DATE) AS report_day
      FROM du)
    SELECT c.event_type, c.report_day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM contrib c JOIN b ON c.event_type = b.event_type
    WHERE c.report_day <= b.d1
    GROUP BY c.event_type, c.report_day
    """,
    "EXACT rolling 7-day active users per event type — windowed COUNT "
    "DISTINCT cannot merge partial states, so the distributed "
    "formulation explodes each (type, day, user) observation into the "
    "7 report days it contributes to (a bounded 7x row fan-out, "
    "postings-style) and runs one ordinary distinct-count shuffle; the "
    "100 TB alternative when 7x fan-out is too hot is the HLL sketch "
    "path (agg_approx_sketches)",
    "2.5 extension (sliding-window distinct / rolling actives)",
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        load_events(spark, sf_dir)
        .select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
            "user_id",
        )
        .distinct()
    )
    bounds = du.groupBy("event_type").agg(F.max("d").alias("d1"))
    contrib = du.select(
        "event_type",
        "user_id",
        F.explode(
            F.sequence("d", F.date_add("d", 6), F.expr("interval 1 day"))
        ).alias("report_day"),
    )
    return (
        contrib.join(bounds, "event_type")
        .filter(F.col("report_day") <= F.col("d1"))
        .groupBy("event_type", "report_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )


def _group_median(df: DataFrame, val_col: str) -> DataFrame:
    """Exact interpolated per-event_type median of ``val_col`` via the
    distributed two-pass boundary-row interpolation of
    agg_percentiles_by_flag (queries/relational.py) — per-group state
    is Spark's spillable external sort, never a value buffer. Returns
    (event_type, med) with the same (n-1)*p double formula DuckDB's
    quantile_cont uses, rounded 6 dp."""
    grp = W.partitionBy("event_type")
    ranked = df.select("event_type", val_col).select(
        "event_type",
        F.col(val_col).alias("__v"),
        (F.row_number().over(grp.orderBy(val_col)) - 1).alias("__idx"),
        F.count(F.lit(1)).over(grp).alias("__n"),
    )
    pos = (F.col("__n") - 1).cast("double") * F.lit(0.5)
    lo, hi = F.floor(pos), F.ceil(pos)
    idx = F.col("__idx")

    def pick(cond):
        return F.max(F.when(cond, F.col("__v")))

    agg = (
        ranked.filter((idx == lo) | (idx == hi))
        .groupBy("event_type")
        .agg(
            F.max("__n").alias("__n"),
            pick(idx == lo).alias("__vlo"),
            pick(idx == hi).alias("__vhi"),
        )
    )
    p = (F.col("__n") - 1).cast("double") * F.lit(0.5)
    frac = p - F.floor(p).cast("double")
    med = F.round(F.col("__vlo") + frac * (F.col("__vhi") - F.col("__vlo")), 6)
    return agg.select("event_type", med.alias("med"))


@register(
    "events_robust_outliers",
    """
    WITH m AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type),
    d AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS dev
      FROM events e JOIN m USING (event_type)
      WHERE e.value IS NOT NULL),
    md AS (
      SELECT event_type, ROUND(quantile_cont(dev, 0.5), 6) AS mad
      FROM d GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value,
           round(0.6745 * (d.value - d.med) / md.mad, 6) AS rz
    FROM d JOIN md USING (event_type)
    WHERE md.mad > 0
      AND abs(round(0.6745 * (d.value - d.med) / md.mad, 6)) > 3.5
    """,
    "ROBUST anomaly detection via median/MAD (modified z-score "
    "0.6745*(x-med)/MAD > 3.5, Iglewicz-Hoaglin): immune to the "
    "masking that inflates the mean/stddev z-score when outliers are "
    "heavy. Medians are exact distributed two-pass interpolations "
    "(spillable external sort, no per-group buffer — the "
    "agg_percentiles_by_flag plan), per-type med/MAD broadcast back "
    "onto the scan; both engines compile the identical score text, "
    "6 dp rounded",
    "analytics extension (robust MAD outlier detection)",
)
def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_events(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    med = _group_median(ev, "value")
    withmed = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = _group_median(withmed, "dev").withColumnRenamed("med", "mad")
    rz = F.round(
        F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"), 6
    )
    return (
        withmed.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select("event_id", "event_type", "value", rz.alias("rz"))
        .filter(F.abs(F.col("rz")) > 3.5)
    )


@register(
    "events_ewma_hourly",
    """
    WITH h AS (
      SELECT event_type,
             epoch_ms(date_trunc('hour', ts)) AS hour_ms,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS tv
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, hour_ms,
             list(tv) OVER (PARTITION BY event_type ORDER BY hour_ms
                            ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
               AS lst
      FROM h)
    SELECT event_type, hour_ms,
           ROUND(list_reduce(lst, (acc, x) -> acc * 0.5 + x * 0.5), 6)
             AS ewma
    FROM l
    """,
    "exponentially-weighted moving average of hourly value totals "
    "(alpha = 0.5 over a trailing 12-hour frame): the recursive "
    "y = a*x + (1-a)*y_prev fold runs over a windowed collect_list in "
    "frame order — alpha 0.5 makes every multiply an exact halving, so "
    "the sequential IEEE fold is bit-identical across engines (the "
    "in-row array-sum parity rule of queries/base.py). Bounded frame = "
    "bounded per-row state; one window sort shuffle, same partitioning "
    "as the rollup it smooths",
    "analytics extension (EWMA smoothing)",
)
def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type",
        F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms"),
    ).agg(
        F.sum(F.col("value").cast("decimal(30,4)"))
        .cast("double")
        .alias("tv")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_ms")
        .rowsBetween(-11, W.currentRow)
    )
    lst = hourly.select(
        "event_type", "hour_ms", F.collect_list("tv").over(w).alias("lst")
    )
    # DuckDB's list_reduce seeds the fold with the first element;
    # emulate with aggregate(tail, head, ...). lst is a materialized
    # column, so the lambda touches only its own element.
    ewma = F.aggregate(
        F.slice(F.col("lst"), 2, F.greatest(F.size("lst") - 1, F.lit(0))),
        F.element_at("lst", 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    return lst.select(
        "event_type", "hour_ms", F.round(ewma, 6).alias("ewma")
    )


@register(
    "events_scd2_user_tier",
    """
    WITH p AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             CASE WHEN value < 50 THEN 'low'
                  WHEN value < 200 THEN 'mid' ELSE 'high' END AS tier
      FROM events WHERE event_type = 'purchase'
    ), chg AS (
      SELECT * FROM (
        SELECT user_id, event_id, ts_ms, tier,
               LAG(tier) OVER (PARTITION BY user_id
                               ORDER BY ts_ms, event_id) AS prev_tier
        FROM p)
      WHERE prev_tier IS NULL OR tier <> prev_tier
    )
    SELECT user_id, tier,
           ts_ms AS valid_from_ms,
           LEAD(ts_ms) OVER (PARTITION BY user_id
                             ORDER BY ts_ms, event_id) AS valid_to_ms,
           CAST(LEAD(ts_ms) OVER (PARTITION BY user_id
                                  ORDER BY ts_ms, event_id) IS NULL
                AS BOOLEAN) AS is_current
    FROM chg
    """,
    "SCD Type-2 dimension build from a change log: per-user purchase "
    "tier history compacted to contiguous validity intervals "
    "(change-detect via lag, close intervals via lead, open interval "
    "= current row) — the warehouse dimension-maintenance pattern. "
    "One window shuffle on the entity key serves all three windows "
    "(identical partitioning + ordering); at 100 TB the change log "
    "shuffles once on user_id and each entity's history is tiny",
    "warehouse extension (SCD2 dimension build; CDC family of "
    "pipelines/diff.py)",
)
def events_scd2_user_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("tier"),
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    chg = p.withColumn("prev_tier", F.lag("tier").over(w)).filter(
        F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier"))
    )
    return chg.select(
        "user_id",
        "tier",
        F.col("ts_ms").alias("valid_from_ms"),
        F.lead("ts_ms").over(w).alias("valid_to_ms"),
        F.lead("ts_ms").over(w).isNull().alias("is_current"),
    )


@register(
    "events_rfm_segments",
    """
    WITH mx AS (SELECT MAX(epoch_ms(ts)) AS max_ms FROM events),
    u AS (
      SELECT user_id,
             CAST((mx.max_ms - MAX(epoch_ms(ts))) // 86400000 AS BIGINT)
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS monetary
      FROM events CROSS JOIN mx
      WHERE event_type = 'purchase'
      GROUP BY user_id, mx.max_ms
    )
    SELECT user_id, recency_days, frequency, monetary,
           CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id)
                AS BIGINT) AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency ASC, user_id)
                AS BIGINT) AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary ASC, user_id)
                AS BIGINT) AS m_score
    FROM u
    """,
    "RFM (recency/frequency/monetary) customer segmentation: one "
    "exact-decimal aggregate per user, the reference max-date as a "
    "broadcast 1-row scalar, and three NTILE(5) quintile scores with "
    "unique tie-breaks (user_id) so bucket boundaries are "
    "deterministic cross-engine. Quintiles come from DISTRIBUTED "
    "exact ranks (operators/ranks.range_rank — the TeraSort "
    "construction: range-partition on the full unique ordering, "
    "per-partition row_number, P-row cumulative offset pass) fed "
    "through the integer NTILE formula (ranks.ntile_sql) — the USER "
    "frame is never sorted through one partition (the old plan ran "
    "three serialized global Sort+Windows over it, user-domain-scale "
    "at 100x); rank outputs are boundary-independent so the oracle's "
    "NTILE hashes are unchanged. Per-user rollup stays one shuffle; "
    "the checkpointed user frame feeds all three rank passes",
    "analytics extension (RFM segmentation)",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.ranks import ntile_sql, range_rank

    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase")
    # Reference date = max over ALL events (matches the oracle's mx
    # CTE) — not just purchases, so an inactive buyer's recency keeps
    # growing with corpus time.
    mx = ev.agg(F.max(F.unix_millis("ts")).alias("max_ms"))
    u = (
        p.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "max_ms")
        .agg(
            F.max(F.unix_millis("ts")).alias("u_max"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("monetary"),
        )
        .select(
            "user_id",
            ((F.col("max_ms") - F.col("u_max")) / F.lit(86400000))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
        .localCheckpoint(eager=True)  # output + three rank consumers
    )

    def score(dim: str, order, name: str) -> DataFrame:
        rr = range_rank(u.select("user_id", dim), order, 32)
        return rr.select(
            "user_id", F.expr(ntile_sql("rn", "__n", 5)).alias(name)
        )

    r_s = score(
        "recency_days",
        [F.col("recency_days").desc(), F.col("user_id").asc()],
        "r_score",
    )
    f_s = score(
        "frequency",
        [F.col("frequency").asc(), F.col("user_id").asc()],
        "f_score",
    )
    m_s = score(
        "monetary",
        [F.col("monetary").asc(), F.col("user_id").asc()],
        "m_score",
    )
    return (
        u.join(r_s, "user_id")
        .join(f_s, "user_id")
        .join(m_s, "user_id")
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary",
            "r_score",
            "f_score",
            "m_score",
        )
    )


@register(
    "events_funnel_paths",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ms
      FROM events
    ), sess AS (
      SELECT user_id, event_id, event_type, ts_ms,
             CAST(SUM(CASE WHEN prev_ms IS NULL
                             OR ts_ms - prev_ms > {SESSION_GAP_MS}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM ordered
    ), headed AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts_ms, event_id) AS rn
      FROM sess
    ), paths AS (
      SELECT user_id, session_id,
             STRING_AGG(event_type, '>' ORDER BY ts_ms, event_id) AS path
      FROM headed WHERE rn <= 5
      GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    "funnel path analysis: sessionize (30-min gap), truncate each "
    "session to its first 5 events, concatenate the ordered "
    "event-type path, count sessions per path, top-20. The ordered "
    "concat is a collect_list over a running window (frame order = "
    "collection order) sliced at the aggregation — all windows share "
    "the one user_id sort shuffle; path cardinality is bounded by "
    "5-grams of event types so the final count is a small agg",
    "analytics extension (behavioral path / funnel mining)",
)
def events_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
    )
    order_w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_ms").over(order_w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(order_w) > SESSION_GAP_MS),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new")
        .over(order_w.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint"),
    )
    sw = W.partitionBy("user_id", "session_id").orderBy("ts_ms", "event_id")
    headed = sess.withColumn("rn", F.row_number().over(sw)).filter(
        F.col("rn") <= 5
    )
    # Ordered concat: collect_list over the running frame of the same
    # window, keep the full-frame row (rn = frame length) per session.
    paths = (
        headed.withColumn(
            "path_arr",
            F.collect_list("event_type").over(
                sw.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.max(F.struct("rn", "path_arr")).alias("last"))
        .select(F.concat_ws(">", F.col("last.path_arr")).alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type)
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) /
             SUM(n) OVER (PARTITION BY prev_type) AS p
    FROM pairs
    """,
    "first-order Markov transition matrix over per-user event "
    "sequences: lag window (one user_id shuffle), pair counts, and "
    "row-normalized probabilities via a partition-total window over "
    "the TYPE-PAIR aggregate (25 rows — the window input is the "
    "matrix, not the events). p is a single divide of exact counts, "
    "bit-identical cross-engine",
    "analytics extension (Markov chain / transition mining)",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    return pairs.select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        (
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("prev_type"))
        ).alias("p"),
    )


@register(
    "events_cusum_changepoint",
    """
    WITH h AS (
      SELECT event_type,
             epoch_ms(date_trunc('hour', ts)) AS hour_ms,
             SUM(CAST(value AS DECIMAL(30,4))) AS tv
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type,
             CAST(round(CAST(SUM(tv) AS DOUBLE) / COUNT(*), 6)
                  AS DECIMAL(30,6)) AS mean_tv
      FROM h GROUP BY event_type),
    d AS (
      SELECT h.event_type, hour_ms,
             CAST(tv AS DECIMAL(30,6)) - mean_tv AS dev
      FROM h JOIN m ON h.event_type = m.event_type),
    c1 AS (
      SELECT event_type, hour_ms,
             SUM(dev) OVER (PARTITION BY event_type ORDER BY hour_ms
                            ROWS UNBOUNDED PRECEDING) AS cs
      FROM d),
    c2 AS (
      SELECT event_type, hour_ms, cs,
             MIN(cs) OVER (PARTITION BY event_type ORDER BY hour_ms
                           ROWS UNBOUNDED PRECEDING) AS lo
      FROM c1),
    s AS (
      SELECT event_type, hour_ms,
             CAST(cs - LEAST(lo, 0) AS DOUBLE) AS cusum
      FROM c2),
    r AS (
      SELECT event_type, hour_ms, cusum,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cusum DESC, hour_ms) AS rk
      FROM s)
    SELECT event_type, hour_ms AS peak_hour_ms, cusum AS max_cusum
    FROM r WHERE rk = 1
    """,
    "CUSUM changepoint detection per event type: upward drift "
    "statistic s_t = cumsum_t - min(0, running-min of cumsum) over "
    "hourly deviations from the per-type mean — the window-closed-form "
    "of the max(0, s+d) recurrence, so the whole detector is two "
    "stacked windows on ONE event_type sort shuffle (no per-row fold, "
    "no O(n^2) lambda — scale-safe where a collect_list fold is not). "
    "All arithmetic is exact decimal (mean rounded at 6 dp then cast "
    "back), the only doubles are the final cast",
    "analytics extension (CUSUM drift / changepoint detection)",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    h = ev.groupBy(
        "event_type",
        F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms"),
    ).agg(F.sum(F.col("value").cast("decimal(30,4)")).alias("tv"))
    m = h.groupBy("event_type").agg(
        F.round(F.sum("tv").cast("double") / F.count(F.lit(1)), 6)
        .cast("decimal(30,6)")
        .alias("mean_tv")
    )
    d = h.join(m, "event_type").select(
        "event_type",
        "hour_ms",
        (F.col("tv").cast("decimal(30,6)") - F.col("mean_tv")).alias("dev"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_ms")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = d.select(
        "event_type",
        "hour_ms",
        F.sum("dev").over(w).alias("cs"),
    ).select(
        "event_type",
        "hour_ms",
        "cs",
        F.min("cs").over(w).alias("lo"),
    )
    s = c.select(
        "event_type",
        "hour_ms",
        (F.col("cs") - F.least(F.col("lo"), F.lit(0).cast("decimal(30,6)")))
        .cast("double")
        .alias("cusum"),
    ).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.col("cusum").desc(), "hour_ms"
            )
        ),
    )
    return s.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("hour_ms").alias("peak_hour_ms"),
        F.col("cusum").alias("max_cusum"),
    )


@register(
    "events_asof_forward_error",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    r0 AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'error'),
    r AS (SELECT user_id, ts, MAX(event_id) AS eid FROM r0 GROUP BY 1, 2)
    SELECT l.event_id, l.user_id,
           epoch_ms(l.ts) AS purchase_ms,
           r.eid AS error_id,
           epoch_ms(r.ts) - epoch_ms(l.ts) AS ms_to_error
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    "FORWARD as-of join (time-to-next-event): each purchase matched "
    "to the user's earliest at-or-after error — the mirror of the "
    "backward carry (operators/temporal.py:as_of_join "
    "direction='forward'): same tag-union + ordered carry over ONE "
    "user_id shuffle, timeline scanned descending. Oracle = DuckDB "
    "native ASOF with the inequality flipped (l.ts <= r.ts)",
    "temporal-join extension (forward as-of / time-to-event)",
)
def events_asof_forward_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.temporal import as_of_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("eid"))
        .withColumn("rts", F.col("ts"))
    )
    joined = as_of_join(
        purchases,
        errors,
        on="user_id",
        right_cols=["eid", "rts"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.col("asof_eid").alias("error_id"),
        (F.unix_millis("asof_rts") - F.unix_millis("ts")).alias(
            "ms_to_error"
        ),
    )


@register(
    "events_watermark_lateness",
    """
    WITH arr AS (
      SELECT user_id,
             epoch_ms(ts) AS ts_ms,
             MAX(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS frontier_ms
      FROM events),
    late AS (SELECT frontier_ms - ts_ms AS late_ms FROM arr)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(SUM(CASE WHEN late_ms > 600000 THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_10m,
           CAST(SUM(CASE WHEN late_ms > 1800000 THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_30m,
           CAST(SUM(CASE WHEN late_ms > 3600000 THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_1h,
           MAX(late_ms) AS max_late_ms
    FROM late
    """,
    "watermark tuning report for the streaming surface: per-key "
    "event-time lateness against the running arrival frontier "
    "(event_id as arrival order, the keyed-stream model of "
    "streaming/events.py), then drop counts for candidate watermarks "
    "(10m/30m/1h) and the max observed lateness — the measurement "
    "that justifies a withWatermark() choice instead of guessing it. "
    "One keyed window shuffle + a scalar conditional aggregate; "
    "exact integer arithmetic throughout",
    "streaming §2.7 extension (watermark/lateness analysis)",
)
def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    arr = ev.select(
        F.unix_millis("ts").alias("ts_ms"),
        F.max(F.unix_millis("ts")).over(w).alias("frontier_ms"),
    )
    late = arr.select((F.col("frontier_ms") - F.col("ts_ms")).alias("late_ms"))

    def drops(th, alias):
        return (
            F.sum(F.when(F.col("late_ms") > th, 1).otherwise(0))
            .cast("bigint")
            .alias(alias)
        )

    return late.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        drops(0, "n_out_of_order"),
        drops(600000, "dropped_10m"),
        drops(1800000, "dropped_30m"),
        drops(3600000, "dropped_1h"),
        F.max("late_ms").alias("max_late_ms"),
    )


@register(
    "events_session_window_native",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ms
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN prev_ms IS NULL
                       OR ts_ms - prev_ms >= {SESSION_GAP_MS} THEN 1 ELSE 0 END
                  AS is_new
      FROM ordered
    ), sess AS (
      SELECT user_id, ts_ms, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts_ms) AS session_start_ms,
           MAX(ts_ms) + {SESSION_GAP_MS} AS session_end_ms,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
    "NATIVE session_window sessionization in BATCH mode (the same "
    "operator the streaming surface uses with state — here it runs "
    "as a sort-based merge inside one groupBy): per-user 30-min-gap "
    "sessions with Spark's exact boundary semantics (a gap of "
    "EXACTLY the duration starts a new session, hence >= in the "
    "gaps-and-islands oracle, vs > in events_sessionize; "
    "session_end = last event + gap by definition). Cross-checks the "
    "builtin operator against the explicit window formulation "
    "cross-engine",
    "streaming §2.7 extension (native session_window, batch mode)",
)
def events_session_window_native(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
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


@register(
    "events_asof_nearest_click",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    r0 AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
    r AS (SELECT user_id, ts, MAX(event_id) AS cid FROM r0 GROUP BY 1, 2),
    b AS (SELECT l.event_id, l.user_id, l.ts,
                 r.cid AS b_id, r.ts AS b_ts
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts >= r.ts),
    f AS (SELECT l.event_id, r.cid AS f_id, r.ts AS f_ts
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts <= r.ts),
    j AS (SELECT b.*, f.f_id, f.f_ts FROM b JOIN f USING (event_id)),
    pick AS (
      SELECT event_id, user_id, ts,
             CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
                    OR epoch_us(ts) - epoch_us(b_ts)
                       <= epoch_us(f_ts) - epoch_us(ts))
                  THEN b_id ELSE f_id END AS click_id,
             CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
                    OR epoch_us(ts) - epoch_us(b_ts)
                       <= epoch_us(f_ts) - epoch_us(ts))
                  THEN b_ts ELSE f_ts END AS click_ts
      FROM j)
    SELECT event_id, user_id,
           epoch_ms(ts) AS purchase_ms,
           click_id,
           epoch_ms(click_ts) - epoch_ms(ts) AS dt_ms
    FROM pick
    """,
    "NEAREST-direction as-of (pandas merge_asof direction='nearest'): "
    "each purchase matched to the user's closest click in either "
    "direction, ties to the backward match — composes the backward "
    "and forward carries (operators/temporal.py:as_of_join_nearest) "
    "and completes the as-of family. Oracle = two native DuckDB ASOF "
    "joins + the same deterministic chooser",
    "temporal-join extension (nearest as-of)",
)
def events_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.temporal import as_of_join_nearest

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("cid"))
        .withColumn("rts", F.col("ts"))
    )
    joined = as_of_join_nearest(
        purchases, clicks, on="user_id", right_cols=["cid", "rts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.col("asof_cid").alias("click_id"),
        (F.unix_millis("asof_rts") - F.unix_millis("ts")).alias("dt_ms"),
    )


@register(
    "events_seasonal_outliers",
    """
    WITH h AS (
      SELECT event_id, event_type, value,
             CAST(hour(ts) AS BIGINT) AS hod
      FROM events),
    base AS (
      SELECT event_type, hod,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS sxx
      FROM h GROUP BY event_type, hod),
    z AS (
      SELECT h.event_id, h.event_type, h.hod, h.value,
             round((h.value - base.sx / base.nd)
                   / sqrt((base.sxx - base.sx * base.sx / base.nd)
                          / (base.nd - 1.0)), 6) AS zscore
      FROM h JOIN base
        ON h.event_type = base.event_type AND h.hod = base.hod
      WHERE base.nd > 1.0 AND base.sxx - base.sx * base.sx / base.nd > 0.0)
    SELECT event_id, event_type, hod, value, zscore
    FROM z WHERE abs(zscore) > 3.0
    ORDER BY abs(zscore) DESC, event_id
    LIMIT 50
    """,
    "seasonality-adjusted anomaly detection: per (event_type, "
    "hour-of-day) baselines from exact decimal moments, then "
    "per-event z-scores against the OWN seasonal cell — catches "
    "values normal globally but anomalous for 3 a.m. (the flaw of "
    "the global z-score in events_value_outliers). The 120-cell "
    "baseline broadcasts; z is one shared-text formula (6 dp FMA "
    "guard); one map-side-combined aggregation + a filter-only "
    "second pass",
    "analytics extension (seasonal baseline anomaly detection)",
)
def events_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    h = ev.select(
        "event_id",
        "event_type",
        "value",
        F.hour("ts").cast("bigint").alias("hod"),
    )
    base = h.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(F.col("value").cast("decimal(30,4)"))
        .cast("double")
        .alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)"))
        .cast("double")
        .alias("sxx"),
    )
    # Degenerate-cell guard (same predicate text as the oracle): a
    # single-row or zero-variance cell has a 0 denominator — Spark's
    # non-ANSI divide yields NULL (row dropped) while DuckDB's IEEE
    # mode yields NaN which passes abs(z) > 3 and sorts greatest, so
    # without the shared guard such cells enter only the oracle's
    # top-50 on sparse data.
    z = h.join(F.broadcast(base), ["event_type", "hod"]).filter(
        F.expr("nd > 1.0 AND sxx - sx * sx / nd > 0.0")
    ).select(
        "event_id",
        "event_type",
        "hod",
        "value",
        F.expr(
            "round((value - sx / nd) / "
            "sqrt((sxx - sx * sx / nd) / (nd - 1.0)), 6)"
        ).alias("zscore"),
    )
    return (
        z.filter(F.abs(F.col("zscore")) > 3.0)
        .orderBy(F.abs(F.col("zscore")).desc(), "event_id")
        .limit(50)
    )


@register(
    "events_conversion_lag_cohorts",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN epoch_ms(ts) END) AS first_view_ms,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_ms(ts) END) AS first_purchase_ms
      FROM events GROUP BY user_id),
    cohorts AS (
      SELECT epoch_ms(date_trunc('week',
                      make_timestamp(first_view_ms * 1000))) AS cohort_ms,
             CASE WHEN first_purchase_ms >= first_view_ms
                  THEN first_purchase_ms - first_view_ms END AS lag_ms
      FROM firsts WHERE first_view_ms IS NOT NULL)
    SELECT cohort_ms,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(lag_ms) AS BIGINT) AS n_converted,
           CAST(COUNT(lag_ms) AS DOUBLE) / COUNT(*) AS conversion_rate,
           CAST(SUM(CAST(lag_ms AS DECIMAL(30,0))) AS DOUBLE)
             / COUNT(lag_ms) AS mean_lag_ms
    FROM cohorts GROUP BY cohort_ms
    """,
    "conversion-lag cohort analysis: per user the FIRST view and "
    "FIRST at-or-after purchase fold out of ONE conditional-min "
    "aggregation pass (no self-join), cohorted by first-view week — "
    "users, converters, exact-ratio conversion rate, exact-decimal "
    "mean lag. The funnel-metrics readout every growth team runs; "
    "one user-key shuffle + a cohort-sized agg",
    "analytics extension (conversion lag / cohort funnel metrics)",
)
def events_conversion_lag_cohorts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_millis("ts"))
        ).alias("first_view_ms"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_millis("ts"))
        ).alias("first_purchase_ms"),
    )
    cohorts = firsts.filter(F.col("first_view_ms").isNotNull()).select(
        F.unix_millis(
            F.date_trunc("week", F.timestamp_millis("first_view_ms"))
        ).alias("cohort_ms"),
        F.when(
            F.col("first_purchase_ms") >= F.col("first_view_ms"),
            F.col("first_purchase_ms") - F.col("first_view_ms"),
        ).alias("lag_ms"),
    )
    return cohorts.groupBy("cohort_ms").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("lag_ms").cast("bigint").alias("n_converted"),
        (F.count("lag_ms").cast("double") / F.count(F.lit(1))).alias(
            "conversion_rate"
        ),
        (
            F.sum(F.col("lag_ms").cast("decimal(30,0)")).cast("double")
            / F.count("lag_ms")
        ).alias("mean_lag_ms"),
    )


def _ensure_events_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Events re-laid-out as date-partitioned parquet — the layout under
    which day-scoped queries prune at the parquet file listing instead
    of scanning the full history. One write, amortized over every
    subsequent time-scoped query. Routed through the fingerprint-
    validated index root (pipelines.indexes) like every durable
    artifact: a corpus regenerated in place auto-invalidates, and temp
    roots are cleaned up at process exit (ADVICE r5)."""
    from hangarbay_spark.pipelines.indexes import ensure_events_partitioned

    return ensure_events_partitioned(spark, sf_dir)


@register(
    "scan_partition_pruned_day",
    """
    WITH d0 AS (SELECT CAST(MIN(ts) AS DATE) AS d FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total_value
    FROM events, d0
    WHERE CAST(ts AS DATE) = d0.d
    GROUP BY event_type
    ORDER BY event_type
    """,
    "date-partitioned layout + partition-pruned day scan (the "
    "time-series twin of the bucketed co-located join): events are "
    "written partitionBy(event_date) once at publish, after which a "
    "single-day rollup reads ONLY that day's files — the parquet "
    "listing prunes every other partition (PartitionFilters pinned in "
    "tests). At 100 TB of history this is the difference between a "
    "full-history scan and touching one day; results identical to "
    "filtering the raw table, same oracle",
    "2.6 Q6 (partitioned layout surfaced as a pruned query)",
)
def scan_partition_pruned_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_events_partitioned(spark, sf_dir)
    ev = spark.read.parquet(path)
    # 1-row driver scalar (the events_rfm_segments precedent): the
    # earliest day, resolved from the partition column — the listing
    # itself answers it without reading data rows.
    day = ev.agg(F.min("d").alias("d")).collect()[0]["d"]
    return (
        ev.filter(F.col("d") == F.lit(day))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Population-stability-index drift monitor
# ---------------------------------------------------------------------------

# Per-bin PSI term from exact integer counts: Laplace-smoothed share
# difference times the smoothed log-ratio. Every count is CAST to
# DOUBLE explicitly (a bare `+ 1.0` would drag Spark into decimal
# arithmetic and a differently-rounded quotient), the ln is rounded at
# 6 dp (libm-drift guard) and the final product at 6 dp
# (FMA-contraction guard) — both engines then sum identical decimals.
_PSI_TERM = (
    "round((((CAST(nc AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + 10.0))"
    " - ((CAST(nr AS DOUBLE) + 1.0) / (CAST(tr AS DOUBLE) + 10.0)))"
    " * round(ln(((CAST(nc AS DOUBLE) + 1.0) * (CAST(tr AS DOUBLE) + 10.0))"
    " / ((CAST(nr AS DOUBLE) + 1.0) * (CAST(tc AS DOUBLE) + 10.0))), 6), 6)"
)

_PSI_BIN = "least(9, greatest(0, CAST(floor(value / 25.0) AS INT)))"


@register(
    "events_psi_drift",
    f"""
    WITH base AS (SELECT event_type, CAST(ts AS DATE) AS d, value
                  FROM events),
    mx AS (SELECT MAX(d) AS maxd FROM base),
    per AS (SELECT event_type,
                   CASE WHEN d >= maxd - 6 THEN 'cur' ELSE 'ref' END
                     AS period,
                   {_PSI_BIN} AS bin
            FROM base CROSS JOIN mx),
    c AS (SELECT event_type, bin,
                 SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS nc,
                 SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS nr
          FROM per GROUP BY 1, 2),
    t AS (SELECT event_type, bin, nc, nr,
                 SUM(nc) OVER (PARTITION BY event_type) AS tc,
                 SUM(nr) OVER (PARTITION BY event_type) AS tr
          FROM c),
    s AS (SELECT event_type, {_PSI_TERM} AS term, tc, tr FROM t)
    SELECT event_type,
           CAST(MAX(tc) AS BIGINT) AS n_cur,
           CAST(MAX(tr) AS BIGINT) AS n_ref,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(CAST(term AS DECIMAL(20,6))) AS DOUBLE) AS psi
    FROM s GROUP BY event_type
    """,
    "population-stability-index (PSI) drift monitor: per event type, "
    "the value distribution of the trailing 7 days vs the prior "
    "reference period over 10 fixed-width bins, Laplace-smoothed — "
    "the standard production gate for feature/score drift (PSI > 0.2 "
    "= retrain). One scan bins every event, one map-side-combined "
    "(type, bin) count, per-type totals via a window over the bounded "
    "bin frame; the reference date is a 1-row broadcast scalar",
    "events extension (PSI data-drift monitor)",
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    base = ev.select("event_type", F.to_date("ts").alias("d"), "value")
    mx = base.agg(F.max("d").alias("maxd"))
    per = base.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.expr(
            "CASE WHEN d >= date_sub(maxd, 6) THEN 'cur' ELSE 'ref' END"
        ).alias("period"),
        F.expr(_PSI_BIN).alias("bin"),
    )
    c = per.groupBy("event_type", "bin").agg(
        F.expr("SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END)").alias("nc"),
        F.expr("SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END)").alias("nr"),
    )
    w = W.partitionBy("event_type")
    t = c.withColumn("tc", F.sum("nc").over(w)).withColumn(
        "tr", F.sum("nr").over(w)
    )
    s = t.select("event_type", F.expr(_PSI_TERM).alias("term"), "tc", "tr")
    return s.groupBy("event_type").agg(
        F.max("tc").cast("bigint").alias("n_cur"),
        F.max("tr").cast("bigint").alias("n_ref"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.col("term").cast("decimal(20,6)")).cast("double").alias("psi"),
    )


_TOUCH_TYPES = ("view", "click", "signup")


@register(
    "events_last_touch_attribution",
    """
    WITH t AS (
      SELECT event_id, user_id, event_type, value,
             last_value(CASE WHEN event_type IN ('view','click','signup')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_touch
      FROM events)
    SELECT COALESCE(last_touch, 'none') AS channel,
           CAST(COUNT(*) AS BIGINT) AS purchases,
           CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
             AS attributed_revenue
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
    "last-touch marketing attribution: each purchase's revenue is "
    "credited to the user's most recent touch channel (view/click/"
    "signup) at or before the purchase, 'none' when no prior touch. "
    "One carry-forward window per user (last IGNORE NULLS over the "
    "ordered event stream — the fill-forward pattern), then one "
    "map-side-combined rollup over ≤4 channels; no self-join, no "
    "per-purchase touch scan. Revenue sums are decimal-exact",
    "events extension (last-touch attribution)",
)
def events_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    touch = F.when(
        F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type")
    )
    marked = ev.withColumn(
        "last_touch", F.last(touch, ignorenulls=True).over(w)
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("last_touch"), F.lit("none")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("purchases"),
            F.sum(F.col("value").cast("decimal(30,4)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


# Shared weight-formula text (U-shaped / position-based attribution):
# 1-touch journeys get full credit, 2-touch split evenly, longer
# journeys 40% first / 40% last / 20% spread over the middles. Single
# double divide per row (IEEE-exact both engines); the weight*value
# product is rounded at 6 dp (FMA-contraction guard) before the exact
# decimal sum — the derived-float parity rule from queries/base.py.
_USHAPE_CONTRIB = (
    "round((CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5 "
    "WHEN pos = 1 OR pos = n THEN 0.4 "
    "ELSE 0.2 / CAST(n - 2 AS DOUBLE) END) * pvalue, 6)"
)


@register(
    "events_ushape_attribution",
    f"""
    WITH t AS (
      SELECT event_id, user_id, ts, event_type,
             first_value(CASE WHEN event_type = 'purchase' THEN event_id
                         END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_pid
      FROM events),
    touches AS (
      SELECT user_id, event_type, next_pid,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id, next_pid
                                     ORDER BY ts, event_id) AS BIGINT)
               AS pos,
             CAST(COUNT(*) OVER (PARTITION BY user_id, next_pid)
                  AS BIGINT) AS n
      FROM t
      WHERE event_type IN ('view','click','signup')
        AND next_pid IS NOT NULL),
    contrib AS (
      SELECT touches.event_type AS channel,
             {_USHAPE_CONTRIB} AS c
      FROM touches
      JOIN (SELECT event_id, value AS pvalue FROM events
            WHERE event_type = 'purchase') AS p
        ON touches.next_pid = p.event_id)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE)
             AS attributed_revenue
    FROM contrib GROUP BY 1 ORDER BY channel
    """,
    "U-shaped (position-based) multi-touch attribution: every touch "
    "is assigned to the user's NEXT purchase (backward fill via first "
    "IGNORE NULLS over the reverse frame — journeys reset at each "
    "conversion by construction), then weighted 40/20/40 by position "
    "within the journey and credited fractionally. Two windows on the "
    "same user-partitioned stream + one (user, journey) window, one "
    "equi-join of touches to purchase revenue on purchase id — no "
    "per-pair expansion; journeys never materialize as arrays",
    "events extension (position-based multi-touch attribution)",
)
def events_ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    pid = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    t = ev.withColumn("next_pid", F.first(pid, ignorenulls=True).over(wf))
    wj = W.partitionBy("user_id", "next_pid").orderBy("ts", "event_id")
    touches = (
        t.filter(
            F.col("event_type").isin(*_TOUCH_TYPES)
            & F.col("next_pid").isNotNull()
        )
        .withColumn("pos", F.row_number().over(wj).cast("bigint"))
        .withColumn(
            "n",
            F.count(F.lit(1))
            .over(W.partitionBy("user_id", "next_pid"))
            .cast("bigint"),
        )
        .select("event_type", "next_pid", "pos", "n")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("value").alias("pvalue")
    )
    contrib = touches.join(
        purchases, touches["next_pid"] == purchases["pid"]
    ).select(
        F.col("event_type").alias("channel"),
        F.expr(_USHAPE_CONTRIB).alias("c"),
    )
    return (
        contrib.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("touches"),
            F.sum(F.col("c").cast("decimal(30,6)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


# Day-bucketed exponential decay: k = whole days between touch and
# purchase (integer math), weight = 0.5^k for k in 0..6 — every weight
# is a negative power of two, exactly representable in double AND in
# DECIMAL(10,6) (2^-6 = 0.015625), so per-purchase weight sums are
# exact in any order and the normalization divide is a single
# deterministic IEEE op. The credit product is rounded at 6 dp (FMA
# guard) before the exact decimal sum.
_DECAY_CONTRIB = "round((pvalue * w) / sum_w, 6)"
# Whole days back. floor() on both engines — a bare double->bigint
# CAST truncates in Spark but ROUNDS in DuckDB.
_DECAY_K = "CAST(floor((pms - tms) / 86400000.0) AS BIGINT)"


@register(
    "events_time_decay_attribution",
    f"""
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_ms(ts) AS pms,
             value AS pvalue
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT user_id, event_type AS channel, epoch_ms(ts) AS tms
      FROM events WHERE event_type IN ('view','click','signup')),
    pairs AS (
      SELECT p.pid, p.pvalue, t.channel,
             {_DECAY_K} AS k
      FROM p JOIN t ON p.user_id = t.user_id
      WHERE t.tms <= p.pms AND p.pms - t.tms < 7 * 86400000),
    w8 AS (
      SELECT pid, pvalue, channel, power(0.5, k) AS w FROM pairs),
    nrm AS (
      SELECT pid, pvalue, channel, w,
             CAST(SUM(CAST(w AS DECIMAL(10,6))) OVER (PARTITION BY pid)
                  AS DOUBLE) AS sum_w
      FROM w8),
    contrib AS (
      SELECT channel, {_DECAY_CONTRIB} AS c FROM nrm)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(CAST(c AS DECIMAL(30,6))) AS DOUBLE)
             AS attributed_revenue
    FROM contrib GROUP BY 1 ORDER BY channel
    """,
    "time-decay multi-touch attribution: every touch in the 7 days "
    "before a purchase earns day-bucketed exponential credit (0.5^k, "
    "k = whole days back — exact powers of two, so weight sums are "
    "order-independent), normalized per purchase. Spark-side "
    "candidate generation is the 1D day-bin pattern (purchases "
    "explode into 8 day bins, touches keep their own bin, equi-join "
    "on (user, bin) + exact window filter) — never a per-user "
    "touch x purchase cross product; the oracle states the plain "
    "quadratic join",
    "events extension (time-decay attribution; 1D-binned non-equi join)",
)
def events_time_decay_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_events(spark, sf_dir)
    day_ms = 86400000
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("pid"),
            F.col("user_id").alias("p_user"),
            F.unix_millis("ts").alias("pms"),
            F.col("value").alias("pvalue"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.expr(f"pms div {day_ms}") - F.lit(7),
                    F.expr(f"pms div {day_ms}"),
                )
            ),
        )
    )
    t = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.unix_millis("ts").alias("tms"),
        F.expr(f"unix_millis(ts) div {day_ms}").alias("bin"),
    )
    pairs = (
        p.join(t, (p["p_user"] == t["t_user"]) & (p["bin"] == t["bin"]))
        .filter(
            (F.col("tms") <= F.col("pms"))
            & (F.col("pms") - F.col("tms") < 7 * day_ms)
        )
        .select(
            "pid",
            "pvalue",
            "channel",
            F.expr(_DECAY_K).alias("k"),
        )
    )
    w8 = pairs.select(
        "pid", "pvalue", "channel", F.expr("power(0.5, k)").alias("w")
    )
    nrm = w8.withColumn(
        "sum_w",
        F.sum(F.col("w").cast("decimal(10,6)"))
        .over(W.partitionBy("pid"))
        .cast("double"),
    )
    contrib = nrm.select("channel", F.expr(_DECAY_CONTRIB).alias("c"))
    return (
        contrib.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("touches"),
            F.sum(F.col("c").cast("decimal(30,6)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


# Forecast / cell-error formula texts shared by the Spark build and the
# DuckDB oracle (identical IEEE op order; 6 dp rounding bounds each
# float before the exact decimal sums).
_FC_F6 = (
    "round(CAST(COALESCE(sx, 0) AS DOUBLE) / CAST(nd AS DOUBLE), 6)"
)
_FC_ERR = "round(abs(CAST(a AS DOUBLE) - f6), 6)"
_FC_BIAS = "round(CAST(a AS DOUBLE) - f6, 6)"


@register(
    "events_forecast_backtest",
    f"""
    WITH hourly AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(hour(ts) AS BIGINT) AS hod, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2, 3),
    sc AS (SELECT MAX(d) AS maxd,
                  CAST(COUNT(DISTINCT d) - 1 AS BIGINT) AS nd
           FROM hourly),
    cond AS (
      SELECT h.event_type, h.hod,
             CAST(SUM(CASE WHEN h.d < sc.maxd THEN h.cnt ELSE 0 END)
                  AS BIGINT) AS sx,
             CAST(SUM(CASE WHEN h.d = sc.maxd THEN h.cnt ELSE 0 END)
                  AS BIGINT) AS a0
      FROM hourly h CROSS JOIN sc GROUP BY 1, 2),
    types AS (SELECT DISTINCT event_type FROM cond),
    cells AS (SELECT event_type, CAST(r.range AS BIGINT) AS hod
              FROM types CROSS JOIN range(24) AS r),
    cell AS (
      SELECT c.event_type,
             COALESCE(cond.a0, 0) AS a, cond.sx, sc.nd
      FROM cells c CROSS JOIN sc
      LEFT JOIN cond ON c.event_type = cond.event_type
                    AND c.hod = cond.hod),
    err AS (
      SELECT event_type, a, {_FC_ERR} AS e, {_FC_BIAS} AS b
      FROM (SELECT event_type, a, {_FC_F6} AS f6 FROM cell)),
    agg AS (
      SELECT event_type,
             CAST(SUM(a) AS BIGINT) AS actual_events,
             CAST(SUM(CAST(e AS DECIMAL(20,6))) AS DOUBLE) AS se,
             CAST(SUM(CAST(b AS DECIMAL(20,6))) AS DOUBLE) AS sb
      FROM err GROUP BY 1)
    SELECT event_type, actual_events,
           round(se / 24.0, 6) AS mae,
           round(sb / 24.0, 6) AS bias
    FROM agg ORDER BY event_type
    """,
    "seasonal-naive forecast backtest: per (event_type, hour-of-day) "
    "mean hourly volume over all training days predicts the held-out "
    "last day; MAE and signed bias per type over the dense 24-hour "
    "grid (zero-filled cells included — a forecast evaluated only on "
    "hours that happened inflates accuracy). One hourly rollup feeds "
    "a single conditional train/test pass (no self-join); the date "
    "scalars are a 1-row broadcast; the cell grid is types x 24",
    "events extension (forecast baselining / backtest metrics)",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    sc = hourly.agg(
        F.max("d").alias("maxd"),
        (F.countDistinct("d") - F.lit(1)).cast("bigint").alias("nd"),
    )
    cond = (
        hourly.crossJoin(F.broadcast(sc))
        .groupBy("event_type", "hod")
        .agg(
            F.sum(F.expr("CASE WHEN d < maxd THEN cnt ELSE 0 END"))
            .cast("bigint")
            .alias("sx"),
            F.sum(F.expr("CASE WHEN d = maxd THEN cnt ELSE 0 END"))
            .cast("bigint")
            .alias("a0"),
        )
    )
    types = cond.select("event_type").distinct()
    cells = types.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hod0"),
    ).select("event_type", F.col("hod0").cast("bigint").alias("hod"))
    cell = (
        cells.crossJoin(F.broadcast(sc))
        .join(F.broadcast(cond), ["event_type", "hod"], "left")
        .select(
            "event_type",
            F.coalesce(F.col("a0"), F.lit(0)).alias("a"),
            "sx",
            "nd",
        )
    )
    err = cell.select("event_type", "a", F.expr(_FC_F6).alias("f6")).select(
        "event_type",
        "a",
        F.expr(_FC_ERR).alias("e"),
        F.expr(_FC_BIAS).alias("b"),
    )
    agg = err.groupBy("event_type").agg(
        F.sum("a").cast("bigint").alias("actual_events"),
        F.sum(F.col("e").cast("decimal(20,6)")).cast("double").alias("se"),
        F.sum(F.col("b").cast("decimal(20,6)")).cast("double").alias("sb"),
    )
    return agg.select(
        "event_type",
        "actual_events",
        F.expr("round(se / 24.0, 6)").alias("mae"),
        F.expr("round(sb / 24.0, 6)").alias("bias"),
    ).orderBy("event_type")


# Pearson correlation from exact integer moments (daily counts), one
# shared formula text: every product/difference stays in BIGINT
# (exact), the only float ops are the two sqrts, one divide and the
# 6 dp round — identical IEEE order on both engines.
_CORR7 = (
    "round((CAST(n * sxy - sx * sy AS DOUBLE)) "
    "/ (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) "
    "* sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)"
)


@register(
    "events_rolling_corr",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END) AS BIGINT) AS y
      FROM events GROUP BY 1),
    m AS (
      SELECT d, x, y,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
             CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT d, x, y, {_CORR7} AS corr7
    FROM m
    WHERE n = 7 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ORDER BY d
    """,
    "rolling cross-series correlation: daily click vs purchase volumes "
    "joined into one series by a single conditional pass, then 7-day "
    "trailing Pearson r from exact integer window moments (counts and "
    "their products never leave BIGINT; zero-variance windows excluded "
    "by the same guard text both sides). The unpartitioned ordered "
    "window runs on the bounded one-row-per-day frame — the corpus "
    "pays one map-side-combined rollup, never a global sort",
    "events extension (rolling cross-series correlation)",
)
def events_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("x"),
        F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("y"),
    )
    w = W.orderBy("d").rowsBetween(-6, W.currentRow)
    m = daily.select(
        "d",
        "x",
        "y",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
    )
    return (
        m.filter(
            (F.col("n") == 7)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select("d", "x", "y", F.expr(_CORR7).alias("corr7"))
        .orderBy("d")
    )


@register(
    "events_interarrival_stats",
    """
    WITH g AS (
      SELECT event_type,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER
               (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS gap
      FROM events),
    v AS (SELECT event_type, CAST(gap AS BIGINT) AS gap
          FROM g WHERE gap IS NOT NULL),
    med AS (SELECT event_type,
                   ROUND(quantile_cont(gap, 0.5), 6) AS median_gap_ms
            FROM v GROUP BY 1),
    agg AS (SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(SUM(gap) AS BIGINT) AS sg,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_ms
            FROM v GROUP BY 1)
    SELECT a.event_type, a.n_gaps,
           round(CAST(a.sg AS DOUBLE) / CAST(a.n_gaps AS DOUBLE), 6)
             AS mean_gap_ms,
           m.median_gap_ms, a.max_gap_ms
    FROM agg a JOIN med m USING (event_type)
    ORDER BY a.event_type
    """,
    "per-type inter-arrival cadence: millisecond gaps between a "
    "user's consecutive events of the same type (one lag window per "
    "(user, type) stream — integer-exact), summarized as mean (exact "
    "BIGINT sum, one double divide), exact interpolated median (the "
    "two-pass spillable _group_median plan — no per-group buffer) and "
    "max. The skew between mean and median exposes bursty vs steady "
    "engagement; the gap frame is localCheckpoint'd once for its two "
    "consumers",
    "events extension (inter-arrival cadence analysis)",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    wlag = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(wlag)
        ).alias("gap"),
    )
    v = (
        g.filter(F.col("gap").isNotNull())
        .select("event_type", F.col("gap").cast("bigint").alias("gap"))
        .localCheckpoint(eager=True)
    )
    med = _group_median(v, "gap").withColumnRenamed("med", "median_gap_ms")
    agg = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("sg"),
        F.max("gap").cast("bigint").alias("max_gap_ms"),
    )
    return (
        agg.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "n_gaps",
            F.expr(
                "round(CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6)"
            ).alias("mean_gap_ms"),
            "median_gap_ms",
            "max_gap_ms",
        )
        .orderBy("event_type")
    )


# Pointwise mutual information from exact integer session counts; the
# single ln is rounded at 6 dp (transcendental guard), everything
# before it is BIGINT-exact and the divide is one IEEE op.
_PMI = (
    "round(ln((CAST(n_ab AS DOUBLE) * n_sessions) "
    "/ (CAST(n_a AS DOUBLE) * n_b)), 6)"
)


@register(
    "events_session_cooccurrence_pmi",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
             LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ms
      FROM events),
    marked AS (
      SELECT *, CASE WHEN prev_ms IS NULL
                       OR ts_ms - prev_ms > {SESSION_GAP_MS}
                     THEN 1 ELSE 0 END AS is_new
      FROM ordered),
    sess AS (
      SELECT user_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts_ms, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM marked),
    st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
           FROM (SELECT user_id, session_id FROM st GROUP BY 1, 2)),
    na AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM st GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
       AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_ab, x.n AS n_a, y.n AS n_b,
           ns.n_sessions, {_PMI} AS pmi
    FROM pairs p
    JOIN na x ON p.type_a = x.event_type
    JOIN na y ON p.type_b = y.event_type
    CROSS JOIN ns
    ORDER BY type_a, type_b
    """,
    "session-level co-occurrence mining: PMI between event-type pairs "
    "appearing in the same 30-min session — positive PMI = the pair "
    "clusters in sessions, negative = they repel. Sessions come from "
    "the gaps-and-islands windows; per-session type sets collapse to "
    "ONE sorted array each and pairs explode from inside the array "
    "(i<j slice combinations — no per-session self-join, pair count "
    "bounded by types^2); counts stay BIGINT, the single ln is 6 dp "
    "rounded. Oracle states the equivalent self-join; the checkpointed "
    "session-type frame feeds all three consumers",
    "events extension (session co-occurrence PMI)",
)
def events_session_cooccurrence_pmi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    order_w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_ms").over(order_w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(order_w) > SESSION_GAP_MS),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new")
        .over(order_w.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint"),
    )
    st = (
        sess.groupBy("user_id", "session_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
        .localCheckpoint(eager=True)
    )
    pairs = st.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (x, i) -> "
                "transform(slice(types, i + 2, size(types)), "
                "y -> named_struct('a', x, 'b', y))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("type_a"), F.col("p.b").alias("type_b"))
    nab = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ab")
    )
    na = (
        st.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ns = st.agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    return (
        nab.join(
            F.broadcast(na.withColumnRenamed("n", "n_a")),
            nab["type_a"] == na["event_type"],
        )
        .drop("event_type")
        .join(
            F.broadcast(
                na.withColumnRenamed("n", "n_b").withColumnRenamed(
                    "event_type", "et_b"
                )
            ),
            F.col("type_b") == F.col("et_b"),
        )
        .drop("et_b")
        .crossJoin(F.broadcast(ns))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_sessions",
            F.expr(_PMI).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


def _group_quantiles_10_90(df: DataFrame, val_col: str) -> DataFrame:
    """Exact interpolated per-event_type p10/p90 from the DISTRIBUTED
    distinct-value prefix sum (operators/ranks.value_prefix — the
    agg_equidepth_histogram two-level value-grid scan; events value
    domain is generator-bounded [0, ~500] so /10 grids to ~50 bins):
    the 0-indexed boundary value is the unique distinct-value row with
    cb <= idx < cb + c — no per-group Sort+Window over the row-scale
    frame, no per-group buffer. Same (n-1)*p formula as DuckDB's
    quantile_cont, rounded 6 dp."""
    from hangarbay_spark.operators.ranks import hit_idx, value_prefix

    ranked = value_prefix(
        df.select("event_type", F.col(val_col).alias("__val")),
        ["event_type"],
        "__val",
        10.0,
    )
    sel = F.lit(False)
    aggs = [F.max("__n").alias("__n")]
    for tag, p in (("10", 0.1), ("90", 0.9)):
        pos = (F.col("__n") - 1).cast("double") * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        sel = sel | hit_idx(lo) | hit_idx(hi)
        aggs.append(
            F.max(F.when(hit_idx(lo), F.col("__v"))).alias(f"__vlo{tag}")
        )
        aggs.append(
            F.max(F.when(hit_idx(hi), F.col("__v"))).alias(f"__vhi{tag}")
        )
    agg = ranked.filter(sel).groupBy("event_type").agg(*aggs)
    outs = []
    for tag, p in (("10", 0.1), ("90", 0.9)):
        pp = (F.col("__n") - 1).cast("double") * F.lit(p)
        frac = pp - F.floor(pp).cast("double")
        outs.append(
            F.round(
                F.col(f"__vlo{tag}")
                + frac * (F.col(f"__vhi{tag}") - F.col(f"__vlo{tag}")),
                6,
            ).alias(f"q{tag}")
        )
    return agg.select("event_type", *outs)


@register(
    "events_winsorized_stats",
    """
    WITH q AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.1), 6) AS q10,
             ROUND(quantile_cont(value, 0.9), 6) AS q90
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    c AS (
      SELECT e.event_type,
             LEAST(GREATEST(e.value, q.q10), q.q90) AS cv,
             q.q10, q.q90
      FROM events e JOIN q USING (event_type)
      WHERE e.value IS NOT NULL),
    a AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(cv AS DECIMAL(30,6))) AS DOUBLE) AS scv,
             MAX(q10) AS q10, MAX(q90) AS q90
      FROM c GROUP BY 1)
    SELECT event_type, n,
           round(scv / CAST(n AS DOUBLE), 6) AS winsorized_mean,
           q10, q90
    FROM a ORDER BY event_type
    """,
    "winsorized robust statistics: per-type p10/p90 from ONE exact "
    "two-pass interpolated-quantile plan (both boundary pairs picked "
    "from a single spillable ranked pass — no per-group buffer, no "
    "second sort), values clipped to the band, decimal-exact clipped "
    "mean. The mean a single fat-finger order can't move — the "
    "robust twin of the plain average; bounds broadcast back onto "
    "the scan",
    "analytics extension (winsorized/trimmed robust statistics)",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_events(spark, sf_dir)
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    q = _group_quantiles_10_90(ev, "value")
    c = ev.join(F.broadcast(q), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("q10")), F.col("q90")).alias(
            "cv"
        ),
        "q10",
        "q90",
    )
    a = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cv").cast("decimal(30,6)")).cast("double").alias("scv"),
        F.max("q10").alias("q10"),
        F.max("q90").alias("q90"),
    )
    return a.select(
        "event_type",
        "n",
        F.expr("round(scv / CAST(n AS DOUBLE), 6)").alias("winsorized_mean"),
        "q10",
        "q90",
    ).orderBy("event_type")


@register(
    "events_debounce_rate",
    """
    WITH g AS (
      SELECT event_type,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER
               (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS gap
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap IS NULL OR gap > 60000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(SUM(CASE WHEN gap IS NULL OR gap > 60000
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS keep_rate
    FROM g GROUP BY 1 ORDER BY 1
    """,
    "debounce/throttle audit: an event is KEPT when it starts a burst "
    "(first of its (user, type) stream or >60 s after the previous "
    "one) — the standard client-event rate-limiting rule. One lag "
    "window per (user, type) stream + a conditional rollup; keep "
    "rates per type quantify how much duplicate-burst traffic a "
    "debouncing ingest stage would shed before it ever reaches "
    "storage",
    "events extension (debounce/throttle rate audit)",
)
def events_debounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    wlag = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(wlag)
        ).alias("gap"),
    )
    kept = F.sum(
        F.expr("CASE WHEN gap IS NULL OR gap > 60000 THEN 1 ELSE 0 END")
    ).cast("bigint")
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            kept.alias("n_kept"),
        )
        .select(
            "event_type",
            "n_events",
            "n_kept",
            F.expr(
                "round(CAST(n_kept AS DOUBLE) / CAST(n_events AS DOUBLE), 6)"
            ).alias("keep_rate"),
        )
        .orderBy("event_type")
    )


@register(
    "events_growth_accounting",
    """
    WITH uw AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS DATE) AS wk
                FROM events),
    mx AS (SELECT MAX(wk) AS maxwk FROM uw),
    seq AS (SELECT user_id, wk,
                   lag(wk) OVER (PARTITION BY user_id ORDER BY wk)
                     AS prev_wk,
                   lead(wk) OVER (PARTITION BY user_id ORDER BY wk)
                     AS next_wk
            FROM uw),
    st AS (
      SELECT wk,
             CASE WHEN prev_wk IS NULL THEN 'new'
                  WHEN prev_wk = wk - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS stage
      FROM seq
      UNION ALL
      SELECT CAST(wk + INTERVAL 7 DAY AS DATE), 'churned'
      FROM seq CROSS JOIN mx
      WHERE (next_wk IS NULL OR next_wk > wk + INTERVAL 7 DAY)
        AND CAST(wk + INTERVAL 7 DAY AS DATE) <= mx.maxwk)
    SELECT wk,
           CAST(SUM(CASE WHEN stage = 'new' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN stage = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN stage = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN stage = 'churned' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned
    FROM st GROUP BY wk ORDER BY wk
    """,
    "weekly growth accounting (new / retained / resurrected / "
    "churned): the standard MAU-accounting identity, from one "
    "distinct user-week frame, one lag+lead window per user, and ONE "
    "filtered-struct-array explode emitting each row's stage plus its "
    "conditional next-week churn record (single consumption — no "
    "unionByName of two selects, failing churn rows never "
    "materialize); weeks clipped at the corpus max via a 1-row "
    "broadcast. Oracle states the equivalent two-arm UNION ALL",
    "events extension (growth accounting / lifecycle stages)",
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    mx = uw.agg(F.max("wk").alias("maxwk"))
    wlag = W.partitionBy("user_id").orderBy("wk")
    seq = uw.select(
        "wk",
        F.lag("wk").over(wlag).alias("prev_wk"),
        F.lead("wk").over(wlag).alias("next_wk"),
    )
    arr = F.expr(
        "filter(array("
        "named_struct('w', wk, 'st', "
        "  CASE WHEN prev_wk IS NULL THEN 'new' "
        "       WHEN prev_wk = date_sub(wk, 7) THEN 'retained' "
        "       ELSE 'resurrected' END), "
        "named_struct('w', date_add(wk, 7), 'st', "
        "  CASE WHEN next_wk IS NULL OR next_wk > date_add(wk, 7) "
        "       THEN 'churned' END)"
        "), x -> x.st IS NOT NULL)"
    )
    st = (
        seq.select(F.explode(arr).alias("e"))
        .select(F.col("e.w").alias("wk"), F.col("e.st").alias("stage"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("wk") <= F.col("maxwk"))
    )

    def cnt(stage):
        return F.sum(
            F.when(F.col("stage") == stage, 1).otherwise(0)
        ).cast("bigint")

    return (
        st.groupBy("wk")
        .agg(
            cnt("new").alias("n_new"),
            cnt("retained").alias("n_retained"),
            cnt("resurrected").alias("n_resurrected"),
            cnt("churned").alias("n_churned"),
        )
        .orderBy("wk")
    )


@register(
    "events_cohort_ltv_curves",
    """
    WITH uw AS (SELECT user_id,
                       MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort
                FROM events GROUP BY 1),
    p AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                 value
          FROM events WHERE event_type = 'purchase'),
    r AS (SELECT u.cohort,
                 CAST(date_diff('day', u.cohort, p.wk) // 7 AS BIGINT)
                   AS wsince,
                 SUM(CAST(p.value AS DECIMAL(30,4))) AS rev
          FROM p JOIN uw u USING (user_id) GROUP BY 1, 2),
    cs AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users
           FROM uw GROUP BY 1),
    c AS (SELECT cohort, wsince,
                 CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY wsince
                                     ROWS UNBOUNDED PRECEDING)
                      AS DOUBLE) AS cum_revenue
          FROM r)
    SELECT c.cohort, c.wsince, c.cum_revenue, cs.cohort_users,
           round(c.cum_revenue / CAST(cs.cohort_users AS DOUBLE), 6)
             AS ltv_per_user
    FROM c JOIN cs USING (cohort) ORDER BY cohort, wsince
    """,
    "cohort LTV curves: users grouped by first-seen week, purchase "
    "revenue accumulated by weeks-since-acquisition — cumulative "
    "decimal window sums (order-independent exactness) over the "
    "bounded (cohort, week) frame, normalized per cohort user. The "
    "curve families answer 'does a newer cohort monetize faster' — "
    "the LTV companion of events_retention_cohorts. One first-seen "
    "aggregation, one purchase join on user, windows never touch the "
    "raw corpus",
    "events extension (cohort LTV curves)",
)
def events_cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    wk = F.date_trunc("week", "ts").cast("date")
    # one row per user, consumed by the purchase join AND the cohort
    # sizes — checkpoint so neither consumer re-runs the first-seen
    # aggregation over the corpus (multiple-consumer invariant)
    uw = (
        ev.groupBy("user_id")
        .agg(F.min(wk).alias("cohort"))
        .localCheckpoint(eager=True)
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", wk.alias("wk"), "value"
    )
    r = (
        p.join(uw, "user_id")
        .groupBy(
            "cohort",
            F.expr("CAST(datediff(wk, cohort) div 7 AS BIGINT)").alias(
                "wsince"
            ),
        )
        .agg(F.sum(F.col("value").cast("decimal(30,4)")).alias("rev"))
    )
    cs = uw.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    c = r.select(
        "cohort",
        "wsince",
        F.sum("rev")
        .over(
            W.partitionBy("cohort")
            .orderBy("wsince")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .cast("double")
        .alias("cum_revenue"),
    )
    return (
        c.join(F.broadcast(cs), "cohort")
        .select(
            "cohort",
            "wsince",
            "cum_revenue",
            "cohort_users",
            F.expr(
                "round(cum_revenue / CAST(cohort_users AS DOUBLE), 6)"
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort", "wsince")
    )


@register(
    "events_adoption_curve",
    """
    WITH fs AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d
                FROM events GROUP BY 1),
    daily AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_new_users
              FROM fs GROUP BY 1)
    SELECT d, n_new_users,
           CAST(SUM(n_new_users) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM daily ORDER BY d
    """,
    "user adoption curve: cumulative distinct users by day WITHOUT a "
    "cumulative-distinct window (quadratic state at scale) — each "
    "user collapses to a first-seen day (one aggregation), the "
    "running total is a window over the bounded per-day frame. The "
    "standard launch/adoption chart, computed the only way that "
    "survives 100 TB",
    "events extension (adoption curve / cumulative distinct)",
)
def events_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    fs = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    daily = fs.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_users")
    )
    return daily.select(
        "d",
        "n_new_users",
        F.sum("n_new_users")
        .over(W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("cum_users"),
    ).orderBy("d")


@register(
    "events_error_budget_burn",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs
      FROM events GROUP BY 1),
    r AS (
      SELECT day, n, errs,
             CAST(SUM(n) OVER w AS BIGINT) AS n7,
             CAST(SUM(errs) OVER w AS BIGINT) AS errs7
      FROM d WINDOW w AS (ORDER BY day
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT day, n, errs,
           round(CAST(errs AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS error_rate,
           round(CAST(errs7 AS DOUBLE) / CAST(n7 AS DOUBLE), 6)
             AS error_rate_7d,
           round((CAST(errs7 AS DOUBLE) / CAST(n7 AS DOUBLE)) / 0.01, 6)
             AS budget_burn_7d
    FROM r ORDER BY day
    """,
    "SLO error-budget burn report: daily and trailing-7-day error "
    "rates plus the burn multiplier against a 1% error budget (the "
    "SRE alerting primitive — burn > 1 means the budget exhausts "
    "before the window closes). One conditional daily rollup, "
    "integer window sums on the bounded per-day frame, divides in "
    "shared 6 dp text; the corpus is scanned once",
    "events extension (SLO error-budget burn)",
)
def events_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("errs"),
    )
    w = W.orderBy("day").rowsBetween(-6, W.currentRow)
    r = d.select(
        "day",
        "n",
        "errs",
        F.sum("n").over(w).cast("bigint").alias("n7"),
        F.sum("errs").over(w).cast("bigint").alias("errs7"),
    )
    return r.select(
        "day",
        "n",
        "errs",
        F.expr("round(CAST(errs AS DOUBLE) / CAST(n AS DOUBLE), 6)").alias(
            "error_rate"
        ),
        F.expr(
            "round(CAST(errs7 AS DOUBLE) / CAST(n7 AS DOUBLE), 6)"
        ).alias("error_rate_7d"),
        F.expr(
            "round((CAST(errs7 AS DOUBLE) / CAST(n7 AS DOUBLE)) / 0.01, 6)"
        ).alias("budget_burn_7d"),
    ).orderBy("day")


# Ensemble flag texts — each reproduces its source detector's exact
# formula (events_value_outliers / events_robust_outliers /
# events_seasonal_outliers) with the detector's own guard folded into
# a null-proof CASE, so a row's flag is 0/1 on both engines even where
# a lone detector would drop the row.
_FLAG_Z = (
    f"CASE WHEN abs(round((value - s / n) "
    f"/ sqrt(sq / n - (s / n) * (s / n)), 9)) > {Z_THRESHOLD} "
    "THEN 1 ELSE 0 END"
)
_FLAG_MAD = (
    "CASE WHEN mad > 0 AND abs(round(0.6745 * (value - med) / mad, 6)) "
    "> 3.5 THEN 1 ELSE 0 END"
)
_FLAG_SEAS = (
    "CASE WHEN nd > 1.0 AND sxx - sx * sx / nd > 0.0 "
    "AND abs(round((value - sx / nd) "
    "/ sqrt((sxx - sx * sx / nd) / (nd - 1.0)), 6)) > 3.0 "
    "THEN 1 ELSE 0 END"
)


@register(
    "events_anomaly_consensus",
    f"""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE)
               AS sq
      FROM events GROUP BY event_type),
    medo AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type),
    devo AS (
      SELECT e.event_type, abs(e.value - m.med) AS dev
      FROM events e JOIN medo m USING (event_type)
      WHERE e.value IS NOT NULL),
    mado AS (
      SELECT event_type, ROUND(quantile_cont(dev, 0.5), 6) AS mad
      FROM devo GROUP BY event_type),
    seas AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE)
               AS sxx
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT e.event_id, e.event_type, e.value,
             CAST({_FLAG_Z} AS BIGINT) AS flag_z,
             CAST({_FLAG_MAD} AS BIGINT) AS flag_mad,
             CAST({_FLAG_SEAS} AS BIGINT) AS flag_seasonal
      FROM events e
      JOIN stats USING (event_type)
      JOIN medo USING (event_type)
      JOIN mado USING (event_type)
      JOIN seas ON e.event_type = seas.event_type
               AND CAST(hour(e.ts) AS BIGINT) = seas.hod)
    SELECT event_id, event_type, value,
           flag_z, flag_mad, flag_seasonal,
           flag_z + flag_mad + flag_seasonal AS votes
    FROM f
    WHERE flag_z + flag_mad + flag_seasonal >= 2
    ORDER BY votes DESC, event_id LIMIT 50
    """,
    "ensemble anomaly detection: the global z-score, robust "
    "median/MAD and hour-of-day seasonal detectors (each reproducing "
    "its standalone query's exact formula text) vote per event; only "
    "rows flagged by >= 2 detectors surface — the alert-fatigue "
    "reducer that keeps single-detector false positives out of the "
    "pager. ONE corpus scan joined to three broadcast baseline "
    "frames (per-type moments, per-type med/MAD from the spillable "
    "two-pass, 120-cell seasonal moments); detector guards are "
    "folded into null-proof CASE flags",
    "analytics extension (ensemble anomaly consensus)",
)
def events_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,4)"))
        .cast("double")
        .alias("sq"),
    )
    evv = ev.select("event_type", "value").filter(F.col("value").isNotNull())
    med = _group_median(evv, "value")
    dev = (
        evv.join(F.broadcast(med), "event_type")
        .withColumn("dev", F.abs(F.col("value") - F.col("med")))
    )
    mad = _group_median(dev, "dev").withColumnRenamed("med", "mad")
    seas = ev.select(
        "event_type", "value", F.hour("ts").cast("bigint").alias("hod")
    ).groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,8)"))
        .cast("double")
        .alias("sxx"),
    )
    f = (
        ev.select(
            "event_id",
            "event_type",
            "value",
            F.hour("ts").cast("bigint").alias("hod"),
        )
        .join(F.broadcast(stats), "event_type")
        .join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .join(F.broadcast(seas), ["event_type", "hod"])
        .select(
            "event_id",
            "event_type",
            "value",
            F.expr(_FLAG_Z).cast("bigint").alias("flag_z"),
            F.expr(_FLAG_MAD).cast("bigint").alias("flag_mad"),
            F.expr(_FLAG_SEAS).cast("bigint").alias("flag_seasonal"),
        )
    )
    return (
        f.withColumn(
            "votes",
            F.col("flag_z") + F.col("flag_mad") + F.col("flag_seasonal"),
        )
        .filter(F.col("votes") >= 2)
        .orderBy(F.desc("votes"), "event_id")
        .limit(50)
    )


@register(
    "events_scd2_asof_enrich",
    """
    WITH p AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
             CASE WHEN value < 50 THEN 'low'
                  WHEN value < 200 THEN 'mid' ELSE 'high' END AS tier
      FROM events WHERE event_type = 'purchase'),
    chg0 AS (
      SELECT user_id, event_id, ts_ms, tier FROM (
        SELECT user_id, event_id, ts_ms, tier,
               LAG(tier) OVER (PARTITION BY user_id
                               ORDER BY ts_ms, event_id) AS prev_tier
        FROM p)
      WHERE prev_tier IS NULL OR tier <> prev_tier),
    chg AS (
      SELECT user_id, ts_ms, tier FROM (
        SELECT user_id, ts_ms, tier,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts_ms
                                  ORDER BY event_id DESC) AS rn
        FROM chg0)
      WHERE rn = 1),
    clicks AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
      FROM events WHERE event_type = 'click'),
    j AS (
      SELECT c.event_id, c.user_id, chg.tier
      FROM clicks c ASOF LEFT JOIN chg
        ON c.user_id = chg.user_id AND c.ts_ms >= chg.ts_ms)
    SELECT COALESCE(tier, 'none') AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY 1 ORDER BY tier
    """,
    "temporal-dimension enrichment: every click is stamped with the "
    "user's SCD2 tier AT CLICK TIME — the change log from "
    "events_scd2_user_tier consumed through the backward as-of "
    "carry (tier valid at t = last change row <= t), so no interval "
    "BETWEEN join and no interval table materialization; facts "
    "before any version get 'none'. One user-keyed carry shuffle + "
    "a bounded tier rollup. Oracle: native DuckDB ASOF LEFT JOIN "
    "against the same change log",
    "warehouse extension (SCD2 as-of fact enrichment)",
)
def events_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.temporal import as_of_join

    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("tier"),
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    chg = (
        p.withColumn("prev_tier", F.lag("tier").over(w))
        .filter(
            F.col("prev_tier").isNull()
            | (F.col("tier") != F.col("prev_tier"))
        )
        .select("user_id", "event_id", "ts_ms", "tier")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms")
    )
    # tie_break dedups same-ms change rows (max event_id wins) — the
    # same rn=1 rule the oracle's chg CTE applies, so an ASOF match
    # against a tied timestamp is deterministic on both engines.
    j = as_of_join(
        clicks,
        chg,
        on="user_id",
        left_ts="ts_ms",
        right_ts="ts_ms",
        right_cols=["tier"],
        tie_break="event_id",
    )
    return (
        j.groupBy(
            F.coalesce(F.col("asof_tier"), F.lit("none")).alias("tier")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("tier")
    )


# Kaplan-Meier per-step hazard term: ln of the survival factor at one
# step, 6 dp-rounded (transcendental guard); shared text, both engines.
_KM_TERM = (
    "round(ln(1.0 - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)), 6)"
)


@register(
    "events_kaplan_meier",
    f"""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             LEAD(CAST(ts AS DATE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events WHERE event_type = 'purchase'),
    ob AS (SELECT MAX(d) AS obs_end FROM p),
    dur AS (
      SELECT CASE WHEN nxt IS NULL THEN date_diff('day', d, obs_end)
                  ELSE date_diff('day', d, nxt) END AS t_days,
             CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS cens
      FROM p CROSS JOIN ob),
    grid AS (
      SELECT CAST(t_days AS BIGINT) AS t_days,
             CAST(SUM(1 - cens) AS BIGINT) AS n_events,
             CAST(SUM(cens) AS BIGINT) AS n_censored,
             CAST(COUNT(*) AS BIGINT) AS all_t
      FROM dur GROUP BY 1),
    risk AS (
      SELECT t_days, n_events, n_censored,
             CAST(SUM(all_t) OVER (ORDER BY t_days DESC) AS BIGINT) AS n_risk
      FROM grid),
    term AS (
      SELECT t_days, n_events, n_censored, n_risk, {_KM_TERM} AS lnterm
      FROM risk WHERE n_events < n_risk),
    cum AS (
      SELECT t_days, n_risk, n_events, n_censored,
             CAST(SUM(CAST(lnterm AS DECIMAL(20,6))) OVER (ORDER BY t_days)
                  AS DOUBLE) AS cs
      FROM term)
    SELECT t_days, n_risk, n_events, n_censored,
           round(exp(cs), 6) AS survival
    FROM cum ORDER BY t_days
    """,
    "Kaplan-Meier survival estimator over inter-purchase gaps: each "
    "purchase opens a spell that 'dies' at the user's next purchase "
    "(gap in days) and each user's open last spell is right-censored "
    "at the observation end — the classic repeat-purchase survival "
    "readout. One per-user lead window collapses the corpus to "
    "spells, then the whole estimator lives on the bounded "
    "per-duration grid: "
    "reverse-cumulative at-risk counts, per-step hazard as a "
    "6 dp-rounded ln factor (transcendental guard), and the survival "
    "product as exp of an exact-decimal running sum — identical "
    "doubles on both engines. At 100 TB the only corpus-scale work "
    "is the one user-keyed window; everything downstream is "
    "duration-domain-sized",
    "analytics extension (Kaplan-Meier survival / churn curve)",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.lead(F.to_date("ts"))
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("nxt"),
        )
        .localCheckpoint()
    )
    ob = p.agg(F.max("d").alias("obs_end"))
    dur = p.crossJoin(F.broadcast(ob)).select(
        F.when(
            F.col("nxt").isNull(), F.datediff("obs_end", "d")
        )
        .otherwise(F.datediff("nxt", "d"))
        .cast("bigint")
        .alias("t_days"),
        F.when(F.col("nxt").isNull(), 1).otherwise(0).alias("cens"),
    )
    grid = dur.groupBy("t_days").agg(
        F.sum(F.lit(1) - F.col("cens")).cast("bigint").alias("n_events"),
        F.sum("cens").cast("bigint").alias("n_censored"),
        F.count(F.lit(1)).cast("bigint").alias("all_t"),
    )
    risk = grid.select(
        "t_days",
        "n_events",
        "n_censored",
        F.sum("all_t")
        .over(W.orderBy(F.desc("t_days")))
        .cast("bigint")
        .alias("n_risk"),
    )
    term = risk.filter(F.col("n_events") < F.col("n_risk")).withColumn(
        "lnterm", F.expr(_KM_TERM)
    )
    cum = term.select(
        "t_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.sum(F.col("lnterm").cast("decimal(20,6)"))
        .over(W.orderBy("t_days"))
        .cast("double")
        .alias("cs"),
    )
    return cum.select(
        "t_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(F.exp("cs"), 6).alias("survival"),
    ).orderBy("t_days")


# Sample ACF at one lag from exact integer moments, all pre-cast to
# DOUBLE: global n/s/q over the dense series, per-lag pair moments
# m/a/b/p. One text, both engines; 6 dp FMA guard.
_ACF_FORMULA = (
    "round((p - s / n * a - s / n * b + m * (s / n) * (s / n)) "
    "/ (q - s / n * s), 6)"
)


@register(
    "events_acf_hourly",
    f"""
    WITH hc AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    bounds AS (SELECT MIN(hi) AS mn, MAX(hi) AS mx FROM hc),
    spine AS (SELECT unnest(generate_series(mn, mx)) AS hi FROM bounds),
    ser AS (SELECT s.hi, COALESCE(hc.x, 0) AS x
            FROM spine s LEFT JOIN hc ON s.hi = hc.hi),
    g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(x) AS DOUBLE) AS s,
                 CAST(SUM(x * x) AS DOUBLE) AS q FROM ser),
    lags AS (SELECT unnest(generate_series(1, 24)) AS lag_h),
    pairs AS (
      SELECT lags.lag_h, t.x AS xt, u.x AS xl
      FROM ser t CROSS JOIN lags JOIN ser u ON u.hi = t.hi + lags.lag_h),
    mo AS (
      SELECT lag_h, CAST(COUNT(*) AS DOUBLE) AS m,
             CAST(SUM(xt) AS DOUBLE) AS a,
             CAST(SUM(xl) AS DOUBLE) AS b,
             CAST(SUM(xt * xl) AS DOUBLE) AS p
      FROM pairs GROUP BY 1)
    SELECT CAST(lag_h AS BIGINT) AS lag_h,
           CAST(m AS BIGINT) AS n_pairs,
           {_ACF_FORMULA} AS acf
    FROM mo CROSS JOIN g
    WHERE q - s / n * s > 0.0 AND m > 1.0
    ORDER BY lag_h
    """,
    "autocorrelation function of the hourly event-count series at "
    "lags 1..24 (the seasonality diagnostic behind the seasonal "
    "detector and forecast backtest): gap hours count as zero via a "
    "generated dense spine, so the series is contiguous and the lag "
    "join is an exact hour-index equi-join. Every moment (global "
    "n/s/q, per-lag pair m/a/b/p) is an exact integer aggregate; the "
    "ACF ratio is ONE shared formula text over their double casts. "
    "At 100 TB the corpus pays one hourly rollup; the spine, lag "
    "expansion and pair join live on the hours-domain frame "
    "(24x series length), never on raw events",
    "analytics extension (autocorrelation / seasonality diagnostic)",
)
def events_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hc = ev.groupBy(
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) DIV 3600 AS BIGINT)"
        ).alias("hi")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    bounds = hc.agg(F.min("hi").alias("mn"), F.max("hi").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("hi")
    )
    # the dense series feeds both sides of the lag self-join —
    # checkpoint once (multi-consumer invariant); hours-domain-sized.
    ser = (
        spine.join(hc, "hi", "left")
        .select("hi", F.coalesce("x", F.lit(0)).alias("x"))
        .localCheckpoint()
    )
    g = ser.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("q"),
    )
    left = ser.select(
        F.col("x").alias("xt"),
        F.col("hi"),
        F.explode(F.sequence(F.lit(1), F.lit(24))).alias("lag_h"),
    ).select("xt", "lag_h", (F.col("hi") + F.col("lag_h")).alias("hj"))
    pairs = left.join(
        ser.select(F.col("hi").alias("hj"), F.col("x").alias("xl")), "hj"
    )
    mo = pairs.groupBy("lag_h").agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("xt").cast("double").alias("a"),
        F.sum("xl").cast("double").alias("b"),
        F.sum(F.col("xt") * F.col("xl")).cast("double").alias("p"),
    )
    return (
        mo.crossJoin(F.broadcast(g))
        # same degenerate-cell guard text as the oracle: a constant
        # series (zero variance) or a single pair would divide by zero
        # — Spark's non-ANSI divide yields NULL while DuckDB yields
        # inf/NaN, so both engines must exclude those rows identically.
        .filter(F.expr("q - s / n * s > 0.0 AND m > 1.0"))
        .select(
            F.col("lag_h").cast("bigint").alias("lag_h"),
            F.col("m").cast("bigint").alias("n_pairs"),
            F.expr(_ACF_FORMULA).alias("acf"),
        )
        .orderBy("lag_h")
    )


# Log-rank per-step terms over exact integer grid counts (d, d1, n, n1)
# pre-cast to DOUBLE: expected arm-1 deaths and hypergeometric
# variance, each 6 dp-rounded then decimal-summed; one text, both
# engines. Steps with n <= 1 contribute nothing (guard in the WHERE).
_LOGRANK_E1 = "round(n1 / n * d, 6)"
_LOGRANK_V = (
    "round(d * (n1 / n) * (1.0 - n1 / n) * ((n - d) / (n - 1.0)), 6)"
)
_LOGRANK_OUT = {
    "chi2": "round((o1 - e1) * (o1 - e1) / v, 6)",
    "z": "round((o1 - e1) / sqrt(v), 6)",
}


def _o_logrank() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    arm = f"CASE WHEN {o_hash_bucket('user_id', 'lr')} < 128 THEN 1 ELSE 0 END"
    outs = ", ".join(f"{e} AS {a}" for a, e in _LOGRANK_OUT.items())
    return f"""
    WITH p AS (
      SELECT user_id, {arm} AS arm, CAST(ts AS DATE) AS d,
             LEAD(CAST(ts AS DATE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events WHERE event_type = 'purchase'),
    ob AS (SELECT MAX(d) AS obs_end FROM p),
    dur AS (
      SELECT arm,
             CASE WHEN nxt IS NULL THEN date_diff('day', d, obs_end)
                  ELSE date_diff('day', d, nxt) END AS t_days,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS died
      FROM p CROSS JOIN ob),
    grid AS (
      SELECT CAST(t_days AS BIGINT) AS t_days,
             CAST(SUM(died) AS BIGINT) AS d,
             CAST(SUM(arm * died) AS BIGINT) AS d1,
             CAST(COUNT(*) AS BIGINT) AS all_t,
             CAST(SUM(arm) AS BIGINT) AS all1_t
      FROM dur GROUP BY 1),
    risk AS (
      SELECT t_days, d, d1,
             CAST(SUM(all_t) OVER (ORDER BY t_days DESC) AS BIGINT) AS n,
             CAST(SUM(all1_t) OVER (ORDER BY t_days DESC) AS BIGINT) AS n1
      FROM grid),
    term AS (
      SELECT CAST(d AS DOUBLE) AS d, CAST(d1 AS DOUBLE) AS d1,
             CAST(n AS DOUBLE) AS n, CAST(n1 AS DOUBLE) AS n1
      FROM risk WHERE n > 1 AND d > 0),
    m AS (
      SELECT
        CAST(SUM(CAST(d1 AS DECIMAL(20,6))) AS DOUBLE) AS o1,
        CAST(SUM(CAST({_LOGRANK_E1} AS DECIMAL(20,6))) AS DOUBLE) AS e1,
        CAST(SUM(CAST({_LOGRANK_V} AS DECIMAL(20,6))) AS DOUBLE) AS v
      FROM term)
    SELECT CAST(o1 AS BIGINT) AS observed_1, round(e1, 6) AS expected_1,
           round(v, 6) AS variance, {outs}
    FROM m WHERE v > 0.0
    """


@register(
    "events_logrank_test",
    _o_logrank(),
    "log-rank test — the hypothesis-test companion of the "
    "Kaplan-Meier estimator: do two hash-assigned user arms have the "
    "same inter-purchase survival curve? Spells and censoring exactly "
    "as events_kaplan_meier; at each duration step the observed arm-1 "
    "deaths are compared to the hypergeometric expectation given the "
    "step's at-risk split, variance-weighted and summed into the "
    "chi-square. All grid counts are exact integers; the per-step "
    "E/V terms are 6 dp-rounded shared text and decimal-summed, "
    "small-step and zero-variance guards identical on both engines. "
    "At 100 TB: one user-keyed window + one duration-grid rollup",
    "analytics extension (log-rank two-sample survival test)",
)
def events_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    ev = load_events(spark, sf_dir)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.when(hash_bucket_expr("user_id", "lr") < 128, 1)
            .otherwise(0)
            .alias("arm"),
            F.to_date("ts").alias("d"),
            F.lead(F.to_date("ts"))
            .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("nxt"),
        )
        .localCheckpoint()
    )
    ob = p.agg(F.max("d").alias("obs_end"))
    dur = p.crossJoin(F.broadcast(ob)).select(
        "arm",
        F.when(
            F.col("nxt").isNull(), F.datediff("obs_end", "d")
        )
        .otherwise(F.datediff("nxt", "d"))
        .cast("bigint")
        .alias("t_days"),
        F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("died"),
    )
    grid = dur.groupBy("t_days").agg(
        F.sum("died").cast("bigint").alias("d"),
        F.sum(F.col("arm") * F.col("died")).cast("bigint").alias("d1"),
        F.count(F.lit(1)).cast("bigint").alias("all_t"),
        F.sum("arm").cast("bigint").alias("all1_t"),
    )
    wdesc = W.orderBy(F.desc("t_days"))
    risk = grid.select(
        "t_days",
        "d",
        "d1",
        F.sum("all_t").over(wdesc).cast("bigint").alias("n"),
        F.sum("all1_t").over(wdesc).cast("bigint").alias("n1"),
    )
    term = risk.filter((F.col("n") > 1) & (F.col("d") > 0)).select(
        F.col("d").cast("double").alias("d"),
        F.col("d1").cast("double").alias("d1"),
        F.col("n").cast("double").alias("n"),
        F.col("n1").cast("double").alias("n1"),
    )
    m = term.agg(
        F.sum(F.col("d1").cast("decimal(20,6)")).cast("double").alias("o1"),
        F.sum(F.expr(_LOGRANK_E1).cast("decimal(20,6)"))
        .cast("double")
        .alias("e1"),
        F.sum(F.expr(_LOGRANK_V).cast("decimal(20,6)"))
        .cast("double")
        .alias("v"),
    )
    return m.filter(F.expr("v > 0.0")).select(
        F.col("o1").cast("bigint").alias("observed_1"),
        F.round("e1", 6).alias("expected_1"),
        F.round("v", 6).alias("variance"),
        *[F.expr(e).alias(a) for a, e in _LOGRANK_OUT.items()],
    )


# Seasonal decomposition shared texts: centered-MA trend (exact
# 25-hour integer sum / 25), detrended value, and the residual after
# subtracting the hour-of-day seasonal mean — each rounded 6 dp.
_DECOMP_TREND = "round(wsum / 25.0, 6)"
_DECOMP_DET = "round(x - trend, 6)"
_DECOMP_SEAS = "round(sdet / nh, 6)"
_DECOMP_RES = "round(abs(round(det - seasonal, 6)), 6)"


@register(
    "events_seasonal_decompose",
    f"""
    WITH hc AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    bounds AS (SELECT MIN(hi) AS mn, MAX(hi) AS mx FROM hc),
    spine AS (SELECT unnest(generate_series(mn, mx)) AS hi FROM bounds),
    ser AS (SELECT s.hi, COALESCE(hc.x, 0) AS x
            FROM spine s LEFT JOIN hc ON s.hi = hc.hi),
    ma AS (
      SELECT hi, x,
             CAST(SUM(x) OVER (ORDER BY hi
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT)
               AS wsum,
             CAST(COUNT(*) OVER (ORDER BY hi
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT)
               AS wn
      FROM ser),
    det AS (
      SELECT hi % 24 AS hod, x, {_DECOMP_TREND} AS trend,
             round(x - {_DECOMP_TREND}, 6) AS det
      FROM ma WHERE wn = 25),
    seas AS (
      SELECT hod,
             CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(CAST(det AS DECIMAL(20,6))) AS DOUBLE) AS sdet
      FROM det GROUP BY 1),
    sj AS (
      SELECT d.hod, d.det, {_DECOMP_SEAS} AS seasonal, s.nh
      FROM det d JOIN seas s ON d.hod = s.hod)
    SELECT CAST(hod AS BIGINT) AS hod, CAST(MAX(nh) AS BIGINT) AS n_obs,
           MAX(seasonal) AS seasonal,
           round(CAST(SUM(CAST({_DECOMP_RES} AS DECIMAL(20,6)))
                      AS DOUBLE) / MAX(nh), 6) AS mean_abs_residual
    FROM sj GROUP BY hod ORDER BY hod
    """,
    "additive seasonal decomposition of the hourly event series "
    "(STL-lite): trend = centered 25-hour moving average (exact "
    "integer window sums, full-coverage rows only so edge semantics "
    "can't drift between engines), hour-of-day seasonal = decimal-"
    "exact mean of the detrended series per hour slot, residual = "
    "what neither explains — surfaced as mean |residual| per slot "
    "next to the seasonal amplitude. Companion diagnostic to the ACF "
    "and the seasonal outlier detector. At 100 TB the corpus pays "
    "one hourly rollup; every window runs on the hours-domain spine",
    "analytics extension (seasonal-trend decomposition)",
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hc = ev.groupBy(
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) DIV 3600 AS BIGINT)"
        ).alias("hi")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    bounds = hc.agg(F.min("hi").alias("mn"), F.max("hi").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hi"))
    ser = spine.join(hc, "hi", "left").select(
        "hi", F.coalesce("x", F.lit(0)).alias("x")
    )
    wma = W.orderBy("hi").rowsBetween(-12, 12)
    ma = ser.select(
        "hi",
        "x",
        F.sum("x").over(wma).cast("bigint").alias("wsum"),
        F.count(F.lit(1)).over(wma).cast("bigint").alias("wn"),
    )
    det = (
        ma.filter(F.col("wn") == 25)
        .select(
            (F.col("hi") % 24).alias("hod"),
            "x",
            F.expr(_DECOMP_TREND).alias("trend"),
            F.expr(f"round(x - {_DECOMP_TREND}, 6)").alias("det"),
        )
        .localCheckpoint()
    )
    seas = det.groupBy("hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum(F.col("det").cast("decimal(20,6)"))
        .cast("double")
        .alias("sdet"),
    )
    sj = det.join(seas, "hod").select(
        "hod", "det", F.expr(_DECOMP_SEAS).alias("seasonal"), "nh"
    )
    return (
        sj.groupBy(F.col("hod").cast("bigint").alias("hod"))
        .agg(
            F.max("nh").cast("bigint").alias("n_obs"),
            F.max("seasonal").alias("seasonal"),
            F.expr(
                f"round(CAST(SUM(CAST({_DECOMP_RES} AS DECIMAL(20,6))) "
                "AS DOUBLE) / MAX(nh), 6)"
            ).alias("mean_abs_residual"),
        )
        .orderBy("hod")
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend over the daily purchase-count series.
#
# The estimator is the median of all pairwise slopes — quadratic in the
# SERIES length, never in the corpus: events collapse to the bounded
# day grid first (one shuffle), the ~n_days^2/2 pair frame is built by
# exploding each day's index into its later partners and EQUI-joining
# back on the index (the 1D-binned non-equi pattern — no cross join),
# and the two medians (slope, then intercept residual) are exact
# interpolated two-pass selections on the bounded pair frame.
# ---------------------------------------------------------------------------

# slope of one pair: one IEEE divide of exact integer deltas —
# identical both engines without rounding.
_TS_SLOPE = "CAST(cj - ci AS DOUBLE) / CAST(dj - di AS DOUBLE)"
# residual intercept at the median slope: slope*d rounded 6 dp (the
# FMA-contraction guard), then one subtract.
_TS_RESID = "CAST(c AS DOUBLE) - round(ts_slope * CAST(d AS DOUBLE), 6)"


def _median_1row(df, val_col: str, out: str):
    """Exact interpolated GLOBAL median of ``val_col`` -> 1-row frame
    (the per-group two-pass idiom of :func:`_group_median` with a
    constant group). Matches DuckDB quantile_cont(x, 0.5) bit for bit
    on these one-divide doubles; 6 dp round on the interpolation."""
    grp = W.partitionBy(F.lit(1))
    ranked = df.select(
        F.col(val_col).alias("__v"),
        (F.row_number().over(grp.orderBy(val_col)) - 1).alias("__idx"),
        F.count(F.lit(1)).over(grp).alias("__n"),
    )
    pos = (F.col("__n") - 1).cast("double") * F.lit(0.5)
    lo, hi = F.floor(pos), F.ceil(pos)
    idx = F.col("__idx")
    agg = ranked.filter((idx == lo) | (idx == hi)).agg(
        F.max("__n").alias("__n"),
        F.max(F.when(idx == lo, F.col("__v"))).alias("__vlo"),
        F.max(F.when(idx == hi, F.col("__v"))).alias("__vhi"),
    )
    p = (F.col("__n") - 1).cast("double") * F.lit(0.5)
    frac = p - F.floor(p).cast("double")
    med = F.round(
        F.col("__vlo") + frac * (F.col("__vhi") - F.col("__vlo")), 6
    )
    return agg.select(med.alias(out))


@register(
    "events_theilsen_trend",
    f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    idx AS (
      SELECT d, c,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i
      FROM daily),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx),
    pairs AS (
      SELECT a.d AS di, a.c AS ci, b.d AS dj, b.c AS cj
      FROM (SELECT i, d, c, unnest(generate_series(i + 1, n)) AS j
            FROM idx CROSS JOIN nn) a
      JOIN idx b ON a.j = b.i),
    sl AS (SELECT {_TS_SLOPE} AS slope FROM pairs),
    med AS (SELECT ROUND(quantile_cont(slope, 0.5), 6) AS ts_slope FROM sl),
    resid AS (
      SELECT {_TS_RESID} AS r
      FROM idx CROSS JOIN med),
    medr AS (
      SELECT ROUND(quantile_cont(r, 0.5), 6) AS ts_intercept FROM resid)
    SELECT nn.n AS n_days,
           CAST(nn.n * (nn.n - 1) / 2 AS BIGINT) AS n_pairs,
           med.ts_slope, medr.ts_intercept
    FROM nn CROSS JOIN med CROSS JOIN medr
    """,
    "Theil-Sen robust trend of the daily purchase-count series: the "
    "median of all pairwise slopes (and the median residual "
    "intercept) — up to ~29% outlier days cannot move it, unlike the "
    "OLS slope. Scale shape: the corpus collapses to the bounded day "
    "grid first; the quadratic pair space lives on that grid only "
    "and is built by exploding each day index into its later "
    "partners and EQUI-joining back (never a cross join); both "
    "medians are exact interpolated two-pass selections. Slopes are "
    "one IEEE divide of exact integer deltas — identical doubles "
    "cross-engine",
    "analytics extension (Theil-Sen robust trend estimator)",
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    idx = daily.select(
        "d",
        "c",
        F.row_number().over(W.orderBy("d")).cast("bigint").alias("i"),
    ).localCheckpoint()  # feeds the pair explode, the join back, residuals
    nn = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    left = (
        idx.crossJoin(F.broadcast(nn))
        .select(
            F.col("i"),
            F.col("d").alias("di"),
            F.col("c").alias("ci"),
            F.explode(F.sequence(F.col("i") + 1, F.col("n"))).alias("j"),
        )
        # Spark's sequence(a, b) DESCENDS when a > b (DuckDB's
        # generate_series is empty) — the last index would otherwise
        # pair with itself and divide by a zero day delta.
        .filter(F.col("j") > F.col("i"))
        .drop("i")
    )
    pairs = left.join(
        idx.select(
            F.col("i").alias("j"),
            F.col("d").alias("dj"),
            F.col("c").alias("cj"),
        ),
        "j",
    )
    sl = pairs.select(F.expr(_TS_SLOPE).alias("slope"))
    med = _median_1row(sl, "slope", "ts_slope")
    resid = idx.crossJoin(F.broadcast(med)).select(
        F.expr(_TS_RESID).alias("r")
    )
    medr = _median_1row(resid, "r", "ts_intercept")
    return (
        nn.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(medr))
        .select(
            F.col("n").alias("n_days"),
            (F.col("n") * (F.col("n") - 1) / F.lit(2))
            .cast("bigint")
            .alias("n_pairs"),
            "ts_slope",
            "ts_intercept",
        )
    )


@register(
    "events_sequence_pattern",
    """
    WITH j AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS s
      FROM events GROUP BY user_id),
    per_user AS (
      SELECT CAST((length(s) - length(replace(s, 'vcp', ''))) / 3
               AS BIGINT) AS strict_conversions,
             CASE WHEN regexp_matches(s, 'v.*c.*p') THEN 1 ELSE 0 END
               AS has_funnel_subseq,
             CAST(length(s) AS BIGINT) AS n_events
      FROM j)
    SELECT strict_conversions, has_funnel_subseq,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM per_user
    GROUP BY 1, 2
    ORDER BY strict_conversions, has_funnel_subseq
    """,
    "sequence-pattern matching over per-user journeys "
    "(MATCH_RECOGNIZE-lite): each user's ordered event stream "
    "collapses to a character string (one letter per event type — "
    "the five types have distinct initials), contiguous "
    "view->click->purchase runs are counted via non-overlapping "
    "substring elimination, and the gapped funnel subsequence is one "
    "regex — the pattern vocabulary SQL windows cannot express "
    "directly. Journey distribution (users/events per pattern "
    "count) is the result. At 100 TB: one user-keyed shuffle; "
    "per-user state is the journey string (the sessionize-state "
    "shape — bound it per (user, day) when journeys are unbounded)",
    "analytics extension (sequence/path pattern matching)",
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    j = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("ch"),
                        )
                    )
                ),
                lambda s: s["ch"],
            ),
        ).alias("s")
    )
    per_user = j.select(
        (
            (F.length("s") - F.length(F.replace(F.col("s"), F.lit("vcp"))))
            / F.lit(3)
        )
        .cast("bigint")
        .alias("strict_conversions"),
        F.when(F.col("s").rlike("v.*c.*p"), 1)
        .otherwise(0)
        .alias("has_funnel_subseq"),
        F.length("s").cast("bigint").alias("n_events"),
    )
    return (
        per_user.groupBy("strict_conversions", "has_funnel_subseq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("total_events"),
        )
        .orderBy("strict_conversions", "has_funnel_subseq")
    )


_WF_WINDOW_MS = 3600000  # 1 h per funnel hop
_WF_RATE = "round(CAST(nconv AS DOUBLE) / CAST(np AS DOUBLE), 6)"


@register(
    "events_windowed_funnel",
    f"""
    WITH s AS (
      SELECT user_id, event_type, event_id,
             CAST(epoch_ms(ts) AS BIGINT) AS tms
      FROM events),
    lv AS (
      SELECT user_id, event_type, event_id, tms,
             MAX(CASE WHEN event_type = 'view' THEN tms END) OVER (
               PARTITION BY user_id ORDER BY tms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastv
      FROM s),
    cl AS (
      SELECT user_id, event_type, event_id, tms,
             CASE WHEN event_type = 'click' THEN tms END AS ctms_set,
             CASE WHEN event_type = 'click' THEN lastv END AS cvtms_set
      FROM lv),
    carried AS (
      SELECT user_id, event_type, tms,
             LAST_VALUE(ctms_set IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ctms,
             LAST_VALUE(cvtms_set IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cvtms
      FROM cl),
    p AS (
      SELECT tms, ctms, cvtms,
             CASE WHEN ctms IS NOT NULL AND cvtms IS NOT NULL
                   AND tms - ctms <= {_WF_WINDOW_MS}
                   AND ctms - cvtms <= {_WF_WINDOW_MS}
                  THEN tms - cvtms END AS tt
      FROM carried WHERE event_type = 'purchase'),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(COUNT(tt) AS BIGINT) AS nconv
      FROM p),
    med AS (
      SELECT ROUND(quantile_cont(tt, 0.5), 6) AS median_tt_ms
      FROM p WHERE tt IS NOT NULL)
    SELECT np AS n_purchases, nconv AS n_conversions,
           {_WF_RATE} AS conversion_rate, med.median_tt_ms
    FROM m CROSS JOIN med WHERE np > 0
    """,
    "time-bounded funnel (MATCH_RECOGNIZE with a WITHIN clause): a "
    "purchase converts only if the most recent click is <= 1 h before "
    "it AND that click's most recent prior view is <= 1 h before the "
    "click — the real product-funnel semantics the unbounded "
    "conditional-min funnel can't express. One user-keyed shuffle: "
    "the view timestamp carries onto click rows (strict-frame MAX), "
    "the (click, its-view) pair carries forward to purchases via two "
    "IGNORE-NULLS last-value windows over the SAME partition (both "
    "set only on click rows, so they stay paired), and the "
    "view->purchase latency median is the exact interpolated "
    "two-pass. At 100 TB everything after the one shuffle is "
    "window-pipelined; no self-joins",
    "analytics extension (windowed funnel / conversion latency)",
)
def events_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    s = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_millis("ts").alias("tms"),
    )
    wseq = W.partitionBy("user_id").orderBy("tms", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    lv = s.select(
        "user_id",
        "event_type",
        "event_id",
        "tms",
        F.max(
            F.when(F.col("event_type") == "view", F.col("tms"))
        ).over(wseq).alias("lastv"),
    )
    cl = lv.select(
        "user_id",
        "event_type",
        "event_id",
        "tms",
        F.when(F.col("event_type") == "click", F.col("tms")).alias(
            "ctms_set"
        ),
        F.when(F.col("event_type") == "click", F.col("lastv")).alias(
            "cvtms_set"
        ),
    )
    carried = cl.select(
        "event_type",
        "tms",
        F.last("ctms_set", ignorenulls=True).over(wseq).alias("ctms"),
        F.last("cvtms_set", ignorenulls=True).over(wseq).alias("cvtms"),
    )
    p = carried.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("ctms").isNotNull()
            & F.col("cvtms").isNotNull()
            & (F.col("tms") - F.col("ctms") <= _WF_WINDOW_MS)
            & (F.col("ctms") - F.col("cvtms") <= _WF_WINDOW_MS),
            F.col("tms") - F.col("cvtms"),
        ).alias("tt")
    ).localCheckpoint()  # feeds counts AND the median pass
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.count("tt").cast("bigint").alias("nconv"),
    )
    med = _median_1row(
        p.filter(F.col("tt").isNotNull()), "tt", "median_tt_ms"
    )
    return (
        m.crossJoin(F.broadcast(med))
        .filter(F.col("np") > 0)
        .select(
            F.col("np").alias("n_purchases"),
            F.col("nconv").alias("n_conversions"),
            F.expr(_WF_RATE).alias("conversion_rate"),
            "median_tt_ms",
        )
    )


# Shapley weights for n=3 players by coalition size |S| (S excludes the
# player): |S|!(n-|S|-1)!/n! = 1/3, 1/6, 1/3. v(S) = conversion rate of
# users exposed to EXACTLY the coalition S; unobserved coalitions
# contribute v = 0 on both engines (COALESCE on the same text).
# CAST the numerator: Spark parses bare decimal literals as DECIMAL
# (1.0/3.0 -> decimal(8,6) 0.333333) while DuckDB parses them as
# DOUBLE — the cast makes both engines run one double divide.
_SHAP_W = {
    0: "CAST(1 AS DOUBLE) / 3.0",
    1: "CAST(1 AS DOUBLE) / 6.0",
    2: "CAST(1 AS DOUBLE) / 3.0",
}
_SHAP_V = "round(CAST(conv AS DOUBLE) / CAST(total AS DOUBLE), 6)"


@register(
    "events_shapley_attribution",
    f"""
    WITH s0 AS (
      SELECT user_id, event_type, CAST(epoch_ms(ts) AS BIGINT) AS tms,
             CAST(MIN(epoch_ms(ts)) OVER (PARTITION BY user_id)
               AS BIGINT) AS t0
      FROM events),
    u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view'
                       AND tms <= t0 + 86400000 THEN 4 ELSE 0 END)
             + MAX(CASE WHEN event_type = 'click'
                         AND tms <= t0 + 86400000 THEN 2 ELSE 0 END)
             + MAX(CASE WHEN event_type = 'signup'
                         AND tms <= t0 + 86400000 THEN 1 ELSE 0 END)
               AS subset,
             MAX(CASE WHEN event_type = 'purchase'
                       AND tms > t0 + 86400000
                       AND tms <= t0 + 172800000 THEN 1 ELSE 0 END)
               AS converted
      FROM s0 GROUP BY user_id),
    vs AS (
      SELECT subset, CAST(COUNT(*) AS BIGINT) AS total,
             CAST(SUM(converted) AS BIGINT) AS conv,
             {_SHAP_V} AS v
      FROM u GROUP BY subset),
    ch AS (SELECT * FROM (VALUES ('view', 4), ('click', 2),
                                 ('signup', 1)) AS t(channel, bit)),
    sub AS (SELECT unnest(generate_series(0, 7)) AS s),
    pairs AS (
      SELECT ch.channel, sub.s AS s_without,
             sub.s + ch.bit AS s_with,
             CASE WHEN sub.s = 0 THEN 0
                  WHEN sub.s IN (1, 2, 4) THEN 1 ELSE 2 END AS ssize
      FROM ch CROSS JOIN sub
      WHERE (CASE WHEN ch.bit = 4 THEN sub.s // 4
                  WHEN ch.bit = 2 THEN (sub.s // 2) % 2
                  ELSE sub.s % 2 END) = 0),
    terms AS (
      SELECT p.channel,
             round((CASE p.ssize
                      WHEN 0 THEN {_SHAP_W[0]}
                      WHEN 1 THEN {_SHAP_W[1]}
                      ELSE {_SHAP_W[2]} END)
                   * (COALESCE(vw.v, 0.0) - COALESCE(vo.v, 0.0)), 9)
               AS term
      FROM pairs p
      LEFT JOIN vs vw ON vw.subset = p.s_with
      LEFT JOIN vs vo ON vo.subset = p.s_without)
    SELECT channel,
           CAST(SUM(CAST(term AS DECIMAL(20,9))) AS DOUBLE)
             AS shapley_value
    FROM terms GROUP BY channel ORDER BY channel
    """,
    "Shapley-value marketing attribution (the game-theoretic credit "
    "assignment; Shapley 1953): each user collapses to an exposure "
    "coalition (channels seen in their first 24 h) + a converted flag "
    "(purchase in the following 24 h — windowed so rates genuinely "
    "vary across coalitions), v(S) = exact conversion rate per coalition, and each "
    "channel's Shapley value sums the coalition-size-weighted "
    "marginal lifts v(S+i) - v(S) over the 2^3 subset lattice — "
    "exactly fair credit, unlike the positional heuristics "
    "(last-touch/U-shape/time-decay) it complements. At 100 TB the "
    "corpus pays ONE user-keyed rollup; the lattice math runs on an "
    "8-row frame (and stays tractable for any bounded channel set). "
    "Per-term 9 dp rounds + exact decimal sum keep both engines "
    "bit-equal",
    "analytics extension (Shapley-value attribution)",
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    s0 = ev.select(
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("tms"),
        F.min(F.unix_millis("ts"))
        .over(W.partitionBy("user_id"))
        .cast("bigint")
        .alias("t0"),
    )
    day1 = F.col("tms") <= F.col("t0") + 86400000
    u = s0.groupBy("user_id").agg(
        (
            F.max(
                F.when((F.col("event_type") == "view") & day1, 4).otherwise(0)
            )
            + F.max(
                F.when(
                    (F.col("event_type") == "click") & day1, 2
                ).otherwise(0)
            )
            + F.max(
                F.when(
                    (F.col("event_type") == "signup") & day1, 1
                ).otherwise(0)
            )
        ).alias("subset"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("tms") > F.col("t0") + 86400000)
                & (F.col("tms") <= F.col("t0") + 172800000),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    vs = (
        u.groupBy("subset")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total"),
            F.sum("converted").cast("bigint").alias("conv"),
        )
        .select("subset", F.expr(_SHAP_V).alias("v"))
        .localCheckpoint()  # joined twice (with / without coalitions)
    )
    spark_ch = ev.sparkSession.createDataFrame(
        [("view", 4), ("click", 2), ("signup", 1)], "channel string, bit int"
    )
    sub = spark_ch.sparkSession.range(8).select(
        F.col("id").cast("int").alias("s")
    )
    pairs = (
        spark_ch.crossJoin(F.broadcast(sub))
        .filter(
            F.expr(
                "(CASE WHEN bit = 4 THEN s div 4 "
                "WHEN bit = 2 THEN (s div 2) % 2 "
                "ELSE s % 2 END) = 0"
            )
        )
        .select(
            "channel",
            F.col("s").alias("s_without"),
            (F.col("s") + F.col("bit")).alias("s_with"),
            F.expr(
                "CASE WHEN s = 0 THEN 0 "
                "WHEN s IN (1, 2, 4) THEN 1 ELSE 2 END"
            ).alias("ssize"),
        )
    )
    terms = (
        pairs.join(
            vs.select(F.col("subset").alias("s_with"), F.col("v").alias("vw")),
            "s_with",
            "left",
        )
        .join(
            vs.select(
                F.col("subset").alias("s_without"), F.col("v").alias("vo")
            ),
            "s_without",
            "left",
        )
        .select(
            "channel",
            F.round(
                F.expr(
                    f"(CASE ssize WHEN 0 THEN {_SHAP_W[0]} "
                    f"WHEN 1 THEN {_SHAP_W[1]} "
                    f"ELSE {_SHAP_W[2]} END)"
                )
                * (
                    F.coalesce(F.col("vw"), F.lit(0.0))
                    - F.coalesce(F.col("vo"), F.lit(0.0))
                ),
                9,
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(
            F.sum(F.col("term").cast("decimal(20,9)"))
            .cast("double")
            .alias("shapley_value")
        )
        .orderBy("channel")
    )


# linear interpolation between the bracketing observations — one
# shared text; inputs are 6 dp-rounded observed means and exact
# integer hour indices, the blend is rounded 6 dp (FMA guard).
_GF_INTERP = (
    "round(pv + (nv - pv) * CAST(hi - ph AS DOUBLE) "
    "/ CAST(nh - ph AS DOUBLE), 6)"
)


@register(
    "events_gapfill_interpolate",
    f"""
    WITH hc AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS v
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1),
    bounds AS (SELECT MIN(hi) AS mn, MAX(hi) AS mx FROM hc),
    spine AS (SELECT unnest(generate_series(mn, mx)) AS hi FROM bounds),
    j AS (SELECT s.hi, hc.v FROM spine s LEFT JOIN hc ON s.hi = hc.hi),
    c AS (
      SELECT hi, v,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
               OVER (ORDER BY hi
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS)
               OVER (ORDER BY hi
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ph,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
               OVER (ORDER BY hi
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS)
               OVER (ORDER BY hi
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nh
      FROM j)
    SELECT hi,
           CASE WHEN v IS NOT NULL THEN v
                ELSE {_GF_INTERP} END AS value,
           CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS filled
    FROM c
    WHERE v IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
    ORDER BY hi
    """,
    "time-series gap filling by linear interpolation: the hourly "
    "mean-purchase-value series densifies onto a generated spine and "
    "every missing hour interpolates between its bracketing "
    "observations (carry-forward and carry-backward IGNORE-NULLS "
    "windows find the brackets — no self-join, no per-gap loop). "
    "Observed means are 6 dp rounds of exact decimal sums; the blend "
    "is one shared formula text, so filled values are bit-equal "
    "cross-engine. Hours outside the observed range stay unfilled "
    "(identical WHERE both sides). At 100 TB the corpus pays one "
    "hourly rollup; the spine windows range-partition by time",
    "analytics extension (time-series gap fill / interpolation)",
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    hc = ev.groupBy(
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) DIV 3600 AS BIGINT)"
        ).alias("hi")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("v")
    )
    bounds = hc.agg(F.min("hi").alias("mn"), F.max("hi").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hi"))
    j = spine.join(hc, "hi", "left")
    wb = W.orderBy("hi").rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = W.orderBy("hi").rowsBetween(W.currentRow, W.unboundedFollowing)
    c = j.select(
        "hi",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(
            F.when(F.col("v").isNotNull(), F.col("hi")), ignorenulls=True
        ).over(wb).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(
            F.when(F.col("v").isNotNull(), F.col("hi")), ignorenulls=True
        ).over(wf).alias("nh"),
    )
    return (
        c.filter(
            F.col("v").isNotNull()
            | (F.col("pv").isNotNull() & F.col("nv").isNotNull())
        )
        .select(
            "hi",
            F.when(F.col("v").isNotNull(), F.col("v"))
            .otherwise(F.expr(_GF_INTERP))
            .alias("value"),
            F.when(F.col("v").isNotNull(), 0).otherwise(1).alias("filled"),
        )
        .orderBy("hi")
    )


@register(
    "events_longest_streak",
    """
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS d
      FROM events WHERE event_type = 'purchase'),
    g AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY d) AS BIGINT) AS grp
      FROM d),
    runs AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak,
             CAST(MIN(d) AS BIGINT) AS start_day
      FROM g GROUP BY user_id, grp),
    best AS (
      SELECT user_id, streak, start_day,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY streak DESC, start_day) AS BIGINT) AS rk
      FROM runs)
    SELECT user_id, streak, start_day
    FROM best WHERE rk = 1
    ORDER BY streak DESC, user_id LIMIT 20
    """,
    "longest consecutive-day purchase streak per user (gaps-and-"
    "islands max run — the engagement-streak metric): distinct "
    "purchase days collapse first, the day-minus-row_number island "
    "key groups consecutive runs, per-user best streak by a window, "
    "top-20 with deterministic tie-breaks. All integers. At 100 TB: "
    "one user-keyed shuffle; runs live on the distinct-day frame",
    "analytics extension (gaps-and-islands longest streak)",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    d = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    ).distinct()
    g = d.select(
        "user_id",
        "d",
        (
            F.col("d")
            - F.row_number()
            .over(W.partitionBy("user_id").orderBy("d"))
            .cast("bigint")
        ).alias("grp"),
    )
    runs = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak"),
        F.min("d").cast("bigint").alias("start_day"),
    )
    best = runs.select(
        "user_id",
        "streak",
        "start_day",
        F.row_number()
        .over(
            W.partitionBy("user_id").orderBy(F.desc("streak"), "start_day")
        )
        .cast("bigint")
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    return (
        best.select("user_id", "streak", "start_day")
        .orderBy(F.desc("streak"), "user_id")
        .limit(20)
    )


# split-conformal pieces: per-cell prediction (6 dp mean over fit
# days), calibration residual, and the rank-selected band.
_CF_PRED = "round(CAST(sxf AS DOUBLE) / CAST(ndf AS DOUBLE), 6)"
_CF_COV = "round(CAST(ncov AS DOUBLE) / 24.0, 6)"
_CF_ALPHA_RANK = 20  # ceil(0.8 * (24 + 1)) for alpha = 0.2


@register(
    "events_forecast_conformal",
    f"""
    WITH hourly AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(extract(hour FROM ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2, 3),
    sc AS (
      SELECT MAX(d) AS maxd,
             MAX(CASE WHEN d < (SELECT MAX(d) FROM hourly) THEN d END)
               AS cald,
             CAST(COUNT(DISTINCT d) - 2 AS BIGINT) AS ndf
      FROM hourly),
    cond AS (
      SELECT event_type, hod,
             CAST(SUM(CASE WHEN d < cald THEN cnt ELSE 0 END) AS BIGINT)
               AS sxf,
             CAST(SUM(CASE WHEN d = cald THEN cnt ELSE 0 END) AS BIGINT)
               AS acal,
             CAST(SUM(CASE WHEN d = maxd THEN cnt ELSE 0 END) AS BIGINT)
               AS atest
      FROM hourly CROSS JOIN sc GROUP BY 1, 2),
    cells AS (
      SELECT t.event_type, h.hod
      FROM (SELECT DISTINCT event_type FROM cond) t,
           (SELECT unnest(generate_series(0, 23)) AS hod) h),
    cell AS (
      SELECT c.event_type, c.hod,
             COALESCE(cond.sxf, 0) AS sxf,
             COALESCE(cond.acal, 0) AS acal,
             COALESCE(cond.atest, 0) AS atest,
             sc.ndf
      FROM cells c LEFT JOIN cond
        ON c.event_type = cond.event_type AND c.hod = cond.hod
      CROSS JOIN sc),
    resid AS (
      SELECT event_type, hod, atest,
             {_CF_PRED} AS pred,
             abs(CAST(acal AS DOUBLE) - {_CF_PRED}) AS r
      FROM cell),
    band AS (
      SELECT event_type,
             MAX(CASE WHEN rn = {_CF_ALPHA_RANK} THEN r END) AS q_band
      FROM (SELECT event_type, r,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY event_type ORDER BY r, hod)
                     AS BIGINT) AS rn
            FROM resid) t
      GROUP BY event_type),
    cov AS (
      SELECT r.event_type, b.q_band,
             CAST(SUM(CASE WHEN abs(CAST(r.atest AS DOUBLE) - r.pred)
                             <= b.q_band THEN 1 ELSE 0 END) AS BIGINT)
               AS ncov
      FROM resid r JOIN band b ON r.event_type = b.event_type
      GROUP BY r.event_type, b.q_band)
    SELECT event_type, q_band, ncov AS n_covered, {_CF_COV} AS coverage
    FROM cov ORDER BY event_type
    """,
    "split-conformal forecast intervals: the seasonal-naive per-"
    "(type, hour) prediction is fit on all days before a held-out "
    "calibration day, the conformal band is the rank-80% absolute "
    "calibration residual (exact integer rank selection — no "
    "interpolation), and empirical coverage is measured on the final "
    "test day. Distribution-free uncertainty for any point forecast "
    "— the band construction drops onto other predictors unchanged. "
    "At 100 TB: one hourly rollup; calibration/rank/coverage all on "
    "the bounded (type x 24) grid with a dense zero-filled spine",
    "analytics extension (conformal prediction intervals)",
)
def events_forecast_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt")).localCheckpoint()
    # scalars in one small frame: maxd (test day), cald (2nd-max day,
    # the calibration split), ndf (fit-day count)
    days = hourly.select("d").distinct()
    sc = (
        days.select(
            "d",
            F.row_number().over(W.orderBy(F.desc("d"))).alias("rk"),
            F.count(F.lit(1))
            .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .alias("ndays"),
        )
        .filter(F.col("rk") <= 2)
        .groupBy()
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("d"))).alias("maxd"),
            F.max(F.when(F.col("rk") == 2, F.col("d"))).alias("cald"),
            (F.max("ndays") - F.lit(2)).cast("bigint").alias("ndf"),
        )
    )
    cond = (
        hourly.crossJoin(F.broadcast(sc))
        .groupBy("event_type", "hod")
        .agg(
            F.sum(F.expr("CASE WHEN d < cald THEN cnt ELSE 0 END"))
            .cast("bigint")
            .alias("sxf"),
            F.sum(F.expr("CASE WHEN d = cald THEN cnt ELSE 0 END"))
            .cast("bigint")
            .alias("acal"),
            F.sum(F.expr("CASE WHEN d = maxd THEN cnt ELSE 0 END"))
            .cast("bigint")
            .alias("atest"),
        )
    )
    cells = (
        cond.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hod0"),
        )
        .select("event_type", F.col("hod0").cast("bigint").alias("hod"))
    )
    cell = (
        cells.join(F.broadcast(cond), ["event_type", "hod"], "left")
        .crossJoin(F.broadcast(sc))
        .select(
            "event_type",
            "hod",
            F.coalesce("sxf", F.lit(0)).alias("sxf"),
            F.coalesce("acal", F.lit(0)).alias("acal"),
            F.coalesce("atest", F.lit(0)).alias("atest"),
            "ndf",
        )
    )
    resid = cell.select(
        "event_type",
        "hod",
        "atest",
        F.expr(_CF_PRED).alias("pred"),
        F.abs(F.col("acal").cast("double") - F.expr(_CF_PRED)).alias("r"),
    ).localCheckpoint()  # feeds the band rank AND the coverage join
    band = (
        resid.select(
            "event_type",
            "r",
            F.row_number()
            .over(W.partitionBy("event_type").orderBy("r", "hod"))
            .cast("bigint")
            .alias("rn"),
        )
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("rn") == _CF_ALPHA_RANK, F.col("r"))
            ).alias("q_band")
        )
    )
    cov = (
        resid.join(band, "event_type")
        .groupBy("event_type", "q_band")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("atest").cast("double") - F.col("pred"))
                    <= F.col("q_band"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("ncov")
        )
    )
    return cov.select(
        "event_type",
        "q_band",
        F.col("ncov").alias("n_covered"),
        F.expr(_CF_COV).alias("coverage"),
    ).orderBy("event_type")


_MSS_ITERS = 12
# one power step: pi_next(j) = sum_i pi(i) * p(i -> j); p is a single
# divide of exact counts, per-term product 12 dp-rounded, summed as
# exact decimals — one text, both engines, per iteration.
_MSS_STEP = "round(CAST(pi AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)), 12)"


def _o_markov_steady() -> str:
    ctes = [
        """seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)""",
        """tm AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS BIGINT)
               AS rt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type)""",
        """states AS (SELECT DISTINCT prev_type AS st FROM tm)""",
        """nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM states)""",
        """pi0 AS (SELECT st, round(1.0 / ns, 12) AS pi
      FROM states CROSS JOIN nn)""",
    ]
    for k in range(1, _MSS_ITERS + 1):
        ctes.append(
            f"""pi{k} AS (
      SELECT tm.next_type AS st,
             CAST(SUM(CAST({_MSS_STEP} AS DECIMAL(26,12))) AS DOUBLE)
               AS pi
      FROM tm JOIN pi{k - 1} p ON tm.prev_type = p.st
      CROSS JOIN nn
      GROUP BY tm.next_type)""".replace("pi AS DOUBLE", "p.pi AS DOUBLE")
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT st AS state, ROUND(pi, 9) AS stationary_p
    FROM pi{_MSS_ITERS} ORDER BY st
    """
    )


@register(
    "events_markov_steady_state",
    _o_markov_steady(),
    "stationary distribution of the user-journey Markov chain: 12 "
    "power iterations of pi <- pi P on the 5x5 transition matrix "
    "(row-normalized exact pair counts) — where user attention "
    "settles in the long run, the PageRank of the behavioral graph. "
    "Per-term products are 12 dp-rounded and summed as exact "
    "decimals (one shared text per iteration) so both engines walk "
    "identical float paths. At 100 TB the corpus pays the one lag-"
    "window shuffle that builds the matrix; every iteration runs on "
    "the states-domain frame",
    "analytics extension (Markov stationary distribution)",
)
def events_markov_steady_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    tm = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "prev_type",
            "next_type",
            "n",
            F.sum("n")
            .over(W.partitionBy("prev_type"))
            .cast("bigint")
            .alias("rt"),
        )
        .localCheckpoint()  # consumed by every iteration
    )
    states = tm.select(F.col("prev_type").alias("st")).distinct()
    nn = states.agg(F.count(F.lit(1)).cast("double").alias("ns"))
    pi = states.crossJoin(F.broadcast(nn)).select(
        "st", F.round(F.lit(1.0) / F.col("ns"), 12).alias("pi")
    )
    step = "round(CAST(p_pi AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)), 12)"
    for _ in range(_MSS_ITERS):
        pi = (
            tm.join(
                pi.select(F.col("st").alias("prev_type"), F.col("pi").alias("p_pi")),
                "prev_type",
            )
            .groupBy(F.col("next_type").alias("st"))
            .agg(
                F.sum(F.expr(step).cast("decimal(26,12)"))
                .cast("double")
                .alias("pi")
            )
        )
    return pi.select(
        F.col("st").alias("state"), F.round("pi", 9).alias("stationary_p")
    ).orderBy("state")


_QTE_PS = (("p25", 0.25), ("p50", 0.50), ("p75", 0.75))


def _o_qte() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    arm = f"CASE WHEN {o_hash_bucket('user_id', 'qte')} < 128 THEN 'A' ELSE 'B' END"
    qs = ", ".join(
        f"ROUND(quantile_cont(value, {p}), 6) AS {tag}"
        for tag, p in _QTE_PS
    )
    arms = " UNION ALL ".join(
        f"SELECT '{tag}' AS quantile, a.{tag} AS q_control, "
        f"b.{tag} AS q_treatment, "
        f"round(b.{tag} - a.{tag}, 6) AS qte FROM a, b"
        for tag, _ in _QTE_PS
    )
    return f"""
    WITH assigned AS (
      SELECT {arm} AS arm, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    q AS (SELECT arm, {qs} FROM assigned GROUP BY arm),
    a AS (SELECT * FROM q WHERE arm = 'A'),
    b AS (SELECT * FROM q WHERE arm = 'B')
    SELECT * FROM ({arms}) ORDER BY quantile
    """


@register(
    "events_quantile_treatment_effect",
    _o_qte(),
    "quantile treatment effects (QTE): the p25/p50/p75 purchase-value "
    "difference between hash-assigned arms — WHERE in the outcome "
    "distribution a treatment moves users, which a mean-shift z-test "
    "cannot see (a tail-only effect has zero median shift). All three "
    "quantiles per arm come from the distributed distinct-value "
    "prefix sum (operators/ranks.value_prefix — no per-arm "
    "Sort+Window over the row-scale frame, no per-group value "
    "buffer), interpolated exactly as DuckDB quantile_cont, 6 dp "
    "rounds; the effect is one shared-text subtract. At 100 TB: one "
    "map-side-combined distinct-value shuffle, bounded bin windows, "
    "2-row frames after",
    "analytics extension (quantile treatment effects)",
)
def events_quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    ev = load_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    assigned = ev.select(
        F.when(hash_bucket_expr("user_id", "qte") < 128, "A")
        .otherwise("B")
        .alias("arm"),
        "value",
    )
    # Distributed distinct-value prefix sum (operators/ranks.value_prefix
    # — the agg_equidepth_histogram two-level value-grid scan; purchase
    # values are generator-bounded so /10 grids to ~40 bins): the
    # 0-indexed boundary value is the unique distinct-value row with
    # cb <= idx < cb + c — no per-arm Sort+Window over the row-scale
    # frame (the old plan serialized each arm through one ranked sort).
    from hangarbay_spark.operators.ranks import hit_idx, value_prefix

    ranked = value_prefix(assigned, ["arm"], "value", 10.0)
    sel = F.lit(False)
    aggs = [F.max("__n").alias("__n")]
    for tag, p in _QTE_PS:
        pos = (F.col("__n") - 1).cast("double") * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        sel = sel | hit_idx(lo) | hit_idx(hi)
        aggs.append(
            F.max(F.when(hit_idx(lo), F.col("__v"))).alias(f"__l{tag}")
        )
        aggs.append(
            F.max(F.when(hit_idx(hi), F.col("__v"))).alias(f"__h{tag}")
        )
    agg = ranked.filter(sel).groupBy("arm").agg(*aggs)
    outs = ["arm"]
    for tag, p in _QTE_PS:
        pp = (F.col("__n") - 1).cast("double") * F.lit(p)
        frac = pp - F.floor(pp).cast("double")
        outs.append(
            F.round(
                F.col(f"__l{tag}")
                + frac * (F.col(f"__h{tag}") - F.col(f"__l{tag}")),
                6,
            ).alias(tag)
        )
    q = agg.select(*outs).localCheckpoint()  # both arms consumed per row
    a = q.filter(F.col("arm") == "A")
    b = q.filter(F.col("arm") == "B")
    rows = None
    for tag, _ in _QTE_PS:
        r = (
            a.select(F.col(tag).alias("q_control"))
            .crossJoin(F.broadcast(b.select(F.col(tag).alias("q_treatment"))))
            .select(
                F.lit(tag).alias("quantile"),
                "q_control",
                "q_treatment",
                F.expr("round(q_treatment - q_control, 6)").alias("qte"),
            )
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("quantile")


_LIFT_RATE = "round(CAST(convs AS DOUBLE) / CAST(users AS DOUBLE), 6)"
_LIFT_LIFT = (
    "round((CAST(convs AS DOUBLE) / CAST(users AS DOUBLE)) "
    "/ (CAST(tconvs AS DOUBLE) / CAST(tusers AS DOUBLE)), 6)"
)
_LIFT_CAPTURE = "round(CAST(cconvs AS DOUBLE) / CAST(tconvs AS DOUBLE), 6)"


@register(
    "events_model_lift_table",
    f"""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS score,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id),
    g AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(conv) AS BIGINT) AS cv
      FROM u GROUP BY score),
    r AS (
      SELECT score, cnt, cv,
             CAST(COALESCE(SUM(cnt) OVER (
               ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS before,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tusers,
             CAST(SUM(cv) OVER () AS BIGINT) AS tconvs
      FROM g),
    d AS (
      SELECT CAST(before * 10 // tusers AS BIGINT) AS decile,
             cnt, cv, tusers, tconvs
      FROM r),
    agg AS (
      SELECT decile,
             CAST(SUM(cnt) AS BIGINT) AS users,
             CAST(SUM(cv) AS BIGINT) AS convs,
             CAST(MAX(tusers) AS BIGINT) AS tusers,
             CAST(MAX(tconvs) AS BIGINT) AS tconvs
      FROM d GROUP BY decile),
    cum AS (
      SELECT decile, users, convs, tusers, tconvs,
             CAST(SUM(convs) OVER (ORDER BY decile) AS BIGINT) AS cconvs
      FROM agg)
    SELECT decile, users, convs,
           {_LIFT_RATE} AS conv_rate,
           {_LIFT_LIFT} AS lift,
           {_LIFT_CAPTURE} AS cum_capture
    FROM cum ORDER BY decile
    """,
    "model lift / cumulative-gains table: users decile by a "
    "propensity score (view count) DESCENDING with value-atomic "
    "buckets (ties never split — the equi-depth pattern), per-decile "
    "conversion rate, lift vs the base rate, and cumulative capture "
    "share — the campaign-targeting readout for ANY score column. "
    "All counts exact integers; rates/lift/capture one shared text "
    "each. At 100 TB: one user rollup + one score-domain groupBy; "
    "ordered passes live on the score domain and the <=10-row "
    "decile frame",
    "analytics extension (lift / cumulative-gains table)",
)
def events_model_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    g = u.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("conv").cast("bigint").alias("cv"),
    )
    wdesc = W.orderBy(F.desc("score")).rowsBetween(W.unboundedPreceding, -1)
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    r = g.select(
        "score",
        "cnt",
        "cv",
        F.coalesce(F.sum("cnt").over(wdesc), F.lit(0))
        .cast("bigint")
        .alias("before"),
        F.sum("cnt").over(wall).cast("bigint").alias("tusers"),
        F.sum("cv").over(wall).cast("bigint").alias("tconvs"),
    )
    d = r.select(
        F.expr("CAST(before * 10 div tusers AS BIGINT)").alias("decile"),
        "cnt",
        "cv",
        "tusers",
        "tconvs",
    )
    agg = d.groupBy("decile").agg(
        F.sum("cnt").cast("bigint").alias("users"),
        F.sum("cv").cast("bigint").alias("convs"),
        F.max("tusers").cast("bigint").alias("tusers"),
        F.max("tconvs").cast("bigint").alias("tconvs"),
    )
    cum = agg.select(
        "decile",
        "users",
        "convs",
        "tusers",
        "tconvs",
        F.sum("convs")
        .over(W.orderBy("decile"))
        .cast("bigint")
        .alias("cconvs"),
    )
    return cum.select(
        "decile",
        "users",
        "convs",
        F.expr(_LIFT_RATE).alias("conv_rate"),
        F.expr(_LIFT_LIFT).alias("lift"),
        F.expr(_LIFT_CAPTURE).alias("cum_capture"),
    ).orderBy("decile")


@register(
    "events_variant_extract",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    "semi-structured VARIANT-type aggregation (Spark 4 parse_json / "
    "variant_get — the open-format answer to a JSON-string column): "
    "props parses ONCE per row into a binary variant and typed "
    "extraction feeds integer aggregates — unlike repeated "
    "get_json_object calls, the parse cost is paid once however many "
    "paths are read. Results are exact integers; the DuckDB twin "
    "reads the same paths with json_extract. At 100 TB this is the "
    "shredded-ingest pattern for heterogeneous event payloads",
    "2.2 scalar functions (Spark 4 VARIANT semi-structured type)",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    v = ev.select(
        "event_type", F.expr("parse_json(props)").alias("pv")
    ).select(
        "event_type",
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


# per-lag Pearson between the two series from exact integer moments;
# one shared text, degenerate-lag guard identical both sides.
_CCF_R = (
    "round((m * p - a * b) / "
    "sqrt((m * qx - a * a) * (m * qy - b * b)), 6)"
)
_CCF_GUARD = "m * qx - a * a > 0.0 AND m * qy - b * b > 0.0"


@register(
    "events_crosscorr_lags",
    f"""
    WITH hc AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS y
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1),
    bounds AS (SELECT MIN(hi) AS mn, MAX(hi) AS mx FROM hc),
    spine AS (SELECT unnest(generate_series(mn, mx)) AS hi FROM bounds),
    ser AS (SELECT s.hi, COALESCE(hc.x, 0) AS x, COALESCE(hc.y, 0) AS y
            FROM spine s LEFT JOIN hc ON s.hi = hc.hi),
    lags AS (SELECT unnest(generate_series(-12, 12)) AS lag_h),
    pairs AS (
      SELECT lags.lag_h, t.x AS xt, u.y AS yl
      FROM ser t CROSS JOIN lags
      JOIN ser u ON u.hi = t.hi + lags.lag_h),
    mo AS (
      SELECT lag_h, CAST(COUNT(*) AS DOUBLE) AS m,
             CAST(SUM(xt) AS DOUBLE) AS a,
             CAST(SUM(yl) AS DOUBLE) AS b,
             CAST(SUM(xt * xt) AS DOUBLE) AS qx,
             CAST(SUM(yl * yl) AS DOUBLE) AS qy,
             CAST(SUM(xt * yl) AS DOUBLE) AS p
      FROM pairs GROUP BY 1)
    SELECT CAST(lag_h AS BIGINT) AS lag_h,
           CAST(m AS BIGINT) AS n_pairs,
           {_CCF_R} AS ccf
    FROM mo
    WHERE {_CCF_GUARD} AND m > 1.0
    ORDER BY lag_h
    """,
    "cross-correlation function between the hourly click and purchase "
    "series at lags -12..+12 — the lead/lag timing readout (the "
    "argmax lag says how long purchases trail clicks) behind any "
    "transfer-function or adstock model; the two-series complement "
    "of the ACF. Both series come from ONE conditional hourly rollup "
    "zero-filled on a generated spine; per-lag Pearson compiles from "
    "exact integer moments via one shared text with identical "
    "degenerate-lag guards. At 100 TB the corpus pays one rollup; "
    "the lag expansion lives on the hours-domain frame",
    "analytics extension (cross-correlation / lead-lag analysis)",
)
def events_crosscorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    hc = ev.groupBy(
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) DIV 3600 AS BIGINT)"
        ).alias("hi")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    bounds = hc.agg(F.min("hi").alias("mn"), F.max("hi").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hi"))
    ser = (
        spine.join(hc, "hi", "left")
        .select(
            "hi",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
        .localCheckpoint()  # both sides of the lag self-join
    )
    left = ser.select(
        F.col("x").alias("xt"),
        "hi",
        F.explode(F.sequence(F.lit(-12), F.lit(12))).alias("lag_h"),
    ).select("xt", "lag_h", (F.col("hi") + F.col("lag_h")).alias("hj"))
    pairs = left.join(
        ser.select(F.col("hi").alias("hj"), F.col("y").alias("yl")), "hj"
    )
    mo = pairs.groupBy("lag_h").agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("xt").cast("double").alias("a"),
        F.sum("yl").cast("double").alias("b"),
        F.sum(F.col("xt") * F.col("xt")).cast("double").alias("qx"),
        F.sum(F.col("yl") * F.col("yl")).cast("double").alias("qy"),
        F.sum(F.col("xt") * F.col("yl")).cast("double").alias("p"),
    )
    return (
        mo.filter(F.expr(f"{_CCF_GUARD} AND m > 1.0"))
        .select(
            F.col("lag_h").cast("bigint").alias("lag_h"),
            F.col("m").cast("bigint").alias("n_pairs"),
            F.expr(_CCF_R).alias("ccf"),
        )
        .orderBy("lag_h")
    )


@register(
    "events_peak_detection",
    """
    WITH hc AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hi,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    bounds AS (SELECT MIN(hi) AS mn, MAX(hi) AS mx FROM hc),
    spine AS (SELECT unnest(generate_series(mn, mx)) AS hi FROM bounds),
    ser AS (SELECT s.hi, COALESCE(hc.x, 0) AS x
            FROM spine s LEFT JOIN hc ON s.hi = hc.hi),
    thr AS (
      SELECT v AS p90 FROM (
        SELECT x AS v,
               CAST(SUM(COUNT(*)) OVER (ORDER BY x) AS BIGINT) AS cum,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
        FROM ser GROUP BY x) t
      WHERE cum * 10 >= n * 9
      ORDER BY v LIMIT 1),
    w AS (
      SELECT hi, x,
             COALESCE(MAX(x) OVER (ORDER BY hi
               ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), -1) AS ml,
             COALESCE(MAX(x) OVER (ORDER BY hi
               ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING), -1) AS mr
      FROM ser)
    SELECT w.hi, w.x AS peak_count, thr.p90 AS threshold
    FROM w CROSS JOIN thr
    WHERE w.x > w.ml AND w.x > w.mr AND w.x >= thr.p90
    ORDER BY w.x DESC, w.hi LIMIT 20
    """,
    "peak detection on the hourly event-count series: a peak "
    "strictly exceeds every neighbor within +-2 hours (strict-frame "
    "MAX windows on the zero-filled spine) AND clears the exact "
    "value-domain p90 threshold (discrete lower quantile via running "
    "counts — no interpolation, so the whole query is integer-"
    "exact). Top-20 peaks with deterministic tie-break — the "
    "traffic-spike / incident-detection readout. At 100 TB: one "
    "hourly rollup; windows range-partition the spine",
    "analytics extension (peak detection / local maxima)",
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    hc = ev.groupBy(
        F.expr(
            "CAST(unix_seconds(date_trunc('hour', ts)) DIV 3600 AS BIGINT)"
        ).alias("hi")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    bounds = hc.agg(F.min("hi").alias("mn"), F.max("hi").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("hi"))
    ser = (
        spine.join(hc, "hi", "left")
        .select("hi", F.coalesce("x", F.lit(0)).alias("x"))
        .localCheckpoint()  # threshold pass + window pass
    )
    vd = ser.groupBy(F.col("x").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    thr = (
        vd.select(
            "v",
            F.sum("c").over(W.orderBy("v")).cast("bigint").alias("cum"),
            F.sum("c")
            .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
            .cast("bigint")
            .alias("n"),
        )
        .filter(F.col("cum") * 10 >= F.col("n") * 9)
        .orderBy("v")
        .limit(1)
        .select(F.col("v").alias("p90"))
    )
    w = ser.select(
        "hi",
        "x",
        F.coalesce(
            F.max("x").over(W.orderBy("hi").rowsBetween(-2, -1)), F.lit(-1)
        ).alias("ml"),
        F.coalesce(
            F.max("x").over(W.orderBy("hi").rowsBetween(1, 2)), F.lit(-1)
        ).alias("mr"),
    )
    return (
        w.crossJoin(F.broadcast(thr))
        .filter(
            (F.col("x") > F.col("ml"))
            & (F.col("x") > F.col("mr"))
            & (F.col("x") >= F.col("p90"))
        )
        .select("hi", F.col("x").alias("peak_count"), F.col("p90").alias("threshold"))
        .orderBy(F.desc("peak_count"), "hi")
        .limit(20)
    )


# per-transition-row entropy term: -p ln p with p one divide of exact
# counts, ln 6 dp-guarded, product 9 dp, decimal-summed per prev state.
_TE_TERM = (
    "round(-(CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)) "
    "* round(ln(CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)), 6), 9)"
)
_TE_PERP = "round(exp(entropy), 6)"


@register(
    "events_transition_entropy",
    f"""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    tm AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS BIGINT)
               AS rt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type),
    h AS (
      SELECT prev_type,
             CAST(COUNT(*) AS BIGINT) AS n_next_states,
             CAST(SUM(CAST({_TE_TERM} AS DECIMAL(20,9))) AS DOUBLE)
               AS entropy
      FROM tm GROUP BY prev_type)
    SELECT prev_type, n_next_states, entropy,
           {_TE_PERP} AS perplexity
    FROM h ORDER BY prev_type
    """,
    "behavioral predictability: the conditional entropy H(next | "
    "prev) of each state's transition row, plus its perplexity "
    "(effective branching factor) — which user states are "
    "predictable and which are coin flips; the information-theoretic "
    "readout over the same matrix the Markov queries mine. "
    "Transition p is one divide of exact counts, ln 6 dp-guarded, "
    "terms 9 dp-rounded and decimal-summed; exp guarded by the same "
    "rounding. At 100 TB: one lag-window shuffle, then the "
    "states-domain frame",
    "analytics extension (transition entropy / predictability)",
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    tm = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "prev_type",
            "n",
            F.sum("n")
            .over(W.partitionBy("prev_type"))
            .cast("bigint")
            .alias("rt"),
        )
    )
    h = tm.groupBy("prev_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_next_states"),
        F.sum(F.expr(_TE_TERM).cast("decimal(20,9)"))
        .cast("double")
        .alias("entropy"),
    )
    return h.select(
        "prev_type",
        "n_next_states",
        "entropy",
        F.expr(_TE_PERP).alias("perplexity"),
    ).orderBy("prev_type")


_STICKY = "round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6)"


@register(
    "events_dau_wau_stickiness",
    f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS d
      FROM events),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    span AS (
      SELECT ud.user_id, ud.d + off AS td
      FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o),
    wau AS (
      SELECT td AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
      FROM span GROUP BY td),
    ok AS (SELECT MIN(d) + 6 AS lo, MAX(d) AS hi FROM dau)
    SELECT dau.d, dau.dau, wau.wau, {_STICKY} AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d CROSS JOIN ok
    WHERE dau.d >= ok.lo AND dau.d <= ok.hi
    ORDER BY dau.d
    """,
    "DAU/WAU stickiness per day — the engagement-frequency ratio "
    "(what share of weekly actives show up daily). Distinct trailing-"
    "7-day actives cannot be summed from daily counts, so each "
    "active (user, day) point expands into the 7 windows it serves "
    "(the point-expansion pattern — never a window self-join) and "
    "WAU is a countDistinct per target day; partial leading windows "
    "excluded identically both sides. All integers; one shared "
    "ratio text. At 100 TB: the user-day frame pays one dedup "
    "shuffle + a 7x expansion rollup",
    "analytics extension (DAU/WAU stickiness)",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    ud = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    ).distinct().localCheckpoint()  # DAU rollup + the 7x expansion
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    span = ud.select(
        "user_id",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).select("user_id", (F.col("d") + F.col("off")).alias("td"))
    wau = span.groupBy(F.col("td").alias("d")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    ok = dau.agg(
        (F.min("d") + F.lit(6)).alias("lo"), F.max("d").alias("hi")
    )
    return (
        dau.join(wau, "d")
        .crossJoin(F.broadcast(ok))
        .filter((F.col("d") >= F.col("lo")) & (F.col("d") <= F.col("hi")))
        .select("d", "dau", "wau", F.expr(_STICKY).alias("stickiness"))
        .orderBy("d")
    )


_ER_TERM = "round(stationary_p * entropy, 9)"


def _o_entropy_rate() -> str:
    # compose the two verified component oracles as subqueries (their
    # own WITH-chains nest inside the FROM)
    steady = _o_markov_steady()
    ent = REGISTRY["events_transition_entropy"].oracle
    return f"""
    WITH pi AS (SELECT * FROM ({steady}) t1),
    h AS (SELECT * FROM ({ent}) t2),
    terms AS (
      SELECT {_ER_TERM} AS term
      FROM pi JOIN h ON pi.state = h.prev_type)
    SELECT CAST(SUM(CAST(term AS DECIMAL(20,9))) AS DOUBLE)
             AS entropy_rate,
           round(exp(CAST(SUM(CAST(term AS DECIMAL(20,9))) AS DOUBLE)), 6)
             AS perplexity_rate
    FROM terms
    """


@register(
    "events_markov_entropy_rate",
    _o_entropy_rate(),
    "entropy RATE of the user-journey Markov chain: the stationary-"
    "distribution-weighted average of per-state transition entropies "
    "— bits-per-step unpredictability of long-run user behavior, and "
    "its perplexity (effective long-run branching factor). Pure "
    "composition of two verified components (the power-iterated "
    "stationary pi and the per-state entropy rows) joined on the "
    "5-state frame; terms 9 dp-rounded, decimal-summed. The oracle "
    "nests both components' own unrolled CTE chains as subqueries — "
    "compositionality of the parity discipline itself",
    "analytics extension (Markov entropy rate)",
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    pi = events_markov_steady_state(spark, sf_dir)
    h = events_transition_entropy(spark, sf_dir)
    terms = pi.join(
        h, pi["state"] == h["prev_type"]
    ).select(F.expr(_ER_TERM).alias("term"))
    return terms.agg(
        F.sum(F.col("term").cast("decimal(20,9)"))
        .cast("double")
        .alias("entropy_rate")
    ).select(
        "entropy_rate",
        F.expr("round(exp(entropy_rate), 6)").alias("perplexity_rate"),
    )


def _o_hll_sliding() -> str:
    from hangarbay_spark.queries.relational import (
        _HLL_EST,
        _HLL_R2,
        _HLL_T43,
        _o_kmv_hashval,
    )

    return f"""
    WITH hu AS (
      SELECT DISTINCT epoch_ms(date_trunc('hour', ts)) AS h, user_id
      FROM events),
    hours AS (SELECT DISTINCT h FROM hu),
    rk AS (
      SELECT h, v // {_HLL_R2} AS bucket,
             CASE WHEN v % {_HLL_R2} = 0 THEN 43
                  ELSE 43 - length(bin(v % {_HLL_R2})) END AS rank
      FROM (SELECT h, {_o_kmv_hashval("user_id")} AS v FROM hu)),
    regs AS (SELECT h, bucket, MAX(rank) AS mr FROM rk GROUP BY 1, 2),
    spread AS (
      SELECT r.h + k * 3600000 AS target, r.bucket, r.mr
      FROM regs r CROSS JOIN (VALUES (0),(1),(2),(3)) ks(k)),
    merged AS (
      SELECT s.target, s.bucket, MAX(s.mr) AS mr
      FROM spread s JOIN hours t ON s.target = t.h
      GROUP BY 1, 2),
    sums AS (
      SELECT target,
             CAST(SUM(1::BIGINT << (43 - mr)) +
                  (64 - COUNT(*)) * {int(_HLL_T43)} AS BIGINT) AS s,
             CAST(64 - COUNT(*) AS BIGINT) AS v0
      FROM merged GROUP BY target),
    uspread AS (
      SELECT DISTINCT hu.h + k * 3600000 AS target, hu.user_id
      FROM hu CROSS JOIN (VALUES (0),(1),(2),(3)) ks(k)),
    exact AS (
      SELECT u.target, CAST(COUNT(DISTINCT u.user_id) AS BIGINT)
               AS exact_users
      FROM uspread u JOIN hours t ON u.target = t.h
      GROUP BY 1)
    SELECT s.target AS window_start_ms, {_HLL_EST} AS est_users,
           e.exact_users
    FROM sums s JOIN exact e ON s.target = e.target
    ORDER BY window_start_ms
    """


def _register_hll_sliding() -> None:
    @register(
        "events_hll_sliding_distinct",
        _o_hll_sliding(),
        "SLIDING distinct users per hour over a trailing 4-hour window "
        "via HLL register algebra — the constant-state twin of the "
        "exact events_rolling_wau: windowed COUNT DISTINCT can't merge "
        "partials, but per-hour register blocks max-merge into any "
        "trailing frame (one bounded 4x explode of SUMMARY rows, never "
        "of raw events), so 100 TB sliding uniques cost one register "
        "build + register-sized merges. The deterministic md5 HLL "
        "(agg_hll_distinct_estimate) makes the per-window ESTIMATE "
        "itself oracle-verified next to the exact trailing count",
        "2.7/2.4 extension (sliding HLL distinct rollup)",
    )
    def events_hll_sliding_distinct(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from hangarbay_spark.queries.relational import (
            _HLL_EST,
            _HLL_R2,
            _HLL_T43,
            _kmv_hashval_col,
        )

        ev = load_events(spark, sf_dir)
        hu = ev.select(
            F.unix_millis(F.date_trunc("hour", "ts")).alias("h"),
            "user_id",
        ).distinct().localCheckpoint()  # consumers: registers, hours,
        # exact arm — one distinct shuffle serves all three
        hours = hu.select("h").distinct().withColumnRenamed("h", "target")
        rk = hu.select(
            "h", _kmv_hashval_col(F.col("user_id")).alias("v")
        ).select(
            "h",
            F.expr(f"v div {_HLL_R2}").alias("bucket"),
            F.expr(
                f"CASE WHEN v % {_HLL_R2} = 0 THEN 43"
                f" ELSE 43 - length(bin(v % {_HLL_R2})) END"
            ).alias("rank"),
        )
        regs = rk.groupBy("h", "bucket").agg(F.max("rank").alias("mr"))
        ks = F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k")
        spread = regs.select("h", "bucket", "mr", ks).select(
            (F.col("h") + F.col("k") * 3600000).alias("target"),
            "bucket",
            "mr",
        )
        merged = (
            spread.join(F.broadcast(hours), "target")
            .groupBy("target", "bucket")
            .agg(F.max("mr").alias("mr"))
        )
        sums = merged.groupBy("target").agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 43 - mr)"))
                + (F.lit(64) - F.count(F.lit(1))) * F.lit(int(_HLL_T43))
            )
            .cast("bigint")
            .alias("s"),
            (F.lit(64) - F.count(F.lit(1))).cast("bigint").alias("v0"),
        )
        uspread = hu.select("h", "user_id", ks).select(
            (F.col("h") + F.col("k") * 3600000).alias("target"), "user_id"
        )
        exact = (
            uspread.join(F.broadcast(hours), "target")
            .groupBy("target")
            .agg(F.countDistinct("user_id").cast("bigint").alias("exact_users"))
        )
        return (
            sums.join(exact, "target")
            .select(
                F.col("target").alias("window_start_ms"),
                F.expr(_HLL_EST).alias("est_users"),
                "exact_users",
            )
            .orderBy("window_start_ms")
        )


_register_hll_sliding()


# --- Markov removal-effect attribution -------------------------------------

_MRE_K = 8  # absorption iterations (journeys are short; geometric tail)
_MRE_CHANNELS = ("click", "error", "signup", "view")


def _o_markov_removal() -> str:
    """Unrolled oracle: journey transitions (truncated at each user's
    first purchase; __start/__end boundary states), then one absorption
    chain per arm — full plus one per removed channel — each K
    iterations of v(s) <- sum_t p(s,t)*v(t) with 12 dp terms summed as
    exact decimals (the events_markov_steady_state float discipline).
    Every journey/chain CTE is MATERIALIZED: the five unrolled
    absorption chains each reference tp and their predecessor, and
    DuckDB's default inlining re-derives the whole journey pipeline
    per chain stage (28.2 -> 0.2 s at sf0.01, identical rows)."""
    states = "('__start'), ('purchase'), ('__end'), " + ", ".join(
        f"('{c}')" for c in _MRE_CHANNELS
    )

    def chain(tag: str, removed: str | None) -> list[str]:
        cut = f"AND tp.next_type <> '{removed}'" if removed else ""
        ctes = [
            f"""a{tag}0 AS MATERIALIZED (
      SELECT state,
             CASE WHEN state = 'purchase' THEN CAST(1 AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END AS v
      FROM states)"""
        ]
        for k in range(1, _MRE_K + 1):
            ctes.append(f"""a{tag}{k} AS MATERIALIZED (
      SELECT s.state,
             CASE WHEN s.state = 'purchase' THEN CAST(1 AS DOUBLE)
                  WHEN s.state = '__end' THEN CAST(0 AS DOUBLE)
                  ELSE COALESCE(x.v, CAST(0 AS DOUBLE)) END AS v
      FROM states s LEFT JOIN (
        SELECT tp.prev_type AS state,
               CAST(SUM(CAST(round(tp.p * a.v, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS v
        FROM tp JOIN a{tag}{k - 1} a ON a.state = tp.next_type
        WHERE 1 = 1 {cut}
        GROUP BY tp.prev_type) x ON x.state = s.state)""")
        return ctes

    chains = chain("f", None)
    for c in _MRE_CHANNELS:
        chains.extend(chain(c, c))
    effs = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, "
        f"(SELECT v FROM af{_MRE_K} WHERE state = '__start') AS p_full, "
        f"(SELECT v FROM a{c}{_MRE_K} WHERE state = '__start') AS p_removed"
        for c in _MRE_CHANNELS
    )
    return f"""
    WITH r AS MATERIALIZED (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    fp AS MATERIALIZED (SELECT user_id, MIN(rn) AS frn FROM r
           WHERE event_type = 'purchase' GROUP BY user_id),
    kept AS MATERIALIZED (
      SELECT r.user_id, r.event_type, r.rn
      FROM r LEFT JOIN fp USING (user_id)
      WHERE fp.frn IS NULL OR r.rn <= fp.frn),
    seq AS MATERIALIZED (
      SELECT user_id, event_type, rn,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY rn)
               AS prev_type,
             MAX(rn) OVER (PARTITION BY user_id) AS mx
      FROM kept),
    trans AS MATERIALIZED (
      SELECT prev_type, event_type AS next_type FROM seq
      WHERE prev_type IS NOT NULL
      UNION ALL
      SELECT '__start', event_type FROM seq WHERE rn = 1
      UNION ALL
      SELECT event_type, '__end' FROM seq
      WHERE rn = mx AND event_type <> 'purchase'),
    tc AS MATERIALIZED (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM trans GROUP BY 1, 2),
    tp AS MATERIALIZED (SELECT prev_type, next_type,
                  CAST(n AS DOUBLE) /
                    SUM(n) OVER (PARTITION BY prev_type) AS p
           FROM tc),
    states(state) AS (VALUES {states}),
    {",".join(chains)},
    eff AS (
      SELECT channel, round(p_full, 9) AS p_full,
             round(p_removed, 9) AS p_removed,
             round(CAST(1 AS DOUBLE) - p_removed / p_full, 9) AS effect
      FROM ({effs}) e),
    tot AS (SELECT CAST(SUM(CAST(effect AS DECIMAL(38,9))) AS DOUBLE)
              AS te FROM eff)
    SELECT channel, p_full, p_removed, effect,
           round(effect / tot.te, 9) AS share
    FROM eff CROSS JOIN tot
    ORDER BY channel
    """


@register(
    "events_markov_removal_attribution",
    _o_markov_removal(),
    "Markov REMOVAL-EFFECT attribution (Anderl et al. 2014 — the "
    "data-driven attribution standard, completing the family beside "
    "last-touch/time-decay/U-shape/Shapley): per-user journeys "
    "truncated at first purchase become a __start/channel/purchase/"
    "__end chain; a channel's effect is 1 - P(convert with every "
    "transition INTO it redirected to dropout)/P(convert), shares "
    "normalized over channels. Journey + transition construction is "
    "fully distributed (one user window + one pair rollup); the "
    "absorption iterations then run driver-side on the COLLECTED "
    "transition matrix — bounded by contract at (#states)^2 <= 49 "
    "rows (the broadcast-lookup-table rule), each arm K=8 iterations "
    "of v <- Pv with 12 dp terms summed as exact decimals, the "
    "markov_steady_state float discipline. The oracle unrolls all "
    "five absorption chains in SQL and hash-matches every arm",
    "analytics extension (Markov removal-effect attribution)",
)
def events_markov_removal_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from decimal import ROUND_HALF_UP, Decimal

    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    fp = (
        r.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("frn"))
    )
    kept = r.join(fp, "user_id", "left").filter(
        F.col("frn").isNull() | (F.col("rn") <= F.col("frn"))
    )
    wk = W.partitionBy("user_id").orderBy("rn")
    seq = kept.select(
        "user_id",
        "event_type",
        "rn",
        F.lag("event_type").over(wk).alias("prev_type"),
        F.max("rn").over(W.partitionBy("user_id")).alias("mx"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
        .unionByName(
            seq.filter(F.col("rn") == 1).select(
                F.lit("__start").alias("prev_type"),
                F.col("event_type").alias("next_type"),
            )
        )
        .unionByName(
            seq.filter(
                (F.col("rn") == F.col("mx"))
                & (F.col("event_type") != "purchase")
            ).select(
                F.col("event_type").alias("prev_type"),
                F.lit("__end").alias("next_type"),
            )
        )
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # bounded by contract: <= (#states)^2 = 49 cells — the transition
    # matrix is the aggregate, the absorption algebra is O(K * cells)
    cells = trans.collect()
    # The oracle pins its state list to _MRE_CHANNELS + boundary
    # states; if the events event_type domain ever grows past that
    # set, the oracle would silently drop transitions into unlisted
    # states while this side kept them — fail loudly instead of
    # producing a parity mismatch that looks like a float bug.
    pinned = set(_MRE_CHANNELS) | {"purchase", "__start", "__end"}
    observed = {row["prev_type"] for row in cells} | {
        row["next_type"] for row in cells
    }
    unknown = observed - pinned
    if unknown:
        raise ValueError(
            "events_markov_removal_attribution: event_type values "
            f"outside the pinned state set: {sorted(unknown)} — extend "
            "_MRE_CHANNELS (and the oracle's states VALUES list)"
        )
    totals: dict[str, int] = {}
    for row in cells:
        totals[row["prev_type"]] = totals.get(row["prev_type"], 0) + row["n"]
    matrix = [
        (row["prev_type"], row["next_type"], row["n"] / totals[row["prev_type"]])
        for row in cells
    ]
    transient = {s for s, _, _ in matrix}

    def d12(x: float) -> Decimal:
        # Spark/DuckDB round(double, 12): shortest-repr then HALF_UP
        return Decimal(repr(x)).quantize(Decimal("1e-12"), ROUND_HALF_UP)

    def r9(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
        )

    def absorb(removed: str | None) -> float:
        v = {s: 0.0 for s in transient}
        v["purchase"], v["__end"] = 1.0, 0.0
        for c in _MRE_CHANNELS:
            v.setdefault(c, 0.0)
        for _ in range(_MRE_K):
            nxt: dict[str, Decimal] = {}
            for s, t, p in matrix:
                if removed is not None and t == removed:
                    continue
                nxt[s] = nxt.get(s, Decimal(0)) + d12(p * v[t])
            v = {s: (float(nxt[s]) if s in nxt else 0.0) for s in transient}
            v["purchase"], v["__end"] = 1.0, 0.0
            for c in _MRE_CHANNELS:
                v.setdefault(c, 0.0)
        return v["__start"]

    p_full = absorb(None)
    rows = []
    for c in _MRE_CHANNELS:
        p_rem = absorb(c)
        rows.append(
            (c, r9(p_full), r9(p_rem), r9(1.0 - p_rem / p_full))
        )
    te = float(sum(Decimal(repr(e)) for _, _, _, e in rows))
    out = [
        (c, pf, pr, e, r9(e / te)) for (c, pf, pr, e) in rows
    ]
    return spark.createDataFrame(
        out,
        "channel string, p_full double, p_removed double, "
        "effect double, share double",
    ).orderBy("channel")


# 7-day rolling OLS trend: x = epoch-day number (exact int), y = daily
# purchase count; slope/intercept from integer window moments through
# ONE shared all-DOUBLE formula text, 9 dp.
_SLOPE7 = (
    "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
    "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 9)"
)
_INTERCEPT7 = (
    "round((CAST(sy AS DOUBLE) - slope7 * sx) / n, 9)"
)


@register(
    "events_rolling_slope",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT d, y,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
    s AS (SELECT d, y, n, sx, sy, {_SLOPE7} AS slope7 FROM m WHERE n = 7)
    SELECT d, y, slope7, {_INTERCEPT7} AS intercept7
    FROM s ORDER BY d
    """,
    "7-day rolling OLS trend of daily purchase volume: slope and "
    "intercept per day from exact integer window moments (x = epoch-"
    "day number, y = daily count; moments never leave BIGINT), the "
    "regression twin of events_rolling_corr and the continuous "
    "upgrade of day-over-day deltas — a slope crossing zero IS the "
    "trend reversal. Slope computed one CTE layer before the "
    "intercept that reuses it (the lateral-alias layering rule); one "
    "map-side-combined daily rollup, windows on the bounded one-row-"
    "per-day frame",
    "events extension (rolling OLS trend)",
)
def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("d"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("x"),
    ).agg(
        F.sum(F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("y"),
    )
    w = W.orderBy("d").rowsBetween(-6, W.currentRow)
    m = daily.select(
        "d",
        "y",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
    )
    s = m.filter(F.col("n") == 7).select(
        "d", "y", "n", "sx", "sy", F.expr(_SLOPE7).alias("slope7")
    )
    return s.select(
        "d", "y", "slope7", F.expr(_INTERCEPT7).alias("intercept7")
    ).orderBy("d")
