"""Analytics-surface queries widening SURVEY.md §2.4/§2.5 evidence:
the full window-function battery (lead/lag/ntile/percent_rank/
cume_dist/nth_value), explicit GROUPING SETS, fixed-width histograms,
and cohort retention — the standard BI shapes a reference user would
expect an analytics engine to run.

Parity notes: percent_rank/cume_dist are ratios of exact integers
(identical doubles both engines); histogram bins use floor(x / width)
arithmetic (DuckDB has no width_bucket); week cohorts use
date_trunc('week') (Monday-start in both engines) surfaced as DATE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hangarbay_spark.queries.base import (
    dsum,
    load_events,
    load_table,
    o_dsum,
    register,
    spread,
)


@register(
    "window_func_battery",
    """
    SELECT o_orderkey,
           o_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS spend_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           lead(o_totalprice, 1) OVER w AS next_price,
           lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
           nth_value(o_totalprice, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_price
    FROM orders
    WHERE o_custkey % 20 = 1
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    "full window-function battery over per-customer spend: ntile "
    "quartiles, percent_rank, cume_dist, lead/lag (with default), and "
    "frame-spec nth_value — one shuffle on the partition key, "
    "tie-broken ordering for cross-engine determinism",
    "2.5 window functions (battery: ranking + offset + frame)",
)
def window_func_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 20 == 1
    )
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("bigint").alias("spend_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.lag("o_totalprice", 1, -1.0).over(w).alias("prev_price"),
        F.nth_value("o_totalprice", 2).over(frame).alias("second_price"),
    )


@register(
    "agg_grouping_sets_explicit",
    f"""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {o_dsum("o_totalprice", "revenue", 2)}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                            (c_mktsegment), ())
    """,
    "explicit GROUPING SETS (detail / per-segment / grand total) over "
    "the orders-customer broadcast join; null group keys labeled 'ALL' "
    "(source columns are non-null, so labels are unambiguous)",
    "2.4 aggregations (explicit grouping sets beyond CUBE/ROLLUP)",
)
def agg_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_gs_customer")
    # SQL path: GROUPING SETS has no stable DataFrame-API equivalent —
    # spark.sql is the same Catalyst plan the DataFrame would build.
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
                 AS revenue
        FROM _gs_orders JOIN _gs_customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
                                (c_mktsegment), ())
        """
    )


HIST_BIN_WIDTH = 5000.0


@register(
    "agg_histogram_price",
    f"""
    SELECT CAST(floor(l_extendedprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
           CAST(floor(l_extendedprice / {HIST_BIN_WIDTH}) * {HIST_BIN_WIDTH}
                AS DOUBLE) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           {o_dsum("l_extendedprice", "total", 2)}
    FROM lineitem
    GROUP BY 1, 2
    """,
    "fixed-width histogram of lineitem price via floor(x/width) "
    "arithmetic binning (portable — DuckDB lacks width_bucket): one "
    "map-side-combined aggregation, ~22 groups",
    "2.4 aggregations (histogram / arithmetic binning)",
)
def agg_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.floor(F.col("l_extendedprice") / HIST_BIN_WIDTH)
    return (
        li.groupBy(
            bin_col.cast("bigint").alias("bin"),
            (bin_col * HIST_BIN_WIDTH).cast("double").alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            dsum("l_extendedprice", "total", 2),
        )
        .select("bin", "bin_lo", "n", "min_price", "max_price", "total")
    )


@register(
    "incremental_agg_maintenance",
    """
    WITH newt AS (
      SELECT l_returnflag, l_linestatus, l_quantity,
             CASE WHEN l_partkey % 7 = 0 THEN l_extendedprice * 2
                  ELSE l_extendedprice END AS price
      FROM lineitem)
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS sum_revenue
    FROM newt GROUP BY 1, 2
    """,
    "materialized-aggregate maintenance: the Spark side builds the agg "
    "on an OLD table version, derives the CDC delta to the NEW version "
    "(inserts + price modifications), and merges the delta WITHOUT "
    "rescanning the base; the oracle recomputes the NEW aggregate "
    "directly — equality is the maintenance composition law, checked "
    "cross-engine (exact decimal sums make it bit-exact)",
    "pipeline extension (incremental materialized-view maintenance)",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.pipelines.incremental import (
        build_agg,
        delta_agg_update,
        signed_delta,
    )

    base = load_table(spark, sf_dir, "lineitem")
    price = F.when(
        F.col("l_partkey") % 7 == 0, F.col("l_extendedprice") * 2
    ).otherwise(F.col("l_extendedprice"))
    new = base.withColumn("price", price)
    # old version: 10% of orders missing, no price modifications
    old = base.filter(F.col("l_orderkey") % 10 != 0).withColumn(
        "price", F.col("l_extendedprice")
    )
    keys = ["l_orderkey", "l_linenumber"]
    groups = ["l_returnflag", "l_linestatus"]
    specs = {"sum_qty": ("l_quantity", 2), "sum_revenue": ("price", 2)}
    prev = build_agg(old, groups, specs)
    delta = signed_delta(old, new, keys)
    updated = delta_agg_update(prev, delta, groups, specs)
    return updated.select(
        *groups,
        F.col("n"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_revenue").cast("double").alias("sum_revenue"),
    )


@register(
    "events_retention_cohorts",
    """
    WITH firstseen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events)
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.act_week) / 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM firstseen f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
    "cohort retention: users grouped by first-seen week, distinct "
    "active users per (cohort_week, week_offset) — two aggregations "
    "sharing the user_id shuffle; weeks are Monday-start DATEs in both "
    "engines",
    "2.4/2.5 analytics extension (cohort retention)",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    firstseen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("act_week")
    ).distinct()
    return (
        firstseen.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
        .select("cohort_week", "week_offset", "active_users")
    )


TRAILING_DAYS = 30


@register(
    "window_range_frame_trailing",
    f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(epoch(o_orderdate) AS BIGINT) AS od_s,
             o_totalprice
      FROM orders WHERE o_custkey % 40 = 1)
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER w AS DOUBLE)
             AS trailing_spend
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY od_s
                 RANGE BETWEEN {TRAILING_DAYS * 86400} PRECEDING AND CURRENT ROW)
    """,
    "RANGE-frame window: per order, the customer's order count and "
    "exact decimal spend in the trailing 30 days — value-based frames "
    "(tie-safe: every row with the same timestamp joins the frame, "
    "unlike ROWS), timestamps as epoch seconds for identical frame "
    "arithmetic in both engines",
    "2.5 window functions (RANGE frame / trailing aggregation)",
)
def window_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 40 == 1
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.unix_timestamp("o_orderdate").cast("bigint").alias("od_s"),
        "o_totalprice",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("od_s")
        .rangeBetween(-TRAILING_DAYS * 86400, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_spend"),
    )


def _stats_formula_sql() -> dict[str, str]:
    """Shared double-arithmetic formulas over the exact decimal moments
    (nd, sx, sy, sxx, syy, sxy) — the SAME text is compiled by Spark
    (F.expr) and DuckDB so every IEEE op runs in the same order and the
    doubles match bit for bit; round() guards the residual risk of
    compiler FMA contraction differences (cosine-oracle precedent,
    llmops._o_cosine). Ratio-scale corr rounds at 9 dp; the larger-
    magnitude covariance/stddev/slope at 6 dp (farther from the
    rounding boundary relative to their ulp)."""
    return {
        "corr_qty_price": (
            "round((nd * sxy - sx * sy) / (sqrt(nd * sxx - sx * sx)"
            " * sqrt(nd * syy - sy * sy)), 9)"
        ),
        "covar_samp_qty_price": "round((sxy - sx * sy / nd) / (nd - 1.0), 6)",
        "stddev_samp_qty": "round(sqrt((sxx - sx * sx / nd) / (nd - 1.0)), 6)",
        "stddev_samp_price": "round(sqrt((syy - sy * sy / nd) / (nd - 1.0)), 6)",
        "regr_slope_price_on_qty": (
            "round((nd * sxy - sx * sy) / (nd * sxx - sx * sx), 6)"
        ),
    }


_STATS_SELECT = ",\n           ".join(
    f"{expr} AS {alias}" for alias, expr in _stats_formula_sql().items()
)


@register(
    "agg_stats_battery",
    f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4)))
                  AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4)))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n_rows,
           {_STATS_SELECT}
    FROM m
    """,
    "statistical aggregate battery (corr / covar_samp / stddev_samp / "
    "regression slope) derived from exact decimal moment sums — the "
    "builtin corr()/stddev() aggregates merge partial states in "
    "nondeterministic float order on both engines, so the parity-safe "
    "(and shuffle-identical: one pass, map-side partials) formulation "
    "is moments-then-formula, with both engines compiling the same "
    "arithmetic text",
    "2.4 aggregation extension (statistical aggregates)",
)
def agg_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread before the five decimal(30,x) moment sums (base.spread;
    # the report_ols_price_drivers precedent)
    li = spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(q.cast("decimal(30,2)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(30,2)")).cast("double").alias("sy"),
        F.sum((q * q).cast("decimal(30,4)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(30,4)")).cast("double").alias("syy"),
        F.sum((q * p).cast("decimal(30,4)")).cast("double").alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        "n_rows",
        *[
            F.expr(expr).alias(alias)
            for alias, expr in _stats_formula_sql().items()
        ],
    )


@register(
    "agg_hll_mergeable_rollup",
    None,  # sketch binaries have no SQL twin — rows-only; error bound tested
    "MERGEABLE distinct-count rollup: one Datasketches HLL sketch per "
    "(event_type, day) via hll_sketch_agg, then hll_union_agg collapses "
    "the daily sketches into the per-type total WITHOUT rescanning "
    "events — the re-aggregation pattern exact COUNT DISTINCT "
    "fundamentally cannot do (distinct partials don't merge), and the "
    "backbone of any 100 TB cube: persist daily sketches once, answer "
    "weekly/monthly/all-time rollups by union alone. exact_users is "
    "computed alongside to surface the sketch error (rel_err asserted "
    "< 5% in tests)",
    "2.4 aggregation extension (mergeable HLL sketch rollup)",
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("bigint")
        .alias("est_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return rolled.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "est_users",
        "exact_users",
        F.round(
            F.abs(F.col("est_users") - F.col("exact_users"))
            / F.col("exact_users").cast("double"),
            6,
        ).alias("rel_err"),
    )


_PR_ITERS = 10
_PR_DAMP = "0.85"
_PR_JUMP = "0.15"


def _o_pagerank() -> str:
    """Unrolled-CTE PageRank oracle: r{k} is one power-iteration step
    over the distinct co-purchase edge set. Float discipline per
    queries/base.py: per-edge contribution rank/deg is one IEEE divide
    (identical inputs -> identical double), the per-node sum
    accumulates in DECIMAL(30,15) (order-independent; ~1e-4 values
    keep 11+ significant digits, inside the double->decimal agreement
    band), and each iteration rounds at 12 dp as the FMA guard."""
    ctes = [
        "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        "e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst "
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey <> b.l_partkey)",
        "dg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM dg)",
        "r0 AS (SELECT src AS node, 1.0 / n AS rank FROM dg, nn)",
    ]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(
            f"r{k} AS (SELECT e.dst AS node, "
            f"round({_PR_JUMP} / nn.n + {_PR_DAMP} * "
            f"CAST(SUM(CAST(r.rank / dg.deg AS DECIMAL(30,15))) AS DOUBLE)"
            f", 12) AS rank "
            f"FROM e JOIN r{k - 1} r ON e.src = r.node "
            f"JOIN dg ON dg.src = e.src CROSS JOIN nn "
            f"GROUP BY e.dst, nn.n)"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT node, ROUND(rank, 9) AS rank
    FROM r{_PR_ITERS} ORDER BY rank DESC, node LIMIT 25
    """
    )


@register(
    "graph_pagerank_copurchase",
    _o_pagerank(),
    "iterative PageRank (10 power iterations, damping 0.85) over the "
    "part co-purchase graph (parts linked when they appear in one "
    "order) — the join-agg-per-iteration shape of every distributed "
    "graph algorithm: edges and degrees are built once and "
    "localCheckpoint'd (reused by all iterations), each iteration is "
    "one edge-rank hash join + one decimal-exact aggregation shuffled "
    "on the SAME node key, and rank vectors stay distributed (the "
    "only driver scalar is N). Oracle = the identical computation as "
    "10 unrolled CTEs; 12 dp per-iteration rounding keeps both "
    "engines' floats bit-identical. Companion of the connected-"
    "components min-label loop (operators/dedup.py)",
    "analytics extension (iterative graph algorithm / PageRank)",
)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.graph import pagerank

    # Per-order pair expansion via collect_set + double explode, not a
    # lineitem self-join: one groupBy shuffle of the fact table replaces
    # BOTH sides of the equi-join shuffle, and the per-order part sets
    # are contract-bounded (<= 7 line items/order), so the explode never
    # goes quadratic in a task (A/B at sf0.1: edge build 4.05 -> 2.10 s,
    # identical (src, dst, deg) rows). pagerank() dedups the final edge
    # set, so the duplicate pairs different orders produce are fine.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    e = (
        sets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    # symmetric=True: the co-purchase relation contains (a,b) iff it
    # contains (b,a), so every node has an in-edge and the zero-in-
    # degree re-attach join is skippable (one shuffle per iteration).
    ranks = pagerank(
        e, iters=_PR_ITERS, damping=float(_PR_DAMP), symmetric=True
    )
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(25)
        .select("node", F.round("rank", 9).alias("rank"))
    )


_COPURCHASE_SMALL_SQL = """
    li AS (SELECT DISTINCT l.l_orderkey, l.l_partkey
           FROM lineitem l JOIN part p
             ON l.l_partkey = p.p_partkey AND p.p_size <= 5),
    e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey)
"""


def _copurchase_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (src < dst) co-purchase edges over small parts
    (p_size <= 5): the part filter lands in the broadcast dim BEFORE
    the fact join, so the quadratic per-order pair expansion only ever
    sees qualifying items. localCheckpoint'd — every consumer mirrors
    or re-joins the edge set (multiple-consumer invariant, CLAUDE.md):
    unchecked, the degree query's union rebuilt the whole edge
    derivation per branch (15 exchanges; 8 after)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    # No broadcast hint: the filtered part side grows linearly with SF
    # (~10% of part; ~2M keys at sf100), so a forced broadcast is a
    # driver-OOM hazard at scale — the planner's size stats / AQE pick
    # broadcast on their own while it is actually small.
    li = li.join(
        part.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    # Per-order pair expansion via collect_set + double explode, not a
    # self-join: one groupBy shuffle of the (semi-join-filtered) fact
    # table replaces both sides of the equi-join shuffle; collect_set
    # also subsumes the old pre-join distinct. Per-order sets are
    # contract-bounded (<= 7 line items/order), so the explode never
    # goes quadratic in a task (pagerank edge-build A/B at sf0.1:
    # 4.05 -> 2.10 s, identical rows).
    sets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    return (
        sets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )


@register(
    "graph_degree_distribution",
    f"""
    WITH {_COPURCHASE_SMALL_SQL},
    und AS (SELECT src, dst FROM e
            UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src)
    SELECT deg, COUNT(*) AS n_nodes
    FROM deg GROUP BY deg ORDER BY deg
    """,
    "degree distribution of the (undirected) small-part co-purchase "
    "graph: oriented edges mirrored with a zero-shuffle unionAll, one "
    "groupBy per level — degree histograms are the first diagnostic "
    "of any graph workload (skew = hub nodes = the rows that break "
    "per-node joins). Both aggregations shuffle on integer keys; "
    "output is bounded by the distinct-degree count",
    "analytics extension (graph degree profile)",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    return (
        deg.groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("deg")
    )


@register(
    "graph_triangle_topk",
    f"""
    WITH {_COPURCHASE_SMALL_SQL},
    tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
            FROM e a JOIN e b ON a.dst = b.src
            JOIN e c ON c.src = a.src AND c.dst = b.dst),
    pernode AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
    SELECT node, COUNT(*) AS n_triangles
    FROM pernode GROUP BY node
    ORDER BY n_triangles DESC, node
    LIMIT 20
    """,
    "per-node triangle counts (top-20) on the small-part co-purchase "
    "graph — the compact-forward algorithm: edges oriented src < dst "
    "so each triangle is enumerated exactly once by a two-hop join "
    "plus a closing-edge hash join (never the naive 3-way cycle join "
    "that counts each triangle 6x). Triangle membership fans out via "
    "unionAll (no shuffle) into one count per node. The closing-edge "
    "join keys on (src, dst) pairs — at 100 TB orient by degree "
    "(low->high) instead of id order to bound the two-hop fan-out by "
    "sqrt(m) per edge",
    "analytics extension (triangle counting / clustering structure)",
)
def graph_triangle_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)  # checkpointed by the builder
    two_hop = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("x"),
            F.col("a.dst").alias("y"),
            F.col("b.dst").alias("z"),
        )
    )
    tri = two_hop.join(
        e.alias("c"),
        (F.col("c.src") == F.col("x")) & (F.col("c.dst") == F.col("z")),
        "left_semi",
    )
    # One explode, not a 3-arm union: the union re-ran the wedge+semi
    # join per branch (plan audit: 13 exchanges -> 7 after).
    pernode = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return (
        pernode.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(20)
    )


@register(
    "graph_jaccard_neighbors",
    f"""
    WITH {_COPURCHASE_SMALL_SQL},
    und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src),
    common AS (
      SELECT a.src AS u, b.src AS v, COUNT(*) AS c
      FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
      GROUP BY a.src, b.src)
    SELECT u, v, CAST(c AS BIGINT) AS n_common,
           CAST(c AS DOUBLE) / (du.deg + dv.deg - c) AS jaccard
    FROM common
    JOIN deg du ON du.node = u
    JOIN deg dv ON dv.node = v
    ORDER BY jaccard DESC, u, v
    LIMIT 20
    """,
    "link prediction via neighborhood Jaccard: wedge join through "
    "shared neighbors (a.dst = b.dst, u < v orientation so each pair "
    "counts once) -> common-neighbor counts -> |N(u) n N(v)| / "
    "|N(u) u N(v)| from exact degrees — top-20 most-similar part "
    "pairs. The wedge join's fan-out is sum-of-squared-degrees: at "
    "100 TB cap hub degrees (or MinHash the neighbor sets — "
    "operators/dedup.py) exactly like the LSH candidate generators; "
    "jaccard is one divide of exact ints",
    "analytics extension (graph link prediction / node similarity)",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    common = (
        und.alias("a")
        .join(
            und.alias("b"),
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    return (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("c").cast("bigint").alias("n_common"),
            (
                F.col("c").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("c"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
        .limit(20)
    )


@register(
    "agg_bitmap_distinct_rollup",
    """
    WITH d AS (
      SELECT event_type,
             epoch_ms(date_trunc('week', ts)) AS week_ms,
             user_id
      FROM events)
    SELECT event_type, week_ms,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM d GROUP BY 1, 2
    """,
    "EXACT mergeable COUNT DISTINCT via bitmap words (the roaring-"
    "bitmap warehouse pattern, exact complement of the HLL rollup): "
    "per (type, day, id div 63) partial bitmaps build with "
    "bit_or(shiftleft) — map-side combinable — then roll up to weeks "
    "by OR-ing WORDS (never rescanning events), and popcount "
    "(bit_count) sums give the exact distinct. Bit index stays in "
    "0..62 so the sign bit never enters popcount semantics. Scale: "
    "partials merge like any sum — the re-aggregation is "
    "words-per-group-sized, not rows — the pattern exact COUNT "
    "DISTINCT can't do (its partials aren't mergeable without the "
    "full value set)",
    "2.4 aggregations (+exact mergeable distinct via bitmaps)",
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            (F.col("user_id") / 63).cast("bigint").alias("word"),
            F.expr("shiftleft(1L, cast(user_id % 63 as int))").alias("bit"),
        )
        .groupBy("event_type", "day", "word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    weekly = daily.groupBy(
        "event_type",
        F.unix_millis(F.date_trunc("week", "day")).alias("week_ms"),
        "word",
    ).agg(F.expr("bit_or(bits)").alias("bits"))
    return weekly.groupBy("event_type", "week_ms").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users")
    )


# Shared A/B z-test formulas over exact per-arm decimal moments
# (na, sa, qa / nb, sb, qb) — one text, both engines (Welch z; the
# _stats_formula_sql convention, 6 dp FMA guard).
_AB_FORMULAS = {
    "mean_a": "round(sa / na, 6)",
    "mean_b": "round(sb / nb, 6)",
    "z_score": (
        "round((sa / na - sb / nb) / "
        "sqrt(((qa - sa * sa / na) / (na - 1.0)) / na"
        " + ((qb - sb * sb / nb) / (nb - 1.0)) / nb), 6)"
    ),
}
_AB_SELECT = ",\n           ".join(
    f"{expr} AS {alias}" for alias, expr in _AB_FORMULAS.items()
)


def _o_ab_test() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    return f"""
    WITH assigned AS (
      SELECT CASE WHEN {o_hash_bucket("user_id", "ab")} < 128
                  THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS DOUBLE) AS na,
        CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
        CAST(SUM(CASE WHEN arm = 'A'
                 THEN CAST(value AS DECIMAL(30,4)) END) AS DOUBLE) AS sa,
        CAST(SUM(CASE WHEN arm = 'B'
                 THEN CAST(value AS DECIMAL(30,4)) END) AS DOUBLE) AS sb,
        CAST(SUM(CASE WHEN arm = 'A'
                 THEN CAST(value * value AS DECIMAL(30,8)) END)
             AS DOUBLE) AS qa,
        CAST(SUM(CASE WHEN arm = 'B'
                 THEN CAST(value * value AS DECIMAL(30,8)) END)
             AS DOUBLE) AS qb
      FROM assigned)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           {_AB_SELECT}
    FROM m
    """


@register(
    "events_ab_test_ztest",
    _o_ab_test(),
    "A/B experiment analysis: deterministic 50/50 assignment by "
    "content-hash of user_id (rerun- and repartition-stable — never "
    "rand()), per-arm exact decimal moments in ONE conditional "
    "aggregation pass, and a Welch z-statistic compiled from shared "
    "formula text on both engines (exact moments -> identical "
    "doubles; 6 dp round guards FMA contraction). At 100 TB this is "
    "a single map-side-combined scan — experiment readouts never "
    "shuffle raw events",
    "analytics extension (A/B test / two-sample z readout)",
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    assigned = ev.select(
        F.when(hash_bucket_expr("user_id", "ab") < 128, "A")
        .otherwise("B")
        .alias("arm"),
        "value",
    )
    m = assigned.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("double")
        .alias("nb"),
        F.sum(F.when(F.col("arm") == "A", F.col("value").cast("decimal(30,4)")))
        .cast("double")
        .alias("sa"),
        F.sum(F.when(F.col("arm") == "B", F.col("value").cast("decimal(30,4)")))
        .cast("double")
        .alias("sb"),
        F.sum(
            F.when(
                F.col("arm") == "A",
                (F.col("value") * F.col("value")).cast("decimal(30,8)"),
            )
        )
        .cast("double")
        .alias("qa"),
        F.sum(
            F.when(
                F.col("arm") == "B",
                (F.col("value") * F.col("value")).cast("decimal(30,8)"),
            )
        )
        .cast("double")
        .alias("qb"),
    )
    return m.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        *[F.expr(expr).alias(alias) for alias, expr in _AB_FORMULAS.items()],
    )


_PERM_B = 64  # deterministic pseudo-permutations (bounded by contract)
# conversion-rate difference, one shared all-DOUBLE text at 9 dp
_PERM_D = (
    "round(CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE) "
    "- CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE), 9)"
)
_PERM_P = (
    f"round(CAST(1 + n_ge AS DOUBLE) / CAST({_PERM_B + 1} AS DOUBLE), 6)"
)


def _o_permutation_test() -> str:
    from hangarbay_spark.operators.sampling import HEX_DIGITS

    salts = ", ".join(
        "(0, 'ab')" if i == 0 else f"({i}, 'perm{i}')"
        for i in range(_PERM_B + 1)
    )
    h = "md5(s.salt || CAST(u.user_id AS VARCHAR))"
    bucket = (
        f"CAST((strpos('{HEX_DIGITS}', substr({h}, 1, 1)) - 1) * 16 + "
        f"(strpos('{HEX_DIGITS}', substr({h}, 2, 1)) - 1) AS INTEGER)"
    )
    return f"""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events GROUP BY 1),
    s(perm, salt) AS (SELECT * FROM (VALUES {salts})),
    a AS (
      SELECT s.perm,
             CASE WHEN {bucket} < 128 THEN 1 ELSE 0 END AS is_t,
             u.conv
      FROM u CROSS JOIN s),
    cells AS (
      SELECT perm,
             CAST(SUM(is_t) AS BIGINT) AS nt,
             CAST(SUM(is_t * conv) AS BIGINT) AS ct,
             CAST(SUM(1 - is_t) AS BIGINT) AS nc,
             CAST(SUM((1 - is_t) * conv) AS BIGINT) AS cc
      FROM a GROUP BY perm),
    d AS (SELECT perm, {_PERM_D} AS d FROM cells),
    obs AS (SELECT d AS d_obs FROM d WHERE perm = 0),
    cnt AS (
      SELECT obs.d_obs,
             CAST(SUM(CASE WHEN abs(d.d) >= abs(obs.d_obs)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
      FROM d CROSS JOIN obs WHERE d.perm >= 1
      GROUP BY obs.d_obs)
    SELECT CAST({_PERM_B} AS BIGINT) AS n_perms, d_obs, n_ge,
           {_PERM_P} AS p_value
    FROM cnt
    """


@register(
    "events_permutation_test",
    _o_permutation_test(),
    "randomization/permutation test for the A/B difference in mean "
    "per-user purchase count (the distribution-free gold standard "
    "when the z approximation is suspect — skewed per-user counts, "
    "small arms; conversion itself is degenerate on this corpus, "
    "every user purchases): the "
    f"observed split plus {_PERM_B} deterministic pseudo-permutations "
    "(md5 content-hash reassignments under distinct salts — rerun- "
    "and repartition-stable, never rand()), each arm split's exact "
    "integer conversion cells computed in ONE map-side-combined pass "
    "over the per-user rollup crossed with the bounded salt table; "
    "p = (1 + #{|d_perm| >= |d_obs|}) / (B + 1), the add-one "
    "permutation p-value. All comparisons on 9-dp-rounded shared-text "
    "rates. At 100 TB: one user-rollup shuffle, then a 65x map-side "
    "fan-out that combines straight back down to 65 cells",
    "analytics extension (permutation / randomization test)",
)
def events_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import HEX_DIGITS

    ev = load_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("conv")
    )
    arr = (
        "array("
        + ",".join(
            f"struct({i} AS perm, '{'ab' if i == 0 else f'perm{i}'}' AS salt)"
            for i in range(_PERM_B + 1)
        )
        + ")"
    )
    a = u.select(
        "user_id", "conv", F.explode(F.expr(arr)).alias("s")
    ).select(
        "user_id", "conv", F.col("s.perm").alias("perm"),
        F.col("s.salt").alias("salt"),
    )
    h = F.md5(F.concat(F.col("salt"), F.col("user_id").cast("string")))
    bucket = (
        (F.instr(F.lit(HEX_DIGITS), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(HEX_DIGITS), F.substring(h, 2, 1)) - 1)
    )
    is_t = F.when(bucket < 128, 1).otherwise(0)
    cells = (
        a.select("perm", is_t.alias("is_t"), "conv")
        .groupBy("perm")
        .agg(
            F.sum("is_t").cast("bigint").alias("nt"),
            F.sum(F.col("is_t") * F.col("conv")).cast("bigint").alias("ct"),
            F.sum(1 - F.col("is_t")).cast("bigint").alias("nc"),
            F.sum((1 - F.col("is_t")) * F.col("conv"))
            .cast("bigint")
            .alias("cc"),
        )
    )
    d = cells.select("perm", F.expr(_PERM_D).alias("d")).localCheckpoint(
        eager=True
    )  # two consumers: the observed scalar + the permutation arms
    obs = d.filter(F.col("perm") == 0).select(F.col("d").alias("d_obs"))
    cnt = (
        d.filter(F.col("perm") >= 1)
        .crossJoin(F.broadcast(obs))
        .groupBy("d_obs")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ge")
        )
    )
    return cnt.select(
        F.lit(_PERM_B).cast("bigint").alias("n_perms"),
        "d_obs",
        "n_ge",
        F.expr(_PERM_P).alias("p_value"),
    )


_LPA_ITERS = 4


def _o_lpa() -> str:
    """Unrolled synchronous label-propagation oracle: l{k} = per node
    the most frequent neighbor label from l{k-1} (count desc, label
    asc tie-break — fully deterministic). l0 = node id."""
    ctes = [
        _COPURCHASE_SMALL_SQL.strip(),
        "und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)",
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM und)",
    ]
    for k in range(1, _LPA_ITERS + 1):
        ctes.append(
            f"c{k} AS (SELECT u.src AS node, p.label, COUNT(*) AS cnt "
            f"FROM und u JOIN l{k - 1} p ON u.dst = p.node "
            f"GROUP BY u.src, p.label)"
        )
        ctes.append(
            f"l{k} AS (SELECT node, label FROM ("
            f"SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node "
            f"ORDER BY cnt DESC, label) AS rk FROM c{k}) WHERE rk = 1)"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM l{_LPA_ITERS} GROUP BY label
    ORDER BY n_nodes DESC, community LIMIT 20
    """
    )


@register(
    "graph_label_propagation",
    _o_lpa(),
    "community detection by synchronous label propagation (4 "
    "deterministic iterations: each node adopts its neighborhood's "
    "most frequent label, count-desc/label-asc tie-break) on the "
    "small-part co-purchase graph — the third iterative-algorithm "
    "family member beside PageRank and connected components: one "
    "edge-label join + one (node, label) count + one per-node argmax "
    "window per round, label frames localCheckpoint'd, all shuffles "
    "on node keys. Oracle = 4 unrolled CTE rounds. Top-20 community "
    "sizes",
    "analytics extension (label propagation / community detection)",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    # AQE scoped OFF for cluster-scale loops (the pagerank()/
    # connected_components pattern): with it on, the checkpointed
    # frames report UnknownPartitioning and every round re-shuffles the
    # full mirrored edge set; pinned on dst, the edge-label join needs
    # no exchange and each round shuffles only the (node, label) counts
    # + the per-node argmax window. Small edge sets keep adaptive
    # planning (broadcast label joins beat pinning there).
    from hangarbay_spark.operators.graph import (
        BCAST_EDGES,
        PIN_NODES,
        loop_partitions,
    )

    und0 = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    n_und = und0.count()  # one cheap job over the materialized checkpoint
    # Regime switch on edge count (graph.LOOP_KERNEL_MAX_EDGES): tiny
    # graphs replay all 4 synchronous rounds in ONE Arrow task — exact
    # integer counts, identical count-desc/label-asc tie-break
    # (equivalence pinned by test_small_graph_loop_kernels_match_loops).
    from hangarbay_spark.operators.graph import (
        LOOP_KERNEL_MAX_EDGES,
        lpa_labels_kernel,
    )

    if n_und <= LOOP_KERNEL_MAX_EDGES:
        return (
            lpa_labels_kernel(und0, _LPA_ITERS)
            .groupBy(F.col("label").alias("community"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
            .orderBy(F.col("n_nodes").desc(), "community")
            .limit(20)
        )
    labels0 = und0.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # Regime switch on NODE count (graph.PIN_NODES): broadcastable
    # label vector -> adaptive planning; beyond -> pinned AQE-off loop.
    n_nodes = labels0.count()
    pin = n_nodes > PIN_NODES
    prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    if pin:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        if pin:
            p = loop_partitions(n_und, spark)
            und = (
                und0.repartition(p, "dst")
                .sortWithinPartitions("dst")
                .localCheckpoint(eager=True)
            )
        else:
            und = und0
        labels = labels0.localCheckpoint(eager=False)
        w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), "label")
        # The explode-derived edge checkpoint carries a tiny origin
        # size estimate, so in the adaptive regime the planner
        # broadcasts the STATIC edge frame — built once, reused by all
        # rounds, measured faster here than re-broadcasting the
        # changing label vector each round (A/B at sf0.1: 1.75 s vs
        # 2.79 s hinted). That accident is only safe while the edge
        # frame truly fits a broadcast: beyond graph.BCAST_EDGES rows
        # the label vector (proven <= PIN_NODES) must be the hinted
        # side instead (guide §3.1).
        hint_labels = (not pin) and n_und > BCAST_EDGES
        for _ in range(_LPA_ITERS):
            lab_dst = labels.withColumnRenamed("node", "dst")
            if hint_labels:
                lab_dst = F.broadcast(lab_dst)
            nbr = und.join(lab_dst, "dst").select(
                F.col("src").alias("node"), "label"
            )
            counts = nbr.groupBy("node", "label").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            labels = (
                counts.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .select("node", "label")
                .localCheckpoint(eager=False)
            )
        return (
            labels.groupBy(F.col("label").alias("community"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
            .orderBy(F.col("n_nodes").desc(), "community")
            .limit(20)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)


# Shared rule-metric formulas (identical text both engines — the
# _stats_formula_sql convention): all inputs are exact integer counts,
# so the single divide/multiply chain is the only float arithmetic and
# runs in the same IEEE order; 9 dp round guards the residual ulp.
_AR_CONF = "round(CAST(nab AS DOUBLE) / CAST(na AS DOUBLE), 9)"
_AR_LIFT = (
    "round((CAST(nab AS DOUBLE) * CAST(n_orders AS DOUBLE)) / "
    "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9)"
)


@register(
    "analytics_association_rules",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM li),
    ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM li GROUP BY l_partkey),
    pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  CAST(COUNT(*) AS BIGINT) AS nab
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey
           HAVING COUNT(*) >= 3),
    j AS (SELECT part_a, part_b, nab, ia.cnt AS na, ib.cnt AS nb, n_orders
          FROM pr JOIN ic ia ON ia.l_partkey = part_a
                  JOIN ic ib ON ib.l_partkey = part_b
                  CROSS JOIN n)
    SELECT part_a, part_b, nab,
           {_AR_CONF} AS confidence,
           {_AR_LIFT} AS lift
    FROM j
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
    "market-basket association rules (the classic co-occurrence "
    "mining workload): orders are baskets, pair support counted from "
    "one a<b self-join of the deduped (order, part) projection — the "
    "same bounded per-basket expansion as the co-purchase graph, "
    "never an all-pairs item join — then confidence and lift from "
    "exact integer supports via one shared formula text. Top-20 by "
    "lift with a support floor; the 1-row basket-count scalar is the "
    "only broadcast",
    "analytics extension (association rules / market-basket mining)",
)
def analytics_association_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Four consumers (basket count, item supports, both self-join
    # sides) — checkpoint once (multiple-consumer invariant, CLAUDE.md)
    # or each re-derives the dedup from the scan.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    ic = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    pr = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
        .filter(F.col("nab") >= 3)
    )
    j = (
        pr.join(
            ic.select(
                F.col("l_partkey").alias("part_a"), F.col("cnt").alias("na")
            ),
            "part_a",
        )
        .join(
            ic.select(
                F.col("l_partkey").alias("part_b"), F.col("cnt").alias("nb")
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        j.select(
            "part_a",
            "part_b",
            "nab",
            F.expr(_AR_CONF).alias("confidence"),
            F.expr(_AR_LIFT).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


# Shared chi-square cell-contribution formula — the SAME text is
# compiled by Spark (F.expr) and DuckDB so every IEEE op runs in the
# same order (the _stats_formula_sql precedent); per-cell round(6)
# guards FMA-contraction drift, and the cell contributions are then
# summed EXACTLY as decimals (15 cells, but the discipline is what
# makes the number engine-independent at any cell count).
_CHISQ_CELL = "round(power(obs - rn * cn / nd, 2) / (rn * cn / nd), 6)"


@register(
    "agg_chisq_priority_status",
    f"""
    WITH o AS (SELECT o_orderpriority AS pr, o_orderstatus AS st FROM orders),
    cells AS (SELECT pr, st, CAST(COUNT(*) AS DOUBLE) AS obs
              FROM o GROUP BY pr, st),
    rt AS (SELECT pr, CAST(COUNT(*) AS DOUBLE) AS rn FROM o GROUP BY pr),
    ct AS (SELECT st, CAST(COUNT(*) AS DOUBLE) AS cn FROM o GROUP BY st),
    g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
                 CAST(COUNT(DISTINCT pr) AS BIGINT) AS npr,
                 CAST(COUNT(DISTINCT st) AS BIGINT) AS nst
          FROM o)
    SELECT CAST(SUM(CAST({_CHISQ_CELL} AS DECIMAL(30,6))) AS DOUBLE) AS chi2,
           MAX((npr - 1) * (nst - 1)) AS dof,
           CAST(MAX(nd) AS BIGINT) AS n_orders
    FROM cells JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN g
    """,
    "chi-square test of independence between two categoricals "
    "(order priority x order status): observed cell counts, marginals "
    "and the grand total are separate exact-integer aggregations of "
    "ONE scan (three map-side-combined groupBys of a 2-column "
    "projection); expected counts and the (O-E)^2/E statistic are "
    "computed per CELL (bounded: |priorities| x |statuses| rows, never "
    "corpus-scale), so the only data-sized work is the counting. Cell "
    "contributions share one formula text on both engines and are "
    "decimal-summed exactly. The 1-row grand-total crossJoin is the "
    "allowlisted bounded-scalar broadcast shape",
    "2.4 extension (categorical association / independence testing)",
)
def agg_chisq_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pr"), F.col("o_orderstatus").alias("st")
    )
    cells = o.groupBy("pr", "st").agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    )
    rt = o.groupBy("pr").agg(F.count(F.lit(1)).cast("double").alias("rn"))
    ct = o.groupBy("st").agg(F.count(F.lit(1)).cast("double").alias("cn"))
    g = o.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.countDistinct("pr").cast("bigint").alias("npr"),
        F.countDistinct("st").cast("bigint").alias("nst"),
    )
    j = (
        cells.join(F.broadcast(rt), "pr")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(g))
    )
    return j.agg(
        F.sum(F.expr(_CHISQ_CELL).cast("decimal(30,6)"))
        .cast("double")
        .alias("chi2"),
        F.max((F.col("npr") - 1) * (F.col("nst") - 1)).alias("dof"),
        F.max("nd").cast("bigint").alias("n_orders"),
    )


@register(
    "agg_equidepth_histogram",
    """
    WITH d AS (SELECT l_extendedprice AS p, CAST(COUNT(*) AS BIGINT) AS c,
                      CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS g
               FROM lineitem GROUP BY 1, 3),
    b AS (SELECT g, CAST(SUM(c) AS BIGINT) AS bc FROM d GROUP BY g),
    o AS (SELECT g,
                 CAST(COALESCE(SUM(bc) OVER (ORDER BY g
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS goff,
                 CAST(SUM(bc) OVER () AS BIGINT) AS n
          FROM b),
    r AS (SELECT p, c,
                 goff + CAST(COALESCE(SUM(c) OVER (PARTITION BY d.g
                   ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cb,
                 n
          FROM d JOIN o USING (g))
    SELECT CAST(cb * 8 // n AS BIGINT) AS bucket,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           MIN(p) AS lo, MAX(p) AS hi
    FROM r GROUP BY 1 ORDER BY 1
    """,
    "equi-depth (quantile-binned) histogram of extended price, 8 "
    "buckets, VALUE-ATOMIC (every copy of a value lands in one bucket: "
    "bucket = floor(8 * rows_before(v) / n), exact integer division "
    "both engines — unlike NTILE, which splits ties by row order and "
    "would single-partition-sort the whole table). rows_before is an "
    "exact DISTRIBUTED prefix sum: distinct (price, count) pairs hash "
    "out of one map-side-combined groupBy; a coarse VALUE-GRID bin "
    "(floor(p/1000) — bounded by the generator's fixed price range, "
    "~110 bins at ANY scale, and monotone in p since IEEE divide and "
    "floor are monotone) splits the cumulative into a parallel "
    "within-bin window plus a ~110-row bin-offset pass — the classic "
    "two-level scan; the fact table is never sorted through one "
    "partition. The nearly-unique price domain (~97% of rows survive "
    "the distinct) is exactly the case that breaks both NTILE and a "
    "global domain window",
    "2.4 extension (equi-depth histogram / quantile binning)",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.col("l_extendedprice").alias("p"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("g"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    b = d.groupBy("g").agg(F.sum("c").cast("bigint").alias("bc"))
    wg = Window.orderBy("g")
    o = b.select(
        "g",
        F.coalesce(
            F.sum("bc").over(wg.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("goff"),
        F.sum("bc")
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("n"),
    )
    wp = Window.partitionBy("g").orderBy("p")
    r = d.join(F.broadcast(o), "g").select(
        "p",
        "c",
        (
            F.col("goff")
            + F.coalesce(
                F.sum("c").over(
                    wp.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint")
        ).alias("cb"),
        "n",
    )
    return (
        r.select(
            F.expr("CAST(cb * 8 div n AS BIGINT)").alias("bucket"), "p", "c"
        )
        .groupBy("bucket")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.min("p").alias("lo"),
            F.max("p").alias("hi"),
        )
        .orderBy("bucket")
    )


_BFS_HOPS = 4
_BFS_SEEDS = 3


def _o_bfs() -> str:
    """Unrolled multi-source BFS oracle: f{k} = nodes first reached at
    hop k (reachable from f{k-1}, not already in d{k-1}); d{k} accumulates
    (node, dist). Seeds = the 3 smallest node ids (deterministic)."""
    ctes = [
        _COPURCHASE_SMALL_SQL.strip(),
        "und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)",
        f"f0 AS (SELECT DISTINCT src AS node FROM und "
        f"ORDER BY node LIMIT {_BFS_SEEDS})",
        "d0 AS (SELECT node, 0 AS dist FROM f0)",
    ]
    for k in range(1, _BFS_HOPS + 1):
        ctes.append(
            f"f{k} AS (SELECT DISTINCT u.dst AS node "
            f"FROM und u JOIN f{k - 1} p ON u.src = p.node "
            f"WHERE NOT EXISTS (SELECT 1 FROM d{k - 1} v "
            f"WHERE v.node = u.dst))"
        )
        ctes.append(
            f"d{k} AS (SELECT node, dist FROM d{k - 1} "
            f"UNION ALL SELECT node, {k} AS dist FROM f{k})"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT CAST(dist AS BIGINT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM d{_BFS_HOPS} GROUP BY dist ORDER BY dist
    """
    )


@register(
    "graph_bfs_hops",
    _o_bfs(),
    "multi-source BFS hop distances (4 rounds from the 3 smallest "
    "node ids) on the small-part co-purchase graph — the shortest-"
    "path family member beside PageRank / components / label "
    "propagation: per round ONE edge-frontier join produces the next "
    "frontier and an anti-join against the visited set keeps it "
    "minimal, so per-round work is proportional to the frontier's "
    "out-edges, never the whole graph; frontier and visited frames "
    "localCheckpoint per round (lineage stays flat across "
    "iterations). Frontier/visited joins broadcast while bounded "
    "(AQE's call; the PIN_NODES pinned-partitioning regime from "
    "operators/graph.py applies when the visited vector outgrows "
    "broadcast). Oracle = 4 unrolled frontier CTEs. Output: hop "
    "histogram with per-level min node id",
    "analytics extension (multi-source BFS / shortest hops)",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    # Regime switch on edge count (graph.LOOP_KERNEL_MAX_EDGES): tiny
    # graphs replay the bounded BFS in ONE Arrow task — exact integers
    # (equivalence pinned by test_small_graph_loop_kernels_match_loops).
    from hangarbay_spark.operators.graph import (
        LOOP_KERNEL_MAX_EDGES,
        bfs_dist_kernel,
    )

    if und.count() <= LOOP_KERNEL_MAX_EDGES:
        return (
            bfs_dist_kernel(und, _BFS_SEEDS, _BFS_HOPS)
            .groupBy("dist")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                F.min("node").cast("bigint").alias("min_node"),
            )
            .select(
                F.col("dist").cast("bigint").alias("dist"),
                "n_nodes",
                "min_node",
            )
            .orderBy("dist")
        )
    seeds = (
        und.select("src").distinct().orderBy("src").limit(_BFS_SEEDS)
        .select(F.col("src").alias("node"))
    )
    visited = seeds.select(
        "node", F.lit(0).alias("dist")
    ).localCheckpoint(eager=True)
    frontier = seeds.localCheckpoint(eager=True)
    for k in range(1, _BFS_HOPS + 1):
        nxt = (
            und.join(frontier, und["src"] == frontier["node"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(
            nxt.select("node", F.lit(k).alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return (
        visited.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("node").cast("bigint").alias("min_node"),
        )
        .select(F.col("dist").cast("bigint").alias("dist"), "n_nodes", "min_node")
        .orderBy("dist")
    )


_SSSP_ROUNDS = 4
_SSSP_SEEDS = 3
# co-purchase affinity distance: frequently co-bought pairs are CLOSE
# (w = 11 - min(multiplicity, 10) in [1, 10]) — exact integers, so the
# whole relaxation is oracle-checkable without float discipline
_SSSP_W = "CAST(11 - least(COUNT(*), 10) AS BIGINT)"


def _o_sssp() -> str:
    """Unrolled Bellman-Ford oracle: d{k} = min over (carry d{k-1},
    one-edge relaxation from d{k-1}) — exactly the Spark loop's
    union + min-groupBy round, so distances match integer-exactly."""
    ctes = [
        """li AS (SELECT DISTINCT l.l_orderkey, l.l_partkey
           FROM lineitem l JOIN part p
             ON l.l_partkey = p.p_partkey AND p.p_size <= 5)""",
        f"""ew AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
                  {_SSSP_W} AS w
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2)""",
        "und AS (SELECT src, dst, w FROM ew "
        "UNION ALL SELECT dst, src, w FROM ew)",
        f"d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM "
        f"(SELECT DISTINCT src AS node FROM und "
        f"ORDER BY node LIMIT {_SSSP_SEEDS}))",
    ]
    for k in range(1, _SSSP_ROUNDS + 1):
        ctes.append(
            f"d{k} AS (SELECT node, MIN(dist) AS dist FROM ("
            f"SELECT node, dist FROM d{k - 1} "
            f"UNION ALL "
            f"SELECT u.dst AS node, p.dist + u.w AS dist "
            f"FROM und u JOIN d{k - 1} p ON u.src = p.node) GROUP BY node)"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
    FROM d{_SSSP_ROUNDS} ORDER BY node
    """
    )


@register(
    "graph_weighted_sssp",
    _o_sssp(),
    f"weighted single-source shortest paths ({_SSSP_ROUNDS} "
    "Bellman-Ford rounds from the 3 smallest node ids) on the "
    "co-purchase graph with affinity distances (w = 11 - "
    "min(multiplicity, 10): frequently co-bought parts are CLOSE — "
    "the recommendation-distance metric). Every round is ONE edge "
    "relaxation join + a min-groupBy that Catalyst partial-aggregates "
    "map-side; the distance frame localCheckpoints per round (flat "
    "lineage, the BFS/PageRank loop discipline). All-integer weights "
    "make the full relaxation oracle-checkable — the unrolled CTE "
    "twin replays the identical carry+relax+min rounds. Bounded "
    f"rounds = {_SSSP_ROUNDS}-hop-bounded distances, the standard "
    "anytime cut for power-law graphs where full convergence chases "
    "the long tail",
    "analytics extension (weighted shortest paths / Bellman-Ford)",
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    li = li.join(
        part.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    ).distinct()
    ew = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.expr(_SSSP_W).alias("w"))
    )
    und = ew.unionByName(
        ew.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    ).localCheckpoint(eager=True)
    # Regime switch on edge count (graph.LOOP_KERNEL_MAX_EDGES): tiny
    # graphs replay the bounded Bellman-Ford rounds in ONE Arrow task
    # (equivalence pinned by test_small_graph_loop_kernels_match_loops).
    from hangarbay_spark.operators.graph import (
        LOOP_KERNEL_MAX_EDGES,
        sssp_dist_kernel,
    )

    if und.count() <= LOOP_KERNEL_MAX_EDGES:
        return (
            sssp_dist_kernel(und, _SSSP_SEEDS, _SSSP_ROUNDS)
            .select(
                F.col("node").cast("bigint").alias("node"),
                F.col("dist").cast("bigint").alias("dist"),
            )
            .orderBy("node")
        )
    dist = (
        und.select("src").distinct().orderBy("src").limit(_SSSP_SEEDS)
        .select(
            F.col("src").alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(_SSSP_ROUNDS):
        relax = und.join(dist, und["src"] == dist["node"]).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("dist").cast("bigint").alias("dist"),
    ).orderBy("node")


_PLC_HOPS = 4
_PLC_SEEDS = 3


def _o_path_load() -> str:
    """Unrolled Brandes-style oracle: forward levels l{k} carry exact
    (all levels MATERIALIZED — DuckDB otherwise inlines the
    multi-referenced a{k}/l{k} chains and the expansion goes
    superlinear: 144 s -> 0.8 s at sf0.01, identical rows)
    shortest-path counts sigma (sum over level-(k-1) predecessors),
    backward levels c{k} carry tail counts (1 + sum over level-(k+1)
    successors) — the same two sweeps the Spark loops run."""
    ctes = [
        _COPURCHASE_SMALL_SQL.strip(),
        "und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)",
        f"l0 AS (SELECT node AS seed, node, 0 AS dist, "
        f"CAST(1 AS BIGINT) AS sigma FROM "
        f"(SELECT DISTINCT src AS node FROM und "
        f"ORDER BY node LIMIT {_PLC_SEEDS}))",
        "a0 AS (SELECT seed, node FROM l0)",
    ]
    for k in range(1, _PLC_HOPS + 1):
        ctes.append(
            f"l{k} AS MATERIALIZED (SELECT seed, node, {k} AS dist, sigma FROM ("
            f"SELECT p.seed AS seed, u.dst AS node, "
            f"CAST(SUM(p.sigma) AS BIGINT) AS sigma "
            f"FROM und u JOIN l{k - 1} p ON u.src = p.node "
            f"WHERE NOT EXISTS (SELECT 1 FROM a{k - 1} v "
            f"WHERE v.seed = p.seed AND v.node = u.dst) "
            f"GROUP BY 1, 2) t)"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT seed, node FROM a{k - 1} "
            f"UNION ALL SELECT seed, node FROM l{k})"
        )
    ctes.append(
        f"c{_PLC_HOPS} AS MATERIALIZED (SELECT seed, node, CAST(1 AS BIGINT) AS c "
        f"FROM l{_PLC_HOPS})"
    )
    for k in range(_PLC_HOPS - 1, -1, -1):
        ctes.append(
            f"c{k} AS MATERIALIZED (SELECT v.seed, v.node, "
            f"CAST(1 + COALESCE(SUM(c.c), 0) AS BIGINT) AS c "
            f"FROM l{k} v "
            f"LEFT JOIN und u ON u.src = v.node "
            f"LEFT JOIN c{k + 1} c ON c.seed = v.seed AND c.node = u.dst "
            f"GROUP BY 1, 2)"
        )
    lall = " UNION ALL ".join(
        f"SELECT * FROM l{k}" for k in range(1, _PLC_HOPS + 1)
    )
    call = " UNION ALL ".join(
        f"SELECT * FROM c{k}" for k in range(_PLC_HOPS + 1)
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f""",
    lall AS ({lall}),
    call AS ({call})
    SELECT CAST(l.node AS BIGINT) AS node,
           CAST(SUM(l.sigma * c.c) AS BIGINT) AS path_load
    FROM lall l JOIN call c ON c.seed = l.seed AND c.node = l.node
    GROUP BY 1
    ORDER BY path_load DESC, node
    LIMIT 20
    """
    )


@register(
    "graph_path_load_centrality",
    _o_path_load(),
    f"shortest-path LOAD centrality (the integer path-count variant "
    f"of Brandes 2001's betweenness accumulation): from the "
    f"{_PLC_SEEDS} smallest seeds, a forward BFS sweep computes exact "
    f"shortest-path counts sigma(s,v) level by level (sum over "
    f"level-(k-1) predecessors — the BFS DAG), a backward sweep "
    f"computes tail counts C(v) = 1 + sum over level-(k+1) successors, "
    f"and load(v) = sigma*C counts every {_PLC_HOPS}-hop-bounded "
    "shortest-path instance through v. Staying with PATH COUNTS "
    "instead of Brandes' fractional dependencies keeps the whole "
    "computation in exact integers — fully hash-verifiable, no float "
    "discipline. Per level: ONE edge-frontier join + a map-side-"
    "combined sum, frames checkpointed per round (the BFS/SSSP loop "
    "shape); the backward sweep reuses the same checkpointed edge "
    "set. Output: top-20 load-bearing nodes — the bridge parts of the "
    "co-purchase graph",
    "analytics extension (shortest-path load centrality)",
)
def graph_path_load_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    # Regime switch on edge count (graph.LOOP_KERNEL_MAX_EDGES): tiny
    # graphs replay both bounded-hop sweeps (forward sigma, backward
    # tail counts) in ONE Arrow task — exact integers throughout
    # (equivalence pinned by test_small_graph_loop_kernels_match_loops).
    from hangarbay_spark.operators.graph import (
        LOOP_KERNEL_MAX_EDGES,
        plc_kernel,
    )

    if und.count() <= LOOP_KERNEL_MAX_EDGES:
        return (
            plc_kernel(und, _PLC_SEEDS, _PLC_HOPS)
            .orderBy(F.desc("path_load"), "node")
            .limit(20)
            .select(
                F.col("node").cast("bigint").alias("node"), "path_load"
            )
        )
    seeds = (
        und.select("src").distinct().orderBy("src").limit(_PLC_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    l0 = seeds.select(
        "seed",
        F.col("seed").alias("node"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint(eager=True)
    levels = [l0]
    visited = l0.select("seed", "node").localCheckpoint(eager=True)
    # The explode-derived edge checkpoint carries a tiny origin size
    # estimate, so the planner broadcasts the STATIC edge frame — built
    # once, reused by every sweep join, measured faster here than
    # re-broadcasting the changing frontier each hop (A/B at sf0.1:
    # 2.79 s vs 3.96 s hinted). Only safe while the edge frame truly
    # fits a broadcast: beyond graph.BCAST_EDGES rows the frontier
    # (at most _PLC_SEEDS rows per node) must be the hinted side
    # instead (guide §3.1).
    from hangarbay_spark.operators.graph import BCAST_EDGES

    hint_frontier = und.count() > BCAST_EDGES

    def _hint(df):
        return F.broadcast(df) if hint_frontier else df

    for k in range(1, _PLC_HOPS + 1):
        prev = _hint(levels[-1])
        nxt = (
            und.join(prev, und["src"] == prev["node"])
            .select("seed", F.col("dst").alias("node"), "sigma")
            .groupBy("seed", "node")
            .agg(F.sum("sigma").cast("bigint").alias("sigma"))
            .join(visited, ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(k).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        levels.append(nxt)
        visited = visited.unionByName(
            nxt.select("seed", "node")
        ).localCheckpoint(eager=True)
    # backward tail-count sweep over the same checkpointed edge set
    c = levels[_PLC_HOPS].select(
        "seed", "node", F.lit(1).cast("bigint").alias("c")
    ).localCheckpoint(eager=True)
    tails = [c]
    for k in range(_PLC_HOPS - 1, -1, -1):
        contrib = (
            und.alias("u")
            .join(_hint(c.alias("cc")), F.col("u.dst") == F.col("cc.node"))
            .groupBy(
                F.col("cc.seed").alias("seed"), F.col("u.src").alias("node")
            )
            .agg(F.sum("cc.c").alias("sc"))
        )
        c = (
            levels[k]
            .select("seed", "node")
            .join(contrib, ["seed", "node"], "left")
            .select(
                "seed",
                "node",
                (F.lit(1) + F.coalesce("sc", F.lit(0)))
                .cast("bigint")
                .alias("c"),
            )
            .localCheckpoint(eager=True)
        )
        tails.append(c)
    lall = levels[1]
    for lv in levels[2:]:
        lall = lall.unionByName(lv)
    call = tails[0]
    for tv in tails[1:]:
        call = call.unionByName(tv)
    return (
        lall.join(call, ["seed", "node"])
        .groupBy("node")
        .agg(
            F.sum(F.col("sigma") * F.col("c"))
            .cast("bigint")
            .alias("path_load")
        )
        .orderBy(F.desc("path_load"), "node")
        .limit(20)
        .select(F.col("node").cast("bigint").alias("node"), "path_load")
    )


@register(
    "agg_revenue_concentration",
    f"""
    WITH s AS (SELECT l_suppkey,
                      CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(30,4))) AS DECIMAL(30,4))
                        AS rev
               FROM lineitem GROUP BY l_suppkey),
    g AS (SELECT CAST(SUM(rev) AS DECIMAL(30,4)) AS total FROM s),
    t AS (SELECT l_suppkey, rev FROM s
          ORDER BY rev DESC, l_suppkey LIMIT 20),
    r AS (SELECT l_suppkey, rev,
                 ROW_NUMBER() OVER (ORDER BY rev DESC, l_suppkey) AS rk,
                 SUM(rev) OVER (ORDER BY rev DESC, l_suppkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM t)
    SELECT CAST(rk AS BIGINT) AS rk, l_suppkey,
           CAST(rev AS DOUBLE) AS revenue,
           round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS cum_share
    FROM r CROSS JOIN g ORDER BY rk
    """,
    "revenue CONCENTRATION (Pareto) report: top-20 suppliers by "
    "revenue with each one's cumulative share of the total — the "
    "80/20 diagnosis behind partner tiering and skew planning. "
    "Revenue aggregates exactly in decimals; the top-20 comes off the "
    "supplier aggregate via TakeOrderedAndProject (k rows per "
    "partition, no global sort of the supplier domain — suppliers "
    "grow with SF, so a global rank window would not hold at 100x), "
    "the total is a 1-row exact-decimal scalar (allowlisted bounded "
    "broadcast), and the rank/cumulative window runs over the 20-row "
    "frame only. Deterministic tie-break on the key",
    "2.4/2.5 extension (Pareto concentration / cumulative share)",
)
def agg_revenue_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,4)"
            )
        )
        .cast("decimal(30,4)")
        .alias("rev")
    ).localCheckpoint()  # feeds both the scalar total and the top-20
    g = s.agg(F.sum("rev").cast("decimal(30,4)").alias("total"))
    t = s.orderBy(F.col("rev").desc(), "l_suppkey").limit(20)
    w = Window.orderBy(F.col("rev").desc(), "l_suppkey")
    r = t.select(
        "l_suppkey",
        "rev",
        F.row_number().over(w).alias("rk"),
        F.sum("rev")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    return (
        r.crossJoin(F.broadcast(g))
        .select(
            F.col("rk").cast("bigint").alias("rk"),
            "l_suppkey",
            F.col("rev").cast("double").alias("revenue"),
            F.round(
                F.col("cum").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Negative sampling for link prediction
# ---------------------------------------------------------------------------

_NEG_NB = 64  # index buckets: only the 64-row offset frame is sorted globally

from hangarbay_spark.queries.relational import _o_kmv_hashval as _o_h48

# 48-bit content hash of the probe key 'neg<j>:<node>' (KMV hash
# construction — exact integer arithmetic on both engines).
_NEG_H = _o_h48("'neg' || CAST(j AS VARCHAR) || ':' || CAST(node AS VARCHAR)")


@register(
    "graph_negative_sampling",
    f"""
    WITH {_COPURCHASE_SMALL_SQL},
    nodes AS (SELECT DISTINCT node FROM
                (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u),
    nb AS (SELECT node, node % {_NEG_NB} AS b FROM nodes),
    rk AS (SELECT node, b,
                  ROW_NUMBER() OVER (PARTITION BY b ORDER BY node) AS r
           FROM nb),
    sz AS (SELECT b, COUNT(*) AS cnt FROM nb GROUP BY b),
    off0 AS (SELECT b, cnt,
                    SUM(cnt) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                      PRECEDING AND 1 PRECEDING) AS off_raw
             FROM sz),
    off AS (SELECT b, COALESCE(off_raw, 0) AS off_b,
                   SUM(cnt) OVER () AS n
            FROM off0),
    idx AS (SELECT rk.node, off.off_b + rk.r - 1 AS idx, off.n
            FROM rk JOIN off USING (b)),
    pr AS (SELECT node, n, j FROM idx
           CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) js),
    ph AS (SELECT node, j,
                  ({_NEG_H}) % n AS tidx
           FROM pr),
    cand AS (SELECT p.node, p.j, t.node AS neg_node
             FROM ph p JOIN idx t ON p.tidx = t.idx
             WHERE t.node <> p.node),
    cl AS (SELECT node, j, neg_node,
                  LEAST(node, neg_node) AS lo,
                  GREATEST(node, neg_node) AS hi
           FROM cand)
    SELECT CAST(node AS BIGINT) AS node, CAST(j AS BIGINT) AS j,
           CAST(neg_node AS BIGINT) AS neg_node
    FROM cl
    WHERE NOT EXISTS (SELECT 1 FROM e
                      WHERE e.src = cl.lo AND e.dst = cl.hi)
    """,
    "deterministic negative sampling for link-prediction training "
    "data: each co-purchase node draws 3 pseudo-random candidate "
    "partners by 48-bit content hash into a dense node index, then "
    "true edges are anti-joined away. The dense index is built "
    "DISTRIBUTED (per-bucket row_number + a 64-row bucket-offset "
    "prefix — the equidepth-histogram trick; the node domain is never "
    "globally sorted), candidate lookup is an integer equi-join, and "
    "the edge filter is a left-anti hash join: every corpus-scale step "
    "shuffles on integer keys",
    "analytics extension (graph negative sampling for training data)",
)
def graph_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.queries.relational import _kmv_hashval_col

    e = _copurchase_small(spark, sf_dir)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("b", F.col("node") % _NEG_NB)
    )
    rk = nodes.withColumn(
        "r",
        F.row_number().over(Window.partitionBy("b").orderBy("node")),
    )
    sz = nodes.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    off0 = sz.withColumn(
        "off_raw",
        F.sum("cnt").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    off = off0.select(
        "b",
        F.coalesce(F.col("off_raw"), F.lit(0)).alias("off_b"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    idx = (
        rk.join(F.broadcast(off), "b")
        .select(
            "node", (F.col("off_b") + F.col("r") - 1).alias("idx"), "n"
        )
        .localCheckpoint()  # probe source AND lookup target (2 consumers)
    )
    ph = (
        idx.select(
            "node",
            "n",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        )
        .withColumn(
            "h",
            _kmv_hashval_col(
                F.concat(F.lit("neg"), F.col("j"), F.lit(":"), F.col("node"))
            ),
        )
        .select("node", "j", (F.col("h") % F.col("n")).alias("tidx"))
    )
    cand = (
        ph.join(
            idx.select(
                F.col("idx").alias("tidx"), F.col("node").alias("neg_node")
            ),
            "tidx",
        )
        .filter(F.col("neg_node") != F.col("node"))
        .select(
            "node",
            "j",
            "neg_node",
            F.least("node", "neg_node").alias("lo"),
            F.greatest("node", "neg_node").alias("hi"),
        )
    )
    neg = cand.join(
        e.select(F.col("src").alias("lo"), F.col("dst").alias("hi")),
        ["lo", "hi"],
        "left_anti",
    )
    return neg.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("j").cast("bigint").alias("j"),
        F.col("neg_node").cast("bigint").alias("neg_node"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

# Per-user conditional decimal sums (x = pre-period covariate, y =
# experiment-period metric) — one text, both engines. x and y are sums
# of 2 dp values, so x*y / x*x / y*y are 4 dp-exact and the
# DECIMAL(30,4) cast of the double product is far above the noise
# floor (base.py dsum rule).
_CUPED_USER = {
    "y": (
        "CAST(COALESCE(SUM(CASE WHEN d >= cut THEN"
        " CAST(value AS DECIMAL(30,4)) END), 0) AS DOUBLE)"
    ),
    "x": (
        "CAST(COALESCE(SUM(CASE WHEN d < cut THEN"
        " CAST(value AS DECIMAL(30,4)) END), 0) AS DOUBLE)"
    ),
}
_CUPED_MOMENTS = {
    "n": "CAST(COUNT(*) AS DOUBLE)",
    "sx": "CAST(SUM(CAST(x AS DECIMAL(30,4))) AS DOUBLE)",
    "sy": "CAST(SUM(CAST(y AS DECIMAL(30,4))) AS DOUBLE)",
    "sxy": "CAST(SUM(CAST(x * y AS DECIMAL(30,4))) AS DOUBLE)",
    "sxx": "CAST(SUM(CAST(x * x AS DECIMAL(30,4))) AS DOUBLE)",
    "syy": "CAST(SUM(CAST(y * y AS DECIMAL(30,4))) AS DOUBLE)",
    "na": "CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS DOUBLE)",
    "nb": "CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS DOUBLE)",
    "sxa": (
        "CAST(SUM(CASE WHEN arm = 'A' THEN CAST(x AS DECIMAL(30,4))"
        " END) AS DOUBLE)"
    ),
    "sya": (
        "CAST(SUM(CASE WHEN arm = 'A' THEN CAST(y AS DECIMAL(30,4))"
        " END) AS DOUBLE)"
    ),
    "sxb": (
        "CAST(SUM(CASE WHEN arm = 'B' THEN CAST(x AS DECIMAL(30,4))"
        " END) AS DOUBLE)"
    ),
    "syb": (
        "CAST(SUM(CASE WHEN arm = 'B' THEN CAST(y AS DECIMAL(30,4))"
        " END) AS DOUBLE)"
    ),
}
# theta = cov(x,y)/var(x) with a degenerate-variance guard (the
# events_seasonal_outliers lesson: guard identically on both engines).
_CUPED_THETA = (
    "CASE WHEN sxx - sx * sx / n > 0.0"
    " THEN round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)"
    " ELSE 0.0 END"
)
_CUPED_FORMULAS = {
    "mean_y_a": "round(sya / na, 6)",
    "mean_y_b": "round(syb / nb, 6)",
    "cuped_a": (
        f"round(sya / na - ({_CUPED_THETA}) * (sxa / na - sx / n), 6)"
    ),
    "cuped_b": (
        f"round(syb / nb - ({_CUPED_THETA}) * (sxb / nb - sx / n), 6)"
    ),
    "theta": _CUPED_THETA,
    "rho2": (
        "CASE WHEN sxx - sx * sx / n > 0.0 AND syy - sy * sy / n > 0.0"
        " THEN round(((sxy - sx * sy / n) * (sxy - sx * sy / n))"
        " / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)"
        " ELSE 0.0 END"
    ),
}


def _o_cuped() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    user_sel = ",\n             ".join(
        f"{t} AS {a}" for a, t in _CUPED_USER.items()
    )
    mom_sel = ",\n             ".join(
        f"{t} AS {a}" for a, t in _CUPED_MOMENTS.items()
    )
    out_sel = ",\n           ".join(
        f"{t} AS {a}" for a, t in _CUPED_FORMULAS.items()
    )
    return f"""
    WITH base AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value
      FROM events WHERE event_type = 'purchase'),
    mx AS (SELECT MAX(d) - 6 AS cut FROM base),
    u AS (
      SELECT user_id,
             CASE WHEN {o_hash_bucket("user_id", "ab")} < 128
                  THEN 'A' ELSE 'B' END AS arm,
             {user_sel}
      FROM base CROSS JOIN mx
      GROUP BY user_id, arm),
    m AS (SELECT {mom_sel} FROM u)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           {out_sel}
    FROM m
    """


@register(
    "events_ab_cuped",
    _o_cuped(),
    "CUPED variance-reduced A/B readout (Deng et al. 2013): per-user "
    "experiment-period metric y (trailing 7 days) and pre-period "
    "covariate x, theta = cov(x,y)/var(x) from pooled exact decimal "
    "moments, arm means adjusted by theta*(mean_x_arm - mean_x); rho2 "
    "reports the variance fraction CUPED removes. One user-keyed "
    "map-side-combined pass builds (x, y), one 1-row moment "
    "aggregation, all formulas shared text with degenerate-variance "
    "guards — the standard trick that cuts experiment runtimes ~50% "
    "when pre-period behavior predicts the metric",
    "analytics extension (CUPED covariate-adjusted experiment readout)",
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr
    from hangarbay_spark.queries.base import load_events

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    base = ev.select(
        "user_id", F.to_date("ts").alias("d"), "value"
    )
    mx = base.agg(F.expr("date_sub(MAX(d), 6)").alias("cut"))
    u = (
        base.crossJoin(F.broadcast(mx))
        .groupBy(
            "user_id",
            F.when(hash_bucket_expr("user_id", "ab") < 128, "A")
            .otherwise("B")
            .alias("arm"),
        )
        .agg(
            *[F.expr(t).alias(a) for a, t in _CUPED_USER.items()]
        )
    )
    m = u.agg(*[F.expr(t).alias(a) for a, t in _CUPED_MOMENTS.items()])
    return m.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        *[
            F.expr(t).alias(a)
            for a, t in _CUPED_FORMULAS.items()
        ],
    )


@register(
    "graph_kcore_membership",
    f"""
    WITH RECURSIVE {_COPURCHASE_SMALL_SQL},
    und AS (SELECT src, dst FROM e
            UNION ALL SELECT dst, src FROM e),
    peel(iter, src, dst) AS (
        SELECT 0, src, dst FROM und
      UNION ALL
        SELECT iter + 1, src, dst
        FROM (SELECT iter, src, dst,
                     COUNT(*) OVER (PARTITION BY iter, src) AS dsrc,
                     COUNT(*) OVER (PARTITION BY iter, dst) AS ddst
              FROM peel WHERE iter < 20)
        WHERE dsrc >= 3 AND ddst >= 3)
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM peel WHERE iter = 20 GROUP BY 1 ORDER BY 1
    """,
    "3-core decomposition of the co-purchase graph: iteratively peel "
    "nodes of degree < 3 (with their edges) until a fixed point — the "
    "standard dense-subgraph/community seed, robust where raw degree "
    "is fooled by hubs. The peel is a bounded 20-round schedule on "
    "BOTH engines (identity rounds after convergence keep results "
    "equal by construction; the DataFrame loop early-exits on an "
    "unchanged checkpointed edge count, so it only pays rounds until "
    "the fixed point). Each round is one degree aggregation + two "
    "semi-joins against the surviving-node set (broadcast-scale); "
    "edges checkpoint once per round with loop-sized partitioning. "
    "Oracle: single-reference recursive CTE carrying the surviving "
    "EDGE set, per-iteration degrees via window functions",
    "analytics extension (k-core decomposition)",
)
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.graph import kcore

    e = _copurchase_small(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return kcore(und, k=3, max_rounds=20).orderBy("node")


@register(
    "agg_gini_revenue",
    """
    WITH r AS (
      SELECT l_suppkey AS s,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(30,4))) AS rev
      FROM lineitem GROUP BY 1),
    rk AS (
      SELECT s, rev,
             CAST(ROW_NUMBER() OVER (ORDER BY rev, s) AS BIGINT) AS i
      FROM r),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS DOUBLE) AS srev,
             CAST(SUM(i * rev) AS DOUBLE) AS sir
      FROM rk)
    SELECT n AS n_suppliers, round(srev, 4) AS total_revenue,
           round((2.0 * sir - (n + 1.0) * srev) / (n * srev), 6) AS gini
    FROM m
    """,
    "Gini coefficient of supplier revenue concentration — the "
    "scalar inequality measure behind the Pareto report (0 = equal, "
    "1 = one supplier takes all; ~0.03 on this uniform synthetic "
    "data). Exact-decimal revenue and rank-weighted sums (i * rev "
    "stays decimal-exact); the rank window runs on the bounded "
    "per-supplier aggregate, never the fact table; the closed-form "
    "Gini is shared 6 dp text",
    "analytics extension (Gini inequality coefficient)",
)
def agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    r = li.groupBy(F.col("l_suppkey").alias("s")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,4)"
            )
        ).alias("rev")
    )
    rk = r.select(
        "s",
        "rev",
        F.row_number()
        .over(Window.orderBy("rev", "s"))
        .cast("bigint")
        .alias("i"),
    )
    m = rk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev").cast("double").alias("srev"),
        F.sum(F.col("i") * F.col("rev")).cast("double").alias("sir"),
    )
    return m.select(
        F.col("n").alias("n_suppliers"),
        F.expr("round(srev, 4)").alias("total_revenue"),
        F.expr(
            "round((2.0 * sir - (n + 1.0) * srev) / (n * srev), 6)"
        ).alias("gini"),
    )


# Mann-Whitney U readout from exact moments: na/nb (counts), ra (exact
# decimal sum of arm-A average ranks, .5-granular), ties (sum t^3 - t).
# One text, both engines; 6 dp FMA guard on the z.
_MW_FORMULAS = {
    "u_a": "round(ra - na * (na + 1.0) / 2.0, 1)",
    "z_score": (
        "round((ra - na * (na + 1.0) / 2.0 - na * nb / 2.0) / "
        "sqrt(na * nb / 12.0 * (na + nb + 1.0 "
        "- ties / ((na + nb) * (na + nb - 1.0)))), 6)"
    ),
}
_MW_SELECT = ",\n           ".join(
    f"{expr} AS {alias}" for alias, expr in _MW_FORMULAS.items()
)


def _o_mannwhitney() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    return f"""
    WITH assigned AS (
      SELECT CASE WHEN {o_hash_bucket("user_id", "mw")} < 128
                  THEN 'A' ELSE 'B' END AS arm,
             value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    g AS (
      SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS cnt_a
      FROM assigned GROUP BY 1),
    r AS (
      SELECT value, cnt, cnt_a,
             CAST(SUM(cnt) OVER (ORDER BY value) AS BIGINT) AS cum
      FROM g),
    m AS (
      SELECT
        CAST(SUM(cnt_a) AS DOUBLE) AS na,
        CAST(SUM(cnt - cnt_a) AS DOUBLE) AS nb,
        CAST(SUM(CAST(cnt_a * (cum - cnt + (cnt + 1.0) / 2.0)
                      AS DECIMAL(30,1))) AS DOUBLE) AS ra,
        CAST(SUM(cnt * cnt * cnt - cnt) AS DOUBLE) AS ties
      FROM r)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           {_MW_SELECT}
    FROM m
    WHERE na > 0.0 AND nb > 0.0
      AND na + nb + 1.0 - ties / ((na + nb) * (na + nb - 1.0)) > 0.0
    """


@register(
    "events_mannwhitney_u",
    _o_mannwhitney(),
    "Mann-Whitney U rank-sum test — the nonparametric complement of "
    "the Welch z readout (no normality assumption; robust to the "
    "heavy-tailed purchase values). Scalable rank formulation: the "
    "corpus collapses to per-distinct-value (cnt, cnt_a) groups "
    "FIRST, average tie ranks come from a running sum over the value "
    "domain (prior + (t+1)/2 — never a per-row global rank), the "
    "arm-A rank sum aggregates as an exact .5-granular decimal, and "
    "the tie-corrected z compiles from shared formula text. At "
    "100 TB the value-domain window is the only ordered pass and a "
    "range-partitioned sort distributes it; raw events are touched "
    "once",
    "analytics extension (Mann-Whitney U nonparametric A/B test)",
)
def events_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    ev = load_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    assigned = ev.select(
        F.when(hash_bucket_expr("user_id", "mw") < 128, "A")
        .otherwise("B")
        .alias("arm"),
        "value",
    )
    g = assigned.groupBy("value").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("cnt_a"),
    )
    r = g.select(
        "cnt",
        "cnt_a",
        F.sum("cnt")
        .over(Window.orderBy("value"))
        .cast("bigint")
        .alias("cum"),
    )
    m = r.agg(
        F.sum("cnt_a").cast("double").alias("na"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("double").alias("nb"),
        F.sum(
            (
                F.col("cnt_a")
                * (
                    F.col("cum")
                    - F.col("cnt")
                    + (F.col("cnt") + F.lit(1.0)) / F.lit(2.0)
                )
            ).cast("decimal(30,1)")
        )
        .cast("double")
        .alias("ra"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("double")
        .alias("ties"),
    )
    # same degenerate guard text as the oracle: an empty arm or an
    # all-tied sample zeroes the variance (Spark NULL vs DuckDB
    # inf/NaN on the divide) — exclude identically on both engines.
    return m.filter(
        F.expr(
            "na > 0.0 AND nb > 0.0 AND na + nb + 1.0 "
            "- ties / ((na + nb) * (na + nb - 1.0)) > 0.0"
        )
    ).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        *[F.expr(expr).alias(alias) for alias, expr in _MW_FORMULAS.items()],
    )


# Bootstrap-normal CI from exact replicate moments: nr replicate count,
# sdv/qd = exact decimal sums of est-centered deviations d and d*d
# (d is 6 dp-rounded, so d*d at 12 dp stays far from the double noise
# floor). One text, both engines; sqrt is IEEE-exact.
_BOOT_SD = "sqrt((qd - sdv * sdv / nr) / (nr - 1.0))"
_BOOT_FORMULAS = {
    "sd_boot": f"round({_BOOT_SD}, 6)",
    "ci_lo": f"round(est_mean - 1.96 * {_BOOT_SD}, 6)",
    "ci_hi": f"round(est_mean + 1.96 * {_BOOT_SD}, 6)",
}
_BOOT_REPS = 100


def _o_bootstrap() -> str:
    from hangarbay_spark.operators.sampling import POISSON1_U16_LADDER

    h = "md5('boot' || CAST(event_id AS VARCHAR) || ':' || CAST(c.c AS VARCHAR))"
    u16 = "('0x' || substr(h, p.p * 4 + 1, 4))::INTEGER"
    n_chunks = (_BOOT_REPS + 7) // 8
    sel = ",\n           ".join(
        f"{e} AS {a}" for a, e in _BOOT_FORMULAS.items()
    )
    return f"""
    WITH pur AS (
      SELECT event_id, value FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL),
    full_m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_obs,
             CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS s
      FROM pur),
    est AS (SELECT n_obs, round(s / n_obs, 6) AS est_mean FROM full_m),
    chunks AS (
      SELECT value, {h} AS h, c.c
      FROM pur CROSS JOIN
           (SELECT unnest(generate_series(0, {n_chunks - 1})) AS c) c),
    expanded AS (
      SELECT c.c * 8 + p.p + 1 AS b, value,
             CAST({u16} AS INTEGER) AS u16
      FROM chunks c CROSS JOIN
           (SELECT unnest(generate_series(0, 7)) AS p) p
      WHERE c.c * 8 + p.p + 1 <= {_BOOT_REPS}),
    wtab AS (SELECT b, value, {POISSON1_U16_LADDER} AS w FROM expanded),
    rep AS (
      SELECT b, CAST(SUM(w) AS DOUBLE) AS nw,
             CAST(SUM(CAST(w * value AS DECIMAL(30,4))) AS DOUBLE) AS sw
      FROM wtab GROUP BY b),
    dev AS (
      SELECT round(round(sw / nw, 6) - est_mean, 6) AS d
      FROM rep CROSS JOIN est WHERE nw > 0.0),
    dm AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nr,
             CAST(SUM(CAST(d AS DECIMAL(20,6))) AS DOUBLE) AS sdv,
             CAST(SUM(CAST(d * d AS DECIMAL(30,12))) AS DOUBLE) AS qd
      FROM dev)
    SELECT CAST(n_obs AS BIGINT) AS n_obs, est_mean,
           CAST(nr AS BIGINT) AS n_reps,
           {sel}
    FROM dm CROSS JOIN est
    """


@register(
    "events_bootstrap_ci",
    _o_bootstrap(),
    "Poisson-bootstrap confidence interval for the mean purchase "
    "value — the one-pass resampling scheme that works at cluster "
    "scale (each row draws a deterministic Poisson(1) weight per "
    "replicate from a content hash; no per-replicate corpus shuffle, "
    "no sampling state). 100 replicates expand map-side and collapse "
    "in ONE map-side-combined aggregation keyed by replicate; one "
    "md5 digest is amortized across 8 replicates (4 hex digits "
    "each, decoded with conv — measured 2x vs a per-digit ladder), "
    "the weight ladder is pure integer compares on a u16 hash, replicate "
    "means are exact-decimal ratios, and the bootstrap sd/CI compile "
    "from shared formula text over est-centered 6 dp deviations "
    "(squares stay 13 significant digits, far from the double noise "
    "floor). At 100 TB the expansion is a projection — the shuffle "
    "carries at most partitions x replicates partial rows",
    "analytics extension (Poisson bootstrap / resampled CI)",
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import POISSON1_U16_LADDER

    # spread: the per-(event, chunk) md5 replicate expansion below is
    # the CPU stage and the events parquet scans as one row group.
    # Checkpointed: the exact-mean arm and the replicate arm would
    # otherwise each re-scan + re-spread (multi-consumer rule).
    pur = (
        spread(load_events(spark, sf_dir), "event_id")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .select("event_id", "value")
        .localCheckpoint()
    )
    est = pur.agg(
        F.count(F.lit(1)).cast("double").alias("n_obs"),
        F.sum(F.col("value").cast("decimal(30,4)"))
        .cast("double")
        .alias("s"),
    ).select("n_obs", F.expr("round(s / n_obs, 6)").alias("est_mean"))
    n_chunks = (_BOOT_REPS + 7) // 8
    chunks = pur.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("c"),
    ).select(
        "value",
        "c",
        F.md5(
            F.concat(
                F.lit("boot"),
                F.col("event_id").cast("string"),
                F.lit(":"),
                F.col("c").cast("string"),
            )
        ).alias("h"),
    )
    expanded = (
        chunks.select(
            "value",
            "c",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("p"),
        )
        .filter(F.col("c") * 8 + F.col("p") + 1 <= _BOOT_REPS)
        .select(
            (F.col("c") * 8 + F.col("p") + 1).alias("b"),
            "value",
            F.expr(
                "CAST(conv(substring(h, p * 4 + 1, 4), 16, 10) AS INT)"
            ).alias("u16"),
        )
    )
    wtab = expanded.select("b", "value", F.expr(POISSON1_U16_LADDER).alias("w"))
    rep = wtab.groupBy("b").agg(
        F.sum("w").cast("double").alias("nw"),
        F.sum((F.col("w") * F.col("value")).cast("decimal(30,4)"))
        .cast("double")
        .alias("sw"),
    )
    # nw > 0 guard (same text as the oracle): a replicate whose every
    # weight drew 0 — possible on tiny corpora — would divide by zero.
    dev = (
        rep.crossJoin(F.broadcast(est))
        .filter(F.expr("nw > 0.0"))
        .select(F.expr("round(round(sw / nw, 6) - est_mean, 6)").alias("d"))
    )
    dm = dev.agg(
        F.count(F.lit(1)).cast("double").alias("nr"),
        F.sum(F.col("d").cast("decimal(20,6)")).cast("double").alias("sdv"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(30,12)"))
        .cast("double")
        .alias("qd"),
    )
    return dm.crossJoin(F.broadcast(est)).select(
        F.col("n_obs").cast("bigint").alias("n_obs"),
        "est_mean",
        F.col("nr").cast("bigint").alias("n_reps"),
        *[F.expr(e).alias(a) for a, e in _BOOT_FORMULAS.items()],
    )


@register(
    "incremental_join_maintenance",
    """
    WITH new_orders AS (
      SELECT o_orderkey, o_custkey AS custkey,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS price
      FROM orders),
    new_cust AS (
      SELECT c_custkey AS custkey, c_nationkey,
             CASE WHEN c_custkey % 11 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey % 97 <> 0)
    SELECT c_nationkey, seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM new_orders JOIN new_cust USING (custkey)
    GROUP BY 1, 2
    """,
    "incremental maintenance of an aggregate OVER A JOIN — the view-"
    "maintenance shape agg-only deltas can't handle: both join inputs "
    "change (orders gain 10% new rows + price modifications; "
    "customers lose a slice and change segments), the Spark side "
    "derives per-input signed deltas, composes the join delta "
    "dA><B + A><dB + dA><dB with sign products (signed_join_delta), "
    "and merges it into the OLD join aggregate — the old join is "
    "never recomputed and the base tables are touched only by "
    "delta-keyed joins. The oracle recomputes the NEW join aggregate "
    "from scratch; equality is the multiset composition law, "
    "bit-exact via decimal sums",
    "pipeline extension (incremental join-view maintenance)",
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.pipelines.incremental import (
        build_agg,
        delta_agg_update,
        signed_delta,
        signed_join_delta,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    new_price = F.when(
        F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") * 2
    ).otherwise(F.col("o_totalprice"))
    a_new = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        new_price.alias("price"),
    )
    a_old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("price"),
    )
    b_old = cust.select(
        F.col("c_custkey").alias("custkey"),
        "c_nationkey",
        F.col("c_mktsegment").alias("seg"),
    )
    b_new = (
        cust.filter(F.col("c_custkey") % 97 != 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_nationkey",
            F.when(F.col("c_custkey") % 11 == 0, "MOVED")
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
        )
    )
    groups = ["c_nationkey", "seg"]
    specs = {"revenue": ("price", 2)}
    m_old = a_old.join(b_old, "custkey").select("c_nationkey", "seg", "price")
    prev = build_agg(m_old, groups, specs)
    da = signed_delta(a_old, a_new, "o_orderkey")
    db = signed_delta(b_old, b_new, "custkey")
    jd = signed_join_delta(a_old, da, b_old, db, "custkey")
    updated = delta_agg_update(prev, jd, groups, specs)
    return updated.select(
        *groups,
        F.col("n"),
        F.col("revenue").cast("double").alias("revenue"),
    )


# Two-regressor OLS solved in closed form from exact decimal moments.
# Layer 1: centered second moments; layer 2: Cramer solution + fit.
# Every layer is ONE shared text per column so IEEE ops run in
# identical order on both engines; outputs rounded 6 dp.
_OLS_CENTERED = {
    "s11": "sx1x1 - sx1 * sx1 / n",
    "s22": "sx2x2 - sx2 * sx2 / n",
    "s12": "sx1x2 - sx1 * sx2 / n",
    "s1y": "sx1y - sx1 * sy / n",
    "s2y": "sx2y - sx2 * sy / n",
    "syy": "syy0 - sy * sy / n",
}
# Coefficients are staged as COLUMNS (b1x/b2x), not inlined into
# b0/r2: inlining duplicates the whole Cramer chain per output and the
# exploded expression tree cost ~4 s of fixed plan/codegen time per
# run (measured; SF-independent). Same float values either way.
_OLS_COEF = {
    "b1x": "(s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12)",
    "b2x": "(s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12)",
}
_OLS_OUT = {
    "b1": "round(b1x, 6)",
    "b2": "round(b2x, 6)",
    "b0": "round((sy - b1x * sx1 - b2x * sx2) / n, 6)",
    "r2": "round((b1x * s1y + b2x * s2y) / syy, 6)",
}
_OLS_GUARD = "s11 * s22 - s12 * s12 > 0.0 AND syy > 0.0 AND n > 3.0"
# Product moments cast at DECIMAL(30,4) — the TRUE precision of 2dp x
# 2dp data. A finer scale (e.g. 8dp) would sit below the double noise
# floor at price^2 magnitudes (~1e10 * 2^-52 ~ 2e-6 > 5e-9), where
# Spark's shortest-string double->decimal cast and DuckDB's
# binary-expansion rounding disagree (see base.py docstring).
#
# Cost audit (round 6, VERDICT-r5 task 7), sf0.1 wall: full query
# 4.08 s = decimal moment agg 3.27 s + formula layers/sort ~0.8 s
# (fixed plan cost on a 4-row frame — NOT worth collapsing) + 0.14 s
# scan floor; the same 10 sums over raw doubles run 0.27 s, so the
# decimal aggregation is ~12x and IS the tax. Alternatives measured
# and rejected: decimal(18,4) input (0.68 vs 1.13 s/sum — accumulator
# still Int128); hi/lo split-long sums (0.56 s/sum, bit-identical at
# test scale) — REJECTED because sum(lo) <= n*1e9 overflows BIGINT at
# ~1e10 rows, i.e. exactly at the 100 TB lineitem scale this repo
# designs for. The decimal(30,4) accumulator holds 1e26: the tax buys
# the only formulation that is exact at every scale AND matches DuckDB
# bit-for-bit. Irreducible parity tax; SF-independent (sf1 ratio 1.3x).


@register(
    "report_ols_price_drivers",
    f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sx1,
             CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4)))
                  AS DOUBLE) AS sx1x1,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(30,4)))
                  AS DOUBLE) AS sx2x2,
             CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(30,4)))
                  AS DOUBLE) AS sx1x2,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4)))
                  AS DOUBLE) AS sx1y,
             CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(30,4)))
                  AS DOUBLE) AS sx2y,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice
                           AS DECIMAL(30,4))) AS DOUBLE) AS syy0
      FROM lineitem GROUP BY 1),
    c AS (
      SELECT l_returnflag, n, sx1, sx2, sy,
             {", ".join(f"{e} AS {a}" for a, e in _OLS_CENTERED.items())}
      FROM m),
    k AS (
      SELECT l_returnflag, n, sx1, sx2, sy, s1y, s2y, syy,
             {", ".join(f"{e} AS {a}" for a, e in _OLS_COEF.items())}
      FROM c WHERE {_OLS_GUARD})
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           {", ".join(f"{e} AS {a}" for a, e in _OLS_OUT.items())}
    FROM k
    ORDER BY l_returnflag
    """,
    "distributed OLS without MLlib: price ~ quantity + discount per "
    "return flag, solved in closed form from the normal equations — "
    "ONE map-side-combined aggregation collects nine exact decimal "
    "moments per group, then centered moments, Cramer coefficients "
    "and R-squared compile from shared formula text (layered so IEEE "
    "ops run in identical order; singular/degenerate groups excluded "
    "by the same determinant guard on both engines). The pattern "
    "behind any per-segment trend/elasticity fit at 100 TB: no "
    "iteration, no driver-side math, moments merge like any sum",
    "analytics extension (closed-form OLS regression per group)",
)
def report_ols_price_drivers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The nine decimal(30,x) moment sums are the measured cost (~5 µs/row
    # at the Int128 accumulator) and the single-row-group testdata scans
    # as ONE task — spread the pruned columns first (base.spread).
    li = spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    d2 = lambda c: F.col(c).cast("decimal(30,2)")  # noqa: E731
    d4 = lambda e: e.cast("decimal(30,4)")  # noqa: E731
    q, d, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d2("l_quantity")).cast("double").alias("sx1"),
        F.sum(d2("l_discount")).cast("double").alias("sx2"),
        F.sum(d2("l_extendedprice")).cast("double").alias("sy"),
        F.sum(d4(q * q)).cast("double").alias("sx1x1"),
        F.sum(d4(d * d)).cast("double").alias("sx2x2"),
        F.sum(d4(q * d)).cast("double").alias("sx1x2"),
        F.sum(d4(q * y)).cast("double").alias("sx1y"),
        F.sum(d4(d * y)).cast("double").alias("sx2y"),
        F.sum(d4(y * y)).cast("double").alias("syy0"),
    )
    c = m.select(
        "l_returnflag",
        "n",
        "sx1",
        "sx2",
        "sy",
        *[F.expr(e).alias(a) for a, e in _OLS_CENTERED.items()],
    )
    k = c.filter(F.expr(_OLS_GUARD)).select(
        "l_returnflag",
        "n",
        "sx1",
        "sx2",
        "sy",
        "s1y",
        "s2y",
        "syy",
        *[F.expr(e).alias(a) for a, e in _OLS_COEF.items()],
    )
    return (
        k.select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n_rows"),
            *[F.expr(e).alias(a) for a, e in _OLS_OUT.items()],
        )
        .orderBy("l_returnflag")
    )


# Difference-in-differences readout from 4 cells x exact (n, s, q)
# moments (q rounded at 2 dp before the decimal cast — identical on
# both engines and far above the double noise floor at price^2
# magnitudes). One text, both engines.
_DID_MEAN = {
    f"m{t}{p}": f"round(s{t}{p} / n{t}{p}, 6)"
    for t in (0, 1)
    for p in (0, 1)
}
_DID_VARN = (
    "((q{t}{p} - s{t}{p} * s{t}{p} / n{t}{p}) / (n{t}{p} - 1.0)) / n{t}{p}"
)
_DID_SE = (
    "sqrt("
    + " + ".join(
        _DID_VARN.format(t=t, p=p) for t in (0, 1) for p in (0, 1)
    )
    + ")"
)
_DID_OUT = {
    "did": "round(m11 - m10 - (m01 - m00), 6)",
    "se": f"round({_DID_SE}, 6)",
    "t_stat": f"round((m11 - m10 - (m01 - m00)) / ({_DID_SE}), 6)",
}
_DID_GUARD = " AND ".join(
    f"n{t}{p} > 1.0" for t in (0, 1) for p in (0, 1)
)


def _o_did() -> str:
    cells = []
    for t in (0, 1):
        for p in (0, 1):
            cond = (
                f"c_nationkey % 2 = {t} AND "
                f"(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END) = {p}"
            )
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE)"
                f" AS n{t}{p}"
            )
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN "
                f"CAST(o_totalprice AS DECIMAL(30,2)) END) AS DOUBLE)"
                f" AS s{t}{p}"
            )
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN "
                f"CAST(round(o_totalprice * o_totalprice, 2) "
                f"AS DECIMAL(30,2)) END) AS DOUBLE) AS q{t}{p}"
            )
    means = ", ".join(f"{e} AS {a}" for a, e in _DID_MEAN.items())
    outs = ", ".join(f"{e} AS {a}" for a, e in _DID_OUT.items())
    ns = ", ".join(
        f"CAST(n{t}{p} AS BIGINT) AS n_t{t}p{p}"
        for t in (0, 1)
        for p in (0, 1)
    )
    return f"""
    WITH m AS (
      SELECT {", ".join(cells)}
      FROM orders JOIN customer ON o_custkey = c_custkey),
    mm AS (
      SELECT *, {means} FROM m WHERE {_DID_GUARD})
    SELECT {ns}, m00, m01, m10, m11, {outs}
    FROM mm
    """


@register(
    "events_diff_in_diff",
    _o_did(),
    "difference-in-differences: the quasi-experimental workhorse "
    "when treatment wasn't randomized — odd-nation customers are the "
    "'treated' group, 1998+ the post period, and the estimator "
    "(treated post-pre delta minus control post-pre delta) nets out "
    "both group-level and period-level confounds. ONE conditional "
    "aggregation pass collects exact (n, s, q) moments for the four "
    "cells; means, pooled SE and the t-statistic compile from shared "
    "formula text (cells with n <= 1 excluded by the same guard both "
    "engines). At 100 TB: a single map-side-combined scan, no "
    "shuffle beyond 4 partial rows",
    "analytics extension (difference-in-differences causal readout)",
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    aggs = []
    for t in (0, 1):
        for p in (0, 1):
            cond = (F.col("c_nationkey") % 2 == t) & (
                F.when(F.year("o_orderdate") >= 1998, 1).otherwise(0) == p
            )
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("double")
                .alias(f"n{t}{p}")
            )
            aggs.append(
                F.sum(
                    F.when(cond, F.col("o_totalprice").cast("decimal(30,2)"))
                )
                .cast("double")
                .alias(f"s{t}{p}")
            )
            aggs.append(
                F.sum(
                    F.when(
                        cond,
                        F.round(
                            F.col("o_totalprice") * F.col("o_totalprice"), 2
                        ).cast("decimal(30,2)"),
                    )
                )
                .cast("double")
                .alias(f"q{t}{p}")
            )
    m = j.agg(*aggs)
    mm = m.filter(F.expr(_DID_GUARD)).select(
        "*", *[F.expr(e).alias(a) for a, e in _DID_MEAN.items()]
    )
    return mm.select(
        *[
            F.col(f"n{t}{p}").cast("bigint").alias(f"n_t{t}p{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
        "m00",
        "m01",
        "m10",
        "m11",
        *[F.expr(e).alias(a) for a, e in _DID_OUT.items()],
    )


# Kolmogorov-Smirnov D from the exact integer ECDF grid: per distinct
# value the scaled gap |C1*n0 - C0*n1| is a bigint (no float until the
# final division), D = gap / (n1*n0), and the sqrt(n1*n0/(n1+n0))
# effect scale is a rounded transcendental per the FMA guard. One
# text, both engines.
_KS_D = "round(CAST(gap AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)"
_KS_LAM = (
    "round(sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) "
    "/ (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))), 6)"
)


def _o_ks_test() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    arm = f"CASE WHEN {o_hash_bucket('user_id', 'ks')} < 128 THEN 1 ELSE 0 END"
    return f"""
    WITH assigned AS (
      SELECT {arm} AS arm, value
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
    g AS (
      SELECT value,
             CAST(SUM(arm) AS BIGINT) AS c1,
             CAST(SUM(1 - arm) AS BIGINT) AS c0
      FROM assigned GROUP BY 1),
    r AS (
      SELECT value,
             CAST(SUM(c1) OVER (ORDER BY value) AS BIGINT) AS c1cum,
             CAST(SUM(c0) OVER (ORDER BY value) AS BIGINT) AS c0cum,
             CAST(SUM(c1) OVER () AS BIGINT) AS n1,
             CAST(SUM(c0) OVER () AS BIGINT) AS n0
      FROM g),
    d AS (
      SELECT value, n1, n0,
             abs(c1cum * n0 - c0cum * n1) AS gap,
             ROW_NUMBER() OVER (
               ORDER BY abs(c1cum * n0 - c0cum * n1) DESC, value) AS rk
      FROM r WHERE n1 > 0 AND n0 > 0),
    top AS (SELECT * FROM d WHERE rk = 1),
    s AS (
      SELECT n1 AS n_1, n0 AS n_0, value AS at_value,
             {_KS_D} AS d_stat, {_KS_LAM} AS ks_lambda
      FROM top)
    SELECT n_1, n_0, at_value, d_stat, ks_lambda,
           round(d_stat * ks_lambda, 6) AS ks_scaled
    FROM s
    """


@register(
    "events_ks_test",
    _o_ks_test(),
    "two-sample Kolmogorov-Smirnov test between hash-assigned user "
    "arms over purchase values — the distribution-shape companion of "
    "the Mann-Whitney location test (detects variance/tail shifts a "
    "rank test misses). Scalable ECDF formulation: the corpus "
    "collapses to per-distinct-value arm counts first, both ECDFs are "
    "one running sum over the value domain, and the D statistic is an "
    "exact bigint gap |C1*n0 - C0*n1| maximized BEFORE any float op — "
    "the only doubles are the final division and the rounded sqrt "
    "scale. At 100 TB the value-domain window is the single ordered "
    "pass (range-partitioned sort); raw events are touched once",
    "analytics extension (Kolmogorov-Smirnov two-sample test)",
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    ev = load_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    assigned = ev.select(
        F.when(hash_bucket_expr("user_id", "ks") < 128, 1)
        .otherwise(0)
        .alias("arm"),
        "value",
    )
    g = assigned.groupBy("value").agg(
        F.sum("arm").cast("bigint").alias("c1"),
        F.sum(F.lit(1) - F.col("arm")).cast("bigint").alias("c0"),
    )
    wcum = Window.orderBy("value")
    wall = Window.partitionBy()
    r = g.select(
        "value",
        F.sum("c1").over(wcum).cast("bigint").alias("c1cum"),
        F.sum("c0").over(wcum).cast("bigint").alias("c0cum"),
        F.sum("c1").over(wall).cast("bigint").alias("n1"),
        F.sum("c0").over(wall).cast("bigint").alias("n0"),
    )
    gap = F.abs(F.col("c1cum") * F.col("n0") - F.col("c0cum") * F.col("n1"))
    d = (
        r.filter((F.col("n1") > 0) & (F.col("n0") > 0))
        .select(
            "value",
            "n1",
            "n0",
            gap.alias("gap"),
            F.row_number()
            .over(Window.orderBy(gap.desc(), F.col("value")))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
    )
    s = d.select(
        F.col("n1").alias("n_1"),
        F.col("n0").alias("n_0"),
        F.col("value").alias("at_value"),
        F.expr(_KS_D).alias("d_stat"),
        F.expr(_KS_LAM).alias("ks_lambda"),
    )
    return s.select(
        "n_1",
        "n_0",
        "at_value",
        "d_stat",
        "ks_lambda",
        F.expr("round(d_stat * ks_lambda, 6)").alias("ks_scaled"),
    )


# Leakage-safe encoding formula: out-of-fold decimal sums/counts come
# from exact window subtraction (segment total minus own fold), the
# smoothing prior is the 6 dp-rounded global mean with weight 10, and
# the encoding itself is one division rounded 6 dp. One text, both
# engines.
_TE_GMEAN = "round(CAST(gsum AS DOUBLE) / CAST(gcnt AS DOUBLE), 6)"
_TE_ENC = (
    "round((CAST(oof_sum AS DOUBLE) + 10.0 * gmean) "
    "/ (CAST(oof_cnt AS DOUBLE) + 10.0), 6)"
)


def _o_target_encoding() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    fold = f"{o_hash_bucket('o.o_orderkey', 'te')} % 5"
    return f"""
    WITH base AS (
      SELECT c.c_mktsegment AS segment,
             CAST({fold} AS BIGINT) AS fold,
             CAST(o.o_totalprice AS DECIMAL(30,4)) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    g AS (
      SELECT segment, fold,
             CAST(COUNT(*) AS BIGINT) AS fold_cnt,
             SUM(y) AS ysum
      FROM base GROUP BY 1, 2),
    w AS (
      SELECT segment, fold, fold_cnt,
             CAST(SUM(fold_cnt) OVER (PARTITION BY segment) - fold_cnt
                  AS BIGINT) AS oof_cnt,
             SUM(ysum) OVER (PARTITION BY segment) - ysum AS oof_sum,
             CAST(SUM(fold_cnt) OVER () AS BIGINT) AS gcnt,
             SUM(ysum) OVER () AS gsum
      FROM g),
    s AS (
      SELECT segment, fold, fold_cnt, oof_cnt, {_TE_GMEAN} AS gmean,
             CAST(oof_sum AS DOUBLE) AS oof_sum
      FROM w)
    SELECT segment, fold, fold_cnt, oof_cnt, gmean, {_TE_ENC} AS enc
    FROM s ORDER BY segment, fold
    """


@register(
    "sample_oof_target_encoding",
    _o_target_encoding(),
    "out-of-fold target encoding — the leakage-safe categorical "
    "feature every tabular training pipeline needs: each (segment, "
    "fold) cell is encoded by the smoothed mean order value of the "
    "OTHER folds only, so the feature a fold's training rows see "
    "never contains their own targets. Fold assignment is the "
    "deterministic md5 bucket, per-cell sums are exact decimals, the "
    "out-of-fold moments come from exact window subtraction (never a "
    "second corpus pass), and the smoothing prior (m=10 toward the "
    "global mean) is shared formula text. At 100 TB the corpus pays "
    "one join + one groupBy; everything after lives on the "
    "segment x fold grid",
    "ML-pipeline extension (leakage-safe target encoding)",
)
def sample_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    base = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (hash_bucket_expr("o_orderkey", "te") % 5)
        .cast("bigint")
        .alias("fold"),
        F.col("o_totalprice").cast("decimal(30,4)").alias("y"),
    )
    g = base.groupBy("segment", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("fold_cnt"),
        F.sum("y").alias("ysum"),
    )
    wseg = Window.partitionBy("segment")
    wall = Window.partitionBy()
    w = g.select(
        "segment",
        "fold",
        "fold_cnt",
        (F.sum("fold_cnt").over(wseg) - F.col("fold_cnt"))
        .cast("bigint")
        .alias("oof_cnt"),
        (F.sum("ysum").over(wseg) - F.col("ysum")).alias("oof_sum"),
        F.sum("fold_cnt").over(wall).cast("bigint").alias("gcnt"),
        F.sum("ysum").over(wall).alias("gsum"),
    )
    s = w.select(
        "segment",
        "fold",
        "fold_cnt",
        "oof_cnt",
        F.expr(_TE_GMEAN).alias("gmean"),
        F.col("oof_sum").cast("double").alias("oof_sum"),
    )
    return s.select(
        "segment",
        "fold",
        "fold_cnt",
        "oof_cnt",
        "gmean",
        F.expr(_TE_ENC).alias("enc"),
    ).orderBy("segment", "fold")


# Stratified / IPW treatment-effect readout: per-cell arm means are
# one 6 dp-rounded division each; the 'ALL' row standardizes the cell
# means over the cell-size distribution with an exact decimal
# weighted sum (n fits DECIMAL(12,0), a 6 dp mean fits DECIMAL(12,6),
# their product DECIMAL(25,6) — exact on both engines) and one final
# division. Same confounded-assignment thresholds, same guard text.
_ATE_MU1 = "round(CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE), 6)"
_ATE_MU0 = "round(CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE), 6)"
_ATE_DIFF = "round(mu1 - mu0, 6)"
_ATE_WMEAN = (
    "round(CAST(SUM(CAST(n AS DECIMAL(12,0)) * CAST({m} AS DECIMAL(12,6))) "
    "AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)"
)
_ATE_THRESH = (
    "CASE cell WHEN 'AUTOMOBILE' THEN 64 WHEN 'BUILDING' THEN 96 "
    "WHEN 'FURNITURE' THEN 128 WHEN 'HOUSEHOLD' THEN 160 ELSE 192 END"
)


def _o_stratified_ate() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    return f"""
    WITH base AS (
      SELECT c.c_mktsegment AS cell,
             CAST(o.o_totalprice AS DECIMAL(30,4)) AS y,
             {o_hash_bucket('o.o_custkey', 'ate')} AS b
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    assigned AS (
      SELECT cell, y,
             CASE WHEN b < {_ATE_THRESH} THEN 1 ELSE 0 END AS t
      FROM base),
    g AS (
      SELECT cell,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS nt,
             CAST(SUM(1 - t) AS BIGINT) AS nc,
             SUM(CASE WHEN t = 1 THEN y END) AS syt,
             SUM(CASE WHEN t = 0 THEN y END) AS syc
      FROM assigned GROUP BY 1),
    k AS (
      SELECT cell, n, nt, nc, {_ATE_MU1} AS mu1, {_ATE_MU0} AS mu0
      FROM g WHERE nt > 0 AND nc > 0),
    cells AS (
      SELECT cell, n, nt, nc, mu1, mu0, {_ATE_DIFF} AS cell_ate FROM k),
    ov AS (
      SELECT 'ALL' AS cell,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(nt) AS BIGINT) AS nt,
             CAST(SUM(nc) AS BIGINT) AS nc,
             {_ATE_WMEAN.format(m='mu1')} AS mu1,
             {_ATE_WMEAN.format(m='mu0')} AS mu0
      FROM cells),
    ov2 AS (
      SELECT cell, n, nt, nc, mu1, mu0, {_ATE_DIFF} AS cell_ate FROM ov)
    SELECT * FROM cells UNION ALL SELECT * FROM ov2 ORDER BY cell
    """


@register(
    "events_stratified_ate",
    _o_stratified_ate(),
    "stratified average-treatment-effect estimate under confounded "
    "assignment — the observational-causal companion of the A/B "
    "z-test/CUPED/DiD family: treatment probability varies by market "
    "segment (the confounder), so the naive treated-vs-control mean "
    "difference is biased; stratifying on the segment cells and "
    "standardizing the per-cell effects over the cell-size "
    "distribution recovers the effect (exact IPW for a discrete "
    "propensity). Per-cell arm moments are exact decimals, cell "
    "means/effects are 6 dp shared text, the ALL row is a "
    "decimal-exact weighted average of cell means, and cells missing "
    "an arm drop under identical guard text. At 100 TB: one join + "
    "one groupBy; the estimator lives on the 5-cell grid",
    "analytics extension (stratified/IPW causal effect)",
)
def events_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    assigned = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("c_mktsegment").alias("cell"),
            F.col("o_totalprice").cast("decimal(30,4)").alias("y"),
            hash_bucket_expr("o_custkey", "ate").alias("b"),
        )
        .select(
            "cell",
            "y",
            F.expr(f"CASE WHEN b < {_ATE_THRESH} THEN 1 ELSE 0 END").alias(
                "t"
            ),
        )
    )
    g = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("nt"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("nc"),
        F.sum(F.when(F.col("t") == 1, F.col("y"))).alias("syt"),
        F.sum(F.when(F.col("t") == 0, F.col("y"))).alias("syc"),
    )
    cells = (
        g.filter((F.col("nt") > 0) & (F.col("nc") > 0))
        .select(
            "cell",
            "n",
            "nt",
            "nc",
            F.expr(_ATE_MU1).alias("mu1"),
            F.expr(_ATE_MU0).alias("mu0"),
        )
        .select("*", F.expr(_ATE_DIFF).alias("cell_ate"))
    )
    ov = cells.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("nt").cast("bigint").alias("nt"),
        F.sum("nc").cast("bigint").alias("nc"),
        F.expr(_ATE_WMEAN.format(m="mu1")).alias("mu1"),
        F.expr(_ATE_WMEAN.format(m="mu0")).alias("mu0"),
    ).select(
        F.lit("ALL").alias("cell"),
        "n",
        "nt",
        "nc",
        "mu1",
        "mu0",
        F.expr(_ATE_DIFF).alias("cell_ate"),
    )
    return cells.unionByName(ov).orderBy("cell")


# ---------------------------------------------------------------------------
# Rank-correlation estimators over the joint value-domain grid.
#
# Both Spearman and Kendall collapse the corpus to per-(x, y) counts
# FIRST (one map-side-combined shuffle; the grid is the product of two
# bounded value domains — 50 quantities x 11 discounts here), then run
# every rank/pair computation on that tiny frame. Ranks are carried
# DOUBLED (2*rank is integral even for .5 average tie ranks), so all
# moments are exact integer/decimal aggregates; rho/tau compile from
# ONE shared formula text over their double casts. Per-cell products
# are cast to DECIMAL(19,0) factors (product DECIMAL(38,0)) so sums
# stay exact far beyond BIGINT range (bound: 2n <= ~9e18, i.e. the
# doubled-rank itself fits BIGINT to ~4.6e18 rows).
# ---------------------------------------------------------------------------

_SPEAR_MOMENTS = {
    "n": "CAST(SUM(CAST(cnt AS DECIMAL(38,0))) AS DOUBLE)",
    "sx": "CAST(SUM(CAST(cnt * rx2 AS DECIMAL(38,0))) AS DOUBLE)",
    "sy": "CAST(SUM(CAST(cnt * ry2 AS DECIMAL(38,0))) AS DOUBLE)",
    "sxx": (
        "CAST(SUM(CAST(cnt * rx2 AS DECIMAL(19,0)) "
        "* CAST(rx2 AS DECIMAL(19,0))) AS DOUBLE)"
    ),
    "syy": (
        "CAST(SUM(CAST(cnt * ry2 AS DECIMAL(19,0)) "
        "* CAST(ry2 AS DECIMAL(19,0))) AS DOUBLE)"
    ),
    "sxy": (
        "CAST(SUM(CAST(cnt * rx2 AS DECIMAL(19,0)) "
        "* CAST(ry2 AS DECIMAL(19,0))) AS DOUBLE)"
    ),
}
_SPEAR_RHO = (
    "round((n * sxy - sx * sy) / "
    "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)"
)
_SPEAR_GUARD = "n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0"
_SPEAR_SELECT = ",\n           ".join(
    f"{expr} AS {alias}" for alias, expr in _SPEAR_MOMENTS.items()
)


@register(
    "agg_spearman_corr",
    f"""
    WITH grid AS (
      SELECT l_quantity AS x, l_discount AS y,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2),
    gx AS (SELECT x, CAST(SUM(cnt) AS BIGINT) AS cx FROM grid GROUP BY 1),
    rx AS (
      SELECT x,
             2 * CAST(SUM(cx) OVER (ORDER BY x) AS BIGINT) - cx + 1 AS rx2
      FROM gx),
    gy AS (SELECT y, CAST(SUM(cnt) AS BIGINT) AS cy FROM grid GROUP BY 1),
    ry AS (
      SELECT y,
             2 * CAST(SUM(cy) OVER (ORDER BY y) AS BIGINT) - cy + 1 AS ry2
      FROM gy),
    j AS (
      SELECT g.cnt, rx.rx2, ry.ry2
      FROM grid g JOIN rx ON g.x = rx.x JOIN ry ON g.y = ry.y),
    m AS (
      SELECT {_SPEAR_SELECT}
      FROM j)
    SELECT CAST(n AS BIGINT) AS n_rows, {_SPEAR_RHO} AS spearman_rho
    FROM m WHERE {_SPEAR_GUARD}
    """,
    "Spearman rank correlation between line-item quantity and "
    "discount — the monotone-association estimator that survives "
    "heavy ties and outliers where Pearson does not. Scalable rank "
    "formulation: the corpus collapses once to the joint (quantity, "
    "discount) value-domain grid (<=550 cells), average tie ranks "
    "come from running sums over each marginal domain and are carried "
    "DOUBLED so they stay integral, and all six moments aggregate as "
    "exact decimals before ONE shared rho formula text runs on their "
    "double casts. At 100 TB the only corpus-scale work is the single "
    "map-side-combined groupBy; every ordered pass lives on the "
    "bounded grid",
    "analytics extension (Spearman rank correlation)",
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    grid = (
        li.groupBy(
            F.col("l_quantity").alias("x"), F.col("l_discount").alias("y")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()  # feeds gx, gy AND the rank join (3 consumers)
    )
    gx = grid.groupBy("x").agg(F.sum("cnt").cast("bigint").alias("cx"))
    rx = gx.select(
        "x",
        (
            F.lit(2) * F.sum("cx").over(Window.orderBy("x")).cast("bigint")
            - F.col("cx")
            + F.lit(1)
        ).alias("rx2"),
    )
    gy = grid.groupBy("y").agg(F.sum("cnt").cast("bigint").alias("cy"))
    ry = gy.select(
        "y",
        (
            F.lit(2) * F.sum("cy").over(Window.orderBy("y")).cast("bigint")
            - F.col("cy")
            + F.lit(1)
        ).alias("ry2"),
    )
    j = grid.join(rx, "x").join(ry, "y")
    m = j.agg(
        *[
            F.expr(expr).alias(alias)
            for alias, expr in _SPEAR_MOMENTS.items()
        ]
    )
    return m.filter(F.expr(_SPEAR_GUARD)).select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(_SPEAR_RHO).alias("spearman_rho"),
    )


# Kendall tau-b from the SAME joint grid via 2D prefix sums on the
# densified domain — concordant/discordant pair counts WITHOUT ever
# materializing pairs: for each cell, LL = pairs strictly below-left
# (concordant partners), LG = strictly above-left (discordant), both
# from layered strict-frame window sums. Tie terms fall out of the
# same aggregate (sum of cnt*rowtot = sum of per-x totals squared).
_KT_MOMENTS = {
    "n": "CAST(SUM(CAST(cnt AS DECIMAL(38,0))) AS DOUBLE)",
    "c": (
        "CAST(SUM(CAST(cnt AS DECIMAL(19,0)) "
        "* CAST(ll AS DECIMAL(19,0))) AS DOUBLE)"
    ),
    "d": (
        "CAST(SUM(CAST(cnt AS DECIMAL(19,0)) "
        "* CAST(lg AS DECIMAL(19,0))) AS DOUBLE)"
    ),
    "sx2": (
        "CAST(SUM(CAST(cnt AS DECIMAL(19,0)) "
        "* CAST(rowtot AS DECIMAL(19,0))) AS DOUBLE)"
    ),
    "sy2": (
        "CAST(SUM(CAST(cnt AS DECIMAL(19,0)) "
        "* CAST(coltot AS DECIMAL(19,0))) AS DOUBLE)"
    ),
}
_KT_SELECT = ",\n           ".join(
    f"{expr} AS {alias}" for alias, expr in _KT_MOMENTS.items()
)
# n0/n1/n2 in pair units: n0 total pairs, n1/n2 tied-in-x / tied-in-y.
_KT_DERIVED = {
    "n0": "n * (n - 1.0) / 2.0",
    "n1": "(sx2 - n) / 2.0",
    "n2": "(sy2 - n) / 2.0",
}
_KT_TAU = "round((c - d) / sqrt((n0 - n1) * (n0 - n2)), 6)"
_KT_GUARD = "n0 - n1 > 0.0 AND n0 - n2 > 0.0"


@register(
    "agg_kendall_tau",
    f"""
    WITH grid AS (
      SELECT l_quantity AS x, l_discount AS y,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2),
    dense AS (
      SELECT dx.x, dy.y
      FROM (SELECT DISTINCT x FROM grid) dx,
           (SELECT DISTINCT y FROM grid) dy),
    cells AS (
      SELECT d.x, d.y, COALESCE(g.cnt, 0) AS cnt
      FROM dense d LEFT JOIN grid g ON d.x = g.x AND d.y = g.y),
    l1 AS (
      SELECT x, y, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY x) AS BIGINT) AS rowtot,
             CAST(SUM(cnt) OVER (PARTITION BY y) AS BIGINT) AS coltot,
             CAST(COALESCE(SUM(cnt) OVER (
               PARTITION BY x ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_below
      FROM cells),
    l2 AS (
      SELECT x, y, cnt, rowtot, coltot,
             CAST(COALESCE(SUM(cum_below) OVER (
               PARTITION BY y ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS ll,
             CAST(COALESCE(SUM(cum_below + cnt) OVER (
               PARTITION BY y ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS lecum,
             CAST(COALESCE(SUM(rowtot) OVER (
               PARTITION BY y ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS colcum
      FROM l1),
    l3 AS (
      SELECT x, y, cnt, rowtot, coltot, ll,
             colcum - lecum AS lg
      FROM l2),
    m AS (SELECT {_KT_SELECT} FROM l3),
    der AS (
      SELECT n, c, d,
             {", ".join(f"{e} AS {a}" for a, e in _KT_DERIVED.items())}
      FROM m)
    SELECT CAST(n AS BIGINT) AS n_rows,
           c AS concordant, d AS discordant,
           {_KT_TAU} AS kendall_tau_b
    FROM der WHERE {_KT_GUARD}
    """,
    "Kendall tau-b rank correlation between quantity and discount "
    "WITHOUT materializing any pair: the corpus collapses to the "
    "joint value-domain grid, the grid densifies (bounded domain "
    "product), and concordant/discordant pair counts come from "
    "layered strict-frame 2D prefix-sum windows (below-left and "
    "above-left masses per cell). Tie corrections fall out of the "
    "same single aggregate (sum cnt*rowtot = sum of squared marginal "
    "totals). All counts are exact decimals; tau-b compiles from one "
    "shared formula text. At 100 TB: one corpus shuffle, then "
    "everything runs on the <=550-cell grid — the O(n^2) pair space "
    "is never touched",
    "analytics extension (Kendall tau-b rank correlation)",
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    grid = (
        li.groupBy(
            F.col("l_quantity").alias("x"), F.col("l_discount").alias("y")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()  # feeds xdom, ydom and the dense left join
    )
    xdom = grid.select("x").distinct()
    ydom = grid.agg(F.sort_array(F.collect_set("y")).alias("ys"))
    dense = xdom.crossJoin(F.broadcast(ydom)).select(
        "x", F.explode("ys").alias("y")
    )
    cells = dense.join(grid, ["x", "y"], "left").select(
        "x", "y", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt")
    )
    w_row = Window.partitionBy("x")
    w_col = Window.partitionBy("y")
    w_below = w_row.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    w_left = w_col.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    l1 = cells.select(
        "x",
        "y",
        "cnt",
        F.sum("cnt").over(w_row).cast("bigint").alias("rowtot"),
        F.sum("cnt").over(w_col).cast("bigint").alias("coltot"),
        F.coalesce(F.sum("cnt").over(w_below), F.lit(0))
        .cast("bigint")
        .alias("cum_below"),
    )
    l2 = l1.select(
        "x",
        "y",
        "cnt",
        "rowtot",
        "coltot",
        F.coalesce(F.sum("cum_below").over(w_left), F.lit(0))
        .cast("bigint")
        .alias("ll"),
        F.coalesce(
            F.sum(F.col("cum_below") + F.col("cnt")).over(w_left), F.lit(0)
        )
        .cast("bigint")
        .alias("lecum"),
        F.coalesce(F.sum("rowtot").over(w_left), F.lit(0))
        .cast("bigint")
        .alias("colcum"),
    )
    l3 = l2.select(
        "cnt",
        "rowtot",
        "coltot",
        "ll",
        (F.col("colcum") - F.col("lecum")).alias("lg"),
    )
    m = l3.agg(
        *[F.expr(expr).alias(alias) for alias, expr in _KT_MOMENTS.items()]
    )
    der = m.select(
        "n",
        "c",
        "d",
        *[F.expr(e).alias(a) for a, e in _KT_DERIVED.items()],
    )
    return der.filter(F.expr(_KT_GUARD)).select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.expr(_KT_TAU).alias("kendall_tau_b"),
    )


@register(
    "agg_weighted_median",
    """
    WITH g AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2),
    r AS (
      SELECT flag, price, w,
             CAST(SUM(w) OVER (PARTITION BY flag ORDER BY price)
               AS BIGINT) AS cum,
             CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
      FROM g)
    SELECT flag,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           (MIN(CASE WHEN 2 * cum >= tot THEN price END)
            + MIN(CASE WHEN 2 * cum > tot THEN price END)) / 2.0
             AS w_median
    FROM r GROUP BY flag ORDER BY flag
    """,
    "quantity-weighted median price per return flag — the "
    "inventory-weighted central price a plain median misses. Value-"
    "domain formulation: the corpus collapses to per-(flag, price) "
    "integer weight groups, the running weight window finds the "
    "half-mass boundary, and the median is (lo + hi) / 2.0 where lo/"
    "hi are the first prices at >= and > half mass (equal unless the "
    "mass splits exactly — then the midpoint rule, one shared IEEE "
    "divide). At 100 TB: one map-side-combined corpus shuffle; the "
    "ordered pass runs on the per-flag price domain and "
    "range-partitions",
    "analytics extension (weighted median / half-mass boundary)",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    r = g.select(
        "flag",
        "price",
        F.sum("w")
        .over(Window.partitionBy("flag").orderBy("price"))
        .cast("bigint")
        .alias("cum"),
        F.sum("w").over(Window.partitionBy("flag")).cast("bigint").alias("tot"),
    )
    return (
        r.groupBy("flag")
        .agg(
            F.max("tot").cast("bigint").alias("total_weight"),
            (
                (
                    F.min(
                        F.when(
                            F.lit(2) * F.col("cum") >= F.col("tot"),
                            F.col("price"),
                        )
                    )
                    + F.min(
                        F.when(
                            F.lit(2) * F.col("cum") > F.col("tot"),
                            F.col("price"),
                        )
                    )
                )
                / F.lit(2.0)
            ).alias("w_median"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# HITS (Kleinberg 1999) over the customer->part purchase bipartite graph.
#
# Integer-exact power iteration: with h0 = 1, every subsequent hub/
# authority value is a COUNT (weighted path count through the bipartite
# graph), so all iterations aggregate as exact DECIMAL(38,0) — no
# per-iteration float normalization, hence no rounding discipline to
# share. Values grow ~(mean degree)^2 per full iteration; DECIMAL(38,0)
# holds 3 iterations far beyond this corpus scale (at true 100 TB node
# counts, switch to per-iteration max-normalization with a shared
# round(x / mx, 9) text — the PageRank discipline).
# ---------------------------------------------------------------------------

_HITS_ITERS = 3  # a1 -> h1 -> a2 -> h2 -> a3 (authorities returned)


def _o_hits() -> str:
    parts = [
        """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    h0 AS (
      SELECT c, CAST(1 AS DECIMAL(38,0)) AS h
      FROM (SELECT DISTINCT c FROM e))"""
    ]
    for k in range(1, _HITS_ITERS + 1):
        parts.append(
            f""",
    a{k} AS (
      SELECT e.p, CAST(SUM(h.h) AS DECIMAL(38,0)) AS a
      FROM e JOIN h{k - 1} h ON e.c = h.c GROUP BY e.p)"""
        )
        if k < _HITS_ITERS:
            parts.append(
                f""",
    h{k} AS (
      SELECT e.c, CAST(SUM(a.a) AS DECIMAL(38,0)) AS h
      FROM e JOIN a{k} a ON e.p = a.p GROUP BY e.c)"""
            )
    parts.append(
        f"""
    SELECT CAST(p AS BIGINT) AS p_partkey,
           CAST(a AS DOUBLE) AS authority
    FROM a{_HITS_ITERS}
    ORDER BY authority DESC, p_partkey LIMIT 15"""
    )
    return "".join(parts)


@register(
    "graph_hits_authorities",
    _o_hits(),
    "HITS hubs-and-authorities power iteration over the customer->"
    "part purchase bipartite graph (Kleinberg 1999): authority(p) = "
    "sum of hub scores of buyers, hub(c) = sum of authority scores of "
    "bought parts, alternating for 3 authority steps from h0 = 1. "
    "Integer-exact formulation: every score is a weighted path count, "
    "so all aggregation is exact DECIMAL — no float normalization to "
    "keep in cross-engine lockstep; the top-15 authority parts are "
    "returned with deterministic tie-break. At 100 TB each half-step "
    "is ONE message-passing shuffle (join on the checkpointed edge "
    "list + groupBy) — the same per-iteration floor as PageRank; "
    "edges build once and checkpoint. Oracle: the identical "
    "iteration unrolled as a CTE chain",
    "analytics extension (HITS link analysis, bipartite)",
)
def graph_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()  # consumed by every half-step join (2k+1 uses)
    )
    # Regime switch on edge count (graph.HITS_KERNEL_MAX_EDGES): below
    # it all 2k-1 half-steps replay in ONE Arrow task as exact-integer
    # scatter-adds — provably identical to the decimal(38,0) loop
    # (equivalence pinned by test_small_graph_loop_kernels_match_loops;
    # counting the materialized checkpoint is ~free).
    from hangarbay_spark.operators.graph import (
        HITS_KERNEL_MAX_EDGES,
        hits_authority_kernel,
    )

    if e.count() <= HITS_KERNEL_MAX_EDGES:
        a = hits_authority_kernel(e, _HITS_ITERS)
    else:
        h = e.select("c").distinct().select(
            "c", F.lit(1).cast("decimal(38,0)").alias("h")
        )
        a = None
        for k in range(1, _HITS_ITERS + 1):
            a = (
                e.join(h, "c")
                .groupBy("p")
                .agg(F.sum("h").cast("decimal(38,0)").alias("a"))
            )
            if k < _HITS_ITERS:
                h = (
                    e.join(a, "p")
                    .groupBy("c")
                    .agg(F.sum("a").cast("decimal(38,0)").alias("h"))
                )
    return (
        a.select(
            F.col("p").cast("bigint").alias("p_partkey"),
            F.col("a").cast("double").alias("authority"),
        )
        .orderBy(F.desc("authority"), "p_partkey")
        .limit(15)
    )


# item-item cosine: co-count over the geometric mean of item supports —
# one sqrt of an exact integer product, 9 dp (shared text).
_CF_COSINE = (
    "round(CAST(nab AS DOUBLE) / "
    "sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9)"
)


@register(
    "analytics_item_cf_topk",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM li GROUP BY l_partkey),
    top_items AS (
      SELECT l_partkey FROM ic
      ORDER BY cnt DESC, l_partkey LIMIT 20),
    pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  CAST(COUNT(*) AS BIGINT) AS nab
           FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey
           HAVING COUNT(*) >= 2),
    sym AS (
      SELECT part_a AS item, part_b AS neighbor, nab FROM pr
      UNION ALL
      SELECT part_b AS item, part_a AS neighbor, nab FROM pr),
    j AS (
      SELECT s.item, s.neighbor, s.nab,
             ia.cnt AS na, ib.cnt AS nb
      FROM sym s
      JOIN top_items t ON s.item = t.l_partkey
      JOIN ic ia ON ia.l_partkey = s.item
      JOIN ic ib ON ib.l_partkey = s.neighbor),
    scored AS (
      SELECT item, neighbor, nab, {_CF_COSINE} AS cosine
      FROM j),
    rk AS (
      SELECT item, neighbor, nab, cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY item
               ORDER BY cosine DESC, neighbor) AS BIGINT) AS rk
      FROM scored)
    SELECT item, neighbor, nab, cosine, rk
    FROM rk WHERE rk <= 3
    ORDER BY item, rk
    """,
    "item-item collaborative-filtering recommender: cosine similarity "
    "nab/sqrt(na*nb) over co-purchase baskets, top-3 neighbors for "
    "each of the 20 best-supported items. Pair supports come from the "
    "bounded per-basket a<b self-join (the association-rules shape, "
    "never an all-pairs item join) with a support floor; the "
    "symmetric item/neighbor expansion is one filtered struct-array "
    "explode (single pair-frame consumption); per-item top-3 is a "
    "window on the candidate frame. At 100 TB: basket expansion is "
    "per-order-bounded, everything downstream is pair-frame-sized "
    "and the seed-item semi-join prunes it to the 20-item candidate "
    "set",
    "analytics extension (item-item collaborative filtering)",
)
def analytics_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)  # item counts + both self-join sides
    )
    ic = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=True)  # top_items + two count joins
    top_items = (
        ic.orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(20)
        .select("l_partkey")
    )
    pr = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
        .filter(F.col("nab") >= 2)
    )
    # symmetric expansion via ONE struct-array explode (single
    # consumption of the pair frame — the unionByName would scan twice)
    sym = pr.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("item"),
                    F.col("part_b").alias("neighbor"),
                    F.col("nab").alias("nab"),
                ),
                F.struct(
                    F.col("part_b").alias("item"),
                    F.col("part_a").alias("neighbor"),
                    F.col("nab").alias("nab"),
                ),
            )
        ).alias("e")
    ).select("e.item", "e.neighbor", "e.nab")
    j = (
        sym.join(
            F.broadcast(top_items.withColumnRenamed("l_partkey", "item")),
            "item",
        )
        .join(
            ic.select(F.col("l_partkey").alias("item"), F.col("cnt").alias("na")),
            "item",
        )
        .join(
            ic.select(
                F.col("l_partkey").alias("neighbor"), F.col("cnt").alias("nb")
            ),
            "neighbor",
        )
    )
    scored = j.select(
        "item", "neighbor", "nab", F.expr(_CF_COSINE).alias("cosine")
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), "neighbor")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("item", "neighbor", "nab", "cosine", "rk")
        .orderBy("item", "rk")
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (topic-sensitive; Haveliwala 2002): teleport
# mass restarts at a SEED set instead of uniformly — the relevance
# ranking primitive behind graph recommenders. Same float discipline
# as _o_pagerank: one IEEE divide per edge contribution, DECIMAL(30,15)
# sums, 12 dp per-iteration round.
# ---------------------------------------------------------------------------

_PPR_ITERS = 6
_PPR_SEEDS = 5


def _o_ppr() -> str:
    ctes = [
        _COPURCHASE_SMALL_SQL.strip().rstrip(),
        "und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)",
        "dg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM und GROUP BY src)",
        f"sd AS (SELECT src AS node FROM dg ORDER BY src LIMIT {_PPR_SEEDS})",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM sd)",
        "r0 AS (SELECT dg.src AS node, CASE WHEN sd.node IS NOT NULL "
        "THEN 1.0 / ns ELSE 0.0 END AS rank "
        "FROM dg LEFT JOIN sd ON dg.src = sd.node CROSS JOIN nn)",
    ]
    for k in range(1, _PPR_ITERS + 1):
        ctes.append(
            f"r{k} AS (SELECT u.dst AS node, "
            f"round(CASE WHEN sd.node IS NOT NULL THEN {_PR_JUMP} / nn.ns "
            f"ELSE 0.0 END + {_PR_DAMP} * "
            f"CAST(SUM(CAST(r.rank / dg.deg AS DECIMAL(30,15))) AS DOUBLE)"
            f", 12) AS rank "
            f"FROM und u JOIN r{k - 1} r ON u.src = r.node "
            f"JOIN dg ON dg.src = u.src "
            f"LEFT JOIN sd ON sd.node = u.dst CROSS JOIN nn "
            f"GROUP BY u.dst, sd.node, nn.ns)"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT r.node,
           CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed,
           ROUND(r.rank, 9) AS rank
    FROM r{_PPR_ITERS} r LEFT JOIN sd ON r.node = sd.node
    ORDER BY rank DESC, r.node LIMIT 15
    """
    )


@register(
    "graph_personalized_pagerank",
    _o_ppr(),
    "personalized (topic-sensitive) PageRank over the small-part "
    "co-purchase graph: teleport mass restarts at the 5 smallest-id "
    "seed nodes instead of uniformly, so ranks measure proximity TO "
    "THE SEEDS — the graph-recommender / related-items primitive "
    "vanilla PageRank cannot express. 6 power iterations at the "
    "_o_pagerank float discipline (per-edge IEEE divide, "
    "DECIMAL(30,15) sums, 12 dp per-iteration round); rank vectors "
    "stay dense over the node set and checkpoint per round. At "
    "100 TB: one message-passing shuffle per iteration on the "
    "checkpointed symmetric edge set — identical floor to PageRank; "
    "the seed table is a bounded broadcast",
    "analytics extension (personalized PageRank / graph recommender)",
)
def graph_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst").localCheckpoint(eager=True)
    # Regime switch on edge count (graph.LOOP_KERNEL_MAX_EDGES): tiny
    # graphs replay all 6 teleport iterations in ONE Arrow task with
    # the identical float discipline (bit-identity pinned by
    # test_small_graph_loop_kernels_match_loops); counting the checkpoint is ~free.
    from hangarbay_spark.operators.graph import (
        LOOP_KERNEL_MAX_EDGES,
        ppr_ranks_kernel,
    )

    if und.count() <= LOOP_KERNEL_MAX_EDGES:
        r = ppr_ranks_kernel(und, _PPR_SEEDS, _PPR_ITERS)
        sd = (
            und.select(F.col("src").alias("node"))
            .distinct()
            .orderBy("node")
            .limit(_PPR_SEEDS)
        )
        return (
            r.join(
                F.broadcast(sd.withColumn("isflag", F.lit(1))),
                "node",
                "left",
            )
            .select(
                "node",
                F.coalesce("isflag", F.lit(0)).alias("is_seed"),
                "rank",
            )
            .orderBy(F.desc("rank"), "node")
            .limit(15)
            .select("node", "is_seed", F.round("rank", 9).alias("rank"))
        )
    dg = und.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).localCheckpoint(eager=True)
    sd = dg.orderBy("src").limit(_PPR_SEEDS).select(
        F.col("src").alias("node")
    ).localCheckpoint(eager=True)
    ns_df = sd.agg(F.count(F.lit(1)).cast("double").alias("ns"))
    seeds_src = sd.withColumnRenamed("node", "src").withColumn(
        "isseed", F.lit(1)
    )
    r = (
        dg.select("src")
        .join(F.broadcast(seeds_src), "src", "left")
        .crossJoin(F.broadcast(ns_df))
        .select(
            F.col("src").alias("node"),
            F.when(F.col("isseed") == 1, F.lit(1.0) / F.col("ns"))
            .otherwise(F.lit(0.0))
            .alias("rank"),
        )
    )
    edeg = und.join(dg, "src")  # (src, dst, deg), checkpoint-backed
    seeds_dst = sd.withColumnRenamed("node", "dst").withColumn(
        "isseed", F.lit(1)
    )
    # The explode-derived edge checkpoint carries a tiny origin size
    # estimate, so the planner broadcasts the STATIC edge side — built
    # once, reused by every iteration, measured faster here than
    # re-broadcasting the changing rank vector each round (A/B at
    # sf0.1: 2.34 s vs 2.98 s hinted). Only safe while the edge frame
    # truly fits a broadcast: beyond graph.BCAST_EDGES rows the
    # node-level rank vector must be the hinted side instead
    # (guide §3.1).
    from hangarbay_spark.operators.graph import BCAST_EDGES

    hint_rank = und.count() > BCAST_EDGES
    for _ in range(_PPR_ITERS):
        r_side = F.broadcast(r) if hint_rank else r
        r = (
            edeg.join(r_side, edeg["src"] == r_side["node"])
            .select(
                "dst",
                (F.col("rank") / F.col("deg"))
                .cast("decimal(30,15)")
                .alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").cast("double").alias("msum"))
            .join(F.broadcast(seeds_dst), "dst", "left")
            .crossJoin(F.broadcast(ns_df))
            .select(
                F.col("dst").alias("node"),
                F.round(
                    F.when(
                        F.col("isseed") == 1,
                        F.expr(f"{_PR_JUMP} / ns"),
                    ).otherwise(F.lit(0.0))
                    + F.expr(f"{_PR_DAMP}") * F.col("msum"),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return (
        r.join(
            F.broadcast(sd.withColumn("isflag", F.lit(1))), "node", "left"
        )
        .select(
            "node",
            F.coalesce("isflag", F.lit(0)).alias("is_seed"),
            "rank",
        )
        .orderBy(F.desc("rank"), "node")
        .limit(15)
        .select("node", "is_seed", F.round("rank", 9).alias("rank"))
    )


# per-community modularity term: intra-edge share minus squared
# degree share — one shared text over exact integer counts, 9 dp.
_MOD_TERM = (
    "round(CAST(lc AS DOUBLE) / CAST(m AS DOUBLE) "
    "- (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))) "
    "* (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))), 9)"
)


@register(
    "graph_modularity_brands",
    f"""
    WITH {_COPURCHASE_SMALL_SQL},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    bs AS (SELECT p_partkey, p_brand FROM part),
    eb AS (
      SELECT a.p_brand AS brand_src, b.p_brand AS brand_dst
      FROM e JOIN bs a ON e.src = a.p_partkey
             JOIN bs b ON e.dst = b.p_partkey),
    intra AS (
      SELECT brand_src AS brand, CAST(COUNT(*) AS BIGINT) AS lc
      FROM eb WHERE brand_src = brand_dst GROUP BY 1),
    und AS (SELECT src FROM e UNION ALL SELECT dst FROM e),
    dg AS (
      SELECT bs.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS dc
      FROM und JOIN bs ON und.src = bs.p_partkey GROUP BY 1),
    terms0 AS (
      SELECT dg.brand, COALESCE(intra.lc, 0) AS lc, dg.dc AS dc
      FROM dg LEFT JOIN intra ON dg.brand = intra.brand),
    terms AS (
      SELECT brand, lc, dc, {_MOD_TERM} AS term
      FROM terms0 CROSS JOIN m)
    SELECT brand, lc AS intra_edges, dc AS degree_sum, term
    FROM terms
    UNION ALL
    SELECT 'Q_TOTAL' AS brand,
           CAST(SUM(lc) AS BIGINT) AS intra_edges,
           CAST(SUM(dc) AS BIGINT) AS degree_sum,
           CAST(SUM(CAST(term AS DECIMAL(20,9))) AS DOUBLE) AS term
    FROM terms
    ORDER BY brand
    """,
    "graph modularity (Newman-Girvan Q) of the brand partition over "
    "the small-part co-purchase graph: per community, intra-edge "
    "share minus squared degree share, summed — THE quality metric "
    "for any community assignment (here: do brands cluster in "
    "co-purchase behavior?). All edge/degree counts exact integers; "
    "per-community terms are one shared 9 dp formula text and Q sums "
    "them as exact decimals. At 100 TB: two broadcast-dim joins onto "
    "the checkpointed edge list + bounded per-community rollups — "
    "the same measurement drops onto label-propagation or "
    "connected-component labels unchanged",
    "analytics extension (graph modularity / community quality)",
)
def graph_modularity_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    bs = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    eb = e.join(
        bs.select(
            F.col("p_partkey").alias("src"), F.col("p_brand").alias("brand_src")
        ),
        "src",
    ).join(
        bs.select(
            F.col("p_partkey").alias("dst"), F.col("p_brand").alias("brand_dst")
        ),
        "dst",
    )
    intra = (
        eb.filter(F.col("brand_src") == F.col("brand_dst"))
        .groupBy(F.col("brand_src").alias("brand"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("lc"))
    )
    und = e.select(
        F.explode(F.array(F.col("src"), F.col("dst"))).alias("src")
    )
    dg = (
        und.join(bs.select(F.col("p_partkey").alias("src"), "p_brand"), "src")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("dc"))
    )
    terms = (
        dg.join(intra, "brand", "left")
        .select(
            "brand",
            F.coalesce("lc", F.lit(0)).cast("bigint").alias("lc"),
            "dc",
        )
        .crossJoin(F.broadcast(m))
        .select("brand", "lc", "dc", F.expr(_MOD_TERM).alias("term"))
        .localCheckpoint()  # per-brand rows AND the Q_TOTAL rollup
    )
    total = terms.agg(
        F.lit("Q_TOTAL").alias("brand"),
        F.sum("lc").cast("bigint").alias("intra_edges"),
        F.sum("dc").cast("bigint").alias("degree_sum"),
        F.sum(F.col("term").cast("decimal(20,9)"))
        .cast("double")
        .alias("term"),
    ).select("brand", "intra_edges", "degree_sum", "term")
    return (
        terms.select(
            "brand",
            F.col("lc").alias("intra_edges"),
            F.col("dc").alias("degree_sum"),
            "term",
        )
        .unionByName(total)
        .orderBy("brand")
    )


# Pearson over directed-edge endpoint degrees; moments are exact
# decimals of integer products (DECIMAL(19,0) factor pattern).
_ASSORT_MOMENTS = {
    "n": "CAST(COUNT(*) AS DOUBLE)",
    "sx": "CAST(SUM(CAST(dx AS DECIMAL(38,0))) AS DOUBLE)",
    "sy": "CAST(SUM(CAST(dy AS DECIMAL(38,0))) AS DOUBLE)",
    "sxx": (
        "CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dx AS DECIMAL(19,0)))"
        " AS DOUBLE)"
    ),
    "syy": (
        "CAST(SUM(CAST(dy AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))"
        " AS DOUBLE)"
    ),
    "sxy": (
        "CAST(SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))"
        " AS DOUBLE)"
    ),
}
_ASSORT_R = (
    "round((n * sxy - sx * sy) / "
    "sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)"
)
_ASSORT_GUARD = "n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0"
_ASSORT_SELECT = ",\n             ".join(
    f"{e} AS {a}" for a, e in _ASSORT_MOMENTS.items()
)


@register(
    "graph_assortativity",
    f"""
    WITH {_COPURCHASE_SMALL_SQL},
    und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    dg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM und GROUP BY src),
    ed AS (
      SELECT a.deg AS dx, b.deg AS dy
      FROM und JOIN dg a ON und.src = a.node
               JOIN dg b ON und.dst = b.node),
    m AS (SELECT {_ASSORT_SELECT} FROM ed)
    SELECT CAST(n AS BIGINT) AS n_directed_edges,
           {_ASSORT_R} AS assortativity
    FROM m WHERE {_ASSORT_GUARD}
    """,
    "degree assortativity (Newman 2002): the Pearson correlation of "
    "endpoint degrees over every directed edge of the co-purchase "
    "graph — do hubs connect to hubs (assortative, r > 0) or to the "
    "periphery (disassortative, r < 0)? The structural diagnostic "
    "behind skew-join planning on graphs. Both endpoint degrees join "
    "from one checkpointed degree table; all six moments are exact "
    "decimals of integer products (DECIMAL(19,0) factor pattern); r "
    "compiles from one shared text with the degenerate guard "
    "identical both sides. At 100 TB: two hash joins on the edge "
    "list + one map-side-combined moment pass",
    "analytics extension (degree assortativity)",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("ed")
    ).select("ed.src", "ed.dst").localCheckpoint(eager=True)
    dg = und.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).localCheckpoint(eager=True)  # joined on both endpoints
    ed = und.join(
        dg.select(F.col("src"), F.col("deg").alias("dx")), "src"
    ).join(
        dg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")),
        "dst",
    )
    m = ed.agg(
        *[F.expr(e_).alias(a) for a, e_ in _ASSORT_MOMENTS.items()]
    )
    return m.filter(F.expr(_ASSORT_GUARD)).select(
        F.col("n").cast("bigint").alias("n_directed_edges"),
        F.expr(_ASSORT_R).alias("assortativity"),
    )


_CFE_RECALL = "round(CAST(hits AS DOUBLE) / CAST(nb AS DOUBLE), 6)"


@register(
    "analytics_item_cf_holdout_recall",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    sized AS (
      SELECT l_orderkey, l_partkey,
             CAST(MAX(l_partkey) OVER (PARTITION BY l_orderkey)
               AS BIGINT) AS held,
             CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS bsz
      FROM li),
    ctx AS (
      SELECT l_orderkey, l_partkey, held
      FROM sized WHERE bsz >= 2 AND l_partkey <> held),
    ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM ctx GROUP BY l_partkey),
    pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                  CAST(COUNT(*) AS BIGINT) AS nab
           FROM ctx a JOIN ctx b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    sym AS (
      SELECT part_a AS item, part_b AS neighbor, nab FROM pr
      UNION ALL
      SELECT part_b AS item, part_a AS neighbor, nab FROM pr),
    joined AS (
      SELECT s.item, s.neighbor, s.nab, ia.cnt AS na, ib.cnt AS nb
      FROM sym s JOIN ic ia ON ia.l_partkey = s.item
                 JOIN ic ib ON ib.l_partkey = s.neighbor),
    scored AS (
      SELECT item, neighbor, {_CF_COSINE} AS cosine FROM joined),
    top3 AS (
      SELECT item, neighbor FROM (
        SELECT item, neighbor,
               ROW_NUMBER() OVER (PARTITION BY item
                                  ORDER BY cosine DESC, neighbor) AS rk
        FROM scored) t
      WHERE rk <= 3),
    ev AS (
      SELECT c.l_orderkey,
             MAX(CASE WHEN t.neighbor IS NOT NULL THEN 1 ELSE 0 END)
               AS hit
      FROM ctx c LEFT JOIN top3 t
        ON c.l_partkey = t.item AND c.held = t.neighbor
      GROUP BY c.l_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(SUM(hit) AS BIGINT) AS hits,
           {_CFE_RECALL} AS recall_at_3
    FROM ev
    """,
    "recommender evaluation by leave-one-out holdout: each basket's "
    "max-key item is held out, item-item CF trains on the remaining "
    "context pairs only (no target leakage into supports), and a "
    "basket scores a hit when ANY context item's top-3 cosine "
    "neighbors contain the held-out item — hit-rate@3, the offline "
    "metric that decides whether the recommender ships. All counts "
    "exact integers; one shared recall text. At 100 TB: the same "
    "basket-bounded pair expansion as training plus one "
    "(item, held) equi-join against the top-3 edge set",
    "analytics extension (recommender holdout evaluation)",
)
def analytics_item_cf_holdout_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    wb = Window.partitionBy("l_orderkey")
    sized = li.select(
        "l_orderkey",
        "l_partkey",
        F.max("l_partkey").over(wb).cast("bigint").alias("held"),
        F.count(F.lit(1)).over(wb).cast("bigint").alias("bsz"),
    )
    ctx = (
        sized.filter(
            (F.col("bsz") >= 2) & (F.col("l_partkey") != F.col("held"))
        )
        .select("l_orderkey", "l_partkey", "held")
        .localCheckpoint(eager=True)  # counts, both pair sides, eval join
    )
    ic = ctx.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=True)
    pr = (
        ctx.alias("a")
        .join(ctx.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
        .filter(F.col("nab") >= 2)
    )
    sym = pr.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_a").alias("item"),
                    F.col("part_b").alias("neighbor"),
                    F.col("nab").alias("nab"),
                ),
                F.struct(
                    F.col("part_b").alias("item"),
                    F.col("part_a").alias("neighbor"),
                    F.col("nab").alias("nab"),
                ),
            )
        ).alias("e")
    ).select("e.item", "e.neighbor", "e.nab")
    scored = (
        sym.join(
            ic.select(F.col("l_partkey").alias("item"), F.col("cnt").alias("na")),
            "item",
        )
        .join(
            ic.select(
                F.col("l_partkey").alias("neighbor"),
                F.col("cnt").alias("nb"),
            ),
            "neighbor",
        )
        .select("item", "neighbor", F.expr(_CF_COSINE).alias("cosine"))
    )
    top3 = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("item").orderBy(
                    F.desc("cosine"), "neighbor"
                )
            ),
        )
        .filter(F.col("rk") <= 3)
        .select("item", F.col("neighbor").alias("held"), F.lit(1).alias("t"))
    )
    ev = (
        ctx.select(F.col("l_partkey").alias("item"), "held", "l_orderkey")
        .join(top3, ["item", "held"], "left")
        .groupBy("l_orderkey")
        .agg(F.max(F.coalesce(F.col("t"), F.lit(0))).alias("hit"))
    )
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("hit").cast("bigint").alias("hits"),
    ).select("nb", "hits", F.expr(_CFE_RECALL).alias("recall_at_3"))


@register(
    "agg_weighted_quantiles",
    """
    WITH g AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2),
    r AS (
      SELECT flag, price, w,
             CAST(SUM(w) OVER (PARTITION BY flag ORDER BY price)
               AS BIGINT) AS cum,
             CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
      FROM g)
    SELECT flag,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           (MIN(CASE WHEN 4 * cum >= tot THEN price END)
            + MIN(CASE WHEN 4 * cum > tot THEN price END)) / 2.0
             AS w_p25,
           (MIN(CASE WHEN 2 * cum >= tot THEN price END)
            + MIN(CASE WHEN 2 * cum > tot THEN price END)) / 2.0
             AS w_median,
           (MIN(CASE WHEN 4 * cum >= 3 * tot THEN price END)
            + MIN(CASE WHEN 4 * cum > 3 * tot THEN price END)) / 2.0
             AS w_p75
    FROM r GROUP BY flag ORDER BY flag
    """,
    "quantity-weighted p25/median/p75 per return flag — the full "
    "weighted-quantile readout generalizing agg_weighted_median: one "
    "running-weight pass serves EVERY quantile (each is the (lo+hi)/2 "
    "midpoint at its exact integer mass boundary — 4*cum >= tot, "
    "2*cum >= tot, 4*cum >= 3*tot — no float mass arithmetic "
    "anywhere). At 100 TB: one map-side-combined corpus shuffle; the "
    "ordered pass range-partitions the per-flag price domain",
    "analytics extension (weighted quantiles)",
)
def agg_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("w"))
    r = g.select(
        "flag",
        "price",
        F.sum("w")
        .over(Window.partitionBy("flag").orderBy("price"))
        .cast("bigint")
        .alias("cum"),
        F.sum("w")
        .over(Window.partitionBy("flag"))
        .cast("bigint")
        .alias("tot"),
    )

    def q(lo_cond, hi_cond, name):
        return (
            (
                F.min(F.when(lo_cond, F.col("price")))
                + F.min(F.when(hi_cond, F.col("price")))
            )
            / F.lit(2.0)
        ).alias(name)

    c, t = F.col("cum"), F.col("tot")
    return (
        r.groupBy("flag")
        .agg(
            F.max("tot").cast("bigint").alias("total_weight"),
            q(4 * c >= t, 4 * c > t, "w_p25"),
            q(2 * c >= t, 2 * c > t, "w_median"),
            q(4 * c >= 3 * t, 4 * c > 3 * t, "w_p75"),
        )
        .orderBy("flag")
    )


# Per-decile uplift and cumulative qini from exact integer counts —
# ONE shared all-DOUBLE formula text each, 9 dp.
_UPLIFT_TXT = (
    # trailing + 0.0 normalizes the zero sign: DuckDB round() keeps
    # -0.0 from a tiny-negative input, Spark's BigDecimal path does not
    "round(CASE WHEN nt > 0 AND nc > 0 THEN "
    "CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc "
    "ELSE CAST(0 AS DOUBLE) END, 9) + CAST(0 AS DOUBLE)"
)
_QINI_TXT = (
    "round(CASE WHEN cum_nc > 0 THEN "
    "CAST(cum_ct AS DOUBLE) - CAST(cum_cc AS DOUBLE) "
    "* (CAST(cum_nt AS DOUBLE) / cum_nc) "
    "ELSE CAST(cum_ct AS DOUBLE) END, 9) + CAST(0 AS DOUBLE)"
)


def _o_uplift_qini() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    return f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN {o_hash_bucket("user_id", "ab")} < 128
                  THEN 'T' ELSE 'C' END AS arm,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS score,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                      END) AS BIGINT) AS converted
      FROM events GROUP BY 1),
    d AS (
      SELECT arm, converted,
             CAST(NTILE(10) OVER (ORDER BY score DESC, user_id)
                  AS BIGINT) AS decile
      FROM u),
    agg AS (
      SELECT decile,
             CAST(SUM(CASE WHEN arm = 'T' THEN 1 ELSE 0 END) AS BIGINT)
               AS nt,
             CAST(SUM(CASE WHEN arm = 'C' THEN 1 ELSE 0 END) AS BIGINT)
               AS nc,
             CAST(SUM(CASE WHEN arm = 'T' THEN converted ELSE 0 END)
                  AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN arm = 'C' THEN converted ELSE 0 END)
                  AS BIGINT) AS cc
      FROM d GROUP BY decile),
    c AS (
      SELECT decile, nt, nc, ct, cc,
             CAST(SUM(nt) OVER w AS BIGINT) AS cum_nt,
             CAST(SUM(nc) OVER w AS BIGINT) AS cum_nc,
             CAST(SUM(ct) OVER w AS BIGINT) AS cum_ct,
             CAST(SUM(cc) OVER w AS BIGINT) AS cum_cc
      FROM agg
      WINDOW w AS (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT decile, nt, nc, ct, cc,
           {_UPLIFT_TXT} AS uplift,
           {_QINI_TXT} AS qini
    FROM c ORDER BY decile
    """


@register(
    "events_uplift_qini",
    _o_uplift_qini(),
    "uplift-by-decile + cumulative Qini (Radcliffe 2007 — the "
    "incrementality readout for targeted campaigns, complementing the "
    "response-only lift table): users scored by pre-treatment "
    "engagement (click count), assigned T/C by the same deterministic "
    "user-id hash the z-test uses, bucketed into score deciles "
    "(NTILE semantics, id tie-break — computed from DISTRIBUTED "
    "exact ranks via operators/ranks.range_rank + the integer NTILE "
    "formula, so the user frame is never sorted through one "
    "partition and the oracle's NTILE hashes are unchanged), then "
    "per-decile treated-minus-control "
    "conversion uplift and the cumulative Qini curve Q(k) = "
    "cumT_conv - cumC_conv * cumT_n/cumC_n — all from exact integer "
    "counts, divisions in shared all-DOUBLE texts at 9 dp. One "
    "per-user rollup; everything after runs on the 10-row decile "
    "frame",
    "analytics extension (uplift modeling / Qini curve)",
)
def events_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr
    from pyspark.sql.window import Window as W

    ev = load_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("score"),
        F.max(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("converted"),
    ).select(
        F.when(hash_bucket_expr("user_id", "ab") < 128, "T")
        .otherwise("C")
        .alias("arm"),
        "score",
        "converted",
        "user_id",
    )
    from hangarbay_spark.operators.ranks import ntile_sql, range_rank

    # checkpoint: the range boundary-sampling pass would otherwise
    # re-run the per-user rollup a second time
    rr = range_rank(
        u.localCheckpoint(eager=True),
        [F.col("score").desc(), F.col("user_id").asc()],
        32,
    )
    d = rr.select(
        "arm",
        "converted",
        F.expr(ntile_sql("rn", "__n", 10)).alias("decile"),
    )
    agg = d.groupBy("decile").agg(
        F.sum(F.expr("CASE WHEN arm = 'T' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("nt"),
        F.sum(F.expr("CASE WHEN arm = 'C' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.expr("CASE WHEN arm = 'T' THEN converted ELSE 0 END"))
        .cast("bigint")
        .alias("ct"),
        F.sum(F.expr("CASE WHEN arm = 'C' THEN converted ELSE 0 END"))
        .cast("bigint")
        .alias("cc"),
    )
    cw = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = agg.select(
        "decile",
        "nt",
        "nc",
        "ct",
        "cc",
        F.sum("nt").over(cw).cast("bigint").alias("cum_nt"),
        F.sum("nc").over(cw).cast("bigint").alias("cum_nc"),
        F.sum("ct").over(cw).cast("bigint").alias("cum_ct"),
        F.sum("cc").over(cw).cast("bigint").alias("cum_cc"),
    )
    return c.select(
        "decile",
        "nt",
        "nc",
        "ct",
        "cc",
        F.expr(_UPLIFT_TXT).alias("uplift"),
        F.expr(_QINI_TXT).alias("qini"),
    ).orderBy("decile")


_TRUSS_K = 4  # keep edges in >= (k-2) = 2 triangles of the survivor graph
_TRUSS_ROUNDS = 3


def _o_ktruss() -> str:
    """Unrolled k-truss oracle: each round recounts per-edge triangle
    support inside the CURRENT survivor subgraph (wedge join through
    common neighbors + closing-edge join) and keeps edges with
    support >= k-2 — exactly the Spark loop's rounds."""
    ctes = [
        _COPURCHASE_SMALL_SQL.strip(),
        "e0 AS (SELECT src, dst FROM e)",
    ]
    for r in range(1, _TRUSS_ROUNDS + 1):
        ctes.append(
            f"und{r - 1} AS (SELECT src, dst FROM e{r - 1} "
            f"UNION ALL SELECT dst, src FROM e{r - 1})"
        )
        ctes.append(
            f"""sup{r} AS (
      SELECT a.src AS u, b.src AS v, COUNT(*) AS s
      FROM und{r - 1} a JOIN und{r - 1} b
        ON a.dst = b.dst AND a.src < b.src
      JOIN e{r - 1} ee ON ee.src = a.src AND ee.dst = b.src
      GROUP BY 1, 2)"""
        )
        ctes.append(
            f"e{r} AS (SELECT ee.src, ee.dst FROM e{r - 1} ee "
            f"JOIN sup{r} s ON s.u = ee.src AND s.v = ee.dst "
            f"WHERE s.s >= {_TRUSS_K - 2})"
        )
    rounds = " UNION ALL ".join(
        f"SELECT {r} AS round, CAST(COUNT(*) AS BIGINT) AS n_edges, "
        f"CAST(COUNT(DISTINCT src) + 0 AS BIGINT) AS n_src FROM e{r}"
        for r in range(_TRUSS_ROUNDS + 1)
    )
    return f"""
    WITH {",".join(ctes)}
    SELECT round, n_edges, n_src FROM ({rounds}) t ORDER BY round
    """


@register(
    "graph_ktruss_edges",
    _o_ktruss(),
    f"k-truss decomposition (Cohen 2008; k={_TRUSS_K}): iteratively "
    "drop every edge lying in fewer than k-2 triangles OF THE "
    "SURVIVOR GRAPH, the edge-cohesion upgrade of k-core — a truss "
    "edge is peer-certified by two common neighbors, which is why "
    "k-truss survives the noisy-hub failure mode of degree-based "
    "cores. Per round: one wedge join through common neighbors + the "
    "closing-edge join (map-side-combined count), survivor frame "
    f"checkpointed; {_TRUSS_ROUNDS} bounded rounds (the anytime cut "
    "— support only shrinks, so counts are a certified upper "
    "envelope). All integers; the oracle unrolls the identical "
    "rounds. Output: per-round surviving edge/endpoint counts",
    "analytics extension (k-truss cohesion)",
)
def graph_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    # Regime switch on edge count (graph.LOOP_KERNEL_MAX_EDGES): tiny
    # graphs replay the peel rounds in ONE Arrow task — exact integers
    # (equivalence pinned by test_small_graph_loop_kernels_match_loops).
    from hangarbay_spark.operators.graph import (
        LOOP_KERNEL_MAX_EDGES,
        ktruss_rounds_kernel,
    )

    if e.count() <= LOOP_KERNEL_MAX_EDGES:
        return ktruss_rounds_kernel(e, _TRUSS_K, _TRUSS_ROUNDS).orderBy(
            "round"
        )
    rounds = [e.localCheckpoint(eager=True)]
    cur = rounds[0]
    for _ in range(_TRUSS_ROUNDS):
        und = cur.unionByName(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        sup = (
            und.alias("a")
            .join(
                und.alias("b"),
                (F.col("a.dst") == F.col("b.dst"))
                & (F.col("a.src") < F.col("b.src")),
            )
            .select(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
            .join(
                cur.select(
                    F.col("src").alias("u"), F.col("dst").alias("v")
                ),
                ["u", "v"],
            )
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("s"))
            .filter(F.col("s") >= _TRUSS_K - 2)
        )
        cur = (
            cur.join(
                sup.select(
                    F.col("u").alias("src"), F.col("v").alias("dst")
                ),
                ["src", "dst"],
                "left_semi",
            )
        ).localCheckpoint(eager=True)
        rounds.append(cur)
    out = None
    for r, frame in enumerate(rounds):
        o = frame.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.countDistinct("src").cast("bigint").alias("n_src"),
        ).select(F.lit(r).cast("bigint").alias("round"), "n_edges", "n_src")
        out = o if out is None else out.unionByName(o)
    return out.orderBy("round")


# Order-statistic ranks for the distribution-free median CI: one
# shared all-DOUBLE text (z = 1.959964), floored to an integer rank;
# the upper rank is the symmetric reflection n + 1 - lo.
_MEDCI_LO = (
    "CAST(floor((CAST(n AS DOUBLE) "
    "- 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT)"
)


@register(
    "agg_median_ci",
    f"""
    WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
    rk AS (SELECT n, {_MEDCI_LO} AS lo_rank,
                  n + 1 - {_MEDCI_LO} AS hi_rank,
                  (n + 1) // 2 AS med_rank
           FROM nn),
    r AS (SELECT o_totalprice AS v,
                 CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice,
                                         o_orderkey) AS BIGINT) AS rn
          FROM orders)
    SELECT rk.n, rk.lo_rank, rk.med_rank, rk.hi_rank,
           MAX(CASE WHEN r.rn = rk.lo_rank THEN r.v END) AS lo_value,
           MAX(CASE WHEN r.rn = rk.med_rank THEN r.v END) AS med_value,
           MAX(CASE WHEN r.rn = rk.hi_rank THEN r.v END) AS hi_value
    FROM r CROSS JOIN rk
    GROUP BY rk.n, rk.lo_rank, rk.med_rank, rk.hi_rank
    """,
    "distribution-free median confidence interval (order-statistic / "
    "sign-test inversion, Hahn & Meeker): the 95% CI is [value at "
    "rank floor((n - 1.96*sqrt(n))/2), value at the symmetric rank "
    "n+1-lo] — NO normality assumption, valid for any continuous "
    "distribution, which a bootstrap needs thousands of resamples to "
    "approximate. Ranks come from one shared all-DOUBLE formula "
    "floored to exact integers; the three order statistics are read "
    "from the DISTRIBUTED distinct-value prefix sum (operators/"
    "ranks.value_prefix — the agg_equidepth_histogram two-level "
    "value-grid scan): the rank-k value is the unique distinct-value "
    "row with cb < k <= cb + c, so no global Sort+Window ever sees "
    "the row-scale frame and n rides in the prefix frame itself (no "
    "rank-frame cross join). The oracle's row_number tie-break "
    "(o_orderkey) cannot change the VALUE at a rank — tied rows "
    "share it. Median rank is integer (n+1) DIV 2 — never a float "
    "ceil",
    "aggregation extension (distribution-free median CI)",
)
def agg_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.ranks import hit_rank as hit
    from hangarbay_spark.operators.ranks import value_prefix

    orders = load_table(spark, sf_dir, "orders")
    r = value_prefix(
        orders.select("o_totalprice"), [], "o_totalprice", 1000.0
    ).select(
        F.col("__v").alias("v"),
        "__c",
        "__cb",
        F.col("__n").alias("n"),
    )
    rk = r.select(
        "v",
        "__c",
        "__cb",
        "n",
        F.expr(_MEDCI_LO).alias("lo_rank"),
        (F.col("n") + 1 - F.expr(_MEDCI_LO)).alias("hi_rank"),
        F.expr("(n + 1) DIV 2").alias("med_rank"),
    )
    return (
        rk.filter(
            hit(F.col("lo_rank"))
            | hit(F.col("med_rank"))
            | hit(F.col("hi_rank"))
        )
        .groupBy("n", "lo_rank", "med_rank", "hi_rank")
        .agg(
            F.max(F.when(hit(F.col("lo_rank")), F.col("v"))).alias(
                "lo_value"
            ),
            F.max(F.when(hit(F.col("med_rank")), F.col("v"))).alias(
                "med_value"
            ),
            F.max(F.when(hit(F.col("hi_rank")), F.col("v"))).alias(
                "hi_value"
            ),
        )
    )


# Local clustering coefficient 2t/(d(d-1)) and the global (transitivity)
# ratio 6T/sum(d(d-1)) — shared all-DOUBLE texts, 9 dp.
_LOCAL_CC_TXT = (
    "round(CAST(2 AS DOUBLE) * t / (CAST(d AS DOUBLE) * (d - 1)), 9)"
)
_GLOBAL_CC_TXT = "round(CAST(6 AS DOUBLE) * n_triangles / wedges2, 9)"
_AVG_CC_TXT = "round(CAST(sloc AS DOUBLE) / n_nodes, 9)"


@register(
    "graph_clustering_coefficient",
    f"""
    WITH {_COPURCHASE_SMALL_SQL},
    und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM und GROUP BY 1),
    tri AS (SELECT a.src AS x, a.dst AS y, b.dst AS z
            FROM e a JOIN e b ON a.dst = b.src
            JOIN e c ON c.src = a.src AND c.dst = b.dst),
    tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
             SELECT unnest([x, y, z]) AS node FROM tri) u
           GROUP BY node),
    loc AS (
      SELECT deg.node, COALESCE(tn.t, 0) AS t, deg.d
      FROM deg LEFT JOIN tn USING (node) WHERE deg.d >= 2),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             SUM(CAST({_LOCAL_CC_TXT} AS DECIMAL(30,9))) AS sloc,
             CAST(SUM(d * (d - 1)) AS BIGINT) AS wedges2
      FROM loc),
    tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri)
    SELECT n_nodes, n_triangles,
           {_GLOBAL_CC_TXT} AS global_cc,
           {_AVG_CC_TXT} AS avg_local_cc
    FROM s CROSS JOIN tc
    """,
    "clustering coefficients (Watts-Strogatz local average + the "
    "global transitivity ratio 3T/W): per-node triangle counts from "
    "the compact-forward enumeration (each triangle once, exploded to "
    "its three corners), wedges from the degree rollup, local ratios "
    "2t/(d(d-1)) rounded at 9 dp and decimal-summed so the average is "
    "order-independent. The two coefficients DISAGREE on hub-heavy "
    "graphs (global is wedge-weighted, local is node-weighted) — "
    "reporting both is the standard small-world diagnostic. All "
    "integer counts; one shared all-DOUBLE text per ratio",
    "analytics extension (clustering coefficients / transitivity)",
)
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    two_hop = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(
            F.col("a.src").alias("x"),
            F.col("a.dst").alias("y"),
            F.col("b.dst").alias("z"),
        )
    )
    tri = two_hop.join(
        e.alias("c"),
        (F.col("c.src") == F.col("x")) & (F.col("c.dst") == F.col("z")),
        "left_semi",
    ).localCheckpoint()  # feeds the per-node explode AND the count
    tn = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    loc = (
        deg.join(tn, "node", "left")
        .select(
            "node", F.coalesce("t", F.lit(0)).alias("t"), "d"
        )
        .filter(F.col("d") >= 2)
    )
    s = loc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr(_LOCAL_CC_TXT).cast("decimal(30,9)")).alias("sloc"),
        F.sum(F.col("d") * (F.col("d") - 1)).cast("bigint").alias("wedges2"),
    )
    tc = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    return (
        s.crossJoin(F.broadcast(tc))
        .select(
            "n_nodes",
            "n_triangles",
            F.expr(_GLOBAL_CC_TXT).alias("global_cc"),
            F.expr(_AVG_CC_TXT).alias("avg_local_cc"),
        )
    )


_RICH_KS = (2, 4, 8)
# rich-club density among nodes of degree > k — shared all-DOUBLE text
_PHI_TXT = (
    "round(CAST(2 AS DOUBLE) * n_edges "
    "/ (CAST(n_nodes AS DOUBLE) * (n_nodes - 1)), 9)"
)


def _o_rich_club() -> str:
    arms = " UNION ALL ".join(
        f"""
      SELECT {k} AS k,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM deg
              WHERE d > {k}) AS n_nodes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM e
              JOIN deg da ON da.node = e.src AND da.d > {k}
              JOIN deg db ON db.node = e.dst AND db.d > {k}) AS n_edges"""
        for k in _RICH_KS
    )
    return f"""
    WITH {_COPURCHASE_SMALL_SQL},
    und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM und GROUP BY 1),
    arms AS ({arms})
    SELECT k, n_nodes, n_edges,
           CASE WHEN n_nodes >= 2 THEN {_PHI_TXT}
                ELSE CAST(0 AS DOUBLE) END AS phi
    FROM arms ORDER BY k
    """


@register(
    "graph_rich_club",
    _o_rich_club(),
    "rich-club coefficient battery (Zhou & Mondragon 2004): for each "
    "degree cutoff k, the edge density among nodes of degree > k — a "
    "rising phi(k) means hubs preferentially interconnect (the "
    "core-periphery signature; flat phi is hub-egalitarian). One "
    "degree rollup feeds every cutoff; per-k membership is two "
    "broadcast-scale semi-joins against the degree table, edges "
    "counted among survivors, density from exact integers through "
    "one shared all-DOUBLE text at 9 dp",
    "analytics extension (rich-club / core-periphery)",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_small(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = (
        und.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint()  # consumed by every cutoff arm
    )
    out = None
    for k in _RICH_KS:
        rich = deg.filter(F.col("d") > k).select("node")
        nn = rich.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        ne = (
            e.join(
                rich.select(F.col("node").alias("src")), "src", "left_semi"
            )
            .join(
                rich.select(F.col("node").alias("dst")), "dst", "left_semi"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        )
        o = (
            nn.crossJoin(F.broadcast(ne))
            .select(
                F.lit(k).cast("bigint").alias("k"),
                "n_nodes",
                "n_edges",
                F.when(F.col("n_nodes") >= 2, F.expr(_PHI_TXT))
                .otherwise(F.lit(0).cast("double"))
                .alias("phi"),
            )
        )
        out = o if out is None else out.unionByName(o)
    return out.orderBy("k")
