"""Core relational operator coverage (SURVEY.md §2.2-§2.6) expressed on
the driver's TPC-H-ish testdata tables.

Each query maps a reference operator family to idiomatic DataFrame code
plus an equivalent DuckDB oracle. Scale notes are inline: broadcasts for
dims, partial aggregation for groupBys, tie-broken top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hangarbay_spark.queries.base import (
    dsum,
    load_table,
    o_dsum,
    register,
    spread,
)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4: A1-A7)
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum("l_quantity", "sum_qty", 2)},
           {o_dsum("l_extendedprice", "sum_base_price", 2)},
           {o_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {o_dsum("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)", "sum_charge", 6)},
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 shape: filtered scan -> 2-key hash agg with 6 aggregates",
    "A1,A4,P1,F8",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread before the four decimal(30,x) sums (base.spread; the
    # report_ols_price_drivers precedent)
    li = spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    # Partial (map-side) aggregation is automatic for hash aggs; the only
    # shuffle is on the 2 low-cardinality keys -> 6 groups at any scale.
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty", 2),
            dsum("l_extendedprice", "sum_base_price", 2),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge", 6),
            (
                F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct_parts",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    "exact distinct aggregation (expand + two-phase agg in Spark)",
    "A4,A7",
)
def agg_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_rollup_status",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "ROLLUP grouping sets (subtotals + grand total)",
    "A1,A4 (+Spark-native grouping sets)",
)
def agg_rollup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
    )


@register(
    "agg_cube_priority_status",
    f"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
           COALESCE(o_orderstatus, 'ALL') AS st,
           COUNT(*) AS n,
           {o_dsum("o_totalprice", "total_price", 2)}
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    "CUBE grouping sets: all 4 subtotal combinations in one pass "
    "(Spark expands grouping sets before the hash agg — one shuffle)",
    "A1,A4 (+Spark-native grouping sets: CUBE)",
)
def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "total_price", 2),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            "n",
            "total_price",
        )
    )


@register(
    "agg_percentiles_by_flag",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    "exact interpolated percentiles per group from the DISTRIBUTED "
    "distinct-value prefix sum (operators/ranks.value_prefix — the "
    "agg_equidepth_histogram two-level value-grid scan): the value at "
    "0-indexed position k is the unique distinct-price row with "
    "cb <= k < cb + c, so NO per-group Sort+Window ever sees the "
    "row-scale frame (the old plan serialized each group through one "
    "ranked sort — 3 tasks total at any scale); the only corpus-scale "
    "shuffle is the map-side-combined distinct-value groupBy, and "
    "within-bin window partitions are price-domain-bounded (a $1000 "
    "band holds <= 100k cent values). Boundary values then feed "
    "v_lo + frac*(v_hi - v_lo) — the same (n-1)*p double formula "
    "Spark's percentile() and DuckDB's quantile_cont use, so "
    "cross-engine parity is unchanged. Unlike the builtin "
    "percentile() (which buffers a value->count map per group in ONE "
    "aggregation buffer and OOMs when a group holds tens of millions "
    "of near-unique doubles), every stage here is a hash shuffle or a "
    "bounded window. The constant-memory sketch twin for 100 TB "
    "remains agg_approx_sketches. Rounded to 6 dp: both engines "
    "interpolate the same sorted doubles and only the last multiply "
    "can drift 1 ulp",
    "A1 (+exact percentile aggregation)",
)
def agg_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.ranks import hit_idx, value_prefix

    li = load_table(spark, sf_dir, "lineitem")
    r = value_prefix(
        li.select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        "l_extendedprice",
        1000.0,
    ).withColumnRenamed("__n", "n")

    def pos(p: float):  # Spark Percentile.getPercentile: (count-1)*p
        return (F.col("n") - 1).cast("double") * F.lit(p)

    lo50, hi50 = F.floor(pos(0.5)), F.ceil(pos(0.5))
    lo90, hi90 = F.floor(pos(0.9)), F.ceil(pos(0.9))
    boundary = (
        hit_idx(lo50) | hit_idx(hi50) | hit_idx(lo90) | hit_idx(hi90)
    )

    def pick(cond):  # each boundary index matches exactly one value row
        return F.max(F.when(cond, F.col("__v")))

    agg = r.filter(boundary).groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        pick(hit_idx(lo50)).alias("v_lo50"),
        pick(hit_idx(hi50)).alias("v_hi50"),
        pick(hit_idx(lo90)).alias("v_lo90"),
        pick(hit_idx(hi90)).alias("v_hi90"),
    )

    def interp(p: float, v_lo: str, v_hi: str):
        # v_lo + (pos - floor(pos)) * (v_hi - v_lo): the exact operation
        # order of Spark's builtin percentile() and DuckDB quantile_cont.
        frac = pos(p) - F.floor(pos(p)).cast("double")
        return F.round(
            F.col(v_lo) + frac * (F.col(v_hi) - F.col(v_lo)), 6
        )

    return agg.select(
        "l_returnflag",
        interp(0.5, "v_lo50", "v_hi50").alias("median_price"),
        interp(0.9, "v_lo90", "v_hi90").alias("p90_price"),
        F.col("n").alias("n"),
    )


@register(
    "scalar_levenshtein_fuzzy",
    """
    SELECT c_custkey, c_name,
           CAST(levenshtein(c_name, 'Customer#000000100') AS BIGINT) AS dist
    FROM customer
    WHERE levenshtein(c_name, 'Customer#000000100') <= 2
    """,
    "fuzzy string matching: names within edit distance 2 of a probe "
    "(levenshtein is JVM-side codegen; at scale the filter sits behind "
    "cheap blocking — length band / shared n-gram — so the DP cost "
    "applies to candidates only)",
    "F-battery (+edit-distance similarity)",
)
def scalar_levenshtein_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    dist = F.levenshtein(F.col("c_name"), F.lit("Customer#000000100"))
    return (
        cust.filter(dist <= 2)
        .select("c_custkey", "c_name", dist.cast("bigint").alias("dist"))
    )


@register(
    "agg_skew_two_phase",
    f"""
    SELECT l_suppkey,
           COUNT(*) AS n,
           {o_dsum("l_extendedprice", "revenue", 2)},
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_suppkey
    """,
    "salted two-phase aggregation (plans/skew.py:two_phase_agg) on the "
    "declared surface: partial agg on (key, salt) shrinks hot keys "
    "map-side, then re-aggregate by key — result identical to the "
    "plain GROUP BY oracle because count/sum(decimal)/max all "
    "re-aggregate exactly",
    "A1 (+skew-mitigation two-phase aggregation)",
)
def agg_skew_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.plans.skew import two_phase_agg

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "price_dec", F.col("l_extendedprice").cast("decimal(30,2)")
    )
    out = two_phase_agg(
        li,
        "l_suppkey",
        {
            "n": ("l_extendedprice", "count"),
            "revenue": ("price_dec", "sum"),
            "max_qty": ("l_quantity", "max"),
        },
        salt=8,
    )
    return out.select(
        "l_suppkey",
        "n",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("max_qty").cast("double").alias("max_qty"),
    )


@register(
    "agg_group_concat",
    """
    SELECT o_custkey,
           COUNT(*) AS order_count,
           STRING_AGG(CAST(o_orderkey AS VARCHAR), ';' ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys_concat,
           BOOL_OR(o_orderstatus = 'F') AS any_f_flag
    FROM orders GROUP BY o_custkey
    """,
    "owners_summary analog: count + ordered STRING_AGG + BOOL_OR "
    "(reference publish.py:58-67; collect order made deterministic via "
    "array_sort, SURVEY §4.3 trap 2)",
    "A1,A2,A3",
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.array_join(
            F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))), ";"
        ).alias("order_keys_concat"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_f_flag"),
    )


@register(
    "filter_revenue_scan",
    f"""
    SELECT {o_dsum("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 shape: pure pushed-down filter + scalar aggregate",
    "P1,A4,F8",
)
def filter_revenue_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3: J1-J9)
# ---------------------------------------------------------------------------


@register(
    "join_topk_shipping_priority",
    f"""
    SELECT l_orderkey,
           {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape: 3-way join -> agg -> tie-broken top-k "
    "(TakeOrderedAndProject, no global sort)",
    "J7,A1,A5",
)
def join_topk_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # customer is the small side after the segment filter -> broadcast it
    # into orders; the orders->lineitem join shuffles on the order key.
    joined = li.join(
        orders.join(cust, orders.o_custkey == cust.c_custkey),
        li.l_orderkey == orders.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "join_local_supplier_volume",
    f"""
    SELECT n_name, {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    "TPC-H Q5 shape: 6-way star join with dim broadcast + region filter",
    "J1,J2,J7,A1",
)
def join_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "revenue"))
    )


@register(
    "join_decode_wide",
    """
    SELECT o_orderkey, o_orderstatus, c_name, n_name, r_name
    FROM orders
    LEFT JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation   ON c_nationkey = n_nationkey
    LEFT JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderkey % 100 = 0
    """,
    "aircraft_decoded analog: chained LEFT-JOIN decode view over "
    "broadcast dims (reference publish.py:156-183)",
    "J1,J2,J3,J4",
)
def join_decode_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 100 == 0
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select("o_orderkey", "o_orderstatus", "c_name", "n_name", "r_name")
    )


@register(
    "join_semi_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    "left-semi join (EXISTS) + agg",
    "J7 (semi variant)",
)
def join_semi_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_anti_no_returns",
    """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderstatus
    """,
    "left-anti join (NOT EXISTS) + agg",
    "J7 (anti variant)",
)
def join_anti_no_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Point lookup / search (SURVEY §2.6: Q1-Q4)
# ---------------------------------------------------------------------------


@register(
    "lookup_point_customer",
    """
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey = 777
    """,
    "search analog: point lookup + decode join (reference api.py:181-192); "
    "pushdown turns the scan into a single-row-group read",
    "Q1,J6",
)
def lookup_point_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") == 777)
    nation = load_table(spark, sf_dir, "nation")
    return cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name")


@register(
    "search_fleet_like",
    """
    SELECT c_custkey, c_name, c_mktsegment, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE (LOWER(c_name) LIKE '%00004%' OR LOWER(c_name) LIKE '%00013%')
      AND UPPER(n_name) = 'NATION_3'
    """,
    "fleet analog: OR-of-LIKEs substring search + equality filter "
    "(reference api.py:232-261)",
    "Q2,Q3,Q4,J7",
)
def search_fleet_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.upper(F.col("n_name")) == "NATION_3"
    )
    like_any = F.lower(F.col("c_name")).like("%00004%") | F.lower(
        F.col("c_name")
    ).like("%00013%")
    return (
        cust.filter(like_any)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "c_mktsegment", "n_name")
    )


@register(
    "topk_brands",
    """
    SELECT p_brand, COUNT(*) AS n
    FROM part GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 10
    """,
    "top-makers analog: group -> count -> tie-broken top-k "
    "(reference README.md:141-143)",
    "A5,A6,J8",
)
def topk_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Window functions (Spark-native extension; SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "window_top_orders_per_customer",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    "top-N per group via row_number window (single shuffle on the "
    "partition key; no self-join)",
    "window (Spark extension over §2.5)",
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(RANK() OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS rk
    FROM orders WHERE o_custkey < 100
    """,
    "running-total + rank windows with deterministic decimal accumulation",
    "window (Spark extension over §2.5)",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        F.rank().over(w).cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.5 set ops)
# ---------------------------------------------------------------------------


@register(
    "setop_union_dedup",
    """
    SELECT DISTINCT c_custkey, c_name FROM (
      SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
      UNION ALL
      SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
    ) t
    """,
    "union + dropDuplicates (notebook cell-13 semantics, SURVEY §2.5)",
    "setops",
)
def setop_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_name")
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name"
    )
    return a.unionByName(b).dropDuplicates(["c_custkey", "c_name"])


@register(
    "setop_intersect_except",
    """
    SELECT 'both' AS side, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') t1
    UNION ALL
    SELECT 'only_rich' AS side, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') t2
    """,
    "INTERSECT / EXCEPT set semantics",
    "setops",
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bld = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    both = rich.intersect(bld).select(F.lit("both").alias("side"), "c_custkey")
    only = rich.exceptAll(bld).distinct().select(
        F.lit("only_rich").alias("side"), "c_custkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Scalar expression parity (SURVEY §2.2: F1-F14)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 10, 9) AS name_digits,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           CONCAT_WS('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           TRIM(CONCAT('  ', c_name, '  ')) AS trimmed,
           REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS name_nonum,
           LPAD(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short
    FROM customer WHERE c_custkey < 200
    """,
    "string function battery: upper/substr/length/concat_ws/trim/"
    "regexp_replace/lpad/replace (SURVEY F1-F6 analogs)",
    "F1,F2,F3,F5,F6",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat_ws(
            "-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_nonum"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
    )


@register(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAYOFMONTH(o_orderdate) AS BIGINT) AS order_day,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month_start
    FROM orders WHERE o_orderkey < 1000
    """,
    "date function battery: year/month/day extract, date arithmetic, "
    "truncation (SURVEY F7,F14 analogs)",
    "F7,F14",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
    )


@register(
    "subquery_small_quantity_revenue",
    f"""
    WITH avgq AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT {o_dsum("l_extendedprice", "revenue", 2)}, COUNT(*) AS n
    FROM lineitem JOIN avgq ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
    "TPC-H Q17 shape: correlated per-key average via self-agg + join "
    "(both sides shuffle on the same key -> co-partitioned join; the "
    "decorrelated form Catalyst would produce for the subquery)",
    "A1,J7 (correlated-subquery decorrelation)",
)
def subquery_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    avgq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(avgq, li.l_partkey == avgq.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice", "revenue", 2),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "subquery_scalar_above_avg",
    """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                                      AS DOUBLE) / COUNT(*) FROM orders)
    GROUP BY o_orderstatus
    """,
    "scalar subquery: global average broadcast into the filter "
    "(one extra tiny job, no per-row recompute)",
    "A4,A7 (scalar subquery)",
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    avg_df = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_having_heavy_customers",
    """
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    """,
    "HAVING clause (post-aggregation filter)",
    "A1,A4",
)
def agg_having_heavy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "argmin_cheapest_supplier_per_part",
    """
    SELECT l_partkey, l_suppkey, cost FROM (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS cost,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY l_partkey
               ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE),
                        l_suppkey) AS BIGINT) AS rn
      FROM lineitem GROUP BY l_partkey, l_suppkey) t
    WHERE rn = 1 AND l_partkey < 200
    """,
    "TPC-H Q2 shape (argmin per group): agg -> window rank -> filter; "
    "one shuffle for the agg, the window reuses its partitioning",
    "A1,window (argmin pattern)",
)
def argmin_cheapest_supplier_per_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("cost")
    )
    w = W.partitionBy("l_partkey").orderBy("cost", "l_suppkey")
    return (
        per_supp.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rn") == 1) & (F.col("l_partkey") < 200))
        .select("l_partkey", "l_suppkey", "cost")
    )


@register(
    "join_full_outer_balance",
    """
    WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
    bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
                                             AND c_acctbal > 8000)
    SELECT COALESCE(big.c_custkey, bld.c_custkey) AS c_custkey,
           big.c_custkey IS NOT NULL AS is_rich,
           bld.c_custkey IS NOT NULL AS is_building
    FROM big FULL OUTER JOIN bld ON big.c_custkey = bld.c_custkey
    """,
    "full outer join (both-sides-preserved merge; the snapshot-diff "
    "join shape, pipelines/diff.py)",
    "J-family (full outer)",
)
def join_full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = cust.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("k_big")
    )
    bld = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 8000)
    ).select(F.col("c_custkey").alias("k_bld"))
    return big.join(bld, big.k_big == bld.k_bld, "full_outer").select(
        F.coalesce("k_big", "k_bld").alias("c_custkey"),
        F.col("k_big").isNotNull().alias("is_rich"),
        F.col("k_bld").isNotNull().alias("is_building"),
    )


@register(
    "agg_approx_sketches",
    None,  # sketch outputs are algorithm-specific (HLL++/GK in Spark,
    # HLL/t-digest in DuckDB) -> rows-only; error bounds are asserted
    # against exact values in tests/test_operators.py
    "approximate aggregation sketches: approx_count_distinct (HLL++) "
    "and percentile_approx (GK) per group — the constant-memory path "
    "for cardinality/quantiles at 100 TB where exact distinct would "
    "shuffle every value",
    "A-family (approximate sketches extension)",
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "pivot_segment_status",
    """
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    "pivot (wide conditional aggregation) over join",
    "A1,A7 (pivot extension)",
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    piv = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_p"),
    )


@register(
    "join_returned_items_topk",
    f"""
    SELECT c_custkey, c_name, n_name,
           {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 shape: returned-item revenue per customer — 4-way join "
    "with the returnflag/date filters pushed to the fact scans, nation "
    "broadcast, tie-broken top-20",
    "J7,A1,A5 (multi-join report)",
)
def join_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "join_market_share",
    """
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             n_name,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,4))) AS rev_dec
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1, 2)
    SELECT o_year, n_name,
           CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER (PARTITION BY o_year) AS DOUBLE)
             AS share
    FROM rev
    """,
    "TPC-H Q8 shape: supplier-nation revenue share per year within a "
    "region — star join, decimal-exact per-(year, nation) sums, and the "
    "per-year total via an exact DECIMAL window sum (a double window "
    "sum would be accumulation-order-dependent); doubles divide only at "
    "the end",
    "J7,A1 + 2.5 windows (market-share ratio)",
)
def join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    # nation⋈region is fixed-size -> safe to hint; the supplier side
    # grows with SF, so AQE decides broadcast-vs-shuffle from runtime
    # sizes rather than a forced hint.
    dims = supp.join(
        F.broadcast(
            nation.join(region, nation.n_regionkey == region.r_regionkey)
        ),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "n_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, li.l_suppkey == dims.s_suppkey)
    )
    rev = joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        "n_name",
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .cast("decimal(30,4)")
        ).alias("rev_dec")
    )
    tot = F.sum("rev_dec").over(W.partitionBy("o_year"))
    return rev.select(
        "o_year",
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec").cast("double") / tot.cast("double")).alias("share"),
    )


@register(
    "agg_order_count_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
    GROUP BY c_count
    """,
    "TPC-H Q13 shape: distribution of customers by order count — LEFT "
    "join with a non-key predicate in the ON clause (kept in the join, "
    "NOT pushed to a WHERE: customers whose only orders are urgent must "
    "still appear with count 0), then a second aggregation over the "
    "first's results. Both aggs are map-side-partial counts; the join "
    "shuffles on the customer key once",
    "A1,J7 (double aggregation; ON-clause predicate semantics)",
)
def agg_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "join_nullsafe_balance_band",
    """
    SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
           COALESCE(a.band, -1) AS band
    FROM (SELECT c_custkey,
                 NULLIF(CAST(FLOOR(c_acctbal / 1000) AS BIGINT), 0) AS band
          FROM customer WHERE c_custkey <= 200) a
    JOIN (SELECT c_custkey,
                 NULLIF(CAST(FLOOR(c_acctbal / 1000) AS BIGINT), 0) AS band
          FROM customer WHERE c_custkey <= 200) b
      ON a.band IS NOT DISTINCT FROM b.band
     AND a.c_custkey < b.c_custkey
    """,
    "null-safe equality join (IS NOT DISTINCT FROM / eqNullSafe): NULL "
    "band keys match each other — the semantics a plain equi-join "
    "silently drops. Spark still plans this as a hash join (eqNullSafe "
    "is an equi-condition, not a theta join); the NULLIF band exercises "
    "the null-bucket path explicitly",
    "J7 (null-safe variant; NULL-semantics battery)",
)
def join_nullsafe_balance_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    band = F.nullif(
        F.floor(F.col("c_acctbal") / 1000).cast("bigint"), F.lit(0)
    ).alias("band")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey", band)
    )
    a = cust.select(F.col("c_custkey").alias("cust_a"), F.col("band").alias("band_a"))
    b = cust.select(F.col("c_custkey").alias("cust_b"), F.col("band").alias("band_b"))
    return (
        a.join(
            b,
            F.col("band_a").eqNullSafe(F.col("band_b"))
            & (F.col("cust_a") < F.col("cust_b")),
        )
        .select(
            "cust_a",
            "cust_b",
            F.coalesce("band_a", F.lit(-1)).cast("bigint").alias("band"),
        )
    )


@register(
    "subquery_rich_no_orders",
    """
    WITH avg_bal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE CAST(c_acctbal AS DECIMAL(30,2)) * n > tot
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    "TPC-H Q22 shape: high-balance customers with no orders — "
    "uncorrelated scalar subquery (the positive-balance mean, broadcast "
    "as a 1-row cross join) + anti join against orders + decimal-exact "
    "balance sum. The above-average test is phrased bal*n > total in "
    "exact decimals: an AVG of doubles is a parallel FP sum whose last "
    "ulp is accumulation-order-dependent, and a boundary customer could "
    "flip between engines. The anti join shuffles on the customer key; "
    "the scalar is a broadcast, not a recompute-per-row",
    "J7 (anti) + A7 (scalar subquery) — Q22 shape",
)
def subquery_rich_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(30,2)")).alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal").cast("decimal(30,2)") * F.col("n") > F.col("tot")
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(30,2)"))
        .cast("double")
        .alias("totacctbal"),
    )


@register(
    "agg_mode_per_group",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM orders GROUP BY 1, 2)
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n_occ FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderstatus
        ORDER BY n_occ DESC, o_orderpriority) AS rk
      FROM c) t
    WHERE rk = 1
    """,
    "MODE aggregate (most frequent value per group): count sub-"
    "aggregation + deterministic argmax window (ties break on the "
    "value itself) — the merge-safe distributed formulation of an "
    "aggregate whose naive per-group value map cannot merge partial "
    "states",
    "2.4 aggregation extension (mode / most-frequent)",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "orders")
    c = li.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n_occ").desc(), F.col("o_orderpriority")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n_occ",
        )
    )


@register(
    "join_fuzzy_deletion_pairs",
    """
    WITH v AS (
      SELECT c_custkey, c_name,
             unnest(list_distinct(list_append(
               list_transform(generate_series(1, length(c_name)),
                              i -> substr(c_name, 1, i - 1)
                                   || substr(c_name, i + 1)),
               c_name))) AS var
      FROM customer),
    cand AS (
      SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.c_name AS na, b.c_name AS nb
      FROM v a JOIN v b ON a.var = b.var AND a.c_custkey < b.c_custkey)
    SELECT id_a, id_b, CAST(levenshtein(na, nb) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(na, nb) <= 1
    """,
    "pairwise fuzzy self-join at scale (entity resolution): all "
    "customer-name pairs within Levenshtein distance 1 via FastSS "
    "deletion neighborhoods (operators/fuzzy.py — each string explodes "
    "into itself + its 1-deletions; lev<=1 pairs MUST share a variant, "
    "so one equi-join on short variant strings replaces the O(n^2) "
    "distance matrix) with exact DP verification of candidates only — "
    "the pairwise upgrade of scalar_levenshtein_fuzzy's probe filter",
    "F-battery extension (fuzzy pairwise join / entity resolution)",
)
def join_fuzzy_deletion_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.fuzzy import deletion_join

    cust = load_table(spark, sf_dir, "customer")
    return deletion_join(cust, "c_custkey", "c_name", max_dist=1)


@register(
    "setop_bag_semantics",
    """
    SELECT 'excess' AS side, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F') t1
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'common' AS side, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F') t2
    GROUP BY o_orderpriority
    """,
    "BAG (multiset) set operations — EXCEPT ALL / INTERSECT ALL keep "
    "per-row multiplicities (count-difference / count-min semantics), "
    "unlike the distinct-set twins in setop_intersect_except; Spark "
    "plans both as count-comparing aggregations, one shuffle each",
    "setops (+bag semantics: EXCEPT ALL / INTERSECT ALL)",
)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")

    def counted(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ).select(F.lit(side).alias("side"), "o_orderpriority", "n")

    return counted(o.exceptAll(f), "excess").unionByName(
        counted(o.intersectAll(f), "common")
    )


@register(
    "sort_null_ordering",
    """
    WITH v AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_totalprice END AS tp
      FROM orders)
    SELECT 'top_non_null' AS side, o_orderkey, tp FROM (
      SELECT o_orderkey, tp FROM v
      ORDER BY tp DESC NULLS LAST, o_orderkey LIMIT 10) a
    UNION ALL
    SELECT 'nulls_first' AS side, o_orderkey, tp FROM (
      SELECT o_orderkey, tp FROM v
      ORDER BY tp ASC NULLS FIRST, o_orderkey LIMIT 10) b
    """,
    "explicit NULL-ordering semantics under LIMIT: Spark's default "
    "null order (NULLS FIRST ascending) and DuckDB's (NULLS LAST) "
    "DISAGREE, so any cross-engine top-k over a nullable sort key "
    "must pin the null position explicitly — this query pins both "
    "directions and selects through the LIMIT where the ordering is "
    "observable (row_number tie-broken; the harness hash is otherwise "
    "order-insensitive)",
    "2.5 sorts (+explicit NULLS FIRST/LAST)",
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tp = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    v = orders.select("o_orderkey", tp.alias("tp"))
    top = (
        v.orderBy(F.col("tp").desc_nulls_last(), "o_orderkey")
        .limit(10)
        .select(F.lit("top_non_null").alias("side"), "o_orderkey", "tp")
    )
    nf = (
        v.orderBy(F.col("tp").asc_nulls_first(), "o_orderkey")
        .limit(10)
        .select(F.lit("nulls_first").alias("side"), "o_orderkey", "tp")
    )
    return top.unionByName(nf)


_BLOOM_BITS = 65536  # 1024 64-bit words; ~0.8% fpp at 3k keys, k=3
_BLOOM_K = 3


@register(
    "join_bloom_prune",
    f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {o_dsum("o_totalprice", "revenue", 2)}
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
    "semi join behind a hand-built distributed Bloom filter (the "
    "runtime-filter pattern Spark injects on clusters via "
    "spark.sql.optimizer.runtime.bloomFilter): the dim keys fold into "
    "a 65536-bit filter fully distributed-side (k=3 xxhash64 seeds -> "
    "explode bit positions -> bit_or per 64-bit word -> one dense "
    "array row, never a driver collect), the fact side drops "
    "non-members with pure bitwise exprs BEFORE the shuffle, and the "
    "exact left-semi join after it removes the ~0.8% false positives "
    "— so results equal the plain IN-subquery oracle. At 100 TB the "
    "win is shuffle-input reduction: the 8 KiB filter broadcasts for "
    "free while the fact shuffle shrinks by the dim's selectivity",
    "2.3 joins (+Bloom-filter runtime pruning)",
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    m, k, nwords = _BLOOM_BITS, _BLOOM_K, _BLOOM_BITS // 64
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    # Build: k bit positions per key, OR'd into 64-bit words, densified
    # into one array<bigint> row (missing words -> 0).
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("c_custkey", F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    words = pos.groupBy((F.col("pos") / 64).cast("int").alias("w")).agg(
        F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("bits")
    )
    dense = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(F.element_at("wm", i), F.lit(0).cast("bigint")),
        ).alias("words")
    )
    checks = " AND ".join(
        f"(element_at(words, cast(pmod(xxhash64(o_custkey, {i}), {m}) "
        f"div 64 as int) + 1) & shiftleft(1L, cast(pmod(xxhash64("
        f"o_custkey, {i}), {m}) % 64 as int))) != 0"
        for i in range(k)
    )
    orders = load_table(spark, sf_dir, "orders")
    pruned = orders.crossJoin(F.broadcast(dense)).filter(F.expr(checks))
    exact = pruned.join(
        keys, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum("o_totalprice", "revenue", 2),
    )


_LATERAL_SQL = """
    SELECT n_name, s.s_name, s.s_acctbal
    FROM nation, LATERAL (
      SELECT s_name, s_acctbal FROM supplier
      WHERE s_nationkey = n_nationkey
      ORDER BY s_acctbal DESC, s_suppkey LIMIT 3) s
"""


@register(
    "join_lateral_topk",
    _LATERAL_SQL,
    "correlated LATERAL subquery with per-row ORDER BY ... LIMIT "
    "(top-3 suppliers by balance per nation) — the modern SQL "
    "formulation of top-k-per-group. Catalyst decorrelates the "
    "lateral into a ranked window join (DecorrelateInnerQuery), so "
    "the physical plan is the same one-shuffle row_number pattern as "
    "window_top_orders_per_customer, never a per-outer-row rescan; "
    "unique s_suppkey tie-break keeps the LIMIT row set identical "
    "cross-engine",
    "2.3/2.5 (+correlated LATERAL subquery surface)",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    # SQL path on purpose: LATERAL has no DataFrame-API equivalent;
    # spark.sql builds the same Catalyst plan a DataFrame would.
    return spark.sql(_LATERAL_SQL)


_RECURSIVE_SPARK_SQL = """
    WITH RECURSIVE anc(node, ancestor) AS (
      SELECT p_partkey, p_partkey FROM part
      UNION ALL
      SELECT node, ancestor div 2 FROM anc WHERE ancestor > 1
    )
    SELECT ancestor,
           CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(30,2))) AS DOUBLE)
             AS subtree_value
    FROM anc JOIN part ON node = p_partkey
    GROUP BY ancestor
    ORDER BY n_desc DESC, ancestor
    LIMIT 25
"""


@register(
    "subquery_recursive_hierarchy",
    _RECURSIVE_SPARK_SQL.replace(" div 2", " // 2"),
    "recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4): "
    "hierarchical rollup over a derived binary-tree part hierarchy "
    "(parent = key/2) — every part's ancestor chain is materialized "
    "iteratively (~log2(n) recursion steps, rows = n*depth, no "
    "explosion) and descendant counts + exact-decimal subtree values "
    "aggregate per ancestor. Spark executes the recursion as an "
    "iterative union loop; the oracle is DuckDB's native recursive "
    "CTE (integer-division spelling differs: div vs //). The BFS/"
    "transitive-closure family for real graphs lives in "
    "operators/graph.py + operators/dedup.py connected components "
    "(checkpointed loops — the scale path when recursion depth is "
    "data-dependent)",
    "2.3/2.5 (+recursive CTE / hierarchical query surface)",
)
def subquery_recursive_hierarchy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Materialized recursion rows = n_parts * log2(max key): ~3.6M at
    # sf1, over Spark's 1M default backstop. The limit is a guard
    # against unbounded recursion, not a memory bound — each iteration
    # is a distributed union step — so raise it for the log-depth
    # hierarchy (100 GB-scale hierarchies stay log-bounded; data-
    # dependent-depth graphs belong to the checkpointed loops in
    # operators/graph.py instead).
    # Scope the override: materialize under the raised limit, then
    # restore the prior value so the runaway-recursion backstop stays
    # armed for every later query on the shared session.
    prior = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(1 << 30))
    try:
        load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
        return spark.sql(_RECURSIVE_SPARK_SQL).localCheckpoint()
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prior)


@register(
    "join_skew_salted",
    f"""
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey = 7
    GROUP BY s_name
    ORDER BY revenue DESC, s_name
    LIMIT 15
    """,
    "explicitly salted fact-to-medium-dim join (plans/skew.py:"
    "salted_join): the fact side gets a seeded random salt, the dim "
    "side replicates salt-x, and the join keys on (key, salt) — each "
    "hot key's shuffle partition shrinks by the salt factor. Results "
    "are salt-invariant (the salt only routes rows), so the oracle is "
    "the plain join. This testdata's l_suppkey is uniform; the plan "
    "is registered for the 100 TB power-law case AQE's sort-merge "
    "skew split can't fix (medium dim: too big to broadcast, hot "
    "partitions too large to split)",
    "2.3 joins (+explicit salting for skew; AQE-resistant shapes)",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.plans.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 7)
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
    )
    joined = salted_join(li, supp, "l_suppkey", salt=8, how="inner")
    return (
        joined.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
        .orderBy(F.col("revenue").desc(), "s_name")
        .limit(15)
    )


@register(
    "join_spatial_grid_pairs",
    """
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * 61) % 1000 AS x,
             (c_custkey * 97) % 1000 AS y
      FROM customer WHERE c_mktsegment = 'MACHINERY'),
    cells AS (
      SELECT id, x, y, x // 5 AS cx, y // 5 AS cy FROM pts),
    shifted AS (
      SELECT a.id, a.x, a.y, a.cx + dx.d AS ncx, a.cy + dy.d AS ncy
      FROM cells a,
           (SELECT unnest([-1, 0, 1]) AS d) dx,
           (SELECT unnest([-1, 0, 1]) AS d) dy),
    pairs AS (
      SELECT s.id AS id_a, b.id AS id_b,
             (s.x - b.x) * (s.x - b.x) + (s.y - b.y) * (s.y - b.y)
               AS dist_sq
      FROM shifted s JOIN cells b
        ON s.ncx = b.cx AND s.ncy = b.cy AND s.id < b.id
      WHERE (s.x - b.x) * (s.x - b.x) + (s.y - b.y) * (s.y - b.y) <= 25)
    SELECT id_a, id_b, CAST(dist_sq AS BIGINT) AS dist_sq
    FROM pairs
    ORDER BY dist_sq, id_a, id_b
    LIMIT 100
    """,
    "2D spatial grid join (the geohash/S2 cell pattern): points on a "
    "derived integer lattice, radius-5 neighbor pairs found by "
    "bucketing into radius-sized cells and expanding ONE side into "
    "its 3x3 neighborhood (9x fan-out of points, never of pairs) — "
    "the equi-join on (cell_x, cell_y) replaces the quadratic "
    "distance cross join exactly like range_join's 1D binning; the "
    "exact distance check is pure integer arithmetic (zero float "
    "drift). id_a < id_b dedups the symmetric pair; at 100 TB cell "
    "ids double as write-time partition keys for spatial locality",
    "2.3 joins (+2D spatial grid join)",
)
def join_spatial_grid_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 61) % 1000).alias("x"),
        ((F.col("c_custkey") * 97) % 1000).alias("y"),
    )
    cells = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / 5).alias("cx"),
        F.floor(F.col("y") / 5).alias("cy"),
    ).localCheckpoint(eager=True)
    shifted = (
        cells.select(
            "id", "x", "y", "cx", "cy",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx"),
        )
        .select(
            "id", "x", "y", "cx", "cy", "dx",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"),
        )
        .select(
            "id", "x", "y",
            (F.col("cx") + F.col("dx")).alias("ncx"),
            (F.col("cy") + F.col("dy")).alias("ncy"),
        )
    )
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    dist_sq = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    return (
        shifted.join(
            b,
            (F.col("ncx") == F.col("cx"))
            & (F.col("ncy") == F.col("cy"))
            & (F.col("id") < F.col("id_b")),
        )
        .filter(dist_sq <= 25)
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            dist_sq.cast("bigint").alias("dist_sq"),
        )
        .orderBy("dist_sq", "id_a", "id_b")
        .limit(100)
    )


_BUCKETED_TABLES: dict[str, tuple[str, str]] = {}


def _ensure_bucketed_orderkey(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Once per (process, corpus): lineitem + orders persisted as
    catalog tables bucketed 32 ways on the order key (column-pruned to
    what the query reads), via plans/layout.write_bucketed — one
    write-time shuffle each, amortized over every subsequent
    co-located join."""
    import hashlib

    key = sf_dir.rstrip("/")
    cached = _BUCKETED_TABLES.get(key)
    if cached is not None:
        return cached
    from hangarbay_spark.plans.layout import write_bucketed

    digest = hashlib.sha256(key.encode()).hexdigest()[:8]
    li_t, o_t = f"hb_bkt_li_{digest}", f"hb_bkt_ord_{digest}"
    # The in-memory catalog dies with the process but the warehouse
    # directory persists: a stale location without catalog metadata is
    # useless (the bucket spec lives in the catalog), so clear it and
    # rewrite.
    import shutil
    from pathlib import Path

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (li_t, o_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(Path(wh) / t.lower(), ignore_errors=True)
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        li_t,
        "l_orderkey",
        buckets=32,
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        o_t,
        "o_orderkey",
        buckets=32,
    )
    _BUCKETED_TABLES[key] = (li_t, o_t)
    return li_t, o_t


@register(
    "join_bucketed_colocated",
    f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "co-located fact-to-fact join over BUCKETED tables (the layout "
    "answer to the biggest shuffle in the schema): lineitem and "
    "orders are persisted bucketed 32 ways on the order key "
    "(write_bucketed, one write-time shuffle each, paid once at "
    "publish), after which the orderkey join is SHUFFLE-FREE — "
    "neither side ever plans an Exchange on the join key (pinned in "
    "tests; at tiny SF the planner still broadcasts the pruned "
    "orders side, which equally shuffles nothing). At 100 TB this "
    "is the difference between "
    "re-shuffling the fact table per query and never shuffling it "
    "again; results identical to the plain join, same oracle",
    "2.3/2.6 Q6 (bucketed co-located join surfaced as a query)",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    li_t, o_t = _ensure_bucketed_orderkey(spark, sf_dir)
    li = spark.table(li_t)
    o = spark.table(o_t)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_interval_overlap_shipments",
    """
    WITH li AS (
      SELECT l_suppkey, l_orderkey * 10 + l_linenumber AS lid,
             CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE)
               + (CAST(l_quantity AS INTEGER) % 30 + 5) AS r
      FROM lineitem),
    p AS (
      SELECT a.l_suppkey
      FROM li a JOIN li b
        ON a.l_suppkey = b.l_suppkey AND a.lid < b.lid
       AND a.s <= b.r AND b.s <= a.r)
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM p GROUP BY l_suppkey
    ORDER BY n_overlaps DESC, l_suppkey
    LIMIT 15
    """,
    "INTERVAL-OVERLAP pair counting (both sides are intervals -- the "
    "shape range_join's point-in-interval binning cannot express): per "
    "supplier, pairs of shipments whose ship->receipt transit windows "
    "overlap. Computed by a SWEEP, no pair join at all (r10): "
    "overlaps = C(n,2) - disjoint pairs, and a disjoint unordered "
    "pair has exactly one orientation with x.r < y.s, so the disjoint "
    "count is a running end-event tally over the merged start/end "
    "event stream (one window, RANGE frame on the 2*day+isr key). One "
    "shuffle on l_suppkey that the final aggregation reuses — "
    "O(n log n) per supplier instead of quadratic-in-bucket-occupancy "
    "(the previous month-bin explode + equi-join read 5.97 s vs "
    "1.89 s at sf0.1). Pure integer arithmetic; the oracle IS the "
    "quadratic per-supplier pair join, proving the sweep computes the "
    "same relation",
    "2.3 extension (interval-overlap join via bin expansion)",
)
def join_interval_overlap_shipments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # the synthetic lineitem carries no receipt date: derive a
    # deterministic transit window end (ship + 5..34 days from the
    # quantity) with identical date arithmetic on both engines
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("s"),
        F.date_add(
            F.to_date("l_shipdate"), F.col("l_quantity").cast("int") % 30 + 5
        ).alias("r"),
    )
    # Sweep-line counting, NO pair join at all (r10, guide §1.2/§2.4:
    # change the algorithm before tuning the join). Per supplier the
    # overlap count is C(n,2) minus the DISJOINT pairs, and a disjoint
    # unordered pair has exactly one orientation with x.r < y.s (both
    # can't hold since s <= r), so disjoint = #{(x,y): x.r < y.s}.
    # That count is a running tally over the merged start/end event
    # stream: encode each event on the integer day line as
    # k = 2*day + isr (isr=1 for interval ENDS), and for every START
    # event sum the isr's over the RANGE frame k' <= k-1 — ends at
    # strictly earlier days only, exactly r < s. One window shuffle on
    # l_suppkey that the following groupBy reuses replaces the
    # month-bin explode + self-join + quadratic-in-occupancy filter
    # (A/B at sf0.1: 5.37 -> ~1 s, identical rows). The count is pure
    # integer arithmetic; the oracle remains the quadratic per-supplier
    # pair join, so parity PROVES the sweep computes the same relation.
    ev = li.select(
        "l_suppkey",
        (F.datediff(F.col("s"), F.lit("1970-01-01")) * 2).alias("k"),
        F.lit(0).alias("isr"),
    ).unionByName(
        li.select(
            "l_suppkey",
            (F.datediff(F.col("r"), F.lit("1970-01-01")) * 2 + 1).alias("k"),
            F.lit(1).alias("isr"),
        )
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("k")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    starts = ev.withColumn(
        "ends_before", F.coalesce(F.sum("isr").over(w), F.lit(0))
    ).filter(F.col("isr") == 0)
    per_supp = starts.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ends_before").alias("disjoint"),
    )
    return (
        per_supp.select(
            "l_suppkey",
            (
                F.expr("CAST(n AS BIGINT) * (CAST(n AS BIGINT) - 1) DIV 2")
                - F.col("disjoint")
            )
            .cast("bigint")
            .alias("n_overlaps"),
        )
        .filter(F.col("n_overlaps") > 0)
        .orderBy(F.col("n_overlaps").desc(), "l_suppkey")
        .limit(15)
    )


@register(
    "join_interval_concurrency",
    """
    WITH li AS (
      SELECT l_suppkey,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               AS sd,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               + (CAST(l_quantity AS INTEGER) % 30 + 5) AS rd
      FROM lineitem),
    ev AS (
      SELECT l_suppkey, sd AS d, 1 AS delta FROM li
      UNION ALL
      SELECT l_suppkey, rd + 1, -1 FROM li),
    agg AS (
      SELECT l_suppkey, d, CAST(SUM(delta) AS BIGINT) AS delta
      FROM ev GROUP BY 1, 2),
    run AS (
      SELECT l_suppkey, d,
             SUM(delta) OVER (PARTITION BY l_suppkey ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM agg),
    mx AS (
      SELECT l_suppkey, CAST(MAX(conc) AS BIGINT) AS max_concurrent
      FROM run GROUP BY 1),
    pk AS (
      SELECT r.l_suppkey, CAST(MIN(r.d) AS BIGINT) AS peak_day
      FROM run r JOIN mx m
        ON m.l_suppkey = r.l_suppkey AND r.conc = m.max_concurrent
      GROUP BY 1)
    SELECT m.l_suppkey, m.max_concurrent, pk.peak_day
    FROM mx m JOIN pk USING (l_suppkey)
    ORDER BY m.max_concurrent DESC, m.l_suppkey
    LIMIT 15
    """,
    "interval CONCURRENCY by sweep line: per supplier, the maximum "
    "number of simultaneously in-transit shipments and the first day "
    "it is reached — +1/-1 boundary events, one (supplier, day) "
    "pre-aggregation, then a running sum per supplier. The sweep "
    "computes in O(events log events) what the pairwise overlap join "
    "(join_interval_overlap_shipments) cannot: concurrency DEPTH, not "
    "just pair existence — the capacity-planning readout. At 100 TB: "
    "one map-side-combined event rollup + one supplier-keyed window; "
    "nothing pairwise anywhere",
    "2.3 extension (interval sweep-line concurrency)",
)
def join_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01")).alias("sd"),
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01"))
            + (F.col("l_quantity").cast("int") % 30 + 5)
        ).alias("rd"),
    )
    ev = li.select(
        "l_suppkey", F.col("sd").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        li.select(
            "l_suppkey",
            (F.col("rd") + 1).alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    agg = ev.groupBy("l_suppkey", "d").agg(
        F.sum("delta").cast("bigint").alias("delta")
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = agg.select(
        "l_suppkey", "d", F.sum("delta").over(w).alias("conc")
    ).localCheckpoint()  # two consumers: max frame + peak-day lookup
    mx = run.groupBy("l_suppkey").agg(
        F.max("conc").cast("bigint").alias("max_concurrent")
    )
    pk = (
        run.join(mx, "l_suppkey")
        .filter(F.col("conc") == F.col("max_concurrent"))
        .groupBy("l_suppkey")
        .agg(F.min("d").cast("bigint").alias("peak_day"))
    )
    return (
        mx.join(pk, "l_suppkey")
        .select("l_suppkey", "max_concurrent", "peak_day")
        .orderBy(F.col("max_concurrent").desc(), "l_suppkey")
        .limit(15)
    )


# --- KMV (bottom-k) distinct-count sketch -----------------------------------

_KMV_K = 256
_KMV_DIGITS = 12          # md5 hex digits -> integer in [0, 16^12)
_KMV_DOMAIN = 16 ** _KMV_DIGITS  # 2^48: exact in BIGINT arithmetic
_HEXD = "0123456789abcdef"


def _kmv_hashval_col(key) -> F.Column:
    """First 12 md5 hex digits as a BIGINT — the o_hash_bucket
    construction widened to 48 bits (string primitives with identical
    semantics on both engines; the value is exact integer arithmetic,
    so no float boundary anywhere in the sketch)."""
    h = F.md5(key.cast("string"))
    v = F.lit(0).cast("bigint")
    for i in range(_KMV_DIGITS):
        d = F.instr(F.lit(_HEXD), F.substring(h, i + 1, 1)) - 1
        v = v * 16 + d.cast("bigint")
    return v


def _o_kmv_hashval(key_sql: str) -> str:
    h = f"md5(CAST({key_sql} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('{_HEXD}', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (_KMV_DIGITS - 1 - i)}"
        for i in range(_KMV_DIGITS)
    )
    return f"CAST({terms} AS BIGINT)"


@register(
    "agg_kmv_distinct_estimate",
    f"""
    WITH d AS (SELECT DISTINCT l_partkey FROM lineitem),
    h AS (SELECT {_o_kmv_hashval("l_partkey")} AS v FROM d),
    bk AS (SELECT v FROM h ORDER BY v LIMIT {_KMV_K}),
    s AS (SELECT MAX(v) AS vk, CAST(COUNT(*) AS BIGINT) AS cnt FROM bk),
    e AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM d)
    SELECT CAST(CASE WHEN cnt < {_KMV_K} THEN cnt
                ELSE ({_KMV_K} - 1) * {_KMV_DOMAIN} // vk END AS BIGINT)
             AS est_distinct,
           exact_distinct,
           CAST({_KMV_K} AS BIGINT) AS k
    FROM s CROSS JOIN e
    """,
    "KMV (bottom-k / k-minimum-values) distinct-count sketch, the "
    "DETERMINISTIC mergeable sketch (Bar-Yossef et al. 2002): the k "
    "smallest 48-bit md5 hash values of the key domain determine the "
    "estimate (k-1) * 2^48 div v_k — every step is exact integer "
    "arithmetic from a content hash, so unlike the HLL/GK entry "
    "(rows-only, Spark-internal sketch) the ESTIMATE ITSELF is "
    "oracle-verified bit for bit, alongside the exact count it "
    "approximates. Plan: map-side-combined distinct, then "
    "TakeOrderedAndProject keeps k rows per partition and merges — "
    "the ordered selection never materializes a global sort. At "
    "100 TB the constant-state single-pass path remains HLL "
    "(agg_approx_sketches); KMV is the cross-engine-checkable "
    "estimator and the merge primitive behind distributed "
    "distinct-count reconciliation (union of bottom-k sets = "
    "bottom-k of union)",
    "2.4 extension (deterministic bottom-k distinct sketch, "
    "oracle-verified estimate)",
)
def agg_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_partkey").distinct()
    h = d.select(_kmv_hashval_col(F.col("l_partkey")).alias("v"))
    bk = h.orderBy("v").limit(_KMV_K)
    s = bk.agg(
        F.max("v").alias("vk"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    e = d.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    est = (
        F.when(F.col("cnt") < _KMV_K, F.col("cnt"))
        .otherwise(
            F.expr(f"({_KMV_K} - 1) * {_KMV_DOMAIN}L div vk")
        )
        .cast("bigint")
    )
    return s.crossJoin(F.broadcast(e)).select(
        est.alias("est_distinct"),
        "exact_distinct",
        F.lit(_KMV_K).cast("bigint").alias("k"),
    )


# --- HyperLogLog with a DETERMINISTIC cross-engine register build ----------
# (Flajolet et al. 2007.) 64 registers addressed by the top 6 bits of
# the 48-bit md5 integer; rank = leading zeros of the 42-bit remainder
# + 1, computed EXACTLY as 43 - length(bin(r)) (both engines print
# minimal binary, so bit_length is a string length — no float log2).
# The harmonic denominator is scaled by 2^43 into exact BIGINT terms
# (1 << (43 - register)), so the only floats are the final alpha
# multiply and the linear-counting ln — both under the shared-text /
# 6 dp discipline. Unlike approx_count_distinct (Spark-internal, rows-
# only), this HLL's ESTIMATE is oracle-verified bit for bit.

_HLL_M = 64
_HLL_R2 = 4398046511104  # 2^42: remainder domain
_HLL_T43 = 8796093022208.0  # 2^43: the register-term scale, exact double
_HLL_EST = (
    "CASE WHEN (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 64.0))"
    f" * 64.0 * 64.0 * {_HLL_T43} / CAST(s AS DOUBLE) <= 160.0"
    " AND v0 > 0"
    " THEN round(64.0 * round(ln(64.0 / CAST(v0 AS DOUBLE)), 6), 6)"
    " ELSE round((CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 64.0))"
    f" * 64.0 * 64.0 * {_HLL_T43} / CAST(s AS DOUBLE), 6) END"
)


def _o_hll_arm(key_sql: str, where: str, label: str) -> str:
    return f"""
    SELECT '{label}' AS domain,
           {_HLL_EST} AS est_distinct,
           exact_distinct
    FROM (
      SELECT CAST(SUM(1::BIGINT << (43 - mr)) +
                  (64 - COUNT(*)) * {int(_HLL_T43)} AS BIGINT) AS s,
             CAST(64 - COUNT(*) AS BIGINT) AS v0
      FROM (
        SELECT v // {_HLL_R2} AS bucket,
               MAX(CASE WHEN v % {_HLL_R2} = 0 THEN 43
                        ELSE 43 - length(bin(v % {_HLL_R2})) END) AS mr
        FROM (SELECT {_o_kmv_hashval(key_sql)} AS v
              FROM (SELECT DISTINCT {key_sql} FROM lineitem {where}))
        GROUP BY 1))
    CROSS JOIN (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct
      FROM (SELECT DISTINCT {key_sql} FROM lineitem {where}))
    """


def _hll_arm(li, key: str, label: str):
    d = li.select(key).distinct()
    h = d.select(_kmv_hashval_col(F.col(key)).alias("v"))
    rk = h.select(
        F.expr(f"v div {_HLL_R2}").alias("bucket"),
        F.expr(
            f"CASE WHEN v % {_HLL_R2} = 0 THEN 43"
            f" ELSE 43 - length(bin(v % {_HLL_R2})) END"
        ).alias("rank"),
    )
    regs = rk.groupBy("bucket").agg(F.max("rank").alias("mr"))
    s = regs.agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 43 - mr)"))
            + (F.lit(64) - F.count(F.lit(1))) * F.lit(int(_HLL_T43))
        )
        .cast("bigint")
        .alias("s"),
        (F.lit(64) - F.count(F.lit(1))).cast("bigint").alias("v0"),
    )
    e = d.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    return s.crossJoin(F.broadcast(e)).select(
        F.lit(label).alias("domain"),
        F.expr(_HLL_EST).alias("est_distinct"),
        "exact_distinct",
    )


@register(
    "agg_hll_distinct_estimate",
    f"""
    SELECT * FROM ({_o_hll_arm("l_partkey", "", "partkey")}
    UNION ALL {_o_hll_arm("l_returnflag", "", "returnflag")})
    ORDER BY domain
    """,
    "HyperLogLog (Flajolet et al. 2007) with a DETERMINISTIC register "
    "build: 64 registers from the top 6 bits of the 48-bit md5 "
    "integer, rank from the remainder's bit length via length(bin(r)) "
    "— a string op, no float log2 — and the harmonic denominator as "
    "exact 2^43-scaled BIGINT terms, so the ESTIMATE itself is oracle-"
    "verified (Spark's own approx_count_distinct HLL is rows-only by "
    "necessity). Two arms exercise both regimes: the partkey domain "
    "takes the raw harmonic path, the 3-value returnflag domain the "
    "small-range linear-counting correction (m ln(m/V)). Accuracy vs "
    "exact is regression-pinned in tests. The constant-state single-"
    "pass sketch for 100 TB distinct counts, with every step exact "
    "integer arithmetic until the final alpha multiply",
    "2.4 extension (deterministic HyperLogLog, oracle-verified estimate)",
)
def agg_hll_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _hll_arm(li, "l_partkey", "partkey")
        .unionByName(_hll_arm(li, "l_returnflag", "returnflag"))
        .orderBy("domain")
    )


@register(
    "agg_hll_merge_rollup",
    f"""
    WITH h AS (
      SELECT l_returnflag AS part,
             {_o_kmv_hashval("l_partkey")} AS v
      FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)),
    rk AS (
      SELECT part, v // {_HLL_R2} AS bucket,
             CASE WHEN v % {_HLL_R2} = 0 THEN 43
                  ELSE 43 - length(bin(v % {_HLL_R2})) END AS rank
      FROM h),
    part_regs AS (
      SELECT part, bucket, MAX(rank) AS mr FROM rk GROUP BY 1, 2),
    merged AS (
      SELECT bucket, MAX(mr) AS mr FROM part_regs GROUP BY 1),
    ms AS (
      SELECT CAST(SUM(1::BIGINT << (43 - mr)) +
                  (64 - COUNT(*)) * {int(_HLL_T43)} AS BIGINT) AS s,
             CAST(64 - COUNT(*) AS BIGINT) AS v0
      FROM merged),
    direct AS (
      SELECT bucket, MAX(rank) AS mr FROM rk GROUP BY 1),
    ds AS (
      SELECT CAST(SUM(1::BIGINT << (43 - mr)) +
                  (64 - COUNT(*)) * {int(_HLL_T43)} AS BIGINT) AS s,
             CAST(64 - COUNT(*) AS BIGINT) AS v0
      FROM direct),
    np AS (SELECT CAST(COUNT(DISTINCT part) AS BIGINT) AS n_parts FROM h)
    SELECT (SELECT {_HLL_EST} FROM ms) AS est_merged,
           (SELECT {_HLL_EST} FROM ds) AS est_direct,
           n_parts
    FROM np
    """,
    "HLL MERGEABILITY demonstrated as an invariant: per-returnflag "
    "register sets (max rank per bucket within each part) merged by "
    "elementwise max give EXACTLY the registers of a direct global "
    "build — max is associative — so est_merged equals est_direct bit "
    "for bit (pinned in tests). This is the 100 TB operating mode: "
    "constant-size register blocks per partition/tenant/day, rolled "
    "up without touching raw data; the same rollup shape as "
    "agg_kmv_hierarchical_rollup for the bottom-k family",
    "2.4 extension (HLL register merge rollup)",
)
def agg_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_returnflag", "l_partkey").distinct()
    rk = d.select(
        F.col("l_returnflag").alias("part"),
        _kmv_hashval_col(F.col("l_partkey")).alias("v"),
    ).select(
        "part",
        F.expr(f"v div {_HLL_R2}").alias("bucket"),
        F.expr(
            f"CASE WHEN v % {_HLL_R2} = 0 THEN 43"
            f" ELSE 43 - length(bin(v % {_HLL_R2})) END"
        ).alias("rank"),
    ).localCheckpoint()  # three consumers: part regs, direct regs, n_parts

    def est_of(regs):
        s = regs.agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 43 - mr)"))
                + (F.lit(64) - F.count(F.lit(1))) * F.lit(int(_HLL_T43))
            )
            .cast("bigint")
            .alias("s"),
            (F.lit(64) - F.count(F.lit(1))).cast("bigint").alias("v0"),
        )
        return s.select(F.expr(_HLL_EST).alias("est"))

    part_regs = rk.groupBy("part", "bucket").agg(F.max("rank").alias("mr"))
    merged = part_regs.groupBy("bucket").agg(F.max("mr").alias("mr"))
    direct = rk.groupBy("bucket").agg(F.max("rank").alias("mr"))
    np_ = rk.agg(
        F.countDistinct("part").cast("bigint").alias("n_parts")
    )
    return (
        est_of(merged)
        .withColumnRenamed("est", "est_merged")
        .crossJoin(
            F.broadcast(est_of(direct).withColumnRenamed("est", "est_direct"))
        )
        .crossJoin(F.broadcast(np_))
    )


# --- AMS / tug-of-war second-moment sketch ----------------------------------
# (Alon, Matias & Szegedy 1996.) F2 = sum of squared key frequencies —
# the self-join size / repeat-rate statistic behind skew detection and
# join-size estimation. Each of d estimators is the SQUARE of a ±1
# signed row count: Z_r = sum over rows of s_r(key), s_r = 2*(first
# md5(r|key) nibble parity)-1; E[Z_r^2] = F2 exactly, so the MEAN of
# the d squares is the unbiased combiner (a median of SINGLE squares
# would estimate median(chi2_1)*F2 ~ 0.45*F2 — measured exactly that
# bias before switching). Signed counts and squares are exact integers
# mergeable by addition; the one float op is the final /9.0 (identical
# single IEEE divide on both engines), so the estimate is
# oracle-verified bit for bit.

_AMS_D = 9


def _ams_sign(r: int, key_sql: str, cast_t: str) -> str:
    # strpos/VARCHAR in DuckDB, instr/STRING in Spark — integer-exact
    # either way, so the texts need not be shared (float discipline
    # does not apply)
    fn = "strpos" if cast_t == "VARCHAR" else "instr"
    return (
        f"(2 * (({fn}('{_HEXD}', substr(md5('{r}|' || "
        f"CAST({key_sql} AS {cast_t})), 1, 1)) - 1) % 2) - 1)"
    )


@register(
    "agg_ams_selfjoin_size",
    f"""
    WITH z AS (
      SELECT {", ".join(
        f"CAST(SUM({_ams_sign(r, 'l_partkey', 'VARCHAR')}) AS BIGINT) AS z{r}"
        for r in range(_AMS_D))}
      FROM lineitem),
    e AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey))
    SELECT round(CAST({" + ".join(
        f"z{r} * z{r}" for r in range(_AMS_D))} AS DOUBLE)
            / {_AMS_D}.0, 6) AS est_f2,
           exact_f2,
           CAST({_AMS_D} AS BIGINT) AS d
    FROM z CROSS JOIN e
    """,
    "AMS tug-of-war sketch (Alon-Matias-Szegedy 1996) for F2, the "
    "self-join size: mean of 9 squared ±1-signed row counts, each "
    "sign from an md5 nibble parity — constant state (9 integers), "
    "mergeable by addition, and exact integer arithmetic until the "
    "final /9, so the estimate hash-matches the oracle bit for bit "
    "alongside the exact sum-of-squared-frequencies it approximates. "
    "The skew/join-size estimator for 100 TB planning: one map-side-"
    "combined pass, no per-key state at all (contrast the groupBy "
    "the exact arm needs). Accuracy envelope regression-pinned",
    "2.4 extension (AMS F2 sketch, oracle-verified estimate)",
)
def agg_ams_selfjoin_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sum over rows of sign_r(key) == sum over distinct keys of
    # cnt * sign_r(key) (exact bigint arithmetic), so both the sketch
    # and the exact arm fold over ONE groupBy — one lineitem scan, the
    # 9 md5 signs evaluated per distinct key instead of per row, and
    # no scalar cross join.
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    z = counts.agg(
        *[
            F.sum(F.col("cnt") * F.expr(_ams_sign(r, "l_partkey", "STRING")))
            .cast("bigint")
            .alias(f"z{r}")
            for r in range(_AMS_D)
        ],
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("exact_f2"),
    )
    sumsq = " + ".join(f"z{r} * z{r}" for r in range(_AMS_D))
    return z.select(
        F.expr(
            f"round(CAST({sumsq} AS DOUBLE) / {_AMS_D}.0, 6)"
        ).alias("est_f2"),
        "exact_f2",
        F.lit(_AMS_D).cast("bigint").alias("d"),
    )


@register(
    "agg_kmv_set_overlap",
    f"""
    WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem
               WHERE l_quantity <= 5),
    b AS (SELECT DISTINCT l_orderkey FROM lineitem
          WHERE l_discount >= 0.09),
    ha AS (SELECT {_o_kmv_hashval("l_orderkey")} AS v FROM a
           ORDER BY v LIMIT {_KMV_K}),
    hb AS (SELECT {_o_kmv_hashval("l_orderkey")} AS v FROM b
           ORDER BY v LIMIT {_KMV_K}),
    u AS (SELECT v FROM (SELECT v FROM ha UNION SELECT v FROM hb)
          ORDER BY v LIMIT {_KMV_K}),
    us AS (SELECT MAX(v) AS mk, CAST(COUNT(*) AS BIGINT) AS ku FROM u),
    mb AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM u
           WHERE EXISTS (SELECT 1 FROM ha WHERE ha.v = u.v)
             AND EXISTS (SELECT 1 FROM hb WHERE hb.v = u.v)),
    ex AS (SELECT
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT l_orderkey FROM a UNION SELECT l_orderkey FROM b))
               AS exact_union,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM a
              WHERE EXISTS (SELECT 1 FROM b
                            WHERE b.l_orderkey = a.l_orderkey))
               AS exact_intersection)
    SELECT CAST(CASE WHEN ku < {_KMV_K} THEN ku
                ELSE ({_KMV_K} - 1) * {_KMV_DOMAIN} // mk END AS BIGINT)
             AS est_union,
           exact_union,
           CAST(CASE WHEN ku < {_KMV_K} THEN m
                ELSE m * (({_KMV_K} - 1) * {_KMV_DOMAIN} // mk)
                     // {_KMV_K} END AS BIGINT)
             AS est_intersection,
           exact_intersection,
           CAST({_KMV_K} AS BIGINT) AS k
    FROM us CROSS JOIN mb CROSS JOIN ex
    """,
    "KMV sketch SET OPERATIONS — the mergeability property that makes "
    "bottom-k the reconciliation primitive at 100 TB (union of bottom-k "
    "sets IS the bottom-k of the union: per-day / per-partition "
    "sketches combine into union, intersection and Jaccard estimates "
    "without rescanning anything): orders containing a small-quantity "
    "item vs orders containing a deep-discount item — genuinely "
    "partially overlapping sets (~50% / ~37%). est_union comes from "
    "the merged sketch's kth value; est_intersection from the m/k "
    "fraction of merged-sketch members present in BOTH input sketches "
    "(v <= union_kth <= each set's kth, so the membership test "
    "against the k-bounded sketches is exact — no false negatives by "
    "construction). Every estimator step is exact 48-bit integer "
    "arithmetic from md5, so both ESTIMATES are oracle-verified bit "
    "for bit next to their exact counterparts; when the union fits "
    "inside k the sketch degenerates to exact counting (same branch "
    "text both engines). All sketch frames are k-row bounded; the "
    "data-sized work is two map-side-combined distincts plus the "
    "exact-answer joins kept for the report",
    "2.4 extension (mergeable bottom-k sketch set operations)",
)
def agg_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # each set feeds three consumers (its sketch, the exact union, the
    # exact intersection) — checkpoint once so the scan+distinct is not
    # re-derived per consumer (multi-consumer invariant, CLAUDE.md)
    a = (
        li.filter(F.col("l_quantity") <= 5)
        .select("l_orderkey")
        .distinct()
        .localCheckpoint()
    )
    b = (
        li.filter(F.col("l_discount") >= 0.09)
        .select("l_orderkey")
        .distinct()
        .localCheckpoint()
    )

    def sketch(d: DataFrame) -> DataFrame:
        return (
            d.select(_kmv_hashval_col(F.col("l_orderkey")).alias("v"))
            .orderBy("v")
            .limit(_KMV_K)
        )

    ha, hb = sketch(a), sketch(b)
    u = ha.union(hb).distinct().orderBy("v").limit(_KMV_K)
    us = u.agg(
        F.max("v").alias("mk"),
        F.count(F.lit(1)).cast("bigint").alias("ku"),
    )
    mb = (
        u.join(ha, "v", "semi")
        .join(hb, "v", "semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    exact_union = (
        a.union(b)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_union"))
    )
    exact_inter = a.join(b, "l_orderkey", "semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_intersection")
    )
    est_u = F.when(F.col("ku") < _KMV_K, F.col("ku")).otherwise(
        F.expr(f"({_KMV_K} - 1) * {_KMV_DOMAIN}L div mk")
    )
    est_i = F.when(F.col("ku") < _KMV_K, F.col("m")).otherwise(
        F.expr(
            f"m * (({_KMV_K} - 1) * {_KMV_DOMAIN}L div mk) div {_KMV_K}L"
        )
    )
    return (
        us.crossJoin(F.broadcast(mb))
        .crossJoin(F.broadcast(exact_union))
        .crossJoin(F.broadcast(exact_inter))
        .select(
            est_u.cast("bigint").alias("est_union"),
            "exact_union",
            est_i.cast("bigint").alias("est_intersection"),
            "exact_intersection",
            F.lit(_KMV_K).cast("bigint").alias("k"),
        )
    )


_KMV_GK = 64  # per-group sketch size for the hierarchical rollup


@register(
    "agg_kmv_hierarchical_rollup",
    f"""
    WITH d AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS mon,
                               o_custkey
               FROM orders),
    h AS (SELECT mon, {_o_kmv_hashval("o_custkey")} AS v FROM d),
    rk AS (SELECT mon, v,
                  ROW_NUMBER() OVER (PARTITION BY mon ORDER BY v) AS r
           FROM h),
    msk AS (SELECT mon, v FROM rk WHERE r <= {_KMV_GK}),
    yd AS (SELECT DISTINCT CAST(year(mon) AS BIGINT) AS yr, v FROM msk),
    yrk AS (SELECT yr, v,
                   ROW_NUMBER() OVER (PARTITION BY yr ORDER BY v) AS r
            FROM yd),
    ys AS (SELECT yr,
                  MAX(CASE WHEN r <= {_KMV_GK} THEN v END) AS vk,
                  CAST(SUM(CASE WHEN r <= {_KMV_GK} THEN 1 ELSE 0 END)
                       AS BIGINT) AS ku
           FROM yrk GROUP BY yr),
    ex AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                  CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                    AS exact_distinct
           FROM orders GROUP BY 1)
    SELECT yr,
           CAST(CASE WHEN ku < {_KMV_GK} THEN ku
                ELSE ({_KMV_GK} - 1) * {_KMV_DOMAIN} // vk END AS BIGINT)
             AS est_distinct,
           exact_distinct,
           CAST({_KMV_GK} AS BIGINT) AS k
    FROM ys JOIN ex USING (yr)
    ORDER BY yr
    """,
    "HIERARCHICAL KMV rollup — per-month bottom-k sketches of the "
    "distinct-customer domain merged into yearly distinct estimates "
    "WITHOUT rescanning the months (any year-level bottom-k element "
    "is necessarily in its month's bottom-k, so the union of month "
    "sketches contains the year's true bottom-k — the KMV merge law). "
    "This is the deterministic, ORACLE-VERIFIED twin of the rows-only "
    "agg_hll_mergeable_rollup: the 100 TB cube pattern (daily sketch "
    "once, re-aggregate to any coarser grain) with every estimate "
    "hash-checked against DuckDB. Per-month ranks are a partitioned "
    "window (distributed across months); when a year's sketch union "
    "stays under k the estimate degenerates to the exact count (same "
    "branch both engines; k=64 => ~12% stderr, the demo trade-off — "
    "production picks k per grain)",
    "2.4 extension (hierarchical mergeable sketch rollup)",
)
def agg_kmv_hierarchical_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.trunc("o_orderdate", "month").alias("mon"), "o_custkey"
    ).distinct()
    h = d.select("mon", _kmv_hashval_col(F.col("o_custkey")).alias("v"))
    wm = W.partitionBy("mon").orderBy("v")
    msk = (
        h.withColumn("r", F.row_number().over(wm))
        .filter(F.col("r") <= _KMV_GK)
        .select("mon", "v")
    )
    yd = msk.select(
        F.year("mon").cast("bigint").alias("yr"), "v"
    ).distinct()
    wy = W.partitionBy("yr").orderBy("v")
    yrk = yd.withColumn("r", F.row_number().over(wy))
    ys = yrk.groupBy("yr").agg(
        F.max(F.when(F.col("r") <= _KMV_GK, F.col("v"))).alias("vk"),
        F.sum(F.when(F.col("r") <= _KMV_GK, 1).otherwise(0))
        .cast("bigint")
        .alias("ku"),
    )
    ex = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct"))
    est = F.when(F.col("ku") < _KMV_GK, F.col("ku")).otherwise(
        F.expr(f"({_KMV_GK} - 1) * {_KMV_DOMAIN}L div vk")
    )
    return (
        ys.join(ex, "yr")
        .select(
            "yr",
            est.cast("bigint").alias("est_distinct"),
            "exact_distinct",
            F.lit(_KMV_GK).cast("bigint").alias("k"),
        )
        .orderBy("yr")
    )


_SQ_BUCKETS = 4  # of 256: a deterministic 1/64 content-hash sample


@register(
    "agg_sampled_quantiles",
    f"""
    WITH s AS (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem
      WHERE {{bucket}} < {_SQ_BUCKETS}),
    samp AS (
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.5), 6)
               AS sampled_median,
             ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS sampled_p90,
             CAST(COUNT(*) AS BIGINT) AS n_sample
      FROM s GROUP BY l_returnflag),
    ex AS (
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS exact_median,
             ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS exact_p90,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, sampled_median, exact_median,
           sampled_p90, exact_p90, n_sample, n
    FROM samp JOIN ex USING (l_returnflag)
    ORDER BY l_returnflag
    """,
    "APPROXIMATE quantiles from a DETERMINISTIC content-hash sample "
    "(md5 bucket of the line id < 4/256 = a 1/64 sample — rerun-, "
    "partitioning- and engine-stable, so unlike rng-based sampling "
    "the sampled estimate itself is oracle-verified bit for bit; the "
    "auditable twin of the GK sketch in agg_approx_sketches): "
    "per-group interpolated median/p90 on the sample next to the "
    "exact full-data values, so sampling error is a visible, "
    "regression-guardable column pair. Both quantile passes use the "
    "distributed two-pass interpolation (spillable sort, no per-group "
    "buffer — agg_percentiles_by_flag); the sample pass sorts 1/64 "
    "of the rows, which is the whole point at 100 TB",
    "2.4 extension (deterministic-sample quantile estimation)",
)
def agg_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sampling import hash_bucket_expr

    li = load_table(spark, sf_dir, "lineitem")
    lid = F.col("l_orderkey") * 10 + F.col("l_linenumber")

    def interp(df: DataFrame, prefix: str, n_alias: str) -> DataFrame:
        grp = W.partitionBy("l_returnflag")
        ranked = df.select("l_returnflag", "l_extendedprice").select(
            "l_returnflag",
            "l_extendedprice",
            (
                F.row_number().over(grp.orderBy("l_extendedprice")) - 1
            ).alias("idx"),
            F.count(F.lit(1)).over(grp).alias("n"),
        )

        def pos(p: float):
            return (F.col("n") - 1).cast("double") * F.lit(p)

        lo50, hi50 = F.floor(pos(0.5)), F.ceil(pos(0.5))
        lo90, hi90 = F.floor(pos(0.9)), F.ceil(pos(0.9))
        idx = F.col("idx")
        boundary = (
            (idx == lo50) | (idx == hi50) | (idx == lo90) | (idx == hi90)
        )

        def pick(cond):
            return F.max(F.when(cond, F.col("l_extendedprice")))

        agg = ranked.filter(boundary).groupBy("l_returnflag").agg(
            F.max("n").alias("n"),
            pick(idx == lo50).alias("v_lo50"),
            pick(idx == hi50).alias("v_hi50"),
            pick(idx == lo90).alias("v_lo90"),
            pick(idx == hi90).alias("v_hi90"),
        )

        def one(p: float, v_lo: str, v_hi: str):
            frac = pos(p) - F.floor(pos(p)).cast("double")
            return F.round(
                F.col(v_lo) + frac * (F.col(v_hi) - F.col(v_lo)), 6
            )

        return agg.select(
            "l_returnflag",
            one(0.5, "v_lo50", "v_hi50").alias(f"{prefix}_median"),
            one(0.9, "v_lo90", "v_hi90").alias(f"{prefix}_p90"),
            F.col("n").cast("bigint").alias(n_alias),
        )

    samp = interp(
        li.filter(hash_bucket_expr(lid) < _SQ_BUCKETS), "sampled", "n_sample"
    )
    ex = interp(li, "exact", "n")
    return (
        samp.join(ex, "l_returnflag")
        .select(
            "l_returnflag",
            "sampled_median",
            "exact_median",
            "sampled_p90",
            "exact_p90",
            "n_sample",
            "n",
        )
        .orderBy("l_returnflag")
    )


def _set_sampled_quantiles_oracle() -> None:
    from hangarbay_spark.operators.sampling import o_hash_bucket
    from hangarbay_spark.queries.base import REGISTRY as _R
    from hangarbay_spark.queries.base import QuerySpec

    spec = _R["agg_sampled_quantiles"]
    oracle = spec.oracle.format(
        bucket=o_hash_bucket("l_orderkey * 10 + l_linenumber")
    )
    _R["agg_sampled_quantiles"] = QuerySpec(
        spec.name, spec.fn, oracle, spec.description, spec.survey
    )


_set_sampled_quantiles_oracle()


# --- GK-style mergeable quantile summary (see operators/sketches.py) --------
# eps = 2/_GK_ERRDIV; every step is exact integer arithmetic (md5 hash
# partition, integer ranks/gaps, integer ceil-div targets), so the
# ESTIMATE — an actual data value — and its rank-envelope audit columns
# are oracle-verified bit for bit. t = ceil(q_pm*n/1000) via
# (q_pm*n + 999) div 1000; a float q*n would parse as DECIMAL in one
# engine and DOUBLE in the other and can ceil differently at exact-
# integer boundaries (the CLAUDE.md bare-literal rule).

_GK_P = 32
_GK_ERRDIV = 100  # eps = 0.02
_GK_QPM = (250, 500, 750, 900, 990)


def _o_gk_chain(part_sql: str, sfx: str) -> str:
    """CTE chain building summary -> selection for one arm: partition
    expression ``part_sql`` over vals(v, tb); emits sel{sfx}(q_pm, n,
    t, est, est_rmin). Requires a prior CTE tq(q_pm, n, t)."""
    return f"""
    pb{sfx} AS (SELECT v, tb, {part_sql} AS p FROM vals),
    rk{sfx} AS (SELECT v, tb, p,
             ROW_NUMBER() OVER (PARTITION BY p ORDER BY v, tb) AS r,
             COUNT(*) OVER (PARTITION BY p) AS np
           FROM pb{sfx}),
    k0{sfx} AS (SELECT v, tb, p, r, np,
              GREATEST(1, np // {_GK_ERRDIV}) AS sp FROM rk{sfx}),
    kept{sfx} AS (SELECT v, tb, p, r FROM k0{sfx}
            WHERE (r - 1) % sp = 0 OR r = np),
    gg{sfx} AS (SELECT v, tb,
             CAST(r - COALESCE(LAG(r) OVER (PARTITION BY p ORDER BY r),
                               0) AS BIGINT) AS g
           FROM kept{sfx}),
    rmin{sfx} AS (SELECT v, tb,
               CAST(SUM(g) OVER (ORDER BY v, tb ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS rmin
             FROM gg{sfx}),
    cand{sfx} AS (SELECT q_pm, n, t, v, rmin,
               ROW_NUMBER() OVER (PARTITION BY q_pm
                 ORDER BY ABS(rmin - t), v, tb) AS rn
             FROM rmin{sfx} CROSS JOIN tq),
    sel{sfx} AS (SELECT q_pm, n, t, v AS est, rmin AS est_rmin
           FROM cand{sfx} WHERE rn = 1)"""


def _o_gk_bucket() -> str:
    from hangarbay_spark.operators.sampling import o_hash_bucket

    return f"(({o_hash_bucket('tb')}) % {_GK_P})"


def _o_gk_vals_tq(vals_cols: str = "") -> str:
    qvals = ",".join(f"({q})" for q in _GK_QPM)
    return f"""
    vals AS (SELECT l_extendedprice AS v,
                    l_orderkey * 10 + l_linenumber AS tb{vals_cols}
             FROM lineitem),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
    tq AS (SELECT q_pm, n,
                  CAST((q_pm * n + 999) // 1000 AS BIGINT) AS t
           FROM (VALUES {qvals}) qs(q_pm) CROSS JOIN nn)"""


def _o_gk_sketch_sql(part_sql: str, vals_cols: str = "") -> str:
    """Full summary -> estimate -> envelope oracle for one partition-
    key expression over vals(v, tb[, extra cols])."""
    return f"""
    WITH {_o_gk_vals_tq(vals_cols)},
    {_o_gk_chain(part_sql, "")},
    env AS (SELECT s.q_pm,
              CAST(SUM(CASE WHEN d.v < s.est THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS rank_lo,
              CAST(SUM(CASE WHEN d.v <= s.est THEN 1 ELSE 0 END)
                AS BIGINT) AS rank_le
            FROM vals d CROSS JOIN sel s GROUP BY s.q_pm)
    SELECT CAST(s.q_pm AS DOUBLE) / 1000.0 AS quantile,
           s.t AS target_rank, s.est, s.est_rmin,
           e.rank_lo, e.rank_le, s.n,
           CASE WHEN e.rank_lo - s.t <= (2 * s.n) // {_GK_ERRDIV}
                 AND s.t - e.rank_le <= (2 * s.n) // {_GK_ERRDIV}
                THEN 1 ELSE 0 END AS within_eps
    FROM sel s JOIN env e ON s.q_pm = e.q_pm
    ORDER BY quantile
    """


_O_GK_SKETCH = _o_gk_sketch_sql(
    f"'' || '|' || CAST({_o_gk_bucket()} AS VARCHAR)"
)


def _gk_lineitem_vals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: consumers run per-row md5 bucketing + window ranking
    # (summary build) and the 5-estimate cross + rank counts (envelope
    # audit) straight off this single-row-group scan
    li = spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    return li.select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
        F.col("l_returnflag"),
    )


def _gk_envelope(vals: DataFrame, est: DataFrame) -> DataFrame:
    """Exact-rank audit of the estimates: one scan, 5-row broadcast
    (bounded BNLJ by contract). rank_lo = count(< est)+1, rank_le =
    count(<= est); the sketch guarantee is rank_lo - t <= eps*n and
    t - rank_le <= eps*n, emitted as the within_eps column."""
    return (
        vals.crossJoin(F.broadcast(est))
        .groupBy("q_pm", "quantile", "target_rank", "est", "est_rmin", "n")
        .agg(
            (
                F.sum(F.when(F.col("v") < F.col("est"), 1).otherwise(0)) + 1
            )
            .cast("bigint")
            .alias("rank_lo"),
            F.sum(F.when(F.col("v") <= F.col("est"), 1).otherwise(0))
            .cast("bigint")
            .alias("rank_le"),
        )
    )


@register(
    "agg_gk_quantile_sketch",
    _O_GK_SKETCH,
    "GK-style mergeable quantile summary (Greenwald-Khanna 2001 tuple "
    "algebra over the order-independent equi-spaced construction of "
    "Manku et al. 1998; merge semantics per Agarwal et al. 2012): each "
    "md5 hash partition keeps items at exact local ranks 1, 1+s_p, "
    "..., n_p (s_p = n_p div 100, eps = 0.02), global rmin is a "
    "running sum of coverage counts over the bounded summary, and the "
    "answer for target rank t = ceil(q*n) is the kept value nearest t "
    "— every step exact integer arithmetic, so unlike Spark's own "
    "insertion-order approx_percentile (rows-only in "
    "agg_approx_sketches) the ESTIMATE is oracle-verified bit for "
    "bit, alongside its exact-rank envelope audit columns "
    "(rank_lo/rank_le/within_eps). Completes the deterministic sketch "
    "family (HLL, CMS, AMS F2) with its most-used member. 100 TB "
    "shape: one window pass per partition, summary <= 2*err_div+2 "
    "tuples/partition regardless of n",
    "2.4 extension (deterministic mergeable quantile sketch, "
    "oracle-verified estimate)",
)
def agg_gk_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sketches import (
        gk_quantile_estimates,
        gk_summary,
    )

    vals = _gk_lineitem_vals(spark, sf_dir)
    kept = gk_summary(
        vals, "v", "tb", partitions=_GK_P, err_div=_GK_ERRDIV
    )
    est = gk_quantile_estimates(kept, _GK_QPM)
    return (
        _gk_envelope(vals, est)
        .select(
            "quantile",
            "target_rank",
            "est",
            "est_rmin",
            "rank_lo",
            "rank_le",
            "n",
            F.expr(
                f"CASE WHEN rank_lo - target_rank <= (2 * n) div {_GK_ERRDIV}"
                f" AND target_rank - rank_le <= (2 * n) div {_GK_ERRDIV}"
                " THEN 1 ELSE 0 END"
            ).alias("within_eps"),
        )
        .orderBy("quantile")
    )


_O_GK_MERGE = f"""
    WITH {_o_gk_vals_tq()},
    vals_rf AS (SELECT l_extendedprice AS v,
                       l_orderkey * 10 + l_linenumber AS tb,
                       l_returnflag AS rf
                FROM lineitem),
    {_o_gk_chain(f"'' || '|' || CAST({_o_gk_bucket()} AS VARCHAR)", "_d")},
    pbm AS (SELECT v, tb,
              rf || '|' || CAST({_o_gk_bucket()} AS VARCHAR) AS p
            FROM vals_rf),
    rkm AS (SELECT v, tb, p,
             ROW_NUMBER() OVER (PARTITION BY p ORDER BY v, tb) AS r,
             COUNT(*) OVER (PARTITION BY p) AS np
           FROM pbm),
    k0m AS (SELECT v, tb, p, r, np,
              GREATEST(1, np // {_GK_ERRDIV}) AS sp FROM rkm),
    keptm AS (SELECT v, tb, p, r FROM k0m
            WHERE (r - 1) % sp = 0 OR r = np),
    ggm AS (SELECT v, tb,
             CAST(r - COALESCE(LAG(r) OVER (PARTITION BY p ORDER BY r),
                               0) AS BIGINT) AS g
           FROM keptm),
    rminm AS (SELECT v, tb,
               CAST(SUM(g) OVER (ORDER BY v, tb ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS rmin
             FROM ggm),
    candm AS (SELECT q_pm, n, t, v, rmin,
               ROW_NUMBER() OVER (PARTITION BY q_pm
                 ORDER BY ABS(rmin - t), v, tb) AS rn
             FROM rminm CROSS JOIN tq),
    selm AS (SELECT q_pm, n, t, v AS est, rmin AS est_rmin
           FROM candm WHERE rn = 1),
    envd AS (SELECT s.q_pm,
              CAST(SUM(CASE WHEN d.v < s.est THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS rank_lo,
              CAST(SUM(CASE WHEN d.v <= s.est THEN 1 ELSE 0 END)
                AS BIGINT) AS rank_le
            FROM vals d CROSS JOIN sel_d s GROUP BY s.q_pm),
    envm AS (SELECT s.q_pm,
              CAST(SUM(CASE WHEN d.v < s.est THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS rank_lo,
              CAST(SUM(CASE WHEN d.v <= s.est THEN 1 ELSE 0 END)
                AS BIGINT) AS rank_le
            FROM vals d CROSS JOIN selm s GROUP BY s.q_pm)
    SELECT CAST(m.q_pm AS DOUBLE) / 1000.0 AS quantile,
           m.t AS target_rank,
           m.est AS est_merged, d.est AS est_direct,
           CASE WHEN em.rank_lo - m.t <= (2 * m.n) // {_GK_ERRDIV}
                 AND m.t - em.rank_le <= (2 * m.n) // {_GK_ERRDIV}
                THEN 1 ELSE 0 END AS merged_within_eps,
           CASE WHEN ed.rank_lo - d.t <= (2 * d.n) // {_GK_ERRDIV}
                 AND d.t - ed.rank_le <= (2 * d.n) // {_GK_ERRDIV}
                THEN 1 ELSE 0 END AS direct_within_eps,
           m.n
    FROM selm m JOIN sel_d d ON m.q_pm = d.q_pm
    JOIN envm em ON m.q_pm = em.q_pm
    JOIN envd ed ON m.q_pm = ed.q_pm
    ORDER BY quantile
    """


@register(
    "agg_gk_merge_rollup",
    _O_GK_MERGE,
    "GK summary MERGEABILITY as an invariant (the agg_hll_merge_rollup "
    "shape): per-returnflag batch summaries union-merged — built in "
    "one pass with (batch, partition) keys, which is bit-identical to "
    "building each batch separately and unioning (ranks, n_p, s_p are "
    "all per-(batch, p) quantities; frame equality pinned in tests) — "
    "answer the same targets as a direct global build, and BOTH "
    "estimates stay inside the eps*n rank envelope (the mergeable-"
    "summaries property: merging never degrades the guarantee). This "
    "is the 100 TB operating mode: per-day/per-tenant summaries "
    "rolled up without re-reading raw data",
    "2.4 extension (GK quantile summary merge rollup)",
)
def agg_gk_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hangarbay_spark.operators.sketches import (
        gk_quantile_estimates,
        gk_summary,
    )

    # THREE consumers re-derive vals (merged arm, direct arm, envelope
    # rank scan) — materialize the spread scan once; each arm then
    # reads the checkpoint instead of re-scanning + re-spreading
    # (multi-consumer rule)
    vals = _gk_lineitem_vals(spark, sf_dir).localCheckpoint()
    merged = gk_summary(
        vals, "v", "tb", partitions=_GK_P, err_div=_GK_ERRDIV,
        batch_col="l_returnflag",
    )
    direct = gk_summary(
        vals, "v", "tb", partitions=_GK_P, err_div=_GK_ERRDIV
    )
    est_m = gk_quantile_estimates(merged, _GK_QPM).withColumn(
        "arm", F.lit("merged")
    )
    est_d = gk_quantile_estimates(direct, _GK_QPM).withColumn(
        "arm", F.lit("direct")
    )
    env = _gk_envelope(
        vals,
        est_m.unionByName(est_d)
        .withColumnRenamed("arm", "q_arm")
        .withColumn("q_pm", F.concat_ws("|", "q_arm", "q_pm"))
        .drop("q_arm"),
    ).withColumn("arm", F.split("q_pm", r"\|").getItem(0))
    we = F.expr(
        f"CASE WHEN rank_lo - target_rank <= (2 * n) div {_GK_ERRDIV}"
        f" AND target_rank - rank_le <= (2 * n) div {_GK_ERRDIV}"
        " THEN 1 ELSE 0 END"
    )
    arms = env.select("quantile", "target_rank", "n", "arm", "est", we.alias("w"))
    return (
        arms.groupBy("quantile", "target_rank", "n")
        .agg(
            F.max(F.when(F.col("arm") == "merged", F.col("est"))).alias(
                "est_merged"
            ),
            F.max(F.when(F.col("arm") == "direct", F.col("est"))).alias(
                "est_direct"
            ),
            F.max(F.when(F.col("arm") == "merged", F.col("w")))
            .cast("int")
            .alias("merged_within_eps"),
            F.max(F.when(F.col("arm") == "direct", F.col("w")))
            .cast("int")
            .alias("direct_within_eps"),
        )
        .select(
            "quantile",
            "target_rank",
            "est_merged",
            "est_direct",
            "merged_within_eps",
            "direct_within_eps",
            "n",
        )
        .orderBy("quantile")
    )


_GK_STREAM_DIRS: dict[str, tuple[str, str, str]] = {}


@register(
    "streaming_gk_quantiles",
    _o_gk_sketch_sql(
        f"CAST(bi AS VARCHAR) || '|' || CAST({_o_gk_bucket()} AS VARCHAR)",
        vals_cols=", l_orderkey % 4 AS bi",
    ),
    "streaming GK quantile maintenance with a FULL oracle (the third "
    "oracle-verified streaming entry): lineitem values staged as 4 "
    "micro-batches, each batch folded into a persisted bounded summary "
    "GENERATION (the crash-safe gen-dir LSM; summary merge = union, "
    "the mergeable-summaries property agg_gk_merge_rollup pins), then "
    "quantiles answered from the MAINTAINED state without re-reading "
    "any ingested row. The batch tag inside each partition key is "
    "derived from the DATA (l_orderkey % 4), so the maintained "
    "estimate is a pure function of the ingested multiset — identical "
    "under any stream slicing — and hash-compares against the DuckDB "
    "one-shot build with the same refined partitioning; the exact-rank "
    "envelope audit rides along like agg_gk_quantile_sketch's",
    "streaming §2.7 extension (mergeable quantile sketch maintenance, "
    "oracle-verified)",
)
def streaming_gk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from hangarbay_spark.operators.sketches import gk_quantile_estimates
    from hangarbay_spark.streaming import gk_maintenance as GM

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
        (F.col("l_orderkey") % 4).alias("bi"),
    )
    key = f"{sf_dir}|gk_stream"
    dirs = _GK_STREAM_DIRS.get(key)
    if dirs is None:
        from hangarbay_spark.queries.base import stage_micro_batches

        stage = stage_micro_batches(rows, "bi", 4, "hb_gkq_src_")
        state = tempfile.mkdtemp(prefix="hb_gkq_state_")
        ckpt = tempfile.mkdtemp(prefix="hb_gkq_ckpt_")
        _GK_STREAM_DIRS[key] = (stage, state, ckpt)
    stage, state, ckpt = _GK_STREAM_DIRS[key]
    stream = (
        spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stage}/*")
    )
    GM.gk_maintenance_stream(
        stream, state, checkpoint_dir=ckpt,
        value_col="v", id_col="tb", batch_col="bi",
        partitions=_GK_P, err_div=_GK_ERRDIV,
    ).awaitTermination()
    est = gk_quantile_estimates(GM.read_summary(spark, state), _GK_QPM)
    return (
        _gk_envelope(rows, est)
        .select(
            "quantile",
            "target_rank",
            "est",
            "est_rmin",
            "rank_lo",
            "rank_le",
            "n",
            F.expr(
                f"CASE WHEN rank_lo - target_rank <= (2 * n) div {_GK_ERRDIV}"
                f" AND target_rank - rank_le <= (2 * n) div {_GK_ERRDIV}"
                " THEN 1 ELSE 0 END"
            ).alias("within_eps"),
        )
        .orderBy("quantile")
    )


_GK_HIST_QPM = (200, 400, 600, 800)  # 4 interior edges -> 5 bins


@register(
    "agg_gk_equidepth_histogram",
    f"""
    WITH {_o_gk_vals_tq()},
    hq AS (SELECT q_pm, n, CAST((q_pm * n + 999) // 1000 AS BIGINT) AS t
           FROM (VALUES {",".join(f"({q})" for q in _GK_HIST_QPM)})
             qs(q_pm) CROSS JOIN nn),
    {_o_gk_chain(f"'' || '|' || CAST({_o_gk_bucket()} AS VARCHAR)", "")
     .replace("CROSS JOIN tq", "CROSS JOIN hq")},
    edges AS (SELECT
        MAX(CASE WHEN q_pm = 200 THEN est END) AS e1,
        MAX(CASE WHEN q_pm = 400 THEN est END) AS e2,
        MAX(CASE WHEN q_pm = 600 THEN est END) AS e3,
        MAX(CASE WHEN q_pm = 800 THEN est END) AS e4,
        MAX(n) AS n
      FROM sel),
    binned AS (SELECT
        CASE WHEN d.v <= e.e1 THEN 0 WHEN d.v <= e.e2 THEN 1
             WHEN d.v <= e.e3 THEN 2 WHEN d.v <= e.e4 THEN 3
             ELSE 4 END AS bin, e.n
      FROM vals d CROSS JOIN edges e)
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows, n,
           CAST(ABS(COUNT(*) - n // 5) AS BIGINT) AS dev,
           CASE WHEN ABS(COUNT(*) - n // 5) <= (4 * n) // {_GK_ERRDIV} + 1
                THEN 1 ELSE 0 END AS within_tol
    FROM binned GROUP BY bin, n
    ORDER BY bin
    """,
    "equi-depth histogram from the GK sketch — the APPLICATION the "
    "quantile summary exists for (optimizer statistics / feature "
    "binning): interior edges at the 20/40/60/80 permille targets come "
    "from the bounded summary, then ONE exact counting pass bins every "
    "row. Each edge's rank error is <= eps*n, so each bin's depth "
    "deviates from n/5 by <= 2*eps*n (two edges move independently) — "
    "emitted as dev/within_tol audit columns, oracle-verified like the "
    "sketch itself. 100 TB shape: sketch pass + one broadcast-CASE "
    "counting pass, no sort of the raw data",
    "2.4 extension (GK equi-depth histogram application)",
)
def agg_gk_equidepth_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hangarbay_spark.operators.sketches import (
        gk_quantile_estimates,
        gk_summary,
    )

    vals = _gk_lineitem_vals(spark, sf_dir)
    kept = gk_summary(
        vals, "v", "tb", partitions=_GK_P, err_div=_GK_ERRDIV
    )
    est = gk_quantile_estimates(kept, _GK_HIST_QPM)
    edges = est.groupBy().agg(
        *[
            F.max(F.when(F.col("q_pm") == q, F.col("est"))).alias(
                f"e{i + 1}"
            )
            for i, q in enumerate(_GK_HIST_QPM)
        ],
        F.max("n").alias("n"),
    )
    binned = vals.crossJoin(F.broadcast(edges)).select(
        F.when(F.col("v") <= F.col("e1"), 0)
        .when(F.col("v") <= F.col("e2"), 1)
        .when(F.col("v") <= F.col("e3"), 2)
        .when(F.col("v") <= F.col("e4"), 3)
        .otherwise(4)
        .alias("bin"),
        "n",
    )
    return (
        binned.groupBy("bin", "n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .select(
            "bin",
            "n_rows",
            "n",
            F.abs(F.col("n_rows") - F.expr("n div 5"))
            .cast("bigint")
            .alias("dev"),
            F.expr(
                f"CASE WHEN ABS(n_rows - n div 5) <= (4 * n) div {_GK_ERRDIV} + 1"
                " THEN 1 ELSE 0 END"
            ).alias("within_tol"),
        )
        .orderBy("bin")
    )


_GK_GRP_QPM = (500, 900)


@register(
    "agg_gk_grouped_quantiles",
    f"""
    WITH vals AS (SELECT l_returnflag AS grp, l_extendedprice AS v,
                         l_orderkey * 10 + l_linenumber AS tb
                  FROM lineitem),
    pb AS (SELECT grp, v, tb,
                  grp || '|' || CAST({_o_gk_bucket()} AS VARCHAR) AS p
           FROM vals),
    rk AS (SELECT grp, v, tb, p,
             ROW_NUMBER() OVER (PARTITION BY p ORDER BY v, tb) AS r,
             COUNT(*) OVER (PARTITION BY p) AS np
           FROM pb),
    k0 AS (SELECT grp, v, tb, p, r, np,
             GREATEST(1, np // {_GK_ERRDIV}) AS sp FROM rk),
    kept AS (SELECT grp, v, tb, p, r FROM k0
             WHERE (r - 1) % sp = 0 OR r = np),
    gg AS (SELECT grp, v, tb,
             CAST(r - COALESCE(LAG(r) OVER (PARTITION BY p ORDER BY r),
                               0) AS BIGINT) AS g
           FROM kept),
    rmin AS (SELECT grp, v, tb,
               CAST(SUM(g) OVER (PARTITION BY grp ORDER BY v, tb
                                 ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS rmin
             FROM gg),
    ng AS (SELECT grp, CAST(SUM(g) AS BIGINT) AS n FROM gg GROUP BY grp),
    tq AS (SELECT grp, n, q_pm,
                  CAST((q_pm * n + 999) // 1000 AS BIGINT) AS t
           FROM ng CROSS JOIN
             (VALUES {",".join(f"({q})" for q in _GK_GRP_QPM)}) qs(q_pm)),
    cand AS (SELECT r.grp, q_pm, n, t, v, rmin,
               ROW_NUMBER() OVER (PARTITION BY r.grp, q_pm
                 ORDER BY ABS(rmin - t), v, tb) AS rn
             FROM rmin r JOIN tq ON r.grp = tq.grp),
    sel AS (SELECT grp, q_pm, n, t, v AS est, rmin AS est_rmin
            FROM cand WHERE rn = 1),
    env AS (SELECT s.grp, s.q_pm,
              CAST(SUM(CASE WHEN d.v < s.est THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS rank_lo,
              CAST(SUM(CASE WHEN d.v <= s.est THEN 1 ELSE 0 END)
                AS BIGINT) AS rank_le
            FROM vals d JOIN sel s ON d.grp = s.grp
            GROUP BY s.grp, s.q_pm)
    SELECT s.grp, CAST(s.q_pm AS DOUBLE) / 1000.0 AS quantile,
           s.t AS target_rank, s.est, s.est_rmin,
           e.rank_lo, e.rank_le, s.n,
           CASE WHEN e.rank_lo - s.t <= (2 * s.n) // {_GK_ERRDIV}
                 AND s.t - e.rank_le <= (2 * s.n) // {_GK_ERRDIV}
                THEN 1 ELSE 0 END AS within_eps
    FROM sel s JOIN env e ON s.grp = e.grp AND s.q_pm = e.q_pm
    ORDER BY s.grp, quantile
    """,
    "per-GROUP quantile sketch — the distributed 'GROUP BY "
    "approx_percentile' workload, deterministic and oracle-verified: "
    "one group-tagged summary build (partition key <group>|<bucket>), "
    "per-group rmin windows over the bounded summary, per-group "
    "targets t = ceil(q * n_grp), per-group exact-rank envelope audit "
    "(median + p90 per returnflag, each within eps*n_grp). The group "
    "count only widens window partitioning — state per group stays "
    "<= partitions*(2*err_div+2) tuples",
    "2.4 extension (grouped GK quantile sketch)",
)
def agg_gk_grouped_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hangarbay_spark.operators.sketches import (
        gk_grouped_quantile_estimates,
        gk_summary,
    )

    vals = _gk_lineitem_vals(spark, sf_dir)
    kept = gk_summary(
        vals, "v", "tb", partitions=_GK_P, err_div=_GK_ERRDIV,
        batch_col="l_returnflag",
    )
    est = gk_grouped_quantile_estimates(kept, _GK_GRP_QPM)
    env = (
        vals.select(F.col("l_returnflag").alias("grp"), "v")
        .join(F.broadcast(est), "grp")
        .groupBy(
            "grp", "q_pm", "quantile", "target_rank", "est", "est_rmin", "n"
        )
        .agg(
            (
                F.sum(F.when(F.col("v") < F.col("est"), 1).otherwise(0)) + 1
            )
            .cast("bigint")
            .alias("rank_lo"),
            F.sum(F.when(F.col("v") <= F.col("est"), 1).otherwise(0))
            .cast("bigint")
            .alias("rank_le"),
        )
    )
    return env.select(
        "grp",
        "quantile",
        "target_rank",
        "est",
        "est_rmin",
        "rank_lo",
        "rank_le",
        "n",
        F.expr(
            f"CASE WHEN rank_lo - target_rank <= (2 * n) div {_GK_ERRDIV}"
            f" AND target_rank - rank_le <= (2 * n) div {_GK_ERRDIV}"
            " THEN 1 ELSE 0 END"
        ).alias("within_eps"),
    ).orderBy("grp", "quantile")


@register(
    "agg_gk_weighted_quantile_sketch",
    f"""
    WITH vals AS (SELECT l_extendedprice AS v,
                         CAST(l_quantity AS BIGINT) AS w,
                         l_orderkey * 10 + l_linenumber AS tb
                  FROM lineitem),
    pb AS (SELECT v, w, tb,
                  '' || '|' || CAST({_o_gk_bucket()} AS VARCHAR) AS p
           FROM vals),
    run AS (SELECT v, w, tb, p,
              CAST(SUM(w) OVER (PARTITION BY p ORDER BY v, tb
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS cumw,
              CAST(SUM(w) OVER (PARTITION BY p) AS BIGINT) AS wp
            FROM pb),
    k0 AS (SELECT v, w, tb, p, cumw, wp,
             GREATEST(1, wp // {_GK_ERRDIV}) AS sp FROM run),
    kept AS (SELECT v, tb, p, cumw FROM k0
             WHERE (cumw // sp) > ((cumw - w) // sp) OR cumw = wp),
    gg AS (SELECT v, tb,
             CAST(cumw - COALESCE(LAG(cumw) OVER (PARTITION BY p
                                                  ORDER BY v, tb),
                                  0) AS BIGINT) AS g
           FROM kept),
    rmin AS (SELECT v, tb,
               CAST(SUM(g) OVER (ORDER BY v, tb ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS rmin
             FROM gg),
    nn AS (SELECT CAST(SUM(g) AS BIGINT) AS n FROM gg),
    tq AS (SELECT q_pm, n,
                  CAST((q_pm * n + 999) // 1000 AS BIGINT) AS t
           FROM (VALUES {",".join(f"({q})" for q in _GK_QPM)}) qs(q_pm)
           CROSS JOIN nn),
    cand AS (SELECT q_pm, n, t, v, rmin,
               ROW_NUMBER() OVER (PARTITION BY q_pm
                 ORDER BY ABS(rmin - t), v, tb) AS rn
             FROM rmin CROSS JOIN tq),
    sel AS (SELECT q_pm, n, t, v AS est, rmin AS est_rmin
            FROM cand WHERE rn = 1),
    env AS (SELECT s.q_pm,
              CAST(SUM(CASE WHEN d.v < s.est THEN d.w ELSE 0 END) + 1
                AS BIGINT) AS rank_lo,
              CAST(SUM(CASE WHEN d.v <= s.est THEN d.w ELSE 0 END)
                AS BIGINT) AS rank_le
            FROM vals d CROSS JOIN sel s GROUP BY s.q_pm)
    SELECT CAST(s.q_pm AS DOUBLE) / 1000.0 AS quantile,
           s.t AS target_mass, s.est, s.est_rmin,
           e.rank_lo, e.rank_le, s.n AS w_total,
           CASE WHEN e.rank_lo - s.t <= (2 * s.n) // {_GK_ERRDIV}
                 AND s.t - e.rank_le <= (2 * s.n) // {_GK_ERRDIV}
                THEN 1 ELSE 0 END AS within_eps
    FROM sel s JOIN env e ON s.q_pm = e.q_pm
    ORDER BY quantile
    """,
    "WEIGHTED GK quantile sketch — quantity-weighted price quantiles, "
    "the mergeable-sketch twin of the exact two-pass "
    "agg_weighted_quantiles: a row is kept iff its running weight "
    "crosses a multiple of s_p = W_p div 100 (a heavy row always "
    "crosses a boundary, so no mass hides between tuples; uncovered "
    "mass per gap < s_p), targets are mass ranks t = ceil(q * W), and "
    "the weighted exact-rank envelope |rank(est) - t| <= eps*W rides "
    "as audit columns. All integer arithmetic (integral l_quantity "
    "cast to BIGINT), oracle-verified like the unweighted family",
    "2.4 extension (weighted mergeable quantile sketch)",
)
def agg_gk_weighted_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hangarbay_spark.operators.sketches import (
        gk_quantile_estimates,
        gk_weighted_summary,
    )

    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("w"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
    )
    kept = gk_weighted_summary(
        vals, "v", "w", "tb", partitions=_GK_P, err_div=_GK_ERRDIV
    )
    est = gk_quantile_estimates(kept, _GK_QPM)
    env = (
        vals.crossJoin(F.broadcast(est))
        .groupBy("q_pm", "quantile", "target_rank", "est", "est_rmin", "n")
        .agg(
            (
                F.sum(
                    F.when(F.col("v") < F.col("est"), F.col("w")).otherwise(
                        0
                    )
                )
                + 1
            )
            .cast("bigint")
            .alias("rank_lo"),
            F.sum(
                F.when(F.col("v") <= F.col("est"), F.col("w")).otherwise(0)
            )
            .cast("bigint")
            .alias("rank_le"),
        )
    )
    return env.select(
        "quantile",
        F.col("target_rank").alias("target_mass"),
        "est",
        "est_rmin",
        "rank_lo",
        "rank_le",
        F.col("n").alias("w_total"),
        F.expr(
            f"CASE WHEN rank_lo - target_rank <= (2 * n) div {_GK_ERRDIV}"
            f" AND target_rank - rank_le <= (2 * n) div {_GK_ERRDIV}"
            " THEN 1 ELSE 0 END"
        ).alias("within_eps"),
    ).orderBy("quantile")


@register(
    "agg_skyline_parts",
    """
    WITH g AS (
      SELECT l_partkey,
             MIN(l_extendedprice) AS p,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, p AS min_price, q AS total_qty
    FROM g a
    WHERE NOT EXISTS (
      SELECT 1 FROM g b
      WHERE b.p <= a.p AND b.q >= a.q AND (b.p < a.p OR b.q > a.q))
    ORDER BY p, l_partkey
    """,
    "skyline / Pareto-front query (Borzsony et al. 2001): parts not "
    "dominated on (cheaper min price, higher total quantity) — the "
    "multi-criteria shortlist operator. Scalable single-sort "
    "formulation: per-price-group max quantity, a strict-predecessor "
    "running max over the price domain, and a part survives iff it "
    "beats every strictly-cheaper quantity and tops its own price "
    "group ((p, q)-duplicates mutually survive). The oracle is the "
    "OPPOSITE construction — the quadratic NOT EXISTS dominance "
    "definition — so agreement checks the window reformulation "
    "itself, not a shared recipe. All comparisons on exact values. "
    "At 100 TB: one part rollup; the running max lives on the "
    "price-domain frame (range-partitionable)",
    "analytics extension (skyline / Pareto-front operator)",
)
def agg_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("p"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"),
    )
    pg = g.groupBy("p").agg(F.max("q").alias("maxq_at_p"))
    ordered = pg.select(
        "p",
        "maxq_at_p",
        F.max("maxq_at_p")
        .over(W.orderBy("p").rowsBetween(W.unboundedPreceding, -1))
        .alias("cummax_prev"),
    )
    # no broadcast hint: the price-domain frame grows with SF — the
    # planner/AQE picks broadcast while it is actually small.
    j = g.join(ordered, "p")
    return (
        j.filter(
            (F.col("cummax_prev").isNull() | (F.col("q") > F.col("cummax_prev")))
            & (F.col("q") == F.col("maxq_at_p"))
        )
        .select(
            "l_partkey",
            F.col("p").alias("min_price"),
            F.col("q").alias("total_qty"),
        )
        .orderBy("min_price", "l_partkey")
    )
