"""The delegated SQL surface (SURVEY.md §2b/§2c), one query per capability.

Each query is built with the DataFrame API so Catalyst plans it (predicate
pushdown / column pruning / join selection are declarative), with a DuckDB
oracle string for the correctness gate. Where the DataFrame API can't express
the construct (GROUPING SETS, correlated subqueries), ``spark.sql`` over
registered views is the idiomatic Spark path — same Catalyst plan.

Scale notes are inline per query: broadcast hints on dimension tables,
unique sort keys under every window/limit so results are deterministic at
any partition count, and aggregate-before-join shapes where they cut shuffle
volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from zarr_datafusion_search_spark.plans.registry import register, register_views, table


# ---------------------------------------------------------------------------
# scans, projection, filter
# ---------------------------------------------------------------------------


@register(
    "full_scan_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="Plain scan + projection + deterministic top-k (TakeOrderedAndProject).",
)
def full_scan_limit(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1995-12-31'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 30
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus IS NOT NULL
    """,
    doc="Comparison/BETWEEN/IN/IS NULL predicate battery; pushdown-friendly.",
)
def filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.filter(
        (F.col("l_shipdate").between("1994-01-01", "1995-12-31"))
        & (F.col("l_discount").between(0.02, 0.08))
        & (F.col("l_quantity") < 30)
        & (F.col("l_returnflag").isin("A", "R"))
        & (F.col("l_linestatus").isNotNull())
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@register(
    "like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%green%' OR p_type LIKE 'SMALL%'
    """,
    doc="LIKE prefix/infix predicates.",
)
def like_filter(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part")
    return p.filter(
        F.col("p_name").like("%green%") | F.col("p_type").like("SMALL%")
    ).select("p_partkey", "p_name", "p_type")


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           sum(l_extendedprice)                                  AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                       AS avg_qty,
           avg(l_extendedprice)                                  AS avg_price,
           avg(l_discount)                                       AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: partial+final hash agg, map-side combine.",
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: tight filter + single global aggregate.",
)
def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "groupby_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 5
    """,
    doc="GROUP BY + HAVING over the fact table.",
)
def groupby_having(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 5)
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           count(*)                                             AS n_all,
           count(*) FILTER (WHERE l_quantity > 25)              AS n_big,
           sum(l_extendedprice) FILTER (WHERE l_discount > 0.05) AS discounted_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Aggregate FILTER (WHERE ...) clauses — conditional aggregation.",
)
def agg_filter_clause(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))).alias(
            "discounted_price"
        ),
    )


@register(
    "count_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="COUNT(DISTINCT) per group (expand + two-phase agg in Spark).",
)
def count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "approx_count_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(DISTINCT l_partkey)  AS BIGINT) AS exact_parts,
           TRUE AS orders_within_5pct,
           TRUE AS parts_within_5pct
    FROM lineitem
    """,
    doc="approx_count_distinct (HLL++, rsd=0.01). Sketch estimates are "
    "engine-specific, so the comparable output is the exact cardinality plus "
    "a within-±5%% boolean that the oracle asserts as constant TRUE — the "
    "sketch is still computed and checked, just not hash-compared bit-wise.",
)
def approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    agg = l.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.col(e) * F.lit(0.05)
    )
    return agg.select(
        "exact_orders",
        "exact_parts",
        within("approx_orders", "exact_orders").alias("orders_within_5pct"),
        within("approx_parts", "exact_parts").alias("parts_within_5pct"),
    )


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (null-marked subtotal rows).",
)
def rollup_agg(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_extendedprice) AS sum_price, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions.",
)
def cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_extendedprice").alias("sum_price"), F.count(F.lit(1)).alias("n")
    )


@register(
    "grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (via spark.sql — same Catalyst Expand plan).",
)
def grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)            AS sd_qty,
           round(var_samp(l_extendedprice), 6)          AS var_price,
           round(corr(l_quantity, l_extendedprice), 6)  AS corr_qty_price,
           min(l_discount)                              AS min_disc,
           max(l_discount)                              AS max_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/corr/min/max. "
    "corr/var/stddev rounded to 6dp on both sides — Spark and DuckDB "
    "accumulate in different orders and differ in the last 2-3 ULPs.",
)
def stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 6).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: 3-way equi join + agg + deterministic top-k. customer is "
    "broadcast (small side); lineitem⋈orders shuffles on orderkey.",
)
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    l = table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(l.l_orderkey.alias("orderkey"), o.o_orderdate.alias("orderdate"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5: 6-way join through two dimension chains; all dims "
    "broadcast, single shuffle on orderkey.",
)
def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    l = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        # round(4): the true sum lies on a 4-decimal grid (2-dec price x
        # 2-dec discount), so both engines land on the same value despite
        # summation-order ULP drift (partitioning-dependent on this side)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "broadcast_dim_join",
    oracle="""
    SELECT p.p_brand AS brand, count(*) AS n_items, sum(l.l_quantity) AS qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Fact ⋈ broadcast dimension, then agg — the canonical star-join shape.",
)
def broadcast_dim_join(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(p.p_brand.alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum("l_quantity").alias("qty"))
    )


@register(
    "outer_joins",
    oracle="""
    SELECT c.c_custkey, c.c_name, agg.n_orders, agg.total
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total
        FROM orders GROUP BY o_custkey
    ) agg ON c.c_custkey = agg.o_custkey
    """,
    doc="LEFT OUTER join against a pre-aggregated subquery (agg-below-join "
    "keeps the shuffled side small).",
)
def outer_joins(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    agg = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total"))
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        "c_custkey", "c_name", "n_orders", "total"
    )


@register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="LEFT SEMI join (EXISTS).",
)
def semi_join(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
    doc="LEFT ANTI join (NOT EXISTS): customers who never placed a "
    "400k+ order. The filtered right side keeps survivors at every "
    "shipped SF (20/202/1997 rows at sf0.001/0.01/0.1) so the driver "
    "row verifies values, not just an empty schema (VERDICT r04 ask #2 "
    "— the unfiltered variant matched every customer and returned 0 "
    "rows on both engines).",
)
def anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "theta_join",
    oracle="""
    SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
           a.s_acctbal - b.s_acctbal AS bal_gap
    FROM supplier a
    JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_acctbal > b.s_acctbal
    """,
    doc="Theta join: equi part (nationkey) hashes; the inequality is a "
    "post-join predicate — Catalyst keeps it out of a cartesian product.",
)
def theta_join(spark: SparkSession, sf: str) -> DataFrame:
    a = table(spark, sf, "supplier").alias("a")
    b = table(spark, sf, "supplier").alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_acctbal") > F.col("b.s_acctbal")),
    ).select(
        F.col("a.s_suppkey").alias("s1"),
        F.col("b.s_suppkey").alias("s2"),
        (F.col("a.s_acctbal") - F.col("b.s_acctbal")).alias("bal_gap"),
    )


@register(
    "cross_join_small",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name
    FROM region r CROSS JOIN nation n
    """,
    doc="Explicit cross join of two tiny dimensions (broadcast NLJ).",
)
def cross_join_small(spark: SparkSession, sf: str) -> DataFrame:
    r = table(spark, sf, "region").select(F.col("r_name").alias("region_name"))
    n = table(spark, sf, "nation").select(F.col("n_name").alias("nation_name"))
    return r.crossJoin(n)


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number()  OVER w AS rn,
               rank()        OVER w AS rnk,
               dense_rank()  OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
    doc="Ranking trio over PARTITION BY/ORDER BY; unique tie-break key keeps "
    "row_number deterministic across engines and partitionings.",
)
def window_rank(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rolling_sum,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_avg
    FROM orders
    """,
    doc="Sliding and running aggregates over ROWS frames.",
)
def window_frame_rows(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    ordering = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_slide = (
        Window.partitionBy("o_custkey").orderBy(*ordering).rowsBetween(-2, 0)
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # rounding both sides: running aggregates accumulate in engine-specific
    # order (incremental vs segment-tree), drifting in the last ULP
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_slide), 2).alias("rolling_sum"),
        F.round(F.avg("o_totalprice").over(w_run), 6).alias("running_avg"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead/first/last navigation functions.",
)
def window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


@register(
    "window_ntile_percent",
    oracle="""
    SELECT c_custkey,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    doc="ntile/percent_rank/cume_dist over a global ordering (unique keys).",
)
def window_ntile_percent(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# sort / limit / offset / set ops / distinct
# ---------------------------------------------------------------------------


@register(
    "sort_nulls_limit_offset",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey
    LIMIT 25 OFFSET 10
    """,
    doc="Multi-key sort with explicit null ordering + LIMIT/OFFSET.",
)
def sort_nulls_limit_offset(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    return (
        c.select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey"),
        )
        .offset(10)
        .limit(25)
    )


@register(
    "union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
    """,
    doc="UNION ALL of two conformed projections.",
)
def union_all(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    s = table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    return c.unionByName(s)


@register(
    "intersect_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics).",
)
def intersect_distinct(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT ALL (bag difference).",
)
def except_all(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="DISTINCT projection.",
)
def distinct_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# subqueries / CTEs
# ---------------------------------------------------------------------------


@register(
    "in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
    doc="IN subquery (planned as left-semi).",
)
def in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        """
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery in a predicate.",
)
def scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "correlated_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 2 * c.c_acctbal
    )
    """,
    doc="Correlated EXISTS with an outer-column comparison (decorrelated by "
    "Catalyst into a semi join).",
)
def correlated_exists(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 2 * c.c_acctbal
        )
        """
    )


@register(
    "cte_query",
    oracle="""
    WITH big_orders AS (
        SELECT o_custkey, count(*) AS n
        FROM orders WHERE o_totalprice > 50000
        GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, b.n AS n_big_orders
    FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
    """,
    doc="CTE feeding a join.",
)
def cte_query(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_custkey, count(*) AS n
            FROM orders WHERE o_totalprice > 50000
            GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, b.n AS n_big_orders
        FROM customer c JOIN big_orders b ON c.c_custkey = b.o_custkey
        """
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4: EXISTS semi join + count per priority. The quarter is "
    "1996-Q3 — inside the synthetic orders range 1995-01..2001-08 — so "
    "the driver row verifies real counts (TPC-H's canonical 1993-Q3 "
    "predates the fixture and returned 0 rows at every SF; VERDICT r04 "
    "ask #2).",
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = table(spark, sf, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# scalar function batteries
# ---------------------------------------------------------------------------


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           length(p_name)                         AS name_len,
           upper(p_brand)                         AS brand_upper,
           lower(p_type)                          AS type_lower,
           substr(p_name, 1, 5)                   AS name_prefix,
           trim(concat('  ', p_brand, '  '))      AS brand_trimmed,
           replace(p_type, ' ', '_')              AS type_snake,
           concat(p_brand, ':', p_type)           AS brand_type,
           strpos(p_name, 'a')                    AS first_a,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
           regexp_extract(p_name, '([a-z]+)', 1)  AS first_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           starts_with(p_type, 'SMALL')           AS is_small
    FROM part
    """,
    doc="String scalar battery: length/case/substr/trim/replace/concat/"
    "position/pad/regexp.",
)
def string_functions(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trimmed"
        ),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "").alias("no_vowels"),
        F.startswith(F.col("p_type"), F.lit("SMALL")).alias("is_small"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(extract(year  FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS order_mon,
           CAST(extract(day   FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(extract(dow   FROM o_orderdate) AS BIGINT) AS order_dow,
           o_orderdate + INTERVAL 90 DAY                   AS due_date,
           CAST(o_orderdate AS DATE)                       AS order_date_only,
           last_day(CAST(o_orderdate AS DATE))             AS month_end
    FROM orders
    """,
    doc="Date/time battery: date_trunc/extract/interval arithmetic/last_day. "
    "dow normalized to DuckDB's Sunday=0 convention.",
)
def date_functions(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("order_dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.col("o_orderdate").cast("date").alias("order_date_only"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@register(
    "math_case_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25)                       AS qty_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_k_ceil,
           CAST(floor(l_discount * 100) AS BIGINT)       AS disc_pct,
           round(l_tax * 100)                         AS tax_pct,
           round(ln(l_extendedprice), 6)              AS ln_price,
           round(exp(l_discount), 6)                  AS exp_disc,
           sqrt(l_quantity)                           AS sqrt_qty,
           power(l_quantity, 2)                       AS qty_sq,
           CAST(l_quantity AS BIGINT) % 7             AS qty_mod7,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END                       AS qty_band,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
    doc="Math + CASE/coalesce/nullif/cast battery. DuckDB ceil/floor return "
    "DOUBLE while Spark's return BIGINT — the oracle casts to BIGINT.",
)
def math_case_functions(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.col("l_tax") * 100).alias("tax_pct"),
        # ln/exp are not correctly-rounded in every libm; round(6) both
        # sides (sqrt IS IEEE-exact and stays raw)
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.sqrt(F.col("l_quantity")).alias("sqrt_qty"),
        F.pow(F.col("l_quantity"), 2).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@register(
    "json_functions",
    oracle="""
    SELECT event_type,
           count(*)                                           AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON field extraction from a string column + aggregate. DuckDB "
    "sum(BIGINT) yields HUGEINT (renders as float through pandas) — outer "
    "CAST AS BIGINT keeps the driver hash comparable.",
)
def json_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


@register(
    "events_tumbling_window",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600) AS TIMESTAMP) AS window_start,
           event_type,
           count(*)    AS n_events,
           sum(value)  AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hourly tumbling-window aggregate over the events table — the batch "
    "twin of the Structured Streaming query in streaming/events.py. Both "
    "sides emit tz-naive timestamps: Spark's F.window yields LTZ (cast to "
    "timestamp_ntz under the UTC session), DuckDB's to_timestamp yields "
    "TIMESTAMPTZ (cast to naive TIMESTAMP).",
)
def events_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour")
            .getField("start")
            .cast("timestamp_ntz")
            .alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
