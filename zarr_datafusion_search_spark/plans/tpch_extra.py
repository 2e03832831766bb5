"""Extended TPC-H derivative suite (q7-q19 adapted to the driver schema).

The synthetic tables (TESTDATA.md) are TPC-H-ish but trimmed: no partsupp,
no l_commitdate/l_receiptdate/l_shipmode, dates span 1995-2001. Queries
that need the missing columns are adapted (noted per query); the rest keep
the canonical TPC-H shape. The reference delegates this whole surface to
its embedded SQL engine (reference: README.md:29-42, python/src/lib.rs);
here each is a Catalyst plan with a DuckDB oracle.

Scale notes: every multi-join query broadcasts its dimension tables
(nation/region/part at TPC-H scale grow ~100x slower than the fact
tables), aggregates before joining where the group key is the join key,
and puts unique tiebreakers under every top-k so results are stable at
any partition count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zarr_datafusion_search_spark.plans.registry import register, table


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 volume shipping: two broadcast nation joins on opposite "
    "sides of the fact join, year extraction, nation-pair filter.",
)
def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    s = table(spark, sf, "supplier")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n1 = F.broadcast(
        table(spark, sf, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        table(spark, sf, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
        AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 market share (adapted: p_type domain is 6 coarse values "
    "here): 7-table join with three broadcast dims, conditional aggregate "
    "ratio per year.",
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    p = F.broadcast(
        table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    )
    l = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = table(spark, sf, "customer")
    n1 = F.broadcast(
        table(spark, sf, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
        )
    )
    r = F.broadcast(
        table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    )
    n2 = F.broadcast(
        table(spark, sf, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("c_nk"))
        .join(r, F.col("c_rk") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume)
            ).alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: quarter scan, returnflag "
    "filter, top-20 customers by lost revenue (c_custkey tiebreak keeps "
    "the limit deterministic).",
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf, "nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 customer distribution (adapted: the anti-filter is on "
    "o_orderpriority; the schema has no o_comment): left outer join "
    "preserving order-less customers, two-level aggregation.",
)
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14 promotion effect (adapted: p_type = 'PROMO' exactly; "
    "the domain here is coarse): month scan, broadcast part join, "
    "conditional-ratio aggregate.",
)
def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = F.broadcast(table(spark, sf, "part").select("p_partkey", "p_type"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 4) AS total_revenue
    FROM supplier s
    JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    doc="TPC-H Q15 top supplier: CTE revenue view + scalar-subquery max "
    "equality (rounded to 4dp on both sides — the equality itself is "
    "computed on raw doubles, which both engines fold identically here).",
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue0 = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("m"))
    s = table(spark, sf, "supplier")
    return (
        revenue0.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 4).alias("total_revenue")
        )
    )


@register(
    "q17_small_quantity_parts",
    oracle="""
    SELECT round(round(sum(l.l_extendedprice), 2) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND p.p_size < 15
      AND l.l_quantity < t.qty_threshold
    """,
    doc="TPC-H Q17 small-quantity-order revenue (adapted: p_size stands in "
    "for the missing p_container): per-part average as a re-joined "
    "aggregate (Catalyst turns the correlated subquery into exactly this "
    "shape), broadcast part filter.",
)
def q17_small_quantity_parts(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    p = F.broadcast(
        table(spark, sf, "part")
        .filter((F.col("p_brand") == "Brand#11") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    # aggregate-before-join: the per-part threshold is tiny next to lineitem
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        # snap the sum to its true 2-decimal grid BEFORE the /7.0 so both
        # engines divide bit-identical inputs — round(sum/7, 4) alone is not
        # grid-snapped and a last-ULP drift near a .00005 boundary could
        # still flip the rounded digit cross-engine
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 4).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, sum(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 large-volume customer: HAVING-filtered IN subquery "
    "(planned as a semi join on the pre-aggregated order keys), top-100 "
    "with orderkey tiebreak.",
)
def q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    return (
        l.join(big.withColumnRenamed("l_orderkey", "big_ok"), l.l_orderkey == F.col("big_ok"), "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 discounted revenue (adapted: p_size ranges stand in for "
    "the missing p_container/l_shipmode): disjunctive mixed join+filter "
    "predicate — the join key stays an equi-join, the OR-of-ANDs is a "
    "post-join filter Catalyst can partially push to both sides.",
)
def q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    p = F.broadcast(table(spark, sf, "part").select("p_partkey", "p_brand", "p_size"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT nation_grp, count(*) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM (
      SELECT c.c_nationkey % 5 AS nation_grp, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (
              SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
            )
        AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
            )
    ) custsale
    GROUP BY nation_grp
    """,
    doc="TPC-H Q22 global sales opportunity (adapted: nationkey%5 stands "
    "in for the missing phone country code, and the anti join excludes "
    "customers with URGENT orders — every synthetic customer has at least "
    "one order): scalar-average subquery + NOT EXISTS anti join.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    o = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("nation_grp"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 product type profit (adapted: the missing "
    "ps_supplycost is proxied by 0.1 * p_retailprice per unit): 4-way "
    "fact join with two broadcast dims, LIKE filter pushed to the part "
    "scan, profit aggregated by supplier nation and order year.",
)
def q9_product_type_profit(spark: SparkSession, sf: str) -> DataFrame:
    p = F.broadcast(
        table(spark, sf, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    l = table(spark, sf, "lineitem")
    s = F.broadcast(table(spark, sf, "supplier"))
    o = table(spark, sf, "orders")
    n = F.broadcast(table(spark, sf, "nation"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == F.col("p_partkey"))
        .join(s, l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == F.col("o_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH partvalue AS (
      SELECT l.l_partkey, sum(l.l_extendedprice) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, round(value, 4) AS value
    FROM partvalue
    WHERE value > (SELECT 0.001 * sum(value) FROM partvalue)
    """,
    doc="TPC-H Q11 important stock (adapted: shipped lineitem value "
    "stands in for the missing partsupp holdings): per-part value for "
    "one nation's suppliers, kept when above a scalar-subquery fraction "
    "of the total. The fraction threshold is a broadcast single-row "
    "join, so the fact relation aggregates exactly once per side.",
)
def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    s = F.broadcast(table(spark, sf, "supplier"))
    n = F.broadcast(
        table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    )
    pv = (
        l.join(s, l.l_suppkey == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = pv.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        pv.join(F.broadcast(total), F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 4).alias("value"))
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT year(l.l_shipdate) AS l_year,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY year(l.l_shipdate)
    """,
    doc="TPC-H Q12 shipping modes / order priority (adapted: the missing "
    "l_shipmode/l_commitdate become a ship-lag predicate — lines shipped "
    ">90 days after the order date — bucketed by ship year): conditional "
    "counts split by priority class over a fact-fact equi join.",
)
def q12_late_shipment_priority(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type NOT LIKE 'ECO%'
      AND p.p_size IN (5, 11, 17, 23, 28, 36, 42, 49)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 parts/supplier relationship (adapted: the shipped "
    "lineitem relation stands in for partsupp, and negative-balance "
    "suppliers for the complaints LIKE filter): COUNT(DISTINCT) over a "
    "broadcast-dim join with an anti-join supplier exclusion.",
)
def q16_supplier_part_count(spark: SparkSession, sf: str) -> DataFrame:
    p = F.broadcast(
        table(spark, sf, "part").filter(
            (F.col("p_brand") != "Brand#2")
            & ~F.col("p_type").like("ECO%")
            & F.col("p_size").isin(5, 11, 17, 23, 28, 36, 42, 49)
        )
    )
    bad = table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = table(spark, sf, "lineitem")
    return (
        l.join(p, l.l_partkey == F.col("p_partkey"))
        .join(bad, l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_name LIKE 'blue%'
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l.l_suppkey
            HAVING sum(l.l_quantity) > 50
          )
    """,
    doc="TPC-H Q20 potential part promotion (adapted: shipped quantity "
    "replaces the missing ps_availqty threshold): HAVING-filtered "
    "aggregate subquery feeding a semi join, nation filter on the outer "
    "side.",
)
def q20_part_promotion_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    p = F.broadcast(
        table(spark, sf, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    heavy = (
        l.join(p, l.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = table(spark, sf, "supplier")
    n = F.broadcast(
        table(spark, sf, "nation").filter(F.col("n_name") == "NATION_5")
    )
    return (
        s.join(n, s.s_nationkey == F.col("n_nationkey"))
        .join(heavy, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, count(*) AS numwait
    FROM lo l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (
            SELECT 1 FROM lo l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
      AND NOT EXISTS (
            SELECT 1 FROM lo l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.late
          )
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 suppliers who kept orders waiting (adapted: 'late' is "
    "shipping >60 days after the order date, replacing the missing "
    "l_receiptdate/l_commitdate): the canonical EXISTS / NOT EXISTS "
    "double self-join on the finished-order lines, expressed as semi + "
    "anti joins co-partitioned on l_orderkey so the three passes share "
    "one shuffle key.",
)
def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    lo = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")).alias(
                "late"
            ),
        )
    )
    l1 = lo.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    others = lo.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = lo.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waited = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    s = F.broadcast(table(spark, sf, "supplier"))
    return (
        waited.join(s, waited.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    regional AS (
      SELECT c.l_partkey, c.unit_cost, s.s_acctbal, s.s_name, n.n_name
      FROM costs c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT rg.*, p.p_brand, p.p_type, p.p_partkey,
             min(rg.unit_cost) OVER (PARTITION BY p.p_partkey) AS min_cost
      FROM regional rg JOIN part p ON p.p_partkey = rg.l_partkey
      WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type LIKE '%MY'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, p_type
    FROM ranked WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 minimum-cost supplier, adapted: no partsupp table in the "
    "fixtures, so per-(part, supplier) unit cost is derived from lineitem "
    "(min extendedprice/quantity). The correlated 'cost = regional minimum' "
    "subquery is expressed as a window min over p_partkey — the decorrelated "
    "plan Catalyst would produce. Both engines compute the identical double "
    "(same division, same min), so the equality filter is exact. Scale: "
    "part/nation/region broadcast; one shuffle for the cost aggregation, "
    "one for the per-part window.",
)
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    costs = (
        table(spark, sf, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    s = table(spark, sf, "supplier")
    n = F.broadcast(table(spark, sf, "nation"))
    r = F.broadcast(
        table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    )
    p = F.broadcast(
        table(spark, sf, "part").filter(
            F.col("p_size").between(10, 20) & F.col("p_type").like("%MY")
        )
    )
    regional = (
        costs.join(s, costs.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        regional.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "p_type")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )
