"""SQL-surface extension set: reshaping, ordered-set aggregates, lateral /
table-generating constructs, bitwise ops, inline tables, user-defined
functions (pandas UDF / grouped UDAF / UDTF), and non-parquet source
roundtrips. Complements sql_surface.py; same QuerySpec contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zarr_datafusion_search_spark.plans.registry import register, register_views, table


# ---------------------------------------------------------------------------
# reshaping
# ---------------------------------------------------------------------------


@register(
    "pivot_returnflag",
    oracle="""
    SELECT l_linestatus,
           sum(l_quantity) FILTER (WHERE l_returnflag = 'A') AS A,
           sum(l_quantity) FILTER (WHERE l_returnflag = 'N') AS N,
           sum(l_quantity) FILTER (WHERE l_returnflag = 'R') AS R
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="PIVOT with explicit values (becomes conditional aggregation; "
    "explicit value list avoids the extra distinct-scan pass).",
)
def pivot_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
    )


@register(
    "unpivot_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    doc="UNPIVOT (melt) three measure columns into (metric, value) rows.",
)
def unpivot_metrics(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# ordered-set / positional aggregates
# ---------------------------------------------------------------------------


@register(
    "percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 6)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
           round(median(l_quantity), 6)                   AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact continuous percentiles (linear interpolation) and median.",
)
def percentiles(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("p99"),
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
    )


@register(
    "approx_percentile",
    oracle="""
    SELECT round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_exact,
           TRUE AS p50_within_1pct,
           TRUE AS p99_within_1pct
    FROM lineitem
    """,
    doc="approx_percentile (GK sketch, accuracy 10000). Sketch estimates are "
    "engine-specific, so the comparable output is the exact continuous "
    "percentile plus a within-±1%% boolean the oracle asserts as constant "
    "TRUE. GK at accuracy=10000 guarantees rank error 1/10000, far inside "
    "1%% value error on this distribution.",
)
def approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    agg = l.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99_approx"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_raw"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99_raw"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.abs(F.col(e)) * F.lit(0.01)
    )
    return agg.select(
        F.round("p50_raw", 6).alias("p50_exact"),
        F.round("p99_raw", 6).alias("p99_exact"),
        within("p50_approx", "p50_raw").alias("p50_within_1pct"),
        within("p99_approx", "p99_raw").alias("p99_within_1pct"),
    )


@register(
    "listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
    doc="Ordered string aggregation (LISTAGG WITHIN GROUP / string_agg).",
)
def listagg_ordered(spark: SparkSession, sf: str) -> DataFrame:
    n = table(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "collect_sorted_array",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Array-valued aggregate: sorted distinct collection per group, "
    "emitted as a '|'-joined string on both sides — the driver's pandas "
    "canonicalizer cannot sort/hash raw list cells.",
)
def collect_sorted_array(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), "|").alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# lateral / table-generating
# ---------------------------------------------------------------------------


@register(
    "lateral_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, m.max_price, m.n_items
    FROM orders o,
    LATERAL (
        SELECT max(l_extendedprice) AS max_price, count(*) AS n_items
        FROM lineitem WHERE l_orderkey = o.o_orderkey
    ) m
    WHERE o.o_totalprice > 150000
    """,
    doc="Correlated LATERAL subquery (decorrelated into a join by the "
    "optimizer in both engines).",
)
def lateral_correlated(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice, m.max_price, m.n_items
        FROM orders o,
        LATERAL (
            SELECT max(l_extendedprice) AS max_price, count(*) AS n_items
            FROM lineitem WHERE l_orderkey = o.o_orderkey
        ) m
        WHERE o.o_totalprice > 150000
        """
    )


@register(
    "explode_token_freq",
    oracle=r"""
    SELECT tok, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> len(x) > 0)) AS tok
        FROM documents
    )
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT 20
    """,
    doc="explode() as a table-generating function: corpus token frequency "
    "top-20 with deterministic tie-break.",
)
def explode_token_freq(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: F.length(t) > 0)
    return (
        d.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(20)
    )


@register(
    "inline_values_join",
    oracle="""
    SELECT v.region_name, count(*) AS n_nations
    FROM (VALUES ('ASIA', 2), ('AMERICA', 1)) AS v(region_name, expected_rank)
    JOIN region r ON r.r_name = v.region_name
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY v.region_name
    """,
    doc="Inline VALUES table joined against stored tables.",
)
def inline_values_join(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT v.region_name, count(*) AS n_nations
        FROM VALUES ('ASIA', 2), ('AMERICA', 1) AS v(region_name, expected_rank)
        JOIN region r ON r.r_name = v.region_name
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY v.region_name
        """
    )


# ---------------------------------------------------------------------------
# bitwise + second string battery
# ---------------------------------------------------------------------------


@register(
    "bitwise_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255                 AS and_low,
           l_orderkey | 4096                AS or_bit,
           xor(l_orderkey, l_partkey)       AS xor_keys,
           l_orderkey << 2                  AS shl2,
           l_orderkey >> 3                  AS shr3,
           CAST(bit_count(l_orderkey) AS INTEGER) AS popcount
    FROM lineitem
    """,
    doc="Bitwise operator battery over integer keys.",
)
def bitwise_ops(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(255).alias("and_low"),
        F.col("l_orderkey").bitwiseOR(4096).alias("or_bit"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("xor_keys"),
        F.expr("shiftleft(l_orderkey, 2)").alias("shl2"),
        F.expr("shiftright(l_orderkey, 3)").alias("shr3"),
        F.bit_count("l_orderkey").alias("popcount"),
    )


@register(
    "string_functions_2",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_matches(p_name, '[aeiou]') AS BOOLEAN)      AS has_vowel,
           len(regexp_extract_all(p_name, '[aeiou]'))::INTEGER     AS n_vowels,
           translate(p_brand, '#', '_')                            AS brand_u,
           repeat('ab', 3)                                         AS rep,
           reverse(p_brand)                                        AS brand_rev,
           left(p_name, 3)                                         AS l3,
           right(p_name, 3)                                        AS r3,
           contains(p_name, 'red')                                 AS has_red
    FROM part
    """,
    doc="Second string battery: regexp_like/extract_all counts, translate, "
    "repeat, reverse, left/right, contains.",
)
def string_functions_2(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_like("p_name", F.lit("[aeiou]")).alias("has_vowel"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).alias("n_vowels"),
        F.translate("p_brand", "#", "_").alias("brand_u"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.substring("p_name", -3, 3).alias("r3"),
        F.contains("p_name", F.lit("red")).alias("has_red"),
    )


@register(
    "sample_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE ('0x' || substr(md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR),
                          2, 15))::BIGINT % 10 = 0
    """,
    doc="Deterministic ~10% hash sample on the row key. Spark's seeded "
    "Bernoulli .sample() is not even run-to-run stable (per-partition RNG "
    "streams), so reproducible pipelines sample by key hash — which also "
    "makes the sample exactly oraclable.",
)
def sample_rows(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.functions.hashing import h64

    l = table(spark, sf, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    return l.filter(h64(key) % 10 == 0).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# user-defined functions: pandas UDF, grouped UDAF, UDTF
# ---------------------------------------------------------------------------


@register(
    "pandas_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000  THEN 'S'
                WHEN o_totalprice < 150000 THEN 'M'
                WHEN o_totalprice < 300000 THEN 'L'
                ELSE 'XL' END AS bracket,
           round(o_totalprice * 0.0825, 6) AS est_tax
    FROM orders
    """,
    doc="Arrow-vectorized scalar pandas UDF (price bracketing + tax "
    "estimate); the oracle is the equivalent SQL, proving the UDF path "
    "computes what the built-in expressions would.",
)
def pandas_udf_scalar(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _bracket(price):
        return pd.cut(
            price,
            bins=[float("-inf"), 50000, 150000, 300000, float("inf")],
            labels=["S", "M", "L", "XL"],
            right=False,
        ).astype(str)

    # functional form: local type annotations don't resolve inside Spark's
    # signature inspection, so pass the return type explicitly
    bracket = pandas_udf(_bracket, "string")
    est_tax = pandas_udf(lambda price: (price * 0.0825).round(6), "double")

    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        bracket("o_totalprice").alias("bracket"),
        est_tax("o_totalprice").alias("est_tax"),
    )


@register(
    "grouped_udaf_regression",
    oracle="""
    SELECT o_custkey,
           round(regr_slope(o_totalprice, epoch(o_orderdate)), 4) AS slope_r4,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3
    """,
    doc="Custom grouped aggregate as a pandas PARTIAL aggregation: each "
    "Arrow batch computes per-customer sufficient statistics (n, Sx, Sy, "
    "Sxy, Sxx) with one vectorized pandas groupby, the JVM merges "
    "partials with built-in sums, and the slope closes over the merged "
    "sums — the map-side-combinable UDAF shape. (The naive per-group "
    "applyInPandas pays pandas overhead per tiny group: measured 10 s -> "
    "<1 s at sf0.1 with ~10k customers.) Validated against DuckDB's "
    "regr_slope (population covariance formula, rounded to 4dp).",
)
def grouped_udaf_regression(spark: SparkSession, sf: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = pdf["o_orderdate"].astype("int64") / 1e9  # epoch seconds
            y = pdf["o_totalprice"]
            g = pd.DataFrame(
                {
                    "o_custkey": pdf["o_custkey"],
                    "n": 1,
                    "sx": x,
                    "sy": y,
                    "sxy": x * y,
                    "sxx": x * x,
                }
            ).groupby("o_custkey", as_index=False).sum()
            yield g

    o = table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    merged = (
        o.mapInPandas(
            partials,
            "o_custkey long, n long, sx double, sy double, "
            "sxy double, sxx double",
        )
        .groupBy("o_custkey")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
            F.sum("sxy").alias("sxy"),
            F.sum("sxx").alias("sxx"),
        )
        .filter(F.col("n") >= 3)
    )
    nn = F.col("n").cast("double")
    slope = (F.col("sxy") / nn - (F.col("sx") / nn) * (F.col("sy") / nn)) / (
        F.col("sxx") / nn - (F.col("sx") / nn) * (F.col("sx") / nn)
    )
    return merged.select(
        "o_custkey",
        F.round(slope, 4).alias("slope_r4"),
        F.col("n").alias("n_orders"),
    )


@register(
    "udtf_expand_priorities",
    oracle="""
    SELECT o.o_orderpriority, g.n AS copy_id, count(*) AS n_orders
    FROM (SELECT DISTINCT o_orderpriority FROM orders) p
    CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS n) g
    JOIN orders o ON o.o_orderpriority = p.o_orderpriority
    GROUP BY o.o_orderpriority, g.n
    """,
    doc="Python UDTF (table function) emitting multiple rows per input, "
    "lateral-joined back — the user-defined analogue of explode.",
)
def udtf_expand_priorities(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="copy_id int")
    class Duplicate:
        def eval(self, n: int):
            for i in range(1, n + 1):
                yield (i,)

    spark.udtf.register("duplicate_rows", Duplicate)
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o.o_orderpriority, d.copy_id, count(*) AS n_orders
        FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        LATERAL duplicate_rows(2) d
        JOIN orders o ON o.o_orderpriority = p.o_orderpriority
        GROUP BY o.o_orderpriority, d.copy_id
        """
    )


# ---------------------------------------------------------------------------
# non-parquet source roundtrips
# ---------------------------------------------------------------------------


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT n.n_name AS nation_name, r.r_name AS region_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="CSV source: write nation+region to CSV with headers, read back "
    "with schema inference, join — oracle is the parquet original.",
)
def source_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    d = tempfile.mkdtemp(prefix="zdss_csv_")
    table(spark, sf, "nation").write.mode("overwrite").option("header", True).csv(
        f"{d}/nation"
    )
    table(spark, sf, "region").write.mode("overwrite").option("header", True).csv(
        f"{d}/region"
    )
    n = spark.read.option("header", True).option("inferSchema", True).csv(f"{d}/nation")
    r = spark.read.option("header", True).option("inferSchema", True).csv(f"{d}/region")
    return n.join(r, n.n_regionkey == r.r_regionkey).select(
        F.col("n_name").alias("nation_name"), F.col("r_name").alias("region_name")
    )


@register(
    "source_json_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 6) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
    doc="JSON-lines source roundtrip: write customer to JSON, read back, "
    "aggregate — oracle is the parquet original.",
)
def source_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    d = tempfile.mkdtemp(prefix="zdss_json_")
    table(spark, sf, "customer").write.mode("overwrite").json(f"{d}/customer")
    c = spark.read.json(f"{d}/customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 6).alias("total_bal"),
    )


@register(
    "window_range_interval",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER w AS n_last_30d,
           round(sum(o_totalprice) OVER w, 6) AS spend_last_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
    """,
    doc="Time-based RANGE frame (trailing 30-day window per customer); "
    "RANGE includes peer rows at equal timestamps so ties are "
    "order-independent.",
)
def window_range_interval(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               count(*) OVER w AS n_last_30d,
               round(sum(o_totalprice) OVER w, 6) AS spend_last_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "rollup_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT)  AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT)  AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="GROUPING() marker functions distinguishing subtotal levels in a "
    "ROLLUP (NULL-valued keys vs genuine NULL groups).",
)
def rollup_grouping_id(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "try_cast_battery",
    oracle="""
    SELECT p_partkey,
           try_cast(p_brand AS INTEGER)                 AS brand_as_int,
           try_cast(substr(p_brand, 7) AS INTEGER)      AS brand_num,
           try_cast(p_retailprice AS VARCHAR)           AS price_str,
           try_cast('2023-13-45' AS DATE)               AS bad_date,
           try_cast(CAST(p_size AS VARCHAR) AS SMALLINT) AS size_rt
    FROM part
    """,
    doc="TRY_CAST battery: failed conversions yield NULL instead of "
    "erroring (ANSI-safe ingestion of dirty columns).",
)
def try_cast_battery(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT p_partkey,
               try_cast(p_brand AS INT)                  AS brand_as_int,
               try_cast(substr(p_brand, 7) AS INT)       AS brand_num,
               try_cast(p_retailprice AS STRING)         AS price_str,
               try_cast('2023-13-45' AS DATE)            AS bad_date,
               try_cast(CAST(p_size AS STRING) AS SHORT) AS size_rt
        FROM part
        """
    )


@register(
    "recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT 1
        UNION ALL
        SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT months.m AS month_num, count(o_orderkey) AS n_orders
    FROM months
    LEFT JOIN orders ON CAST(extract(month FROM o_orderdate) AS INTEGER) = months.m
    GROUP BY months.m
    """,
    doc="Recursive CTE (iterative union) generating a month spine, joined "
    "against facts — gap-free calendar aggregation.",
)
def recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
            SELECT 1
            UNION ALL
            SELECT m + 1 FROM months WHERE m < 12
        )
        SELECT months.m AS month_num, count(o_orderkey) AS n_orders
        FROM months
        LEFT JOIN orders ON month(o_orderdate) = months.m
        GROUP BY months.m
        """
    )


@register(
    "exists_in_select",
    oracle="""
    SELECT c_custkey,
           EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 200000) AS has_big_order,
           c_custkey IN (SELECT s_suppkey FROM supplier) AS id_is_suppkey
    FROM customer c
    """,
    doc="Boolean subqueries projected in the SELECT list (EXISTS / IN as "
    "expressions, not predicates).",
)
def exists_in_select(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey,
               EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 200000) AS has_big_order,
               c_custkey IN (SELECT s_suppkey FROM supplier) AS id_is_suppkey
        FROM customer c
        """
    )


@register(
    "intersect_all_bags",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT ALL (bag semantics, multiplicity = min of the sides).",
)
def intersect_all_bags(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "array_functions",
    oracle="""
    SELECT p_partkey,
           string_split(p_type, ' ')                          AS words,
           len(string_split(p_type, ' '))::INTEGER            AS n_words,
           (string_split(p_type, ' '))[1]                     AS first_word,
           list_sort(string_split(p_type, ' '))               AS sorted_words,
           array_to_string(list_sort(string_split(p_type, ' ')), '-')
             AS joined,
           list_contains(string_split(p_type, ' '), 'SMALL')  AS has_small,
           string_split(p_type, ' ')[1:2]                     AS first_two,
           list_reverse(string_split(p_type, ' '))            AS rev_words
    FROM part
    """,
    doc="Array function battery over split() arrays: size/element_at/sort/"
    "join/contains/slice/reverse (array-valued outputs hash via the "
    "canonicalized list rendering).",
)
def array_functions(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part")
    words = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        words.alias("words"),
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.sort_array(words).alias("sorted_words"),
        F.array_join(F.sort_array(words), "-").alias("joined"),
        F.array_contains(words, "SMALL").alias("has_small"),
        F.slice(words, 1, 2).alias("first_two"),
        F.reverse(words).alias("rev_words"),
    )


@register(
    "map_functions",
    oracle="""
    SELECT n_nationkey,
           cardinality(map(['name', 'region'],
                           [n_name, n_regionkey::VARCHAR]))::INTEGER AS map_size,
           map_extract(map(['name', 'region'],
                           [n_name, n_regionkey::VARCHAR]), 'name')[1] AS name_val,
           list_sort(map_keys(map(['name', 'region'],
                                  [n_name, n_regionkey::VARCHAR]))) AS keys_sorted
    FROM nation
    """,
    doc="Map construction + lookup + key introspection (map_from_arrays / "
    "element_at / map_keys).",
)
def map_functions(spark: SparkSession, sf: str) -> DataFrame:
    n = table(spark, sf, "nation")
    m = F.map_from_arrays(
        F.array(F.lit("name"), F.lit("region")),
        F.array(F.col("n_name"), F.col("n_regionkey").cast("string")),
    )
    return n.select(
        "n_nationkey",
        F.size(m).alias("map_size"),
        F.element_at(m, "name").alias("name_val"),
        F.sort_array(F.map_keys(m)).alias("keys_sorted"),
    )
