"""Bucketed (pre-partitioned) tables -> shuffle-free co-located joins.

The single biggest lever for repeated big-table joins at 100 TB: pay the
shuffle ONCE at write time (``bucketBy(n, key)`` + ``sortBy(key)``), then
every subsequent equi-join or aggregation on the bucket key plans with NO
Exchange on either side — Spark's native answer to the "co-located join"
of distributed warehouses. At cluster scale, fact tables bucketed on their
join key turn the nightly join pipeline from shuffle-bound into scan-bound.

Demonstrated here on lineitem x orders over l_orderkey/o_orderkey: the
test asserts the SortMergeJoin executes with zero shuffle exchanges under
the join (only the final aggregation exchanges, on the tiny grouped side).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zarr_datafusion_search_spark.plans.registry import table


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])


def _clear_orphaned_location(spark: SparkSession, name: str) -> None:
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme not in ("", "file"):
        return  # remote warehouse: leave lifecycle to the catalog service
    loc = os.path.join(wh.path or wh.geturl(), name)
    if os.path.exists(loc):
        shutil.rmtree(loc)


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 16,
) -> tuple[str, str]:
    """Materialize lineitem/orders as bucketed+sorted catalog tables (once
    per session per sf) and return their names. The write is the one-time
    shuffle; reads after it are bucket-aligned."""
    li_name = f"zdss_bucketed_lineitem_{_tag(sf_dir)}"
    o_name = f"zdss_bucketed_orders_{_tag(sf_dir)}"
    for name, tbl, key in (
        (li_name, "lineitem", "l_orderkey"),
        (o_name, "orders", "o_orderkey"),
    ):
        if not spark.catalog.tableExists(name):
            # a fresh session doesn't know tables a previous session left in
            # the warehouse dir; clear the orphaned location or saveAsTable
            # fails with LOCATION_ALREADY_EXISTS
            _clear_orphaned_location(spark, name)
            (
                table(spark, sf_dir, tbl)
                .write.bucketBy(n_buckets, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
    return li_name, o_name


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority off the bucketed pair. ``MERGE`` hint
    pins sort-merge so the plan demonstrates the shuffle-free join even
    when one side would broadcast at test scale."""
    li_name, o_name = ensure_bucketed(spark, sf_dir)
    li = spark.table(li_name).hint("MERGE")
    o = spark.table(o_name)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
