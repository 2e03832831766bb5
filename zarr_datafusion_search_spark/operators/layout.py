"""Data-layout management: hive-partitioned dataset writes with
partition-pruned reads, and schema-evolution (mergeSchema) reads.

At 100 TB the physical layout IS the optimization: a dataset partitioned
on its dominant filter column turns a full scan into a directory listing
plus the matching partitions, and a corpus accumulated over months will
carry multiple schema versions that a reader must reconcile without a
rewrite. Both are built-in Spark capabilities — these helpers pin the
conventions (memoized fixture builds for benching, explicit column
ordering after mergeSchema) and give the plan-shape tests a stable
surface to assert pruning on.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-layout partitioned parquet write (``col=value`` directories).
    Partition columns should be low-cardinality filter columns; every
    distinct combination becomes a directory, so a high-cardinality key
    here is an object-store metadata bomb — that judgment stays with the
    caller."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def _memo_dir(tag: str, sf: str) -> tuple[str, str]:
    import hashlib

    key = hashlib.md5(f"{tag}:{sf}".encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"zdss_layout_{key}")
    return d, os.path.join(d, "_READY")


def partitioned_events_dir(spark: SparkSession, sf: str) -> str:
    """Events written partitioned by event_type, memoized per sf (pure
    function of the immutable input, so the bench's warmup+median runs
    pay the write once and time the PRUNED READ — the capability under
    test)."""
    from zarr_datafusion_search_spark.plans.registry import table

    d, marker = _memo_dir("events_by_type", sf)
    if not os.path.exists(marker):
        write_partitioned(
            table(spark, sf, "events"), os.path.join(d, "data"), ["event_type"]
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    return os.path.join(d, "data")


def evolved_docs_dir(spark: SparkSession, sf: str) -> str:
    """Two-generation document dataset: generation 1 (even doc ids) has
    the original columns; generation 2 (odd ids) adds a ``quality_tier``
    column — the additive schema drift a long-lived corpus accumulates.
    Memoized per sf."""
    from zarr_datafusion_search_spark.plans.registry import table

    d, marker = _memo_dir("docs_evolved", sf)
    data = os.path.join(d, "data")
    if not os.path.exists(marker):
        docs = table(spark, sf, "documents")
        g1 = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "source", "n_chars"
        )
        g2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            "source",
            "n_chars",
            F.when(F.col("n_chars") >= 200, "long")
            .otherwise("short")
            .alias("quality_tier"),
        )
        g1.write.mode("overwrite").parquet(os.path.join(data, "gen=1"))
        g2.write.mode("overwrite").parquet(os.path.join(data, "gen=2"))
        with open(marker, "w") as fh:
            fh.write("ok")
    return data


def read_evolved_docs(spark: SparkSession, sf: str) -> DataFrame:
    """mergeSchema read across both generations: generation-1 rows carry
    NULL for the added column (the correct additive-evolution semantics);
    the explicit select pins column order regardless of footer merge
    order."""
    d = evolved_docs_dir(spark, sf)
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(d)
        .select("doc_id", "source", "n_chars", "quality_tier")
    )
