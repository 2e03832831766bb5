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


def zorder_key(col_a, col_b, bits: int = 4):
    """Morton/Z-order interleaved key over two already-bucketed dimensions
    (each in ``[0, 2**bits)``): bit i of each input lands at output bits
    ``2i`` / ``2i+1``. Pure JVM bit arithmetic (no UDF) — the multi-column
    clustering key a lakehouse layout job sorts on so a range scan on
    EITHER dimension touches a bounded band of files instead of all of
    them. At 100 TB this is a write-once layout decision that every later
    query amortizes."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftright(col_a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(col_b, i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_sql(a: str, b: str, bits: int = 4) -> str:
    """The identical interleave as a SQL expression string (oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({b}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_locality_audit(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 4,
    order_col: str = "event_id",
) -> DataFrame:
    """Assign rows to ``n_files`` equal-row files in z-key order and report
    each file's min/max extent in BOTH dimensions. Tight extents on both
    axes are the whole point of z-ordering: a predicate on either
    dimension prunes to the few files whose [min,max] band overlaps it,
    which single-column sorting only delivers for its one sort key.

    Scale note: the exact equal-row assignment needs a global rank, and
    the naive ``ntile() OVER (ORDER BY ...)`` window executes on ONE task
    — a non-starter at scale. This uses the two-phase distributed
    prefix-rank instead (:func:`~zarr_datafusion_search_spark.operators.
    packing.distributed_rank`: range-repartition on the z key, local rank
    per sorted partition, broadcast per-partition offsets), then
    ``file_id = (rank-1) * n_files div total + 1`` — integer arithmetic
    that an external oracle replays exactly over ``row_number()``. The
    production layout WRITE uses ``df.repartitionByRange(n_files,
    F.col("z"))``: sampled range boundaries, fully parallel sort,
    approximately-equal files — same z-band locality, no exact-rank pass
    at all.

    NOT a lazy plan builder: ``distributed_rank`` runs an eager
    ``localCheckpoint`` plus the per-partition-offsets collect at CALL
    time (same eager-at-build contract as ``text.bpe_train``), and the
    checkpoint blocks stay pinned until the returned frame is garbage
    collected."""
    from zarr_datafusion_search_spark.operators.packing import (
        distributed_rank,
    )

    keyed = df.select(
        F.col(col_a).alias("da"),
        F.col(col_b).alias("db"),
        zorder_key(F.col(col_a), F.col(col_b), bits).alias("z"),
        F.col(order_col).alias("_ord"),
    )
    ranked, total = distributed_rank(keyed, ["z", "_ord"])
    return (
        ranked.withColumn(
            "file_id",
            F.expr(f"(_grank - 1) * {n_files} div {max(total, 1)} + 1"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("da").alias("a_min"),
            F.max("da").alias("a_max"),
            F.min("db").alias("b_min"),
            F.max("db").alias("b_max"),
        )
        .select(
            "file_id",
            "n_rows",
            "a_min",
            "a_max",
            "b_min",
            "b_max",
            (F.col("a_max") - F.col("a_min") + 1).alias("a_span"),
            (F.col("b_max") - F.col("b_min") + 1).alias("b_span"),
        )
    )


def plan_compaction_greedy(
    files: DataFrame,
    group_col: str = "source",
    order_col: str = "file_no",
    bytes_col: str = "bytes",
    target_bytes: int = 20_000,
) -> DataFrame:
    """Small-file compaction plan: within each partition, stride the
    cumulative byte stream — group = ``floor(exclusive_cumsum / target)``
    over a window — so every compaction group lands within one
    ``target_bytes`` stride (group totals ~= target, off by at most one
    file). One shuffle on the partition key no matter how many files
    exist; the sequential reset-on-overflow greedy would need a per-key
    fold for marginally tighter packing. The single most common
    maintenance job on a 100 TB parquet lake (small ingest files ->
    read-amplification) reduced to a window function; no driver-side loop
    over the file inventory."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "grp",
        F.floor(
            F.coalesce(F.sum(bytes_col).over(w), F.lit(0)) / F.lit(target_bytes)
        ),
    )
    return (
        planned.groupBy(group_col, "grp")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(bytes_col).alias("total_bytes"),
        )
        .select(
            F.col(group_col),
            F.col("grp").alias("compaction_group"),
            "n_files",
            "total_bytes",
            # integer-myria rounding: byte sums over a round target land
            # exactly on 4dp .5 boundaries (11441/20000 = 0.57205) where
            # Spark's HALF_UP on the decimal repr and an oracle engine's
            # binary-double rounding diverge; x*1e4 is exactly
            # representable at the boundary so both engines agree
            (
                F.round(
                    F.col("total_bytes") * 10000.0 / F.lit(target_bytes), 0
                )
                / 10000.0
            ).alias("fill_ratio"),
        )
    )


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


def zone_map_skipping_audit(
    df: DataFrame,
    natural_order_col: str,
    value_col: str,
    n_files: int = 64,
    threshold: float = 250.0,
) -> DataFrame:
    """Zone-map (per-file min/max) file-skipping audit for the predicate
    ``value > threshold``, comparing two physical layouts of the SAME
    rows: 'natural' (ingest order) vs 'clustered' (sorted by the filter
    column). Per layout: files whose max can't satisfy the predicate
    (skippable without opening), rows a scan must still read, and the
    exact matching rows. On randomly-arriving data every natural file
    spans the full value range — zero skipping — while the clustered
    layout skips all but the boundary file; THIS delta is the entire
    argument for sort-on-write at 100 TB, measured instead of asserted.
    File assignment is the two-phase distributed prefix-rank (one pass
    per layout; see ``zorder_locality_audit``) — never a single-task
    global window — bucketed as ``(rank-1) * n_files div total + 1``,
    which the oracle replays exactly over ``row_number()``. Production
    assignment is ``repartitionByRange``; the audit's exact equal-row
    bucketing is the oracle-replayable equivalent.

    NOT a lazy plan builder: ``distributed_rank`` runs TWICE here (one
    pass per layout), each an eager ``localCheckpoint`` + offsets collect
    at CALL time (the ``bpe_train`` eager-at-build contract); checkpoint
    blocks are pinned until the returned frame is garbage collected."""
    from zarr_datafusion_search_spark.operators.packing import (
        distributed_rank,
    )

    base = df.select(
        F.col(value_col).alias("_v"),
        F.col(natural_order_col).alias("_o"),
    )
    nat, total = distributed_rank(base, ["_o"], out_col="_r")
    clu, _ = distributed_rank(base, ["_v", "_o"], out_col="_r")
    assign = F.expr(f"(_r - 1) * {n_files} div {max(total, 1)} + 1")

    def per_layout(name: str, ranked: DataFrame):
        zones = (
            ranked.withColumn("_f", assign)
            .groupBy("_f")
            .agg(
                F.max("_v").alias("_mx"),
                F.count(F.lit(1)).alias("_n"),
                F.sum((F.col("_v") > threshold).cast("long")).alias("_nm"),
            )
        )
        return zones.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum((F.col("_mx") <= threshold).cast("long")).alias(
                "n_skipped"
            ),
            F.sum(
                F.when(F.col("_mx") > threshold, F.col("_n")).otherwise(0)
            ).alias("rows_scanned"),
            F.sum("_nm").alias("rows_matching"),
        )

    return per_layout("natural", nat).unionAll(
        per_layout("clustered", clu)
    )
