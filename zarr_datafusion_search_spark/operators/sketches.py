"""Probabilistic filter/counter sketches built from plain aggregates:
a 63-bit Bloom pre-filter for join reduction and a count-min sketch with
an exact-error audit.

Both are the map-side-combinable shapes that survive 100 TB: the Bloom
bitmap is a single ``bit_or`` aggregate (each executor folds its rows
into one long, merge = OR), mirroring Spark's own runtime bloom-filter
join pruning (`spark.sql.optimizer.runtime.bloomFilter.enabled`) in a
form an external oracle can replay bit-for-bit; the CMS counter table is
an ordinary group-by whose estimate/exact comparison quantifies the
overcount a fixed memory budget buys. Hash functions are small affine
maps (not engine ``hash()``) so Spark and DuckDB compute identical
bits — weaker mixing than xxhash, irrelevant for the mechanics under
test and required for cross-engine determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: affine hash parameters shared by the Spark plan and the SQL oracle.
#: shift domain [0, 63) keeps ``1 << h`` positive in a signed 64-bit long
#: on both engines.
BLOOM_BITS = 63
BLOOM_H1 = (37, 11)
BLOOM_H2 = (101, 29)


def bloom_hash_sql(key: str) -> tuple[str, str]:
    """The identical two hashes as SQL expression strings (oracle side)."""
    a1, b1 = BLOOM_H1
    a2, b2 = BLOOM_H2
    return (
        f"(({key}) * {a1} + {b1}) % {BLOOM_BITS}",
        f"(({key}) * {a2} + {b2}) % {BLOOM_BITS}",
    )


def bloom64_build(df: DataFrame, key_col: str) -> DataFrame:
    """Fold a key column into ONE 63-bit Bloom bitmap: per row set bits
    ``h1(k)`` and ``h2(k)``, aggregate with ``bit_or``. Map-side
    combinable — each task reduces its partition to a single long before
    the 1-row exchange, so building the filter over a 100 TB fact side
    moves 8 bytes per task."""
    h1, h2 = bloom_hash_sql(f"cast({key_col} as bigint)")
    return df.selectExpr(
        f"cast({h1} as int) as _h1", f"cast({h2} as int) as _h2"
    ).agg(
        F.expr("bit_or(shiftleft(1L, _h1) | shiftleft(1L, _h2)) as bloom")
    )


def bloom64_prefilter_audit(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
) -> DataFrame:
    """Build a Bloom from ``build[build_key]``, probe every
    ``probe[probe_key]`` against it, and report the 1-row audit: probe
    count, bloom passes, true members (exact semi-join ground truth),
    false positives, and the false-positive rate among true negatives.
    The bitmap travels as a broadcast 1-row cross join — the pre-shuffle
    reduction pattern that keeps a 100 TB probe side from shuffling rows
    a membership test would have dropped."""
    bloom = bloom64_build(build, build_key)
    h1, h2 = bloom_hash_sql("cast(_k as bigint)")
    probed = (
        probe.select(F.col(probe_key).alias("_k"))
        .crossJoin(F.broadcast(bloom))
        .selectExpr(
            "_k",
            f"(shiftright(bloom, cast({h1} as int)) & 1) = 1 "
            f"and (shiftright(bloom, cast({h2} as int)) & 1) = 1 "
            "as bloom_pass",
        )
    )
    truth = build.select(F.col(build_key).alias("_k")).distinct().withColumn(
        "is_member", F.lit(True)
    )
    joined = probed.join(truth, "_k", "left").select(
        "bloom_pass", F.coalesce("is_member", F.lit(False)).alias("is_member")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_pass"),
        F.sum(F.col("is_member").cast("long")).alias("n_members"),
        F.sum(
            (F.col("bloom_pass") & ~F.col("is_member")).cast("long")
        ).alias("n_false_pos"),
        F.round(
            F.sum((F.col("bloom_pass") & ~F.col("is_member")).cast("long"))
            / F.greatest(
                F.sum((~F.col("is_member")).cast("long")), F.lit(1)
            ),
            6,
        ).alias("fp_rate"),
    )


#: CMS geometry + per-depth affine hash parameters (same determinism
#: rationale as the Bloom constants).
CMS_WIDTH = 32
CMS_HASHES = ((13, 7), (31, 3), (61, 17), (97, 5))


def cms_hash_sql(key: str, d: int) -> str:
    a, b = CMS_HASHES[d]
    return f"(({key}) * {a} + {b}) % {CMS_WIDTH}"


def countmin_error_audit(df: DataFrame, key_col: str) -> DataFrame:
    """Count-min sketch over an integer key: a depth x width counter
    table built as ONE group-by over the unioned per-depth bucket ids
    (map-side combinable, fixed ``depth*width`` memory regardless of
    cardinality), then an exact-count join reporting each key's estimate
    and overcount. The estimate >= exact invariant and the error the
    audit surfaces are the whole trade a fixed-memory counter makes at
    100 TB, where exact per-key counts need a full shuffle."""
    k = F.col(key_col).cast("long")
    depth_cols = [
        ((k * F.lit(a) + F.lit(b)) % F.lit(CMS_WIDTH)).alias(f"b{d}")
        for d, (a, b) in enumerate(CMS_HASHES)
    ]
    hashed = df.select(k.alias("_k"), *depth_cols)
    # counters: union the depth columns into (depth, bucket) rows first so
    # the counter build is one aggregation over depth*width cells
    per_depth = [
        hashed.select(
            F.lit(d).alias("depth"), F.col(f"b{d}").alias("bucket")
        )
        for d in range(len(CMS_HASHES))
    ]
    cells = per_depth[0]
    for p in per_depth[1:]:
        cells = cells.unionAll(p)
    counters = cells.groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # estimate per distinct key: min over depths of its bucket counter
    keys = hashed.groupBy("_k").agg(
        F.count(F.lit(1)).alias("exact"),
        *[F.first(f"b{d}").alias(f"b{d}") for d in range(len(CMS_HASHES))],
    )
    est = keys
    for d in range(len(CMS_HASHES)):
        cd = counters.filter(F.col("depth") == d).select(
            F.col("bucket").alias(f"b{d}"), F.col("cnt").alias(f"c{d}")
        )
        est = est.join(F.broadcast(cd), f"b{d}")
    return est.select(
        F.col("_k").alias("key"),
        "exact",
        F.least(
            *[F.col(f"c{d}") for d in range(len(CMS_HASHES))]
        ).alias("estimate"),
    ).withColumn("overcount", F.col("estimate") - F.col("exact"))


def feature_hash_audit(
    df: DataFrame, col: str, n_buckets: int = 16
) -> DataFrame:
    """Hashing-trick collision audit: every distinct value of ``col``
    lands in ``h64(value) % n_buckets``; per bucket report the distinct
    features sharing it (collisions = features - 1) and the row mass it
    carries. The portable 60-bit hash (functions/hashing.py) is what
    lets the oracle replay the exact bucketing. One group-by on the
    bucket id — the audit a feature-hashed model needs before trusting
    a bucket count as a feature signal."""
    from zarr_datafusion_search_spark.functions.hashing import h64

    bucketed = df.select(
        F.col(col).alias("_f"),
        (h64(F.col(col)) % n_buckets).alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.countDistinct("_f").alias("n_features"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "bucket",
            "n_features",
            "n_rows",
            (F.col("n_features") - 1).alias("collisions"),
        )
    )
