"""Planner-style cardinality estimation: join output size predicted from
a correlated key sample, audited against the exact size.

Sampling KEYS (``key % mod == 0``) rather than rows keeps the two sides
correlated — the sampled join is the true join restricted to the sampled
key universe, so scaling by ``mod`` estimates the full size with one
pass over 1/mod of each side. Row-wise Bernoulli sampling would need a
1/p^2 correction and much higher variance on skewed keys. This is the
estimate a query planner (or a shuffle-sizing heuristic) wants BEFORE
committing to a 100 TB join; the audit query also runs the exact join so
the relative error is measured, not guessed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    mod: int = 4,
) -> DataFrame:
    """One-row audit: estimated join cardinality from the key-sampled
    join (scaled by ``mod``) next to the exact cardinality and the
    relative error. Both joins are plain equi-joins Catalyst plans
    normally; the sampled one reads ``1/mod`` of each side after
    pushdown of the key predicate."""
    ls = left.filter(F.col(left_key) % mod == 0)
    rs = right.filter(F.col(right_key) % mod == 0)
    sampled = ls.join(
        rs, ls[left_key] == rs[right_key]
    ).agg(F.count(F.lit(1)).alias("_sn"))
    exact = left.join(
        right, left[left_key] == right[right_key]
    ).agg(F.count(F.lit(1)).alias("exact_size"))
    return (
        sampled.crossJoin(exact)
        .select(
            (F.col("_sn") * mod).alias("estimated_size"),
            "exact_size",
            F.round(
                F.abs(F.col("_sn") * mod - F.col("exact_size"))
                / F.greatest(F.col("exact_size"), F.lit(1)),
                6,
            ).alias("rel_error"),
        )
    )


#: bytes assumed per fixed-width column in the row-size model; strings
#: contribute their measured average length instead.
FIXED_COL_BYTES = 8
TARGET_PARTITION_BYTES = 128 * 1024 * 1024


def shuffle_partition_advisor(df: DataFrame) -> DataFrame:
    """Capacity planning from one aggregation pass: estimate the
    table's in-flight byte size from its schema (fixed-width columns at
    8 bytes, strings at their measured average length) and recommend a
    shuffle partition count targeting 128 MB per partition — the sizing
    rule the brief's `spark.sql.shuffle.partitions` guidance encodes.
    The row-size model is deliberately simple and stated in the output
    (est_row_bytes), because the point is the *shape*: one cheap pass
    over the data answers 'how many partitions should downstream
    shuffles use', which at 100 TB is the difference between 200
    spilling tasks and 800 healthy ones."""
    from pyspark.sql.types import StringType

    strings = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    n_fixed = len(df.schema.fields) - len(strings)
    row_bytes = F.lit(float(FIXED_COL_BYTES * n_fixed))
    for s in strings:
        row_bytes = row_bytes + F.avg(F.length(F.col(s)))
    est_total = F.count(F.lit(1)) * row_bytes
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(row_bytes, 2).alias("est_row_bytes"),
        F.round(est_total / F.lit(1048576.0), 2).alias("est_total_mb"),
        F.greatest(
            F.lit(1),
            F.ceil(est_total / F.lit(float(TARGET_PARTITION_BYTES))),
        ).alias("recommended_partitions"),
    )
