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
