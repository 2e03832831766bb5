"""As-of (point-in-time) join — an operator Spark SQL lacks natively.

Implemented as a composition of built-in operators (option (a) of the
custom-operator ladder): union both sides with a tag, then a single
``last(..., ignorenulls)`` window ordered by time scans each key's merged
timeline once. One shuffle on (key), no row explosion — unlike the naive
``a JOIN b ON a.ts >= b.ts`` + dedup, whose intermediate is quadratic in
events per key. DuckDB validates via its native ``ASOF JOIN``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` and the same key.

    Right-side payload columns (and the right event time) arrive suffixed
    ``_right``, so they never collide with left columns of the same name.
    ``tolerance`` (an INTERVAL string, e.g. ``'1 hour'``) nulls out matches
    older than the window (left rows are kept, like ASOF LEFT JOIN).
    """
    l_tagged = left.withColumn("_side", F.lit("l"))
    r_tagged = right.withColumn("_side", F.lit("r"))
    payload = [ts] + right_cols
    merged = l_tagged.select(
        key,
        ts,
        "_side",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
        *[c for c in left.columns if c not in (key, ts)],
    ).unionByName(
        r_tagged.select(
            key,
            ts,
            "_side",
            *[F.col(c).alias(f"_r_{c}") for c in payload],
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in (key, ts)
            ],
        )
    )
    # right rows sort before left rows at equal timestamps so ts_right == ts
    # matches (ASOF >= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.when(F.col("_side") == "r", 0).otherwise(1))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        key,
        ts,
        "_side",
        *[c for c in left.columns if c not in (key, ts)],
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}_right")
            for c in payload
        ],
    )
    out = filled.filter(F.col("_side") == "l").drop("_side")
    if tolerance is not None:
        age_ok = F.col(f"{ts}_right") >= F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            key,
            ts,
            *[c for c in left.columns if c not in (key, ts)],
            *[F.when(age_ok, F.col(f"{c}_right")).alias(f"{c}_right") for c in payload],
        )
    return out
