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
import pyspark.sql.types as T
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

    The whole right payload travels as ONE struct through a single
    ``last(ignorenulls)``: a right row always contributes a non-null struct
    (even when its payload *fields* are null), so the matched row is taken
    atomically — per-column backfill would mix values from different right
    rows whenever the matched row carries a NULL payload value (DuckDB ASOF
    returns the matched row's NULL, and so do we).
    """
    l_tagged = left.withColumn("_side", F.lit("l"))
    r_tagged = right.withColumn("_side", F.lit("r"))
    payload = [ts] + right_cols
    struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    merged = l_tagged.select(
        key,
        ts,
        "_side",
        F.lit(None).cast(struct_t).alias("_r"),
        *[c for c in left.columns if c not in (key, ts)],
    ).unionByName(
        r_tagged.select(
            key,
            ts,
            "_side",
            F.struct(*[F.col(c).alias(c) for c in payload]).alias("_r"),
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
        F.last("_r", ignorenulls=True).over(w).alias("_rm"),
    )
    out = filled.filter(F.col("_side") == "l").drop("_side")
    if tolerance is not None:
        age_ok = F.col("_rm")[ts] >= F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn("_rm", F.when(age_ok, F.col("_rm")))
    return out.select(
        key,
        ts,
        *[c for c in left.columns if c not in (key, ts)],
        *[F.col("_rm")[c].alias(f"{c}_right") for c in payload],
    )
