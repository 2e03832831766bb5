"""Time-series resampling: regularize an event stream onto a fixed grid
with gap-filling — the batch primitive behind feature tables and training
curricula over temporal data.

Pure DataFrame composition: per-key bounds -> ``sequence()``-exploded date
spine -> left join of the actual buckets -> zero-fill + forward-fill via a
``last(ignorenulls)`` window. One shuffle on the key for the join, one for
the window (same key, so Catalyst reuses the exchange).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample_daily(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily buckets per key over each key's [first, last] active day.

    Returns one row per (key, day): event count and value total (zero on
    gap days) plus ``carried_value`` — the last non-gap day's total,
    forward-filled.
    """
    day = F.date_trunc("day", F.col(ts_col))
    daily = events.groupBy(F.col(key), day.alias("day")).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_v")
    )
    bounds = daily.groupBy(key).agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    spine = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = spine.join(daily, [key, "day"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        key,
        "day",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.round(F.coalesce(F.col("_v"), F.lit(0.0)), 6).alias("total_value"),
        F.round(F.last("_v", ignorenulls=True).over(w), 6).alias("carried_value"),
    )
