"""Gap-based sessionization over event streams (batch form).

A session is a maximal run of a user's events where consecutive gaps are
below a threshold. Classic two-window composition: lag() marks session
starts, a running sum over the boolean assigns session ids — one shuffle on
user_id, each partition scanned twice, no join. The streaming twin uses
``session_window`` (see streaming/events.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign ``session_id`` (per-user ordinal) to each event."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
            > gap_s
        )
    ).cast("long")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_id", F.sum(is_new).over(w_run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregates: bounds, event count, total value."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
