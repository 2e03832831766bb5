"""Bucketed interval (range) join — scale-safe non-equi time joins.

Spark's optimizer plans ``p.ts BETWEEN i.start AND i.end`` with no equi
key as BroadcastNestedLoopJoin (all-pairs per partition) — quadratic and a
100 TB non-starter. The standard fix (Databricks' RANGE_JOIN hint, Flink's
interval join) is to quantize time into coarse buckets so the theta join
becomes an equi-join on the bucket id plus an exact refine filter:

- each point belongs to exactly one bucket (integer epoch-second floor —
  exact arithmetic, no float boundary drift);
- each interval is exploded to the buckets it covers (``sequence`` —
  bounded by interval_length / bucket_width + 1 rows);
- equi-join on (optional key +) bucket id, then the exact BETWEEN filter.

Shuffle is keyed on the bucket id, so candidate pairs are bounded by
points x intervals *sharing a bucket*, not |points| x |intervals|. Bucket
width tunes the trade: ~ the median interval length keeps the interval
explode factor ~2 while holding per-bucket candidate counts low. Floor is
monotone, so a point inside [start, end] always lands in a bucket the
interval covers — no candidate is missed by quantization.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def _epoch_seconds(df: DataFrame, col: str) -> F.Column:
    """Integer epoch seconds for numeric, DATE, TIMESTAMP, or TIMESTAMP_NTZ
    columns. TIMESTAMP_NTZ cannot cast to BIGINT directly (Spark 4), so it
    goes through TIMESTAMP_LTZ first — exact under the engine's pinned UTC
    session timezone (engine.py: spark.sql.session.timeZone=UTC)."""
    c = F.col(col)
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampNTZType, T.DateType)):
        c = c.cast("timestamp")
    return c.cast("long")


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 1800,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point_ts <= end`` (and equal ``keys``, if given), without a
    nested-loop join. Returns points columns + intervals columns."""
    keys = keys or []
    w = int(bucket_seconds)
    p = points.withColumn(
        "_b", F.floor(_epoch_seconds(points, point_ts) / w).cast("long")
    )
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(intervals, start_col) / w).cast("long"),
                F.floor(_epoch_seconds(intervals, end_col) / w).cast("long"),
            )
        ),
    )
    joined = p.join(i, on=keys + ["_b"], how="inner").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_b")
