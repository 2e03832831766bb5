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


def scd2_history(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse an event log into
    validity intervals per key.

    Consecutive rows with an unchanged attribute are merged; each surviving
    change-point opens an interval ``[valid_from, valid_to)`` closed by the
    next change (open-ended for the current state). ``id_col`` breaks ties
    between same-timestamp events so the history is deterministic.

    Two windows over the same (key, ts) ordering — Catalyst reuses one
    exchange, so this is a single shuffle on the key. At 100 TB the log is
    huge but per-key history is small; skewed keys (one bot user) are the
    only hazard, the same salting escape as sessionization.
    """
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    changes = (
        events.select(key, ts_col, id_col, attr_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, id_col)
    return changes.select(
        F.col(key),
        F.col(attr_col).alias("state"),
        F.col(ts_col).cast("timestamp_ntz").alias("valid_from"),
        F.lead(ts_col).over(w2).cast("timestamp_ntz").alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    ts_col: str,
    state_col: str = "state",
) -> DataFrame:
    """Point-in-time dimension enrichment: attach to each fact the SCD2
    state whose validity interval covers the fact's timestamp.

    ``history`` is :func:`scd2_history` output (``valid_from``/``valid_to``
    intervals per key). Because per-key intervals are contiguous and
    non-overlapping, interval containment reduces to an as-of match on the
    interval's opening edge — so this reuses the union+window as-of join
    (one shuffle on the key, linear scan) instead of a fact x history
    interval join whose intermediate blows up with history depth. A fact
    at exactly ``valid_from`` takes the NEW state ([valid_from, valid_to)
    half-open semantics, the as-of join's right-sorts-first tie rule);
    facts before the first interval get NULL.

    At 100 TB this is THE dimension-join shape for replayed training
    snapshots: the fact log never joins against more than one state row
    per fact, and the window scan is a single pass per key timeline.
    """
    from zarr_datafusion_search_spark.operators.asof import asof_join

    dim = history.select(
        key, F.col("valid_from").alias(ts_col), F.col(state_col)
    )
    return asof_join(facts, dim, key=key, ts=ts_col, right_cols=[state_col])


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a compacted CDC changeset to a snapshot (MERGE semantics).

    ``changes`` holds at most one row per key with ``op`` in
    ('I','U','D') and the new attribute values under the base's column
    names; the result is the next snapshot: deletes drop the base row,
    upserts take the change row's values, untouched keys pass through.
    Compact a raw multi-row log to latest-per-key first (the
    ``latest_record_per_key`` operator).

    One full-outer shuffle join on the key — the minimal work MERGE can
    do. Changesets are usually tiny next to the snapshot; Catalyst's AQE
    converts the join to broadcast when the compacted side fits, so at
    100 TB the snapshot never re-shuffles for a small delta.
    """
    attrs = [c for c in base.columns if c != key]
    ch = changes.select(
        F.col(key).alias("_k"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in attrs],
    )
    joined = base.join(ch, base[key] == ch["_k"], "full_outer")
    return (
        joined.filter(~(F.coalesce(F.col("_op"), F.lit("")) == F.lit("D")))
        .select(
            F.coalesce(base[key], F.col("_k")).alias(key),
            *[
                F.when(F.col("_op").isin("I", "U"), F.col(f"_c_{c}"))
                .otherwise(base[c])
                .alias(c)
                for c in attrs
            ],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed relation:
    ``change_type`` in {added, deleted, changed, unchanged} per key — the
    audit step between pipeline runs (what did this rebuild actually
    touch?), and the complement of :func:`merge_apply` (which APPLIES a
    changeset; this RECOVERS one from two states).

    One full-outer equi-join on the key columns (single shuffle per side,
    co-partitioned); value comparison is null-safe (``<=>``), so NULL ->
    value and value -> NULL count as changed. Old and new values ride
    along for changed rows.
    """
    o = old.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk{i}") for i, k in enumerate(keys)],
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = None
    for i in range(len(keys)):
        c = F.col(f"_k{i}") == F.col(f"_nk{i}")
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    same = None
    for c in value_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"_k{i}"), F.col(f"_nk{i}")).alias(k)
        for i, k in enumerate(keys)
    ]
    return joined.select(
        *key_out,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in value_cols],
        *[F.col(f"new_{c}") for c in value_cols],
    )


def merge_aggregates(
    base_summary: DataFrame,
    delta: DataFrame,
    key: str,
    value_col: str = "value",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a batch of new
    rows into an existing per-key summary WITHOUT rescanning the base data.

    ``base_summary`` carries re-aggregatable state (``n``, ``total``) per
    key; the delta batch is aggregated to the same shape (map-side
    combined), unioned, and merged with one summary-sized shuffle — the
    incremental-view-maintenance primitive behind continuous rollups.
    Derived measures (``avg_value``) are computed from the merged state,
    never averaged across partials. At 100 TB the point is the asymmetry:
    the shuffle moves O(|keys|) summary rows + O(|delta keys|) partials,
    not the base fact data; count/sum/min/max generalize the same way
    (any commutative monoid), percentiles/NDV need sketches instead.
    """
    d = delta.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("total")
    )
    merged = base_summary.select(key, "n", "total").unionByName(d)
    return (
        merged.groupBy(key)
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        .select(
            key,
            F.col("n").cast("long").alias("n"),
            F.round("total", 6).alias("total"),
            F.round(F.col("total") / F.col("n"), 6).alias("avg_value"),
        )
    )


def time_decayed_sum(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    half_life_days: float = 7.0,
) -> DataFrame:
    """Exponentially time-decayed running sum per key: at each event,
    ``sum_i v_i * 2^(-(t_n - t_i) / half_life)`` over all of the key's
    events so far — the recency-weighted engagement/feature score that
    replaces "count in the last N days" with a smooth decay.

    The naive formulation is a per-key self-join over all earlier events
    (O(n^2) per key). But the decayed sum factorizes:
    ``S(t_n) = e^(-a(t_n - t0)) * cumsum(v_i * e^(a(t_i - t0)))`` with
    ``a = ln2 / half_life`` — a plain cumulative window after a narrow
    rescaling map, one shuffle on the key, linear work. ``t0`` is the
    key's first event (a same-key window min; Catalyst reuses the one
    exchange for both windows).

    Numerics: the rescaled terms span ``2^(key_span / half_life)``, so
    the key's active time span must stay under ~1000 half-lives or the
    intermediate overflows double range (span 60 d at half-life 7 d is
    2^8.6 — nowhere close). For pathological spans, segment per epoch
    (e.g. re-base t0 per quarter and carry the decayed total across
    segments with one multiply) — same plan shape, applied per segment.
    Timestamp math is exact integer microseconds; both engines' libm
    exp() agree to the last ulp relative error, absorbed by the 6dp
    rounding.
    """
    a_per_us = F.lit(0.6931471805599453 / (half_life_days * 86400.0 * 1e6))
    # unix_micros needs TIMESTAMP; NTZ casts through the session zone,
    # which the engine pins to UTC, so naive wall-clock == epoch micros
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_key = Window.partitionBy(key)
    w_cum = (
        Window.partitionBy(key)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t0 = F.min(t_us).over(w_key)
    based = events.select(
        id_col,
        key,
        ts_col,
        value_col,
        ((t_us - t0).cast("double") * a_per_us).alias("_x"),
    )
    decayed = F.sum(F.col(value_col) * F.exp(F.col("_x"))).over(w_cum) * F.exp(
        -F.col("_x")
    )
    return based.select(
        id_col, key, ts_col, F.round(decayed, 6).alias("decayed_sum")
    )


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention table: users grouped by their first-activity
    period (the cohort), tracked by how many return in each later period
    — the standard activation/retention report, and the shape engagement
    dashboards page through.

    Two aggregations: first-activity per key (one key shuffle, min), then
    distinct (cohort, offset, key) activity rolled up to counts. The
    cohort dimension relation is key-sized but slim (2 columns); it joins
    back to the activity stream on the key — at 100 TB that's the one
    join, and AQE broadcasts the cohort side when the key space fits.
    ``retention`` is the cohort-relative fraction, rounded to 6dp.
    """
    p = F.date_trunc(period, F.col(ts_col))
    if period == "week":
        offset = F.floor(F.datediff(F.col("_p"), F.col("cohort")) / 7)
    elif period == "day":
        offset = F.datediff(F.col("_p"), F.col("cohort"))
    elif period == "month":
        offset = F.months_between(F.col("_p"), F.col("cohort"))
    else:
        raise ValueError(f"unsupported period {period!r} (day/week/month)")
    first = events.groupBy(key).agg(F.min(p).alias("cohort"))
    activity = (
        events.select(key, p.alias("_p"))
        .join(first, key)
        .select(key, "cohort", offset.cast("int").alias("period_offset"))
        .distinct()
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    ret = activity.groupBy("cohort", "period_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return ret.join(sizes, "cohort").select(
        F.col("cohort").cast("date").alias("cohort"),
        "period_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_rows: int = 20,
    min_history: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each event's value is
    scored against the mean/stddev of its own TRAILING window (the
    ``window_rows`` events strictly before it), and events with
    ``|z| > threshold`` are flagged — the streaming-shaped outlier pass a
    metrics pipeline runs before aggregation, in batch form.

    One shuffle on the key; mean and sample stddev come from a single
    ROWS-frame window pass (two aggregates over one frame, computed
    together by Spark's window exec). The frame EXCLUDES the current row
    (``window_rows PRECEDING .. 1 PRECEDING``) so an outlier never masks
    itself. Keys need ``min_history`` prior events and a nonzero spread;
    z is rounded to 6dp BEFORE thresholding so the flag set is identical
    cross-engine at the boundary.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-window_rows, -1)
    )
    scored = events.select(
        id_col,
        key_col,
        ts_col,
        value_col,
        F.count(value_col).over(w).alias("n_hist"),
        F.avg(value_col).over(w).alias("mu"),
        F.stddev_samp(value_col).over(w).alias("sigma"),
    )
    return (
        scored.filter(
            (F.col("n_hist") >= min_history) & (F.col("sigma") > 0)
        )
        .select(
            id_col,
            key_col,
            ts_col,
            value_col,
            F.round(
                (F.col(value_col) - F.col("mu")) / F.col("sigma"), 6
            ).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > threshold)
    )


def rollup_reuse(
    df,
    ts_col: str,
    group_col: str,
    value_col: str,
    fine: str = "hour",
    coarse: str = "day",
):
    """Continuous-aggregate reuse: materialize the ``fine``-grain rollup
    once, then answer the ``coarse`` grain FROM the fine partials
    (count-sum merge) instead of rescanning facts — the hypertable
    pattern that turns every dashboard grain into an O(partials)
    aggregation at 100 TB. Additivity of (count, sum) is what makes the
    reuse exact; avg is derived at the end, never merged. Values are
    accumulated as DECIMAL(18,6): decimal addition is associative, so
    the hourly-then-daily merge is bit-identical to a direct daily
    scan — double sums would drift with grouping order and make the
    reuse only approximately equal to the rescan it replaces."""
    dec = F.col(value_col).cast("decimal(18,6)")
    fine_agg = df.groupBy(
        F.date_trunc(fine, F.col(ts_col)).alias("_fine_ts"),
        F.col(group_col),
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec).alias("_sum"),
    )
    return (
        fine_agg.groupBy(
            F.date_trunc(coarse, F.col("_fine_ts")).alias("bucket_ts"),
            F.col(group_col),
        )
        .agg(
            F.sum("_n").alias("n_events"),
            F.round(F.sum("_sum").cast("double"), 6).alias("total_value"),
            F.round(
                F.sum("_sum").cast("double") / F.sum("_n"), 6
            ).alias("avg_value"),
        )
    )


def cusum_changepoint(
    df,
    group_col: str,
    ts_col: str,
    value_col: str,
    grain: str = "day",
):
    """CUSUM change-point detection per group: bucket to ``grain``
    means, accumulate deviations from the group's mean-of-means, and
    flag the bucket where |cusum| peaks — the classic location estimate
    for a single level shift. Everything is one bucket aggregation plus
    a bucket-count-sized window (the raw series never reshuffles).
    Cusums are rounded to 6dp BEFORE the argmax so the ranking compares
    engine-identical values; ties break on the earlier bucket."""
    from pyspark.sql import Window

    buckets = df.groupBy(
        F.col(group_col),
        F.date_trunc(grain, F.col(ts_col)).alias("_b"),
    ).agg(F.avg(value_col).alias("_m"))
    mu = buckets.groupBy(group_col).agg(F.avg("_m").alias("_mu"))
    cus = buckets.join(mu, group_col).select(
        F.col(group_col),
        F.col("_b"),
        F.round(
            F.sum(F.col("_m") - F.col("_mu")).over(
                Window.partitionBy(group_col).orderBy("_b")
            ),
            6,
        ).alias("cusum"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.abs(F.col("cusum")).desc(), F.col("_b")
    )
    return (
        cus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            group_col,
            F.col("_b").alias("changepoint_bucket"),
            "cusum",
        )
    )
