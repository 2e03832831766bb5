"""Data-governance operators for training corpora: k-anonymity auditing,
per-user contribution bounding, and freshness/staleness reporting.

These are the compliance-side passes a 100 TB pipeline runs before and
after every release: does any quasi-identifier combination isolate fewer
than k people, is any single user over-represented enough to dominate a
model (the contribution bound differential-privacy preprocessing
requires), and how stale is each slice. All three are one-shuffle
group-by/window shapes with O(groups) output — no row-level data leaves
the executors, which for a governance pass is itself a requirement.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row k-anonymity summary over the quasi-identifier columns:
    group sizes, how many groups fall below ``k``, and the row count /
    fraction that would need suppression to reach k-anonymity. The
    detailed below-k groups deliberately stay distributed (they are the
    sensitive part); only counts reach the driver."""
    sizes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("sz"))
    below = F.when(F.col("sz") < k, F.col("sz")).otherwise(F.lit(0))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("sz") < k).cast("long")).alias("n_below_k"),
        F.sum(below).alias("n_rows_suppressed"),
        F.round(F.sum(below) / F.sum("sz"), 6).alias("suppression_rate"),
        F.min("sz").alias("min_group_size"),
    )


def cap_user_contributions(
    df: DataFrame,
    user_col: str,
    order_col: str,
    tiebreak_col: str,
    cap: int,
) -> DataFrame:
    """Bound each user to their ``cap`` most recent rows (deterministic
    ``order_col DESC, tiebreak_col DESC`` ranking) — the contribution
    bounding step DP-style training prescribes so no single user can
    dominate the gradient signal. One window shuffle on the user key;
    the filter is rank-based, so the pass is a single stage at any
    corpus size."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).desc()
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= cap
    ).drop("_rn")


def contribution_cap_report(
    df: DataFrame,
    user_col: str,
    order_col: str,
    tiebreak_col: str,
    group_col: str,
    cap: int,
) -> DataFrame:
    """Per-group before/after report of contribution capping: raw rows,
    rows surviving the per-user cap, and the clipped fraction — the
    number a pipeline owner checks to see whether the bound actually
    bit (and on which slice)."""
    capped = cap_user_contributions(
        df, user_col, order_col, tiebreak_col, cap
    )
    raw = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_raw"))
    kept = capped.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_capped")
    )
    return raw.join(kept, group_col).select(
        group_col,
        "n_raw",
        "n_capped",
        F.round(
            (F.col("n_raw") - F.col("n_capped")) / F.col("n_raw"), 6
        ).alias("clipped_rate"),
    )


def freshness_audit(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    recent_days: int = 7,
    stale_days: int = 1,
) -> DataFrame:
    """Per-group freshness relative to the corpus watermark (global max
    timestamp): lag in seconds, the share of the group's rows inside the
    trailing ``recent_days`` window, and a staleness flag at
    ``stale_days``. Two tiny aggregations — the 1-row watermark is
    broadcast back, rows never reshuffle. Corpus time, not wall time,
    so the audit is reproducible."""
    wm = df.agg(F.max(ts_col).alias("_wm"))
    per = df.crossJoin(F.broadcast(wm)).groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(ts_col).alias("latest_ts"),
        F.first("_wm").alias("_wm"),
        F.sum(
            (
                F.col(ts_col)
                >= F.col("_wm") - F.expr(f"INTERVAL {recent_days} DAYS")
            ).cast("long")
        ).alias("n_recent"),
    )
    # NTZ timestamps don't cast to long; go through unix_micros on the
    # session-tz cast — both ends shift identically, so the difference is
    # timezone-invariant, and integer microseconds avoid double rounding
    # at second boundaries.
    lag_s = F.floor(
        (
            F.unix_micros(F.col("_wm").cast("timestamp"))
            - F.unix_micros(F.col("latest_ts").cast("timestamp"))
        )
        / F.lit(1_000_000)
    )
    return per.select(
        group_col,
        "n_rows",
        "latest_ts",
        lag_s.alias("lag_seconds"),
        F.round(F.col("n_recent") / F.col("n_rows"), 6).alias(
            "recent_share"
        ),
        (lag_s > stale_days * 86400).alias("is_stale"),
    )


def temporal_split_embargo(
    df: DataFrame,
    ts_col: str,
    test_start: str,
    embargo_days: int = 1,
) -> DataFrame:
    """Time-based train/test split with an embargo gap: train ends
    ``embargo_days`` BEFORE the test window opens, and the rows in
    between are dropped — the leakage guard for temporally-correlated
    data (a model must not train on the minutes before its evaluation
    window). One filter pass, one 1-row summary; the split predicate
    pushes down to the scan."""
    ts = F.col(ts_col)
    # cast the literal to the column's NTZ family so the comparison never
    # routes through the session timezone
    cut = F.lit(test_start).cast("timestamp_ntz")
    emb_lo = cut - F.expr(f"INTERVAL {embargo_days} DAYS")
    return df.agg(
        F.sum((ts < emb_lo).cast("long")).alias("n_train"),
        F.sum(((ts >= emb_lo) & (ts < cut)).cast("long")).alias(
            "n_embargo_dropped"
        ),
        F.sum((ts >= cut).cast("long")).alias("n_test"),
        F.round(
            F.sum((ts < emb_lo).cast("long")) / F.count(F.lit(1)), 6
        ).alias("train_frac"),
    )


#: PII patterns shared by the scan and its oracle — simple enough to behave
#: identically under Java regex (Spark) and RE2 (DuckDB): no lookaround, no
#: backreferences, plain classes and bounded repetition only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "phone": r"\+\d{1,3}[ -]\d{3}[ -]\d{3,4}",
}

#: redaction order matters (the ipv4 pattern could bite into an already-
#: redacted string otherwise) and must match the oracle exactly
PII_REDACTION_ORDER = ("email", "ipv4", "phone")


def pii_scan(
    docs: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Per-document PII audit + redaction fingerprint: counts of email /
    IPv4 / phone matches, a ``has_pii`` flag, and the 60-bit hash of the
    redacted text (each match class replaced by its ``<CLASS>`` marker in
    a fixed order). The release gate a training corpus passes before
    export; emitting the HASH of the redacted text rather than the text
    itself keeps row-level content on the executors while still letting
    the oracle verify the exact redaction output.

    Pure per-row JVM regex work (``regexp_count`` / ``regexp_replace``)
    — no shuffle at all; scales with the scan.
    """
    from zarr_datafusion_search_spark.functions.hashing import h64

    t = F.col(text_col)
    red = t
    for name in PII_REDACTION_ORDER:
        red = F.regexp_replace(red, PII_PATTERNS[name], f"<{name.upper()}>")
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    return docs.select(
        F.col(id_col),
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phones"),
        (counts["email"] + counts["ipv4"] + counts["phone"] > 0).alias(
            "has_pii"
        ),
        h64(red).alias("redacted_hash"),
    )
