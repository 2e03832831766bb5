"""Skew mitigation: salted aggregation and salted broadcast-replicated join.

At 100 TB a handful of hot keys (one dominant language, a null-ish default
id) can pin a whole stage on one reducer. AQE's skew-join splitting handles
sort-merge joins automatically (enabled in ENGINE_CONF); these helpers cover
the remaining cases:

- ``salted_aggregate``: two-phase aggregation — partial per (key, salt)
  spreads a hot key over ``n_salts`` reducers, then a cheap final merge over
  the (small) per-key partials. Works for any algebraic aggregate
  (sum/count/min/max, and avg via sum+count).
- ``salted_join``: explode the *small* side with every salt value and salt
  the big side's key randomly, so one hot key's rows land on ``n_salts``
  different reducers while still meeting their matching small-side copy.

Salting is deterministic here (hash-based, not random) so results are
reproducible and oraclable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _salt(df_col: Column, n_salts: int) -> Column:
    """Deterministic salt derived from a (high-cardinality) discriminator
    column — typically a unique id — so a hot key's rows spread evenly."""
    return F.pmod(F.xxhash64(df_col), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key: str,
    discriminator: str,
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> ``"fn(col)"`` with fn in
    sum/count/min/max. Phase 1 aggregates per (key, salt); phase 2 merges
    per-key. The phase-2 input has at most ``n_salts`` rows per key
    regardless of skew.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial_cols = []
    final_cols = []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fn = fn.strip().lower()
        if fn == "count":
            partial_cols.append(F.count(F.lit(1) if col in ("*", "1") else col).alias(f"_p_{out}"))
        elif fn == "sum":
            partial_cols.append(F.sum(col).alias(f"_p_{out}"))
        elif fn == "min":
            partial_cols.append(F.min(col).alias(f"_p_{out}"))
        elif fn == "max":
            partial_cols.append(F.max(col).alias(f"_p_{out}"))
        else:
            raise ValueError(f"unsupported salted aggregate: {fn}")
        final_cols.append(merge_fn[fn](f"_p_{out}").alias(out))
    partial = (
        df.withColumn("_salt", _salt(F.col(discriminator), n_salts))
        .groupBy(key, "_salt")
        .agg(*partial_cols)
    )
    return partial.groupBy(key).agg(*final_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    discriminator: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt the big side's key, replicate the small
    side once per salt, join on (key, salt). Output columns = big ++ small
    (minus the duplicated key), same as ``big.join(small, key, how)``.
    """
    b = big.withColumn("_salt", _salt(F.col(discriminator), n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Pre-join skew diagnostic: per-key row counts for the ``top_n``
    heaviest keys plus each key's share of the relation and its skew
    factor (count / mean-count-per-key) — the numbers that decide
    between a plain shuffle join, a broadcast, or salting BEFORE the
    join runs at 100 TB and stragglers appear.

    One map-side-combinable count aggregation; the global count/NDV ride
    along as a broadcast 1-row aggregate; top-N via orderBy+limit
    (TakeOrderedAndProject). Rounded to 6dp for cross-engine equality.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), key_col).limit(top_n)
    return top.crossJoin(F.broadcast(totals)).select(
        key_col,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        F.round(
            F.col("n_rows") * F.col("_n_keys") / F.col("_total"), 6
        ).alias("skew_factor"),
    )
