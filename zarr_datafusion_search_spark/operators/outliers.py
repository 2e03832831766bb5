"""Robust per-group anomaly detection: median / MAD (median absolute
deviation) outlier flagging.

Mean/stddev z-scores break exactly when you need them (the outliers drag
the mean); median/MAD is the standard robust alternative for numeric
data-quality gates over training pipelines (drop corrupt reward values,
flag sensor glitches before they poison a curriculum).

Three passes over the data are inherent to MAD flagging (median -> MAD
-> flag: each needs the previous pass's scalar), each a scan plus a
tiny broadcast join — never a data-sized shuffle or persist. Exact ``percentile`` is
used for the cross-engine oracle (DuckDB ``quantile_cont`` matches
Spark's interpolation); at 100 TB swap in ``approx_percentile`` — exact
grouped percentiles hold per-key value multisets in memory, the same
exact->sketch swap documented in ``profile_columns``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Consistency constant: MAD * 1.4826 estimates sigma for Gaussian data.
MAD_SIGMA = 1.4826


def mad_outlier_stats(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    z: float = 3.0,
) -> DataFrame:
    """Per-key robust stats + outlier counts.

    Output per key: ``n``, ``med`` (median), ``mad``, and ``n_outliers``
    — rows whose robust z-score ``|v - med| / (MAD_SIGMA * mad)``
    exceeds ``z``. Keys where MAD is 0 (a majority-constant value)
    report NULL mad and 0 outliers rather than dividing by zero.
    """
    med = df.groupBy(key_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("med")
    )
    j = df.join(F.broadcast(med), key_col)
    dev = j.withColumn("_dev", F.abs(F.col(value_col) - F.col("med")))
    mad = dev.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("med").alias("med"),
        F.nullif(F.percentile("_dev", F.lit(0.5)), F.lit(0.0)).alias("mad"),
    )
    scored = dev.join(
        F.broadcast(mad.select(key_col, F.col("mad").alias("_mad"))), key_col
    )
    robust_z = F.try_divide(F.col("_dev"), F.lit(MAD_SIGMA) * F.col("_mad"))
    counts = scored.groupBy(key_col).agg(
        F.count(F.when(robust_z > z, 1)).alias("n_outliers"),
        F.round(F.max(robust_z), 6).alias("max_robust_z"),
    )
    return mad.join(counts, key_col).select(
        key_col,
        "n",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
        "max_robust_z",
    )


def quantile_sketch(
    df,
    value_col: str = "value",
    quantiles: tuple = (0.5, 0.9, 0.99),
    n_bins: int = 256,
):
    """Mergeable fixed-grid quantile sketch: approximate quantiles from a
    deterministic equal-width histogram with within-bin linear
    interpolation — the map-side-combinable shape (each partition emits
    bin counts; merge = vector add) that exact sort-based percentiles
    can't give you at 100 TB, made fully reproducible so an oracle can
    replay it bit-for-bit (unlike t-digest, whose centroids depend on
    merge order).

    Grid: ``[min, max]`` split into ``n_bins`` equal bins (one cheap
    min/max pass — itself map-side combinable). Estimate for quantile q:
    the value at rank ``q * (n-1)`` assuming uniform spread inside its
    bin. All arithmetic is fixed-order double ops both engines compute
    identically; results rounded 6dp.
    """
    import pyspark.sql.functions as F

    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        F.count(v).alias("n"),
    )
    # bin id: clamp to [0, n_bins-1]; the max value lands in the last bin
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.greatest(
                    F.floor(
                        (v - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / n_bins)
                    ),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # cumulative counts over <=256 rows: the window runs on a relation of
    # n_bins rows, not data rows — single-task is CORRECT here
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bin", "c", F.sum("c").over(w).alias("cum")
    ).crossJoin(F.broadcast(bounds))
    out = None
    for q in quantiles:
        # target rank in [0, n-1]; first bin whose cum > rank holds it
        rank = F.lit(q) * (F.col("n") - 1)
        hit = (
            cum.filter(F.col("cum") > rank)
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(q).alias("quantile"),
                F.round(
                    F.col("lo")
                    + ((F.col("hi") - F.col("lo")) / n_bins)
                    * (
                        F.col("bin")
                        + (rank - (F.col("cum") - F.col("c")))
                        / F.col("c")
                    ),
                    6,
                ).alias("estimate"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out
