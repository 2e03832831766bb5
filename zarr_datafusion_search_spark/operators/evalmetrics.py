"""Evaluation metrics over curation signals, computed distributed:
group-wise ROC AUC (midrank Mann-Whitney), Cohen's kappa annotator
agreement, and mixture reweighting with effective sample size.

A 100 TB curation pipeline is steered by exactly these numbers — does a
cheap score actually rank the positives above the negatives per slice,
do two labeling heuristics agree beyond chance, and how much statistical
power survives reweighting a skewed source mixture. Each metric is a
closed-form aggregate (window rank + group-by, no iteration, no UDF):
the per-group state is O(1) beyond one rank shuffle, so every metric
holds at any corpus size. All tie handling uses midranks — statistically
standard AND order-independent, which is what makes the numbers
bit-reproducible against an external SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def groupwise_auc(
    df: DataFrame, group_col: str, score_col: str, label_col: str
) -> DataFrame:
    """ROC AUC per group via the rank-sum (Mann-Whitney U) identity:
    ``AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)`` where
    ``R_pos`` sums the positives' midranks. Midrank = ``rank() +
    (ties-1)/2`` handles equal scores exactly (the expected AUC over
    random tie orders) without any nondeterministic ordering. One rank
    shuffle on (group, score); groups with a single class return NULL
    rather than a fake 0/1."""
    mr = (
        F.rank().over(Window.partitionBy(group_col).orderBy(score_col))
        + (
            F.count(F.lit(1)).over(
                Window.partitionBy(group_col, score_col)
            )
            - 1
        )
        / 2.0
    )
    y = F.col(label_col).cast("int")
    ranked = df.select(
        F.col(group_col), y.alias("_y"), mr.alias("_mr")
    )
    agg = ranked.groupBy(group_col).agg(
        F.sum(F.when(F.col("_y") == 1, F.col("_mr"))).alias("_rpos"),
        F.sum("_y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("_y")).alias("n_neg"),
    )
    auc = (
        F.col("_rpos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        group_col,
        "n_pos",
        "n_neg",
        F.round(
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc), 6
        ).alias("auc"),
    )


def cohen_kappa_binary(
    df: DataFrame, group_col: str, label_a: str, label_b: str
) -> DataFrame:
    """Cohen's kappa between two binary labelers, per group:
    ``(p_o - p_e) / (1 - p_e)`` with ``p_e = p_a p_b +
    (1-p_a)(1-p_b)`` — the full chance-agreement formula collapses to
    marginal means for binary labels, so the whole metric is one
    group-by of three averages (map-side combinable, no shuffle beyond
    the group key). Degenerate groups (both labelers constant and
    identical, ``p_e = 1``) return NULL."""
    a = F.col(label_a).cast("double")
    b = F.col(label_b).cast("double")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(a).alias("_pa"),
        F.avg(b).alias("_pb"),
        F.avg((a == b).cast("double")).alias("_po"),
    )
    pe = F.col("_pa") * F.col("_pb") + (1 - F.col("_pa")) * (
        1 - F.col("_pb")
    )
    return agg.select(
        group_col,
        "n",
        F.round("_po", 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(
            (F.col("_po") - pe) / F.nullif(F.lit(1) - pe, F.lit(0.0)), 6
        ).alias("kappa"),
    )


def mixture_reweight_ess(df: DataFrame, group_col: str) -> DataFrame:
    """Importance weights that rebalance a skewed group mixture to the
    uniform target, plus the effective sample size the reweighting
    leaves: ``w_g = (1/k) / share_g`` per group and Kish's
    ``ESS = (sum n_g w_g)^2 / (sum n_g w_g^2)`` overall. Two tiny
    aggregations (per-group counts, then a k-row rollup broadcast back)
    — the corpus itself is never reshuffled, so the planner scales with
    the number of groups, not rows. ESS/total is the honest answer to
    'how much data do we still have after fixing the mixture'."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("_total"), F.count(F.lit(1)).alias("_k")
    )
    w = counts.crossJoin(F.broadcast(tot)).select(
        F.col(group_col),
        "n_docs",
        "_total",
        (F.col("n_docs") / F.col("_total")).alias("_share"),
        (
            (F.lit(1.0) / F.col("_k"))
            / (F.col("n_docs") / F.col("_total"))
        ).alias("_w"),
    )
    summ = w.agg(
        (
            F.pow(F.sum(F.col("n_docs") * F.col("_w")), 2)
            / F.sum(F.col("n_docs") * F.col("_w") * F.col("_w"))
        ).alias("_ess")
    )
    return w.crossJoin(F.broadcast(summ)).select(
        group_col,
        "n_docs",
        F.round("_share", 6).alias("share"),
        F.round("_w", 6).alias("weight"),
        F.round("_ess", 2).alias("ess"),
        F.round(F.col("_ess") / F.col("_total"), 6).alias("ess_fraction"),
    )


def mixture_anneal_schedule(
    df: DataFrame, group_col: str, n_epochs: int = 5
) -> DataFrame:
    """Epoch-wise mixture annealing from the natural group shares to the
    uniform target: ``target(e) = (1-t) * natural + t * uniform`` with
    ``t = e / (n_epochs - 1)`` — the mid-training data-mix schedule
    (up-weight rare slices late in training) expressed as a cross join
    of a k-row share table with an epoch range. Planned document counts
    use ``floor(x + 0.5)`` so both engines round identically. O(k *
    epochs) everywhere; the corpus is only touched for the share
    counts."""
    spark = df.sparkSession
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("_total"), F.count(F.lit(1)).alias("_k")
    )
    epochs = spark.range(n_epochs).select(F.col("id").alias("epoch"))
    t = F.col("epoch") / F.lit(float(n_epochs - 1))
    target = (1 - t) * (F.col("n_docs") / F.col("_total")) + t * (
        F.lit(1.0) / F.col("_k")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(epochs))
        .select(
            "epoch",
            F.col(group_col),
            "n_docs",
            F.round(target, 6).alias("target_share"),
            F.floor(target * F.col("_total") + F.lit(0.5)).alias(
                "planned_docs"
            ),
        )
    )


def kfold_assignment_counts(
    df: DataFrame, id_col: str, strata_col: str, k: int = 5
) -> DataFrame:
    """Deterministic stratified k-fold audit: fold = portable hash of
    the id, counted per (fold, stratum) with each fold's share of its
    stratum — the balance table you check before trusting
    cross-validation on a skewed corpus. Replayable across engines and
    across runs (no RNG), one group-by; rows never leave executors."""
    from zarr_datafusion_search_spark.functions.hashing import h64

    fold = h64(F.col(id_col).cast("string")) % k
    counts = df.select(
        fold.alias("fold"), F.col(strata_col)
    ).groupBy("fold", strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy(strata_col)
    return counts.select(
        "fold",
        strata_col,
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias(
            "stratum_share"
        ),
    )


def mixture_temperature_weights(
    df: DataFrame, group_col: str, alpha: float = 0.7
) -> DataFrame:
    """Temperature-based multinomial sampling weights over sources:
    ``w_s = p_s^alpha / sum_t p_t^alpha`` with ``p_s = n_s / N`` — the
    standard alpha-smoothing (mBERT/XLM-R style) that up-samples small
    sources and down-samples dominant ones; ``alpha = 1`` is proportional,
    ``alpha = 0`` uniform. Also reports ``sampling_factor = w_s / p_s``,
    the effective epoch multiplier each source sees under the mix.

    One group-by shuffle; the |groups|-row weight table folds its two
    normalizers in via broadcast cross joins. BOTH sides of the weight
    ratio live on the fixed 1e-12 grid: the ``p^alpha`` denominator is
    summed in fixed point as an exact long (partition-order-insensitive —
    the same device as source_term_kl's contrib sum), and each row's
    numerator reuses the SAME quantized long instead of recomputing the
    raw double ``pow`` — a 1-ulp Java ``Math.pow`` vs libm ``pow``
    difference landing on a 6dp rounding boundary therefore cannot
    realistically flip ``weight``/``sampling_factor`` parity. (The
    residual risk is the quantization itself: ``round(pow * 1e12)`` can
    differ by ±1 long between engines when the product lands within an
    ulp of a .5 grid boundary, a ~1e-12 relative slack that would in turn
    have to land exactly on a 6dp boundary to surface.)
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("_n"))
    with_p = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        (F.col("n_docs") / F.col("_n")).alias("_p"),
    )
    pow_fp = F.round(F.pow("_p", F.lit(alpha)) * 1e12, 0).cast("long")
    denom = with_p.agg(F.sum(pow_fp).alias("_dfp"))
    return (
        with_p.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            "n_docs",
            F.round("_p", 6).alias("share"),
            F.round(pow_fp / F.col("_dfp"), 6).alias("weight"),
            F.round(pow_fp / F.col("_dfp") / F.col("_p"), 6).alias(
                "sampling_factor"
            ),
        )
    )
