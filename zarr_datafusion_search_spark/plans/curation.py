"""Round-2 curation / warehouse-maintenance queries: data mixing,
collocation mining, SCD2 history, CDC MERGE application, semantic dedup.

Each binds an operator from ``operators/`` to the synthetic tables with an
exact DuckDB oracle (the portable md5 hash family and double-precision
sequential-fold cosine make even the clustered dedup reproducible).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zarr_datafusion_search_spark.functions.hashing import duckdb_h64
from zarr_datafusion_search_spark.operators import similarity, text, timeseries
from zarr_datafusion_search_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# data mixing
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = {"src1": 0.5, "src2": 0.3, "src3": 0.2}
_MIX_TOTAL = 300
_MIX_QUOTA = {
    d: int(_MIX_TOTAL * w / sum(_MIX_WEIGHTS.values()))
    for d, w in _MIX_WEIGHTS.items()
}


def _mix_oracle() -> str:
    case = " ".join(
        f"WHEN '{d}' THEN {q}" for d, q in sorted(_MIX_QUOTA.items())
    )
    doms = ", ".join(f"'{d}'" for d in sorted(_MIX_QUOTA))
    return f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {duckdb_h64('CAST(doc_id AS VARCHAR)')}, doc_id
             ) AS rn
      FROM documents WHERE source IN ({doms})
    ) WHERE rn <= CASE source {case} END
    """


@register(
    "mixture_sample_domains",
    oracle=_mix_oracle(),
    doc="Data mixing: sample the corpus to a 50/30/20 target domain "
    "mixture; each domain keeps its quota of rows chosen deterministically "
    "by the portable hash.",
)
def mixture_sample_domains(spark: SparkSession, sf: str) -> DataFrame:
    return text.mixture_sample(
        table(spark, sf, "documents"), _MIX_WEIGHTS, total=_MIX_TOTAL
    )


# ---------------------------------------------------------------------------
# collocations
# ---------------------------------------------------------------------------

_PMI_ORACLE = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'),
                     x -> len(x) > 0) AS t
  FROM documents
),
uc AS (
  SELECT w, count(*) AS c_w
  FROM (SELECT unnest(t) AS w FROM toks WHERE len(t) > 0)
  GROUP BY w
),
n AS (SELECT CAST(sum(c_w) AS DOUBLE) AS n FROM uc),
bc AS (
  SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_ab
  FROM (
    SELECT unnest(list_transform(
             generate_series(1, len(t) - 1),
             i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
    FROM toks WHERE len(t) >= 2
  )
  GROUP BY 1, 2
  HAVING count(*) >= 5
),
nb AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS nb FROM bc)
SELECT bc.w1, bc.w2, CAST(c_ab AS BIGINT) AS c_ab,
       round(ln((c_ab / nb.nb) /
                ((u1.c_w / n.n) * (u2.c_w / n.n))), 6) AS pmi
FROM bc
JOIN uc u1 ON bc.w1 = u1.w
JOIN uc u2 ON bc.w2 = u2.w
CROSS JOIN n CROSS JOIN nb
ORDER BY pmi DESC, bc.w1, bc.w2
LIMIT 50
"""


@register(
    "bigram_pmi_top",
    oracle=_PMI_ORACLE,
    doc="Collocation mining: top-50 adjacent bigrams by pointwise mutual "
    "information (exact counts, ln rounded to 6 dp). The phrase-detection "
    "statistic tokenizer builders compute over a corpus.",
)
def bigram_pmi_top(spark: SparkSession, sf: str) -> DataFrame:
    return text.bigram_pmi(
        table(spark, sf, "documents"), min_count=5, top_k=50
    )


# ---------------------------------------------------------------------------
# SCD2 history
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
changes AS (
  SELECT user_id, ts, event_id, event_type
  FROM ordered WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type AS state,
       CAST(ts AS TIMESTAMP) AS valid_from,
       CAST(lead(ts) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)
         AS valid_to,
       lead(ts) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changes
"""


@register(
    "scd2_user_state",
    oracle=_SCD2_ORACLE,
    doc="SCD type 2: collapse the event log into per-user validity "
    "intervals of the event_type state (consecutive duplicates merged, "
    "open-ended current interval).",
)
def scd2_user_state(spark: SparkSession, sf: str) -> DataFrame:
    return timeseries.scd2_history(table(spark, sf, "events"))


# ---------------------------------------------------------------------------
# CDC MERGE apply
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH agg AS (
  SELECT o_custkey, max(o_orderkey) AS mx,
         round(sum(o_totalprice), 2) AS bal
  FROM orders GROUP BY o_custkey
),
changes AS (
  SELECT o_custkey AS c_custkey,
         CASE WHEN mx % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         'cust_' || CAST(o_custkey AS VARCHAR) AS c_name,
         bal AS c_acctbal
  FROM agg
  UNION ALL
  SELECT o_custkey + 10000000, 'I',
         'new_' || CAST(o_custkey AS VARCHAR), bal
  FROM agg WHERE mx % 13 = 0
),
base AS (SELECT c_custkey, c_name, c_acctbal FROM customer)
SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
       CASE WHEN c.op IN ('I', 'U') THEN c.c_name ELSE b.c_name END
         AS c_name,
       CASE WHEN c.op IN ('I', 'U') THEN c.c_acctbal ELSE b.c_acctbal END
         AS c_acctbal
FROM base b FULL OUTER JOIN changes c ON b.c_custkey = c.c_custkey
WHERE COALESCE(c.op, '') <> 'D'
"""


@register(
    "merge_apply_snapshot",
    oracle=_MERGE_ORACLE,
    doc="CDC MERGE: apply a compacted insert/update/delete changeset "
    "(derived deterministically from orders) to the customer snapshot in "
    "one full-outer key join.",
)
def merge_apply_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    base = table(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    agg = (
        table(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderkey").alias("mx"),
            F.round(F.sum("o_totalprice"), 2).alias("bal"),
        )
    )
    upd = agg.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("mx") % 10 == 0, "D").otherwise("U").alias("op"),
        F.concat(F.lit("cust_"), F.col("o_custkey").cast("string")).alias(
            "c_name"
        ),
        F.col("bal").alias("c_acctbal"),
    )
    ins = agg.filter(F.col("mx") % 13 == 0).select(
        (F.col("o_custkey") + 10000000).alias("c_custkey"),
        F.lit("I").alias("op"),
        F.concat(F.lit("new_"), F.col("o_custkey").cast("string")).alias(
            "c_name"
        ),
        F.col("bal").alias("c_acctbal"),
    )
    return timeseries.merge_apply(base, upd.unionByName(ins), "c_custkey")


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def _duck_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
    )


def _semantic_oracle(
    n_centroids: int | str = 16,
    threshold: float = 0.4,
    target_cell_rows: int = similarity.SEMDEDUP_TARGET_CELL_ROWS,
) -> str:
    """DuckDB twin of :func:`similarity.semantic_dedup_pairs`.

    ``n_centroids="auto"`` replays the operator's deterministic sizing
    rule (:func:`similarity.semdedup_auto_n_centroids`) inside the SQL —
    ``max(16, ceil(count(*) / target_cell_rows))`` up to target^2 rows,
    ``ceil(sqrt(count(*)))`` beyond (the round-11 sqrt-k fallback) —
    with integer arithmetic throughout, exactly like the minhash
    bucket-cap and LPA degree-cap oracles replay theirs: the rule is a
    pure function of the corpus row count, so both engines derive the
    identical quantizer at every scale factor. The ceil-sqrt is computed
    as a +/-1-corrected ``floor(sqrt(double))`` (smallest k of {f-1, f,
    f+1} with k*k >= n), exact wherever the true isqrt is within 1 of
    the double rounding — everywhere below 2^52 rows."""
    cos_ec = _duck_cos("e.embedding", "c.cent_vec")
    cos_ab = _duck_cos("a._va", "b._vb")
    if n_centroids == "auto":
        linear_max = similarity.SEMDEDUP_LINEAR_K_MAX_ROWS
        cents = f"""
      SELECT vec_id AS centroid_id, embedding AS cent_vec
      FROM embeddings
      QUALIFY row_number() OVER (ORDER BY vec_id) <= (
        SELECT CASE
          WHEN n <= {linear_max}
            THEN GREATEST(16, (n + {target_cell_rows - 1})
                              // {target_cell_rows})
          WHEN (f - 1) * (f - 1) >= n THEN f - 1
          WHEN f * f >= n THEN f
          ELSE f + 1 END
        FROM (SELECT n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)
                       AS f
              FROM (SELECT COUNT(*) AS n FROM embeddings))
      )"""
    else:
        cents = f"""
      SELECT vec_id AS centroid_id, embedding AS cent_vec
      FROM embeddings ORDER BY vec_id LIMIT {n_centroids}"""
    return f"""
    WITH cents AS ({cents}
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, c.centroid_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round({cos_ec}, 6) DESC, c.centroid_id) AS r
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, embedding, centroid_id AS cell
      FROM scored WHERE r = 1
    )
    SELECT id_a, id_b, centroid_id, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell AS centroid_id,
             round({cos_ab}, 6) AS cosine
      FROM (SELECT cell, vec_id, embedding AS _va FROM assigned) a
      JOIN (SELECT cell, vec_id, embedding AS _vb FROM assigned) b
        USING (cell)
      WHERE a.vec_id < b.vec_id
    ) WHERE cosine >= {threshold}
    """


@register(
    "dedup_semantic",
    oracle=_semantic_oracle(),
    doc="SemDeDup-style semantic dedup: deterministic IVF cell assignment "
    "(16 seed centroids), then exact cosine pairs within each cell only — "
    "the clustered escape from quadratic all-pairs similarity.",
)
def dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.semantic_dedup_pairs(
        table(spark, sf, "embeddings"), threshold=0.4, n_centroids=16
    )


@register(
    "dedup_semantic_auto",
    oracle=_semantic_oracle(n_centroids="auto"),
    doc="SemDeDup with the corpus-sized quantizer: n_centroids = "
    "max(16, ceil(n / SEMDEDUP_TARGET_CELL_ROWS)), so the mean cell "
    "population — and with it the per-row pair work — stays constant as "
    "the corpus grows. This is the scale-suite member (VERDICT r08 ask "
    "#1): the pinned-16 twin above is quadratic in corpus size by "
    "construction (361.8 s at 300x vs 24.7 s at 100x in the r8 record), "
    "while this plan's total work is linear. The sizing rule is a pure "
    "function of the row count; the DuckDB oracle replays it in SQL.",
)
def dedup_semantic_auto(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.semantic_dedup_pairs(
        table(spark, sf, "embeddings"), threshold=0.4, n_centroids="auto"
    )


@register(
    "dedup_semantic_auto_strict",
    oracle=_semantic_oracle(n_centroids="auto", threshold=0.75),
    doc="SemDeDup at a production-grade threshold (0.75; published "
    "SemDeDup uses 0.9+): auto-sized quantizer, pairs emitted only above "
    "the near-duplicate line. This is the 100x/300x scale-suite member: "
    "the 0.4 twin's OUTPUT is quadratic in corpus size on the synthetic "
    "scale tables by data construction (each scaled copy is the "
    "normalized midpoint of two base vectors, cosine ~0.7 vs its parents, "
    "so sub-0.7 thresholds couple every copy to its parents' entire "
    "neighborhoods — measured 7.3M pairs at 100x -> 58M at 300x, 7.9x "
    "output for 3x input, and pair EMISSION is the dominant cost at that "
    "density). Above the 0.7 coupling line output scales linearly "
    "(1.8k -> 5.1k pairs, 2.8x for 3x), so this query isolates the "
    "operator's own scaling from the data artifact. At base SFs (<=2000 "
    "random-ish vectors) the result is legitimately empty — the "
    "correctness gate checks 0 == 0 here; the VALUE-bearing small-SF "
    "check is the 0.4 twin plus the engaged-quantizer pytest.",
)
def dedup_semantic_auto_strict(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.semantic_dedup_pairs(
        table(spark, sf, "embeddings"), threshold=0.75, n_centroids="auto"
    )
