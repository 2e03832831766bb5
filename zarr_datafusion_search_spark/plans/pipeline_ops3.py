"""Round-3 pipeline-operator queries (second batch): heavy hitters,
deterministic per-key sampling, SCD2 point-in-time lookup, robust outlier
detection, BPE merge statistics, incremental aggregate maintenance, and
hashed-feature quality classification.

Same contract as ``pipeline_ops``: every entry is a Spark DataFrame plan
plus a DuckDB oracle computing the identical result (column names aliased
identically on both sides; floats pinned with both-side rounding).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zarr_datafusion_search_spark.plans.registry import register, table

#: shared oracle CTE: lower-cased whitespace tokens per document
_TOKS = r"""
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                             x -> len(x) > 0) AS t
  FROM documents
)"""


def _bigram_terms(docs: DataFrame) -> DataFrame:
    """One row per adjacent token pair ('a b') across the corpus —
    the term stream for the frequent-items queries. All built-in array
    expressions (slice + zip_with), JVM-side."""
    from zarr_datafusion_search_spark.operators.dedup import tokens_col

    t = tokens_col("text")
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(t, 1, n1),
        F.slice(t, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return docs.select(F.explode(pairs).alias("term"))


_FREQ_MIN_COUNT = 30
_FREQ_CAPACITY = 4096


@register(
    "frequent_terms_heavy_hitters",
    oracle=f"""
    WITH {_TOKS},
    tl AS (
      SELECT t[i] || ' ' || t[i + 1] AS term
      FROM toks, unnest(range(1, len(t))) AS r(i)
    ),
    tot AS (SELECT count(*) AS n FROM tl),
    cnt AS (SELECT term, count(*) AS cnt FROM tl GROUP BY 1)
    SELECT term, cnt FROM cnt CROSS JOIN tot
    WHERE cnt >= greatest({_FREQ_MIN_COUNT},
                          n // ({_FREQ_CAPACITY} + 1) + 1)
    """,
    doc="Exact heavy hitters over the corpus bigram stream via two-pass "
    "Misra-Gries (bounded-memory per-partition candidates, zero-shuffle "
    "pass 1; broadcast-semi-join exact verification, candidate-only "
    "shuffle pass 2) — the scale path that avoids shuffling the full "
    "vocabulary tail. Output is exact and partitioning-independent "
    "(threshold = max(min_count, MG guarantee floor)), so the oracle is "
    "the plain GROUP BY / HAVING it replaces.",
)
def frequent_terms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.frequent import frequent_terms

    docs = table(spark, sf, "documents")
    return frequent_terms(
        _bigram_terms(docs),
        min_count=_FREQ_MIN_COUNT,
        capacity=_FREQ_CAPACITY,
    )
