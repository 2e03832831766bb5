"""Heavy hitters (frequent items) at corpus scale: bounded-memory
candidate generation + exact verification.

The naive ``GROUP BY term`` over an exploded 100 TB token stream shuffles
the full vocabulary — billions of singleton keys move across the wire so
that 99.99% of them can be discarded by the HAVING clause. This operator
is the classic two-pass answer:

- **Pass 1 — Misra-Gries per partition** (``mapInPandas``, zero shuffle):
  each task streams its partition through a capacity-bounded counter set
  (the mergeable-summaries MG merge: add a batch's exact counts, then
  subtract the (capacity+1)-th largest estimate from everything and drop
  non-positives). The surviving candidates per partition are at most
  ``capacity`` rows; the union over partitions is a guaranteed superset of
  every term with global count > N/(capacity+1).
- **Pass 2 — exact counts for candidates only**: broadcast the candidate
  set, ``LEFT SEMI`` join the token stream against it, and GROUP BY the
  (tiny) surviving key space. The shuffle now carries only candidate
  terms, not the vocabulary tail.

The final output is EXACT and partitioning-independent: terms whose true
count >= max(min_count, floor(N/(capacity+1)) + 1), with their true
counts. Any term clearing that threshold is guaranteed to be in the
candidate union (if its global count exceeded N/(capacity+1), some
partition saw it above its local n_p/(capacity+1) share), so filtering
candidates with exact counts reproduces the exact GROUP-BY/HAVING answer
— which is precisely what the DuckDB oracle computes.

Sizing at scale: the candidate union is <= capacity x num_partitions rows
(a few MB at capacity 4096); if a deployment fans out to tens of
thousands of tasks, pre-aggregate the union with one tiny groupBy before
the broadcast — the plan below already does (``.distinct()`` on <=
capacity x P rows).

Reference: the reference engine delegates all aggregation to DataFusion's
hash agg (src/table_provider.rs:81-93 passes plans through); this is the
beyond-parity scale path for the frequent-terms shape.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from zarr_datafusion_search_spark.operators.cache import tracked_persist


def misra_gries_summaries(
    terms: DataFrame, term_col: str = "term", capacity: int = 4096
) -> DataFrame:
    """Per-partition MG summaries of a one-column term stream.

    Output rows: ``(term, est, n)`` — candidate terms with their
    (under)estimates, plus one sentinel row per partition
    (``term IS NULL``) carrying the partition's exact item count ``n``
    so the caller can recover the global N without a second scan.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            col = pdf[term_col]
            n += len(col)
            for t, w in col.value_counts().items():
                counters[t] = counters.get(t, 0) + int(w)
            if len(counters) > capacity:
                # mergeable-summaries prune: subtract the (capacity+1)-th
                # largest estimate, keep strictly-positive counters
                sub = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    t: c - sub for t, c in counters.items() if c - sub > 0
                }
        out = pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "est": list(counters.values()) + [0],
                "n": [0] * len(counters) + [n],
            }
        )
        yield out.astype({"est": "int64", "n": "int64"})

    return terms.select(term_col).mapInPandas(mg, "term string, est long, n long")


def frequent_terms(
    terms: DataFrame,
    term_col: str = "term",
    min_count: int = 100,
    capacity: int = 4096,
) -> DataFrame:
    """Exact frequent terms: ``(term, cnt)`` for every term with true
    count >= max(min_count, floor(N/(capacity+1)) + 1).

    The threshold's second arm is the MG guarantee floor — below it the
    candidate set is not provably complete, so the operator raises the
    bar rather than silently returning a partial answer. Choose
    ``capacity >= N/min_count`` to make ``min_count`` the binding arm.

    Two scans of the term stream (candidate pass + exact pass), one
    broadcast, one shuffle over candidate keys only. The tiny summary
    relation is persisted (tracked) because both the candidate set and
    the N total read it — without the persist each branch would re-run
    the full pass-1 scan.
    """
    summ = tracked_persist(misra_gries_summaries(terms, term_col, capacity))
    total = summ.where(F.col("term").isNull()).select(
        F.sum("n").alias("_total_n")
    )
    cand = summ.where(F.col("term").isNotNull()).select("term").distinct()
    exact = (
        terms.select(F.col(term_col).alias("term"))
        .join(F.broadcast(cand), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    threshold = F.greatest(
        F.lit(min_count).cast("long"),
        (F.floor(F.col("_total_n") / (capacity + 1)) + 1).cast("long"),
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= threshold)
        .select("term", "cnt")
    )
