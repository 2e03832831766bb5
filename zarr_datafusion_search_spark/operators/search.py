"""Full-text relevance search (BM25) as a pure DataFrame pipeline.

The reference repo is a *search* engine at heart
(`/root/reference/README.md`: query layer over array stores); BM25 top-k is
the canonical text-retrieval operator a corpus-scale engine needs next to
ANN vector search (operators/similarity.py).

Shape for 100 TB:

- The postings list ``(doc_id, term, tf)`` is one explode + one map-side
  combinable groupBy — shuffle bounded by distinct (doc, term) pairs.
- The query set is tiny (a benchmark run is 10s–1000s of queries) and is
  broadcast; scoring touches only postings whose term occurs in some query,
  so the big corpus-side join is an equi-join on ``term`` after a semi
  filter — never a full scan of the postings per query.
- Corpus stats (N, avgdl) are a 1-row aggregate broadcast to the scorer;
  no driver collect.
- Hot terms (stopwords) skew the postings join at real-corpus scale; the
  production guard is the same document-frequency cutoff used by
  ``dedup.ngram_jaccard_pairs`` (drop terms with df > cap — they carry no
  BM25 weight anyway, idf ~ 0). Exposed as ``max_df``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from zarr_datafusion_search_spark.operators.dedup import spread, tokens_col


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query under Lucene-style BM25.

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``;
    ``w = idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))``;
    score = sum of ``w`` over matching query terms, rounded to 6 digits
    (cross-engine summation-order stability), ties broken by ``doc_id``.

    Returns ``(query_id, doc_id, score, rank)``.
    """
    spark = docs.sparkSession
    toked = (
        spread(docs, id_col)
        .select(F.col(id_col), tokens_col(text_col).alias("_toks"))
        .filter(F.size("_toks") > 0)
    )
    # postings: one row per (doc, term); dl rides along as a grouping key
    # (functionally dependent on doc_id, so it adds no groups)
    tf = (
        toked.select(
            id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    qrows = [
        (int(qid), t)
        for qid, qtext in queries
        for t in sorted(set(qtext.lower().split()))
    ]
    qdf = spark.createDataFrame(qrows, "query_id INT, term STRING")
    # df over the full corpus, but only for terms some query mentions
    dfc = (
        tf.join(F.broadcast(qdf.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    if max_df is not None:
        dfc = dfc.filter(F.col("df") <= max_df)
    stats = toked.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("_toks")).alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(w), 6).alias("score"))
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )
