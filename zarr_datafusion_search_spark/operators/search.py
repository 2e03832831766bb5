"""Full-text relevance search (BM25) as a pure DataFrame pipeline.

The reference repo is a *search* engine at heart
(`/root/reference/README.md`: query layer over array stores); BM25 top-k is
the canonical text-retrieval operator a corpus-scale engine needs next to
ANN vector search (operators/similarity.py).

Shape for 100 TB:

- The query vocabulary is tiny (a benchmark run is 10s–1000s of queries)
  and is compiled into the tokenize pass as a literal array filter, so
  non-query tokens never reach the explode: the postings build
  ``(doc_id, term, tf)`` shuffles rows proportional to query HITS, not to
  corpus token count, and corpus stats ride out of the same pass.
- The query set itself is broadcast for scoring — the corpus never
  shuffles on anything but its own doc id.
- Corpus stats (N, avgdl) are a 1-row aggregate broadcast to the scorer;
  no driver collect.
- Hot terms (stopwords) skew the postings join at real-corpus scale; the
  production guard is the same document-frequency cutoff used by
  ``dedup.ngram_jaccard_pairs`` (drop terms with df > cap — they carry no
  BM25 weight anyway, idf ~ 0). Exposed as ``max_df``.
"""

from __future__ import annotations

from zarr_datafusion_search_spark.operators.cache import (
    lineage_barrier as _lb,
)

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from zarr_datafusion_search_spark.operators.dedup import tokens_col


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
    # Only query terms can score, so non-query tokens are dropped BEFORE
    # the explode: downstream rows are proportional to query hits, not to
    # corpus token count (at sf0.1 that is ~5M rows -> a few thousand).
    # The term filter is a codegen'd array_contains against the literal
    # query vocabulary — no join, no broadcast. ``explode_outer`` keeps a
    # null-term row for docs with no hits so the corpus stats (N, avgdl)
    # can come out of the SAME pass.
    qterms = sorted({t for _, qtext in queries for t in qtext.lower().split()})
    qlit = F.array(*[F.lit(t) for t in qterms])
    toks = tokens_col(text_col)
    # One tokenize pass, then a repartition on doc id as the branch point:
    # both consumers below re-read this exchange (ReusedExchange) instead
    # of re-tokenizing, and hash(doc_id) partitioning already satisfies
    # their groupBy clusterings, so neither adds another shuffle. The
    # doc-id repartition only spreads the (tiny) post-explode rows — the
    # tokenize itself still executes in the scan stage, so an unsplittable
    # input file needs the up-front parallelism repair below (a no-op at
    # cluster scale, where the tokenize parallelism comes from file splits).
    from zarr_datafusion_search_spark.operators.scanning import (
        ensure_scan_parallelism,
    )

    ex = (
        ensure_scan_parallelism(docs)
        .select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            id_col,
            F.size("_toks").alias("dl"),
            F.explode_outer(
                F.filter("_toks", lambda t: F.array_contains(qlit, t))
            ).alias("term"),
        )
        .repartition(F.col(id_col))
    )
    # postings: one row per (doc, query term); dl rides along as a grouping
    # key (functionally dependent on doc_id, so it adds no groups)
    tf = (
        ex.filter(F.col("term").isNotNull())
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    qrows = [
        (int(qid), t)
        for qid, qtext in queries
        for t in sorted(set(qtext.lower().split()))
    ]
    qdf = spark.createDataFrame(qrows, "query_id INT, term STRING")
    # document frequency per query term (tf already holds one row per
    # (doc, query term))
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    if max_df is not None:
        dfc = dfc.filter(F.col("df") <= max_df)
    stats = (
        ex.groupBy(id_col, "dl")
        .agg(F.count(F.lit(1)).alias("_dummy"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
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


def tfidf_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query under tf-idf cosine (the vector-space
    complement to :func:`bm25_topk`).

    ``idf = ln((1 + N) / (1 + df)) + 1`` (smooth — defined even for unseen
    query terms), doc weight ``w = tf * idf``, score =
    ``dot(q, d) / (||q|| * ||d||)`` rounded to 6 digits, ties by doc id.

    Scale shape differs from BM25 on purpose: the DOC NORM needs every
    term's weight, so this pipeline builds the full postings relation
    (shuffle bounded by total token occurrences — the inverted-index build
    a retrieval deployment pays once and reuses), while the dot product
    still touches only query-term postings. Query-side weights/norms are a
    few-row aggregate, broadcast; corpus rows never shuffle on anything
    but term and doc id.
    """
    spark = docs.sparkSession
    toks = tokens_col(text_col)
    # the postings relation feeds FIVE consumers (df counts, weights, doc
    # norms, scoring, corpus size) — without materialization each branch
    # re-scans and re-tokenizes the corpus (~20 file scans in the final
    # plan). Materialized via a LAZY localCheckpoint rather than persist
    # (round 12, guide §2.4/§5): under AQE the first action launches the
    # consumers' shuffle-map stages CONCURRENTLY, and with a persist each
    # of them raced the CacheManager and re-ran the tokenize+groupBy from
    # scratch (3-4 duplicate ~2.5 s stages in the event log); the
    # checkpoint truncates the lineage to one RDD whose blocks every
    # consumer reads. Interleaved A/B at the 10x bench point: 7.0 s ->
    # 4.3 s median (values bit-identical — same relation, materialized
    # once). Same pattern and block-lifecycle argument as the
    # minhash_lsh_pairs_between band checkpoint: lazy so a plan-only
    # caller never runs a job; blocks are freed by the ContextCleaner
    # when the frame is collected.
    from zarr_datafusion_search_spark.operators.scanning import (
        ensure_scan_parallelism,
    )

    tf = (
        ensure_scan_parallelism(docs)
        .select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    ).transform(_lb, eager=False)
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select(id_col).distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    # tf |><| dfc is vocabulary-sized on both sides: an equi-join on term
    # (no broadcast hint — at corpus scale the df relation outgrows a
    # broadcast; AQE still broadcasts it when it is actually small)
    weights = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term", (F.col("tf") * idf).alias("w"))
    )
    norms = weights.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("d_norm")
    )
    qrows = [
        (int(qid), t, c)
        for qid, qtext in queries
        for t, c in sorted(Counter(qtext.lower().split()).items())
    ]
    qdf = spark.createDataFrame(qrows, "query_id INT, term STRING, qtf INT")
    # query weights use the same smooth idf; df of unseen terms is 0. The
    # df relation is pre-filtered to the literal query vocabulary so the
    # broadcast is query-sized, never vocabulary-sized
    qterms = sorted({t for _, t, _ in qrows})
    dfc_q = dfc.filter(F.col("term").isin(qterms))
    qw = (
        qdf.join(F.broadcast(dfc_q), "term", "left")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "query_id",
            "term",
            (
                F.col("qtf")
                * (
                    F.log(
                        (1.0 + F.col("n_docs"))
                        / (1.0 + F.coalesce(F.col("df"), F.lit(0)))
                    )
                    + 1.0
                )
            ).alias("qw"),
        )
    )
    qnorms = qw.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("q_norm")
    )
    scored = (
        weights.join(F.broadcast(qw), "term")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
        .join(norms, id_col)
        .join(F.broadcast(qnorms), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("dot") / (F.col("d_norm") * F.col("q_norm")), 6
            ).alias("score"),
        )
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )
