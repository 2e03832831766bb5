"""Semantic tests for the curation / warehouse-maintenance operators:
mixture quotas, SCD2 interval chaining, MERGE apply semantics, semantic
dedup cell locality, PMI on a hand-built corpus."""

import datetime
import math

import pyspark.sql.functions as F

from zarr_datafusion_search_spark.operators import similarity, text, timeseries
from zarr_datafusion_search_spark.plans.registry import table


def test_mixture_sample_hits_quotas(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = text.mixture_sample(
        docs, {"src1": 0.5, "src2": 0.25, "src3": 0.25}, total=40
    )
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"src1": 20, "src2": 10, "src3": 10}
    # domains not listed are dropped entirely
    assert set(counts) == {"src1", "src2", "src3"}


def test_mixture_sample_caps_at_domain_size(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n_src1 = docs.filter(F.col("source") == "src1").count()
    out = text.mixture_sample(docs, {"src1": 1.0}, total=n_src1 * 100)
    # quota exceeds the domain: every row kept, none invented
    assert out.count() == n_src1


def test_mixture_sample_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in
               text.mixture_sample(docs, {"src1": 1.0}, total=10).collect())
    b = sorted(r.doc_id for r in
               text.mixture_sample(docs, {"src1": 1.0}, total=10).collect())
    assert a == b and len(a) == 10


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1, 0, 0, s), u, t)
         for i, (s, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_scd2_merges_consecutive_and_chains_intervals(spark):
    ev = _events_df(spark, [
        (0, 1, "view"), (10, 1, "view"), (20, 1, "click"),
        (30, 1, "view"), (5, 2, "purchase"),
    ])
    hist = timeseries.scd2_history(ev).collect()
    u1 = sorted([r for r in hist if r.user_id == 1],
                key=lambda r: r.valid_from)
    # consecutive duplicate 'view' merged: 3 intervals, not 4
    assert [r.state for r in u1] == ["view", "click", "view"]
    # intervals chain: each valid_to equals the next valid_from
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from
    # exactly one open (current) interval per key
    assert [r.is_current for r in u1] == [False, False, True]
    u2 = [r for r in hist if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current


def test_merge_apply_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [(2, "U", "b2", 25.0), (3, "D", None, None), (9, "I", "new", 1.0)],
        "k long, op string, name string, bal double",
    )
    out = {r.k: (r.name, r.bal)
           for r in timeseries.merge_apply(base, changes, "k").collect()}
    assert out == {
        1: ("a", 10.0),      # untouched passes through
        2: ("b2", 25.0),     # update takes the change row's values
        9: ("new", 1.0),     # insert appears
    }                        # 3 deleted


def test_semantic_dedup_pairs_are_within_cells(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    pairs = similarity.semantic_dedup_pairs(emb, threshold=0.3)
    rows = pairs.collect()
    assert rows, "expected some within-cell pairs at threshold 0.3"
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.cosine >= 0.3 for r in rows)
    # every reported pair's members really share the reported cell: rebuild
    # the assignment and check
    cents = (
        emb.orderBy("vec_id").limit(16)
        .select(F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("cent_vec"))
    )
    from zarr_datafusion_search_spark.functions.vectors import (
        cosine_similarity,
    )
    from pyspark.sql import Window
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "centroid_id",
        F.round(cosine_similarity("embedding", "cent_vec"), 6).alias("c"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("c").desc(), F.col("centroid_id"))
    cell_of = {r.vec_id: r.centroid_id
               for r in scored.withColumn("r", F.row_number().over(w))
               .filter("r = 1").collect()}
    for r in rows:
        assert cell_of[r.id_a] == r.centroid_id == cell_of[r.id_b]


def test_bigram_pmi_hand_case(spark):
    # 'x y' always adjacent (4 times); 'a b' adjacent 4 times but a,b also
    # appear apart, so PMI(x,y) > PMI(a,b)
    docs = spark.createDataFrame(
        [(0, "x y a b a c b d x y a b"), (1, "x y a b b a")],
        "doc_id long, text string",
    )
    out = text.bigram_pmi(docs, min_count=2, top_k=10).collect()
    byp = {(r.w1, r.w2): (r.c_ab, r.pmi) for r in out}
    assert ("x", "y") in byp and ("a", "b") in byp
    assert byp[("x", "y")][1] > byp[("a", "b")][1]
    # exact count check: 'x y' occurs 3 times
    assert byp[("x", "y")][0] == 3
    # PMI formula spot-check: counts are exact, so recompute
    n_tok = 18.0
    n_big = sum(c for (c, _) in byp.values())
    c_x, c_y = 3.0, 3.0
    want = round(math.log((3.0 / n_big) / ((c_x / n_tok) * (c_y / n_tok))), 6)
    assert abs(byp[("x", "y")][1] - want) < 1e-9
