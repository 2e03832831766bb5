"""Round-8 hardening: numpy-2-safe rounding, guard-arg validation, the
label-propagation auto degree cap, and the hashed-gram diversity distinct."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from zarr_datafusion_search_spark.operators.graph import (
    LPA_AUTO_FLOOR,
    _auto_degree_cap,
    _spark_round,
    label_propagation,
)


# ---------------------------------------------------------------------------
# _spark_round: numpy scalar coercion (ADVICE r07 #1)
# ---------------------------------------------------------------------------


def test_spark_round_accepts_numpy_scalars():
    # numpy>=2 reprs np.float64(0.1) as 'np.float64(0.1)', which Decimal
    # rejects; the float() coercion must make these identical to plain floats
    for x in [0.1, 0.123456789, 2.5e-7, 1.0 / 3.0]:
        assert _spark_round(np.float64(x), 6) == _spark_round(x, 6)
    assert _spark_round(np.float32(0.5), 0) == 1.0  # HALF_UP


def test_spark_round_half_up_grid():
    assert _spark_round(0.5, 0) == 1.0
    assert _spark_round(1.5, 0) == 2.0
    assert _spark_round(0.125, 2) == 0.13


# ---------------------------------------------------------------------------
# guard-argument validation (ADVICE r07 #3 + round-8 LPA symmetry)
# ---------------------------------------------------------------------------


def test_minhash_rejects_unknown_string_cap(spark):
    from zarr_datafusion_search_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_bucket_size"):
        minhash_lsh_pairs(docs, max_bucket_size="anto").collect()


def test_label_propagation_rejects_unknown_string_cap(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.9)], "doc_a long, doc_b long, jaccard double"
    )
    seeds = spark.createDataFrame([(1, "a")], "node long, label string")
    with pytest.raises(ValueError, match="degree_cap"):
        label_propagation(edges, seeds, degree_cap="atuo")


# ---------------------------------------------------------------------------
# label propagation auto degree cap
# ---------------------------------------------------------------------------


def _star_plus_chain(spark, hub_degree: int):
    """Hub node 0 connected to 1..hub_degree, plus a sparse chain of
    2-degree nodes far away — a heavy-tailed degree histogram."""
    rows = [(0, i, 1.0 - i * 1e-6) for i in range(1, hub_degree + 1)]
    base = 10_000
    for i in range(40):
        rows.append((base + i, base + i + 1, 0.5))
    return spark.createDataFrame(rows, "doc_a long, doc_b long, jaccard double")


def test_auto_degree_cap_floor_and_quantile(spark):
    # uniform sparse graph: every degree <= floor -> cap == floor
    edges = _star_plus_chain(spark, hub_degree=2)
    und = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    cap0, maxdeg0 = _auto_degree_cap(und)
    assert cap0 == LPA_AUTO_FLOOR
    # every degree is under the floor, so the caller skips the trim
    assert cap0 >= maxdeg0

    # heavy hub: p99.5 of node degrees stays at the sparse mass, so the cap
    # keeps the floor while the hub (degree 200 >> floor) gets trimmed
    heavy = _star_plus_chain(spark, hub_degree=200)
    und_h = heavy.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        heavy.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    cap, maxdeg = _auto_degree_cap(und_h)
    assert LPA_AUTO_FLOOR <= cap < 200
    assert maxdeg == 200  # the hub: cap < maxdeg -> the trim engages


def test_auto_cap_default_matches_explicit_cap(spark):
    """Above the round-11 cost gate's payoff point the default ('auto')
    run must equal an explicit run at the derived cap (the rule is a cap
    DERIVATION); below it — too few rounds to amortize the trim — auto
    must keep exact unguarded semantics. Star fixture: hub degree 200,
    cap 8, removed=192 of 480 rows -> the gate (n_rounds * removed >
    LPA_TRIM_COST_FACTOR * (heavy_rows + kept_rows), i.e. 192r > 976)
    engages at r >= 6."""
    edges = _star_plus_chain(spark, hub_degree=200)
    seeds = spark.createDataFrame(
        [(1, "a"), (10_000, "b")], "node long, label string"
    )
    und = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    cap, _maxdeg = _auto_degree_cap(und)
    auto = sorted(
        map(tuple, label_propagation(edges, seeds, n_rounds=8).collect())
    )
    explicit = sorted(
        map(
            tuple,
            label_propagation(
                edges, seeds, n_rounds=8, degree_cap=cap
            ).collect(),
        )
    )
    assert auto == explicit
    # below the gate: trim doesn't pay at 2 rounds -> unguarded semantics
    auto2 = sorted(
        map(tuple, label_propagation(edges, seeds, n_rounds=2).collect())
    )
    unguarded2 = sorted(
        map(
            tuple,
            label_propagation(
                edges, seeds, n_rounds=2, degree_cap=None
            ).collect(),
        )
    )
    assert auto2 == unguarded2


def test_auto_cap_sparse_graph_equals_unguarded(spark):
    """On a graph with every degree under the floor, auto must be a no-op:
    identical labels to degree_cap=None."""
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.5), (3, 4, 0.8)],
        "doc_a long, doc_b long, jaccard double",
    )
    seeds = spark.createDataFrame(
        [(1, "a"), (4, "b")], "node long, label string"
    )
    auto = sorted(
        map(tuple, label_propagation(edges, seeds, n_rounds=3).collect())
    )
    unguarded = sorted(
        map(
            tuple,
            label_propagation(
                edges, seeds, n_rounds=3, degree_cap=None
            ).collect(),
        )
    )
    assert auto == unguarded


# ---------------------------------------------------------------------------
# hashed-gram diversity: the xxhash64 distinct must agree with the exact
# string distinct (collision-free at test scale by construction)
# ---------------------------------------------------------------------------


def test_source_ngram_diversity_matches_string_distinct(spark):
    from zarr_datafusion_search_spark.operators.text import (
        source_ngram_diversity,
    )

    rows = [
        (1, "s1", "the quick brown fox jumps over the lazy dog"),
        (2, "s1", "the quick brown fox naps all day long today"),
        (3, "s2", "alpha beta gamma alpha beta gamma alpha beta gamma"),
        (4, "s2", "one two"),  # shorter than n -> zero grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r for r in source_ngram_diversity(docs).collect()}

    def grams(text, n=3):
        t = text.split()
        return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]

    import collections

    exp = collections.defaultdict(list)
    for _, src, text in rows:
        exp[src].extend(grams(text))
    for src, gs in exp.items():
        assert got[src].total_ngrams == len(gs)
        assert got[src].distinct_ngrams == len(set(gs))
        assert got[src].diversity == pytest.approx(
            round(len(set(gs)) / len(gs), 6)
        )
    assert "s2" in got and got["s2"].total_ngrams == 7  # short doc contributed 0


# ---------------------------------------------------------------------------
# lsh_topk small-query dispatch: both plan shapes must emit identical rows
# ---------------------------------------------------------------------------


def test_lsh_topk_small_path_equals_explode_path(spark, sf_dir, monkeypatch):
    from zarr_datafusion_search_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    small = similarity.lsh_topk(emb, queries, k=10)  # auto: small path
    monkeypatch.setattr(similarity, "LSH_SMALL_QUERY_MAX", -1)
    explode = similarity.lsh_topk(emb, queries, k=10)  # forced explode path
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, explode.collect())
    )
