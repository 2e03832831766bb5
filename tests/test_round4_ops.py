"""Round-4 operator unit tests: hand-computable fixtures for the graph
structure diagnostics, prefix-sum vocabulary curve, rolling z-score, KL
drift factorization, and the Gram-partial covariance — plus plan-shape
guards for the scale claims their docstrings make."""

import contextlib
import io

import pyspark.sql.functions as F
import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_triangle_clustering_known_graph(spark):
    """K4 minus one edge: nodes 1-2-3 form a triangle, 4 connects to 2,3.
    Triangles: (1,2,3) and (2,3,4). Degrees: 1->2, 2->3, 3->3, 4->2."""
    from zarr_datafusion_search_spark.operators.graph import (
        triangle_clustering,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (2, 1)],  # dup reversed
        "doc_a long, doc_b long",
    )
    rows = {r.node: r for r in triangle_clustering(edges).collect()}
    assert {n: r.degree for n, r in rows.items()} == {1: 2, 2: 3, 3: 3, 4: 2}
    assert {n: r.triangles for n, r in rows.items()} == {1: 1, 2: 2, 3: 2, 4: 1}
    assert rows[1].clustering == 1.0  # 2*1/(2*1)
    assert rows[2].clustering == pytest.approx(2 * 2 / 6, abs=1e-6)
    assert rows[4].clustering == 1.0


def test_triangle_clustering_no_triangles(spark):
    from zarr_datafusion_search_spark.operators.graph import (
        triangle_clustering,
    )

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    rows = triangle_clustering(path).collect()
    assert all(r.triangles == 0 and r.clustering == 0.0 for r in rows)


def test_neighborhood_mean_2hop_path(spark):
    """Path 1-2-3: 2-hop of 1 is {3}, of 2 is {} (only self via wedges),
    of 3 is {1}."""
    from zarr_datafusion_search_spark.operators.graph import (
        neighborhood_mean_2hop,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    attrs = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 40)], "doc_id long, n_chars long"
    )
    rows = {r.doc_id: r for r in neighborhood_mean_2hop(edges, attrs).collect()}
    assert rows[1].n_1hop == 1 and rows[1].mean_1hop == 20.0
    assert rows[1].n_2hop == 1 and rows[1].mean_2hop == 40.0
    assert rows[2].n_1hop == 2 and rows[2].mean_1hop == 25.0
    assert rows[2].n_2hop == 0 and rows[2].mean_2hop is None
    assert rows[3].n_2hop == 1 and rows[3].mean_2hop == 10.0


def test_global_cumsum_matches_window(spark):
    """The two-phase prefix sum equals the single-task window cumsum, for
    any partitioning of the input."""
    from pyspark.sql import Window

    from zarr_datafusion_search_spark.operators.packing import global_cumsum

    df = (
        spark.range(0, 500, 1, 7)
        .select(
            F.col("id"),
            (F.col("id") % 13).alias("a"),
            (F.col("id") % 7).alias("b"),
        )
        .repartition(5)  # scramble away from id order
    )
    got = {
        r.id: (r.cum_a, r.cum_b)
        for r in global_cumsum(df, "id", ["a", "b"]).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: (r.ca, r.cb)
        for r in df.select(
            "id",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        ).collect()
    }
    assert got == want


def test_global_cumsum_no_global_window_over_data(spark):
    """Every window over DATA rows must be partitioned (by pid); the only
    partition-less window allowed is the exclusive-prefix one over the
    partition-TOTALS relation (rows = partition count), recognizable
    because it orders by pid rather than by the data order column."""
    import re

    from zarr_datafusion_search_spark.operators.packing import global_cumsum

    df = spark.range(100).select("id", (F.col("id") % 3).alias("v"))
    plan = _plan(global_cumsum(df, "id", ["v"]))
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs, "expected window-based two-phase cumsum"
    for spec in specs:
        first = spec.split(",")[0].strip()
        if first.startswith("pid#"):
            continue  # partitioned data window OR tiny pid-ordered totals
        assert not first.startswith("id#"), (
            f"partition-less window over data order column: {spec}"
        )


def test_rolling_zscore_hand_case(spark):
    """19 values of alternating 9/11 history then a large spike: the spike
    is flagged with the exact z; the stable rows are not."""
    import datetime

    from zarr_datafusion_search_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    t0 = datetime.datetime(2024, 1, 1)
    vals = [9.0, 11.0] * 5 + [100.0]
    rows = [
        (i, 1, t0 + datetime.timedelta(minutes=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = rolling_zscore_anomalies(df, threshold=3.0).collect()
    assert len(out) == 1 and out[0].event_id == 10
    import statistics

    hist = vals[:10]
    z = (100.0 - statistics.mean(hist)) / statistics.stdev(hist)
    assert out[0].zscore == pytest.approx(round(z, 6))


def test_source_term_kl_zero_for_identical_distribution(spark):
    """Two sources with IDENTICAL token streams: both KL divergences are
    equal and near zero (exactly equal smoothed distributions differ from
    the corpus only via the n_g != n smoothing denominators)."""
    from zarr_datafusion_search_spark.operators.text import source_term_kl

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "a b c", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in source_term_kl(docs).collect()}
    assert rows["s1"].kl_divergence == rows["s2"].kl_divergence
    assert abs(rows["s1"].kl_divergence) < 0.05
    assert rows["s1"].n_tokens == 3 and rows["s1"].n_terms == 3


def test_source_term_kl_detects_drift(spark):
    """A source using disjoint vocabulary diverges more than one matching
    the corpus."""
    from zarr_datafusion_search_spark.operators.text import source_term_kl

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c", "normal"),
            (2, "a b c a b c", "normal2"),
            (3, "x y z w q r", "weird"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r.kl_divergence for r in source_term_kl(docs).collect()}
    assert rows["weird"] > rows["normal"]


def test_covariance_top_pairs_known(spark):
    """3-dim vectors where dim0 == dim1 exactly and dim2 is constant:
    top pair must be (0, 1) with cov == var(dim0); pairs with the
    constant dim have cov 0."""
    from zarr_datafusion_search_spark.operators.similarity import (
        covariance_top_pairs,
    )

    rows = [(i, [float(i), float(i), 5.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = covariance_top_pairs(df, dim=3, top_k=3).collect()
    assert (out[0].i, out[0].j) == (0, 1)
    # population variance of 0..7
    import statistics

    var = statistics.pvariance(range(8))
    assert out[0].cov == pytest.approx(var, abs=1e-6)
    assert {(r.i, r.j) for r in out[1:]} == {(0, 2), (1, 2)}
    assert all(abs(r.cov) < 1e-9 for r in out[1:])


def test_covariance_no_vector_shuffle(spark):
    """The Gram accumulation must aggregate AFTER mapInPandas partials —
    the exchange moves d^2 partials, never exploded vector elements. The
    plan therefore has no join/exchange between the scan and the Python
    stage."""
    from zarr_datafusion_search_spark.operators.similarity import (
        covariance_top_pairs,
    )

    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    plan = _plan(covariance_top_pairs(df, dim=4))
    py_stages = [
        i for i, l in enumerate(plan.splitlines()) if "MapInPandas" in l
    ]
    assert py_stages, plan[:600]


# ---------------------------------------------------------------------------
# batch 2: leakage-safe split, crosslingual mining, span corruption,
# n-gram diversity
# ---------------------------------------------------------------------------


def test_leakage_safe_split_clusters_stay_together(spark):
    from zarr_datafusion_search_spark.operators.components import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in leakage_safe_split(docs, pairs).collect()}
    assert len(rows) == 7
    # cluster {1,2,3}: one representative (min id), one split
    assert {rows[i].representative for i in (1, 2, 3)} == {1}
    assert len({rows[i].split for i in (1, 2, 3)}) == 1
    assert {rows[i].representative for i in (5, 6)} == {5}
    assert len({rows[i].split for i in (5, 6)}) == 1
    # unclustered docs represent themselves
    assert rows[4].representative == 4 and rows[7].representative == 7
    assert all(r.split in ("train", "val", "test") for r in rows.values())


def test_crosslingual_candidates_hand_fixture(spark):
    from zarr_datafusion_search_spark.operators.text import (
        crosslingual_align_candidates,
    )

    docs = spark.createDataFrame(
        [
            (1, "alice zurich 42 connects the dots", "en"),
            (2, "alice zurich 42 connects der punkt", "de"),
            (3, "alice zurich 42 connects more text", "en"),  # same lang as 1
            (4, "common words only here now", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = crosslingual_align_candidates(docs, n=3, max_df=3, min_shared=2)
    rows = sorted(
        (r.doc_a, r.doc_b, r.n_shared) for r in out.collect()
    )
    # docs 1 and 2 share the rare trigrams 'alice zurich 42' and
    # 'zurich 42 connects' across languages; 2-3 likewise (de/en);
    # 1-3 is same-language and excluded regardless of overlap
    assert rows == [(1, 2, 2), (2, 3, 2)]


def test_span_corruption_reconstructs(spark):
    from zarr_datafusion_search_spark.operators.text import (
        span_corruption_pairs,
    )

    text = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(7, text), (8, "too short")], "doc_id long, text string"
    )
    out = span_corruption_pairs(docs, span_len=5).collect()
    assert len(out) == 1  # the 2-token doc is excluded
    r = out[0]
    toks = text.split()
    s = r.span_start
    assert 0 <= s <= len(toks) - 5
    assert r.target_text == " ".join(toks[s : s + 5])
    rebuilt = r.input_text.replace("<extra_id_0>", r.target_text)
    assert rebuilt.split() == toks


def test_source_ngram_diversity_hand_counts(spark):
    from zarr_datafusion_search_spark.operators.text import (
        source_ngram_diversity,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c", "rep"),  # 7 trigrams, 3 distinct
            (2, "x y z w", "var"),  # 2 trigrams, 2 distinct
            (3, "q r", "tiny"),  # < 3 tokens: no trigrams
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in source_ngram_diversity(docs).collect()}
    assert rows["rep"].total_ngrams == 7
    assert rows["rep"].distinct_ngrams == 3
    assert rows["rep"].diversity == pytest.approx(round(3 / 7, 6))
    assert rows["var"].diversity == 1.0
    assert "tiny" not in rows


# ---------------------------------------------------------------------------
# batch 3: quantile sketch, char entropy, edit-distance verify
# ---------------------------------------------------------------------------


def test_quantile_sketch_close_to_exact(spark):
    """On a uniform ramp the sketch must land within one bin width of the
    exact percentile."""
    from zarr_datafusion_search_spark.operators.outliers import (
        quantile_sketch,
    )

    df = spark.range(0, 10_000).select(F.col("id").cast("double").alias("value"))
    got = {r.quantile: r.estimate for r in quantile_sketch(df).collect()}
    bin_width = 9999 / 256
    for q in (0.5, 0.9, 0.99):
        assert abs(got[q] - q * 9999) <= bin_width + 1e-6, (q, got[q])


def test_quantile_sketch_is_mapside_combinable(spark):
    """Result is independent of input partitioning (the mergeability
    property the sketch exists for)."""
    from zarr_datafusion_search_spark.operators.outliers import (
        quantile_sketch,
    )

    base = spark.range(0, 5000).select(
        ((F.col("id") * 37) % 1000).cast("double").alias("value")
    )
    a = {r.quantile: r.estimate for r in quantile_sketch(base.coalesce(1)).collect()}
    b = {r.quantile: r.estimate for r in quantile_sketch(base.repartition(16)).collect()}
    assert a == b


def test_char_entropy_known_values(spark):
    import math

    from zarr_datafusion_search_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),          # one symbol: 0 bits
            (2, "abab"),          # two equiprobable: 1 bit
            (3, "abcd"),          # four equiprobable: 2 bits
            (4, "aab"),           # H = -(2/3 log 2/3 + 1/3 log 1/3)
            (5, ""),              # empty: defined as 0
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert rows[1].entropy_bits == 0.0
    assert rows[2].entropy_bits == 1.0
    assert rows[3].entropy_bits == 2.0
    h = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert rows[4].entropy_bits == pytest.approx(round(h, 6), abs=1e-6)
    assert rows[5].entropy_bits == 0.0 and rows[5].n_chars_text == 0


def test_editdist_verify_flags_false_positives(spark):
    from zarr_datafusion_search_spark.operators.text import (
        neardup_editdist_verify,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumped"),   # near-identical
            (3, "fox brown jumps quick the"),    # same bag, shuffled
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    rows = {(r.doc_a, r.doc_b): r for r in neardup_editdist_verify(pairs, docs).collect()}
    assert rows[(1, 2)].verified is True
    assert rows[(1, 2)].edit_distance <= 2
    assert rows[(1, 3)].verified is False  # large edit distance, same bag


# ---------------------------------------------------------------------------
# batch 4: vocab similarity, event paths, duplication matrix, dormancy
# ---------------------------------------------------------------------------


def test_source_vocab_similarity_orders_sources(spark):
    """A source sharing vocabulary with another scores higher than a
    disjoint one; identical corpora score ~1."""
    from zarr_datafusion_search_spark.operators.text import (
        source_vocab_similarity,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "s1"),
            (2, "alpha beta gamma", "s2"),
            (3, "delta epsilon zeta", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r.group_a, r.group_b): r.cosine
        for r in source_vocab_similarity(docs).collect()
    }
    assert rows[("s1", "s2")] == pytest.approx(1.0, abs=1e-6)
    assert ("s1", "s3") not in rows or rows[("s1", "s3")] == 0.0
    # disjoint vocab pairs share no term: no dot-product row at all
    assert ("s2", "s3") not in rows


def test_frequent_event_paths_counts(spark):
    import datetime

    from zarr_datafusion_search_spark.operators.sessions import (
        frequent_event_paths,
    )

    t0 = datetime.datetime(2024, 1, 1)
    seq = ["view", "cart", "buy", "view", "cart", "abandon"]
    rows = [
        (i, 1, t0 + datetime.timedelta(minutes=i), s)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r.path: r.n_paths for r in frequent_event_paths(df).collect()}
    # windows: view,cart,buy / cart,buy,view / buy,view,cart / view,cart,abandon
    assert got["view > cart > buy"] == 1
    assert got["view > cart > abandon"] == 1
    assert sum(got.values()) == 4


def test_cross_source_duplication_matrix(spark):
    from zarr_datafusion_search_spark.operators.dedup import (
        cross_source_duplication_matrix,
    )

    docs = spark.createDataFrame(
        [(1, "sA"), (2, "sB"), (3, "sA"), (4, "sA")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    rows = {
        (r.source_a, r.source_b): r.n_pairs
        for r in cross_source_duplication_matrix(pairs, docs).collect()
    }
    assert rows[("sA", "sB")] == 2  # (1,2) and (2,3)
    assert rows[("sA", "sA")] == 2  # (1,3) and (1,4)


def test_max_inactivity_gaps(spark):
    import datetime

    from zarr_datafusion_search_spark.operators.sessions import (
        max_inactivity_gaps,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + datetime.timedelta(days=10)),  # 10-day gap -> dormant
        (3, 1, t0 + datetime.timedelta(days=10, hours=1)),
        (4, 2, t0),
        (5, 2, t0 + datetime.timedelta(hours=2)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {r.user_id: r for r in max_inactivity_gaps(df).collect()}
    assert got[1].is_dormant and got[1].max_gap_days == 10.0
    assert got[1].n_gaps == 2
    assert not got[2].is_dormant
    assert got[2].max_gap_days == pytest.approx(round(2 / 24, 6))


# ---------------------------------------------------------------------------
# batch 5: data layout — partition pruning, schema evolution
# ---------------------------------------------------------------------------


def test_partitioned_read_shows_partition_filters(spark, sf_dir):
    """The pruned read's scan must carry the event_type equality as a
    PartitionFilter (directory-level pruning), not a data filter."""
    from zarr_datafusion_search_spark.plans.registry import load_all

    reg = load_all()
    df = reg["partitioned_dataset_prune"].spark(spark, sf_dir)
    plan = _plan(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("event_type" in l for l in pf), plan[:1200]


def test_schema_evolution_null_semantics(spark, sf_dir):
    """Generation-1 rows (no quality_tier column on disk) must read as
    NULL, generation-2 rows keep their value."""
    from zarr_datafusion_search_spark.operators.layout import (
        read_evolved_docs,
    )

    df = read_evolved_docs(spark, sf_dir)
    rows = df.collect()
    assert all(
        (r.quality_tier is None) == (r.doc_id % 2 == 0) for r in rows
    )
    assert {r.quality_tier for r in rows if r.doc_id % 2 == 1} <= {
        "long",
        "short",
    }
