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


def test_global_cumsum_no_global_window(spark):
    """The plan must not contain a partition-less Window (single task)."""
    from zarr_datafusion_search_spark.operators.packing import global_cumsum

    df = spark.range(100).select("id", (F.col("id") % 3).alias("v"))
    plan = _plan(global_cumsum(df, "id", ["v"]))
    assert "Window" not in plan


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
