"""Unit tests for the round-3 second-batch operators (heavy hitters,
per-key sampling, SCD2 lookup, outliers, BPE stats, incremental aggs,
hashed-feature classifier). The registered queries are additionally
oracle-checked end-to-end in test_queries_oracle.py; these tests target
the operator-level guarantees (bounded memory, exactness under skew,
partitioning independence)."""

import pyspark.sql.functions as F
import pytest

from zarr_datafusion_search_spark.operators.cache import release_operator_caches


@pytest.fixture(autouse=True)
def _release_caches():
    yield
    release_operator_caches()


def _skewed_terms(spark, n_tail=2000, hot=("alpha", 300, "beta", 150)):
    """Long-tail stream: n_tail singletons + a few hot terms."""
    rows = [(f"tail_{i}",) for i in range(n_tail)]
    for t, c in zip(hot[::2], hot[1::2]):
        rows += [(t,)] * c
    return spark.createDataFrame(rows, "term string").repartition(8)


class TestFrequentTerms:
    def test_exact_under_small_capacity(self, spark):
        """capacity << vocabulary: the MG prune path runs, and the output
        still equals the exact GROUP BY / HAVING answer for every term
        above the guarantee floor."""
        from zarr_datafusion_search_spark.operators.frequent import frequent_terms

        terms = _skewed_terms(spark)
        # N = 2450, capacity 63 -> guarantee floor = floor(2450/64)+1 = 39
        out = {
            r["term"]: r["cnt"]
            for r in frequent_terms(
                terms, min_count=100, capacity=63
            ).collect()
        }
        assert out == {"alpha": 300, "beta": 150}

    def test_guarantee_floor_raises_threshold(self, spark):
        """min_count below the MG floor: the operator raises the bar to
        the floor rather than returning a provably-incomplete answer."""
        from zarr_datafusion_search_spark.operators.frequent import frequent_terms

        terms = _skewed_terms(spark)
        # capacity 9 -> floor = floor(2450/10)+1 = 246 > min_count=100
        out = {
            r["term"]: r["cnt"]
            for r in frequent_terms(terms, min_count=100, capacity=9).collect()
        }
        assert out == {"alpha": 300}

    def test_partitioning_independent(self, spark):
        from zarr_datafusion_search_spark.operators.frequent import frequent_terms

        base = _skewed_terms(spark, n_tail=500)
        a = frequent_terms(base.coalesce(1), min_count=50, capacity=127)
        b = frequent_terms(base.repartition(16), min_count=50, capacity=127)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_summary_memory_bounded(self, spark):
        """Every partition summary retains at most `capacity` candidates."""
        from zarr_datafusion_search_spark.operators.frequent import (
            misra_gries_summaries,
        )

        terms = _skewedterms = _skewed_terms(spark, n_tail=5000)
        summ = misra_gries_summaries(terms, capacity=16).collect()
        n_candidates = sum(1 for r in summ if r["term"] is not None)
        n_parts = terms.rdd.getNumPartitions()
        assert n_candidates <= 16 * n_parts
        # sentinels carry the exact global N
        assert sum(r["n"] for r in summ if r["term"] is None) == terms.count()
