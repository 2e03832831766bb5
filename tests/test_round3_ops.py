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

        terms = _skewed_terms(spark, n_tail=5000)
        summ = misra_gries_summaries(terms, capacity=16).collect()
        n_candidates = sum(1 for r in summ if r["term"] is not None)
        n_parts = terms.rdd.getNumPartitions()
        assert n_candidates <= 16 * n_parts
        # sentinels carry the exact global N
        assert sum(r["n"] for r in summ if r["term"] is None) == terms.count()


class TestSamplePerKey:
    def test_partitioning_and_k(self, spark):
        from zarr_datafusion_search_spark.operators.text import sample_per_key

        rows = [(i, f"s{i % 3}") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = sample_per_key(df.coalesce(1), key_col="source", k=5).collect()
        b = sample_per_key(df.repartition(16), key_col="source", k=5).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        per_key = {}
        for r in a:
            per_key.setdefault(r["source"], []).append(r["sample_rank"])
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_key.values())

    def test_seed_changes_sample(self, spark):
        from zarr_datafusion_search_spark.operators.text import sample_per_key

        rows = [(i, "s") for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = {r["doc_id"] for r in sample_per_key(df, "source", k=10, seed=1).collect()}
        b = {r["doc_id"] for r in sample_per_key(df, "source", k=10, seed=2).collect()}
        assert a != b


class TestScd2Lookup:
    def test_half_open_interval_edges(self, spark):
        """A fact at exactly valid_from takes the NEW state; a fact before
        the first interval gets NULL."""
        from zarr_datafusion_search_spark.operators.timeseries import (
            scd2_history,
            scd2_lookup,
        )

        ev = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 10, "bronze"),
                (1, "2024-01-05 00:00:00", 11, "gold"),
            ],
            "user_id long, ts string, event_id long, event_type string",
        ).select(
            "user_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "event_id",
            "event_type",
        )
        facts = spark.createDataFrame(
            [
                (1, "2023-12-31 23:59:59", 100),  # before any state
                (1, "2024-01-05 00:00:00", 101),  # exactly at change -> gold
                (1, "2024-01-04 23:59:59", 102),  # just before -> bronze
            ],
            "user_id long, ts string, event_id long",
        ).select(
            "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id"
        )
        out = {
            r["event_id"]: r["state_right"]
            for r in scd2_lookup(
                facts, scd2_history(ev), key="user_id", ts_col="ts"
            ).collect()
        }
        assert out == {100: None, 101: "gold", 102: "bronze"}


class TestMergeAggregates:
    def test_matches_full_recompute(self, spark):
        from zarr_datafusion_search_spark.operators.timeseries import (
            merge_aggregates,
        )

        all_rows = [(i % 7, float(i)) for i in range(100)] + [(99, 5.0)]
        df = spark.createDataFrame(all_rows, "user_id long, value double")
        base_rows = df.limit(60)
        delta = df.subtract(base_rows.limit(0)).exceptAll(base_rows)
        base = base_rows.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
        )
        merged = merge_aggregates(base, delta, key="user_id")
        full = df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.round(F.sum("value") / F.count(F.lit(1)), 6).alias("avg_value"),
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )


class TestMadOutliers:
    def test_zero_mad_guard(self, spark):
        """A majority-constant key yields NULL mad and zero outliers
        instead of a division blowup."""
        from zarr_datafusion_search_spark.operators.outliers import (
            mad_outlier_stats,
        )

        rows = [("const", 5.0)] * 20 + [("var", float(i)) for i in range(20)]
        rows += [("var", 1000.0)]  # an obvious outlier
        df = spark.createDataFrame(rows, "event_type string, value double")
        out = {r["event_type"]: r for r in mad_outlier_stats(df).collect()}
        assert out["const"]["mad"] is None
        assert out["const"]["n_outliers"] == 0
        assert out["var"]["n_outliers"] == 1


class TestItemsetPairs:
    def test_basket_cap_bounds_expansion(self, spark):
        """A pathological doc with many frequent tokens contributes at most
        cap*(cap-1)/2 pairs."""
        from zarr_datafusion_search_spark.operators.text import (
            frequent_itemset_pairs,
        )

        wide = " ".join(f"tok{i:03d}" for i in range(30))
        # every token appears in every doc -> all singletons frequent
        df = spark.createDataFrame(
            [(i, wide) for i in range(10)], "doc_id long, text string"
        )
        out = frequent_itemset_pairs(df, min_support=5, max_items_per_doc=8)
        rows = out.collect()
        # only the first 8 tokens in sort order survive the cap
        assert len(rows) == 8 * 7 // 2
        assert all(r["support"] == 10 for r in rows)
        items = {r["item_a"] for r in rows} | {r["item_b"] for r in rows}
        assert items == {f"tok{i:03d}" for i in range(8)}

    def test_apriori_pruning(self, spark):
        from zarr_datafusion_search_spark.operators.text import (
            frequent_itemset_pairs,
        )

        docs = [(i, "common rare" if i == 0 else "common other") for i in range(10)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = frequent_itemset_pairs(df, min_support=5)
        rows = [tuple(r) for r in out.collect()]
        # 'rare' (support 1) can never reach the pair stage
        assert rows == [("common", "other", 9)]


class TestCentroidDrift:
    def test_known_centroids(self, spark):
        from zarr_datafusion_search_spark.operators.similarity import (
            centroid_drift_matrix,
            group_centroids,
        )

        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0]), (1, [3.0, 0.0]),   # centroid (2, 0)
                (2, [0.0, 2.0]),                     # centroid (0, 2)
                (3, [1.0, 1.0]), (3, [3.0, 3.0]),   # centroid (2, 2)
            ],
            "label long, embedding array<double>",
        )
        cents = {
            r["label"]: (r["n_vectors"], r["centroid"])
            for r in group_centroids(df).collect()
        }
        assert cents == {1: (2, [2.0, 0.0]), 2: (1, [0.0, 2.0]), 3: (2, [2.0, 2.0])}
        drift = {
            (r["group_a"], r["group_b"]): r["cosine"]
            for r in centroid_drift_matrix(df).collect()
        }
        assert drift[(1, 2)] == 0.0
        assert abs(drift[(1, 3)] - 0.707107) < 1e-6
        assert abs(drift[(2, 3)] - 0.707107) < 1e-6


class TestZarrAppend:
    def _roundtrip(self, spark, store):
        from zarr_datafusion_search_spark.sources import zarrv3

        g = zarrv3.open_group(store)
        n = g.n_rows
        return {
            name: list(meta.read_range(0, n)) for name, meta in g.arrays.items()
        }

    def _df(self, spark, lo, hi):
        return spark.createDataFrame(
            [(i, f"s{i}", float(i) / 2) for i in range(lo, hi)],
            "id long, name string, score double",
        )

    def test_append_unaligned_boundary(self, spark, tmp_path):
        """Append across a partial final chunk: the boundary chunk is
        merged and rewritten, earlier chunk files are untouched."""
        from zarr_datafusion_search_spark.sources.zarr_sink import (
            append_zarr_distributed,
            write_zarr_distributed,
        )

        store = str(tmp_path / "a.zarr")
        assert write_zarr_distributed(self._df(spark, 0, 25), store, chunk_rows=10) == 25
        import os

        chunk0 = os.path.join(store, "id", "c", "0")
        mtime0 = os.path.getmtime(chunk0)
        assert (
            append_zarr_distributed(self._df(spark, 25, 42), store) == 42
        )
        data = self._roundtrip(spark, store)
        assert data["id"] == list(range(42))
        assert data["name"] == [f"s{i}" for i in range(42)]
        assert data["score"] == [i / 2 for i in range(42)]
        # chunks fully covered by old data were not rewritten
        assert os.path.getmtime(chunk0) == mtime0
        # chunk stats extended to the new chunk count (5 chunks of 10)
        from zarr_datafusion_search_spark.sources import zarrv3

        meta = zarrv3.open_array(store, "id")
        assert meta.n_rows == 42
        assert meta.chunk_stats is not None
        assert len(meta.chunk_stats["min"]) == 5
        assert meta.chunk_stats["min"][2] == 20  # merged boundary chunk
        assert meta.chunk_stats["max"][2] == 29

    def test_append_aligned_boundary(self, spark, tmp_path):
        from zarr_datafusion_search_spark.sources.zarr_sink import (
            append_zarr_distributed,
            write_zarr_distributed,
        )

        store = str(tmp_path / "b.zarr")
        write_zarr_distributed(self._df(spark, 0, 20), store, chunk_rows=10)
        append_zarr_distributed(self._df(spark, 20, 30), store)
        assert self._roundtrip(spark, store)["id"] == list(range(30))

    def test_append_sharded_store(self, spark, tmp_path):
        from zarr_datafusion_search_spark.sources.zarr_sink import (
            append_zarr_distributed,
            write_zarr_distributed,
        )

        store = str(tmp_path / "c.zarr")
        write_zarr_distributed(
            self._df(spark, 0, 13), store, chunk_rows=8, inner_rows=4
        )
        append_zarr_distributed(self._df(spark, 13, 29), store)
        data = self._roundtrip(spark, store)
        assert data["id"] == list(range(29))
        assert data["name"][12:15] == ["s12", "s13", "s14"]

    def test_append_schema_mismatch_rejected(self, spark, tmp_path):
        from zarr_datafusion_search_spark.sources.zarr_sink import (
            append_zarr_distributed,
            write_zarr_distributed,
        )

        store = str(tmp_path / "d.zarr")
        write_zarr_distributed(self._df(spark, 0, 5), store, chunk_rows=10)
        bad_cols = spark.createDataFrame([(1, "x")], "id long, name string")
        with pytest.raises(ValueError, match="schema mismatch"):
            append_zarr_distributed(bad_cols, store)
        bad_type = spark.createDataFrame(
            [(1, "x", 2)], "id long, name string, score long"
        )
        with pytest.raises(ValueError, match="dtype mismatch"):
            append_zarr_distributed(bad_type, store)

    def test_empty_append_is_noop(self, spark, tmp_path):
        from zarr_datafusion_search_spark.sources.zarr_sink import (
            append_zarr_distributed,
            write_zarr_distributed,
        )

        store = str(tmp_path / "e.zarr")
        write_zarr_distributed(self._df(spark, 0, 7), store, chunk_rows=10)
        assert append_zarr_distributed(self._df(spark, 0, 0), store) == 7
        assert self._roundtrip(spark, store)["id"] == list(range(7))


class TestTopkTwoPhase:
    def test_equals_one_phase_window(self, spark):
        from pyspark.sql import Window

        from zarr_datafusion_search_spark.operators.topk import topk_per_key

        rows = [(i, f"k{i % 5}", (i * 37) % 100) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, key string, score long")
        two = topk_per_key(
            df.repartition(16), "key", "score", k=7, id_col="doc_id"
        )
        w = Window.partitionBy("key").orderBy(F.col("score").desc(), "doc_id")
        one = (
            df.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 7)
        )
        assert sorted(map(tuple, two.collect())) == sorted(
            map(tuple, one.collect())
        )

    def test_partitioning_independent(self, spark):
        from zarr_datafusion_search_spark.operators.topk import topk_per_key

        rows = [(i, f"k{i % 3}", i % 11) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, key string, score long")
        a = topk_per_key(df.coalesce(1), "key", "score", k=4)
        b = topk_per_key(df.repartition(13), "key", "score", k=4)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestLabelPropagation:
    def test_spread_and_clamped_seeds(self, spark):
        from zarr_datafusion_search_spark.operators.graph import label_propagation

        # chain 1-2-3-4; seed 1='a', seed 4='b'; heavier edge wins at 2/3
        edges = spark.createDataFrame(
            [(1, 2, 0.9), (2, 3, 0.5), (3, 4, 0.8)],
            "doc_a long, doc_b long, jaccard double",
        )
        seeds = spark.createDataFrame(
            [(1, "a"), (4, "b")], "node long, label string"
        )
        out = {
            r["node"]: r["label"]
            for r in label_propagation(edges, seeds, n_rounds=3).collect()
        }
        assert out[1] == "a" and out[4] == "b"  # seeds clamped
        assert out[2] == "a"   # 0.9 from 'a' side beats 0.5 path
        assert out[3] == "b"   # 0.8 from the seed 4 side

    def test_tie_breaks_by_label(self, spark):
        from zarr_datafusion_search_spark.operators.graph import label_propagation

        edges = spark.createDataFrame(
            [(1, 3, 0.5), (2, 3, 0.5)], "doc_a long, doc_b long, jaccard double"
        )
        seeds = spark.createDataFrame(
            [(1, "zeta"), (2, "alpha")], "node long, label string"
        )
        out = {
            r["node"]: r["label"]
            for r in label_propagation(edges, seeds, n_rounds=1).collect()
        }
        assert out[3] == "alpha"


class TestTimeDecayedSum:
    def test_decay_math(self, spark):
        from zarr_datafusion_search_spark.operators.timeseries import (
            time_decayed_sum,
        )

        rows = [
            (1, 1, "2024-01-01 00:00:00", 1.0),
            (2, 1, "2024-01-08 00:00:00", 1.0),  # one half-life later
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).select(
            "event_id", "user_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"), "value",
        )
        out = {
            r["event_id"]: r["decayed_sum"]
            for r in time_decayed_sum(df, half_life_days=7.0).collect()
        }
        assert out[1] == 1.0
        assert abs(out[2] - 1.5) < 1e-6  # 1 + 1 * 2^-1


class TestZarrAppendAtomicity:
    def test_old_metadata_survives_boundary_rewrite(self, spark, tmp_path):
        """A crashed append may have already rewritten the boundary chunk
        file — but until zarr.json flips, readers of the OLD metadata get
        exactly the old rows: the merge PREPENDS the store's trailing rows
        in order, and the chunk decoder trims the payload to the metadata
        row count. Simulated by appending and then restoring the old
        zarr.json files (= the crash point after data writes, before the
        metadata commit)."""
        import json as _json
        import os

        from zarr_datafusion_search_spark.sources import zarrv3
        from zarr_datafusion_search_spark.sources.zarr_sink import (
            append_zarr_distributed,
            write_zarr_distributed,
        )

        store = str(tmp_path / "atomic.zarr")
        df1 = spark.createDataFrame(
            [(i, f"s{i}") for i in range(23)], "id long, name string"
        )
        write_zarr_distributed(df1, store, chunk_rows=10)
        old_meta = {}
        for col in ("id", "name"):
            p = os.path.join(store, col, "zarr.json")
            old_meta[col] = open(p).read()
        df2 = spark.createDataFrame(
            [(i, f"s{i}") for i in range(23, 40)], "id long, name string"
        )
        append_zarr_distributed(df2, store)
        # crash simulation: metadata never flipped
        for col, doc in old_meta.items():
            with open(os.path.join(store, col, "zarr.json"), "w") as fh:
                fh.write(doc)
        g = zarrv3.open_group(store)
        assert g.n_rows == 23
        assert list(g.arrays["id"].read_range(0, 23)) == list(range(23))
        assert list(g.arrays["name"].read_range(20, 23)) == ["s20", "s21", "s22"]
        # sanity: the flipped (new) metadata would have exposed 40 rows
        _json.loads(old_meta["id"])


def test_append_equals_full_write_property(spark, tmp_path):
    """Property: for random row counts and split points, write(a) +
    append(b) reads back identically to write(a+b)."""
    from hypothesis import given, settings, strategies as st

    from zarr_datafusion_search_spark.sources import zarrv3
    from zarr_datafusion_search_spark.sources.zarr_sink import (
        append_zarr_distributed,
        write_zarr_distributed,
    )

    counter = [0]

    @settings(max_examples=6, deadline=None)
    @given(
        total=st.integers(min_value=1, max_value=60),
        split=st.floats(min_value=0.0, max_value=1.0),
        chunk_rows=st.sampled_from([7, 16]),
    )
    def prop(total, split, chunk_rows):
        counter[0] += 1
        cut = int(total * split)
        rows = [(i, f"v{i}", float(i) * 0.5) for i in range(total)]
        schema = "id long, name string, x double"
        counter_dir = str(tmp_path / f"p{counter[0]}")
        store_a = counter_dir + "/split.zarr"
        store_f = counter_dir + "/full.zarr"
        df_all = spark.createDataFrame(rows, schema)
        write_zarr_distributed(
            df_all.filter(F.col("id") < cut), store_a, chunk_rows=chunk_rows
        )
        append_zarr_distributed(df_all.filter(F.col("id") >= cut), store_a)
        write_zarr_distributed(df_all, store_f, chunk_rows=chunk_rows)
        ga, gf = zarrv3.open_group(store_a), zarrv3.open_group(store_f)
        assert ga.n_rows == gf.n_rows == total
        for col in ("id", "name", "x"):
            assert list(ga.arrays[col].read_range(0, total)) == list(
                gf.arrays[col].read_range(0, total)
            )

    prop()


def test_topk_keeps_null_keys(spark):
    """NULL keys form their own partition in the one-phase window; the
    map-side prune must not drop them (pandas groupby dropna default)."""
    from pyspark.sql import Window

    from zarr_datafusion_search_spark.operators.topk import topk_per_key

    rows = [(1, None, 10), (2, None, 9), (3, None, 8), (4, "a", 5)]
    df = spark.createDataFrame(rows, "doc_id long, key string, score long")
    two = topk_per_key(df.repartition(4), "key", "score", k=2)
    w = Window.partitionBy("key").orderBy(F.col("score").desc(), "doc_id")
    one = (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 2)
    )
    assert sorted(map(tuple, two.collect()), key=str) == sorted(
        map(tuple, one.collect()), key=str
    )


class TestPlanShapes:
    """Physical-plan assertions for the scale claims the docstrings make."""

    @staticmethod
    def _plan(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_mg_candidate_pass_adds_no_shuffle(self, spark):
        """Pass 1 of frequent_terms is map-side only: the summaries plan
        contains exactly the Exchanges of its INPUT, none of its own."""
        from zarr_datafusion_search_spark.operators.frequent import (
            misra_gries_summaries,
        )

        terms = spark.createDataFrame(
            [("t",)] * 10, "term string"
        ).repartition(4)
        base_exchanges = self._plan(terms).count("Exchange")
        summ_exchanges = self._plan(misra_gries_summaries(terms)).count(
            "Exchange"
        )
        assert summ_exchanges == base_exchanges

    def test_frequent_terms_broadcasts_candidates(self, spark):
        """Pass 2 verifies via a broadcast LEFT SEMI join — the vocabulary
        tail must never shuffle."""
        from zarr_datafusion_search_spark.operators.frequent import (
            frequent_terms,
        )

        terms = spark.createDataFrame([("t",)] * 10, "term string")
        plan = self._plan(frequent_terms(terms, min_count=2, capacity=64))
        assert "BroadcastExchange" in plan
        assert "LeftSemi" in plan

    def test_centroid_drift_broadcasts_pairwise_side(self, spark):
        from zarr_datafusion_search_spark.operators.similarity import (
            centroid_drift_matrix,
        )

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "label long, embedding array<double>",
        )
        assert "BroadcastNestedLoopJoin" in self._plan(
            centroid_drift_matrix(emb)
        )
