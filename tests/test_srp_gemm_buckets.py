"""The GEMM pandas_udf SRP bucketing (similarity._srp_buckets_udf) must
produce the same bucket ids as the SQL-expression fold path
(similarity.srp_bucket) it replaced in the hot paths (round 7).

Sign decisions are reorder-tolerant by construction (the DuckDB oracle
already derives them via list_dot_product, its own summation order), but
on CONCRETE data the two paths must agree bit-for-bit for the swap to be
a pure plan change — this pins that on the shipped fixtures and on
synthetic float32 vectors.
"""

import math

import pyspark.sql.functions as F

from zarr_datafusion_search_spark.operators import similarity
from zarr_datafusion_search_spark.plans.registry import table


def _bucket_frames(df, all_planes, vec_col="embedding"):
    n_tables = len(all_planes)
    sql_path = df.select(
        "vec_id",
        *[
            similarity.srp_bucket(vec_col, all_planes[t]).alias(f"b{t}")
            for t in range(n_tables)
        ],
    )
    bk = similarity._srp_buckets_udf(all_planes)
    gemm_path = df.select("vec_id", bk(F.col(vec_col)).alias("_bs")).select(
        "vec_id", *[F.col("_bs")[t].alias(f"b{t}") for t in range(n_tables)]
    )
    return sql_path, gemm_path


def _assert_identical(sql_path, gemm_path):
    a = {r["vec_id"]: tuple(r[i] for i in range(1, len(r))) for r in sql_path.collect()}
    b = {r["vec_id"]: tuple(r[i] for i in range(1, len(r))) for r in gemm_path.collect()}
    assert a == b


def test_gemm_buckets_match_sql_fold_on_fixture(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    all_planes = [
        [similarity._hyperplane(64, t * 4 + p) for p in range(4)] for t in range(4)
    ]
    _assert_identical(*_bucket_frames(emb, all_planes))


def test_gemm_buckets_match_sql_fold_synthetic(spark):
    # float32 inputs incl. zero and near-boundary vectors at a small dim
    rows = []
    for i in range(200):
        vec = [math.sin(i * 13 + j) * (1.0 if i % 3 else 1e-6) for j in range(8)]
        rows.append((i, vec))
    rows.append((1000, [0.0] * 8))  # zero vector: every dot == 0 -> bit set
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    all_planes = [
        [similarity._hyperplane(8, t * 2 + p) for p in range(2)] for t in range(3)
    ]
    _assert_identical(*_bucket_frames(df, all_planes))


def test_lsh_topk_unchanged_by_gemm_swap(spark, sf_dir):
    """End-to-end pin: lsh_topk's full output on the fixture corpus —
    the score-before-dedup reorder and the GEMM buckets are both
    value-identical plan changes."""
    emb = table(spark, sf_dir, "embeddings")
    out = similarity.lsh_topk(emb, emb.filter(F.col("vec_id") < 8), k=10)
    rows = out.collect()
    assert len(rows) > 0
    # every (query, rank) unique, ranks contiguous from 1 per query
    seen = {}
    for r in rows:
        seen.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in seen.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
