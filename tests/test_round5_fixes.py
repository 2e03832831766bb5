"""Round-5 verdict fixes (VERDICT r04 "Next round" asks #1-#5):

1. the layout audits' single-task global ``ntile`` windows are replaced by
   the two-phase distributed prefix-rank — plan tests assert NO WindowExec
   remains anywhere in either physical plan;
2. ``q4_order_priority`` and ``anti_join`` are de-vacuated — both return
   rows at every shipped SF, so their driver rows verify values;
3. the MinHash degenerate-bucket guard is registered and exercised — the
   guarded pair set is a strict subset of the unguarded one at sf0.001.
"""

import pyspark.sql.functions as F

from zarr_datafusion_search_spark.plans.registry import load_all

REGISTRY = load_all()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_layout_audits_have_no_window_exec(spark, sf_dir):
    """The round-4 verdict's one remaining scale-killer class: a
    non-partitioned window (ntile/row_number with no PARTITION BY) runs on
    ONE task. After the prefix-rank rewrite neither audit may contain ANY
    WindowExec — the rank comes from a range exchange + mapInPandas."""
    for name in ("zorder_locality_audit", "zone_map_skipping_audit"):
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = _executed_plan(df)
        assert "Window" not in plan, f"{name} still has a window:\n{plan}"


def test_distributed_rank_matches_global_order(spark):
    """Rank must equal row_number over the global ordering, regardless of
    input partitioning; bucketing must give near-equal file sizes."""
    from zarr_datafusion_search_spark.operators.packing import (
        distributed_rank,
    )

    df = (
        spark.range(1000)
        .select(
            (F.col("id") * 7919 % 1000).alias("k"), F.col("id").alias("tid")
        )
        .repartition(13)
    )
    ranked, total = distributed_rank(df, ["k", "tid"])
    assert total == 1000
    rows = ranked.orderBy("k", "tid").collect()
    assert [r._grank for r in rows] == list(range(1, 1001))
    # k = id*7919 mod 1000 is a bijection, so rank-1 == k for every row
    assert all(r._grank == r.k + 1 for r in rows)


def test_distributed_rank_empty_input(spark):
    from zarr_datafusion_search_spark.operators.packing import (
        distributed_rank,
    )

    df = spark.range(0).select(F.col("id").alias("k"))
    ranked, total = distributed_rank(df, ["k"])
    assert total == 0
    assert ranked.count() == 0


def test_q4_and_anti_join_not_vacuous(spark, sf_dir):
    """VERDICT r04 'What's wrong' #2: both queries returned 0 rows at
    every shipped SF, so their green driver rows verified schema only."""
    assert REGISTRY["q4_order_priority"].spark(spark, sf_dir).count() > 0
    assert REGISTRY["anti_join"].spark(spark, sf_dir).count() > 0


def test_minhash_guard_trims_pairs(spark, sf_dir):
    """The guarded pair set must be a strict subset of the unguarded one
    at the test SF (cap 2 trims 16 degenerate buckets at sf0.001) — the
    guard is exercised, not dark; pairs it keeps are identical."""
    unguarded = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_minhash_lsh"].spark(spark, sf_dir).collect()
    }
    guarded = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_minhash_lsh_guarded"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(guarded) < set(unguarded)
    assert len(guarded) > 0
    for k, v in guarded.items():
        assert unguarded[k] == v


def test_explicit_width_idempotent(spark, sf_dir):
    """f(f(df)) == f(df): a frame already round-robined to the requested
    width must come back without another exchange, even though its SOURCE
    is still a single-row-group parquet file (ADVICE r04 #1 follow-up)."""
    from zarr_datafusion_search_spark.operators.scanning import (
        ensure_scan_parallelism,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    once = ensure_scan_parallelism(docs, width=7)
    assert once.rdd.getNumPartitions() == 7
    twice = ensure_scan_parallelism(once, width=7)
    assert twice is once


def test_distributed_rank_rejects_column_clash(spark):
    import pytest
    import pyspark.sql.functions as F
    from zarr_datafusion_search_spark.operators.packing import (
        distributed_rank,
    )

    df = spark.range(4).select(F.col("id"), F.lit(1).alias("_pid"))
    with pytest.raises(ValueError, match="_pid"):
        distributed_rank(df, ["id"])
