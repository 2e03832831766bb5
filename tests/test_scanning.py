"""Scan-parallelism repair (``operators/scanning.py``).

A single-row-group parquet file scans as one Spark task (byte-range
splits only produce rows when a row-group midpoint falls inside them), so
amplifying operators call ``ensure_scan_parallelism`` before their
expensive stage. These tests pin the gate's two sides:

* under-split input -> exactly one round-robin exchange to session width
* already-parallel input -> NO exchange added (the production-scale
  behavior: thousands of file splits must not pay a gratuitous shuffle)

and that the repaired operators keep their oracle semantics (covered
exhaustively by test_queries_oracle; one spot assertion here keeps the
wiring honest if the oracle suite set ever changes).
"""

import contextlib
import io

import pyspark.sql.functions as F

from zarr_datafusion_search_spark.operators.scanning import (
    ensure_scan_parallelism,
)
from zarr_datafusion_search_spark.plans.registry import table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_under_split_input_gets_one_exchange(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    fixed = ensure_scan_parallelism(docs)
    assert (
        fixed.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # exactly one exchange node in the executed (final) plan, and it is
    # round-robin (no partition key); AQE's dump repeats the exchange in
    # the "Initial Plan" section, so scope to the final tree
    import re

    plan = _plan(fixed)
    final = plan.split("== Initial Plan ==")[0]
    node_ids = set(re.findall(r"Exchange \((\d+)\)", final))
    assert len(node_ids) == 1, plan
    assert "RoundRobinPartitioning" in plan, plan


def test_parallel_input_is_left_alone(spark):
    wide = spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
    out = ensure_scan_parallelism(wide)
    assert out is wide  # identity: not even a new plan node


def test_explicit_width_override(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    assert ensure_scan_parallelism(docs, width=7).rdd.getNumPartitions() == 7


def test_repaired_operator_matches_unrepaired_semantics(
    spark, sf_dir, monkeypatch
):
    """Round-robin placement must not change operator output. The serial
    reference leg BYPASSES the in-operator gate (monkeypatched to
    identity) — without that, coalesce(1) input would be re-repaired by
    the operator itself and the test would compare the repaired plan to
    itself."""
    from zarr_datafusion_search_spark.operators import scanning
    from zarr_datafusion_search_spark.operators.text import (
        source_ngram_diversity,
    )

    docs = table(spark, sf_dir, "documents")
    repaired = {
        tuple(r)
        for r in source_ngram_diversity(docs).collect()
    }
    monkeypatch.setattr(
        scanning, "ensure_scan_parallelism", lambda df, width=None: df
    )
    serial = {
        tuple(r)
        for r in source_ngram_diversity(docs.coalesce(1)).collect()
    }
    assert repaired == serial and repaired
