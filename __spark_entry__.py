"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``zarr_datafusion_search_spark.plans`` — one
``QuerySpec`` per capability of SURVEY.md §2, each carrying both the
PySpark plan builder and the DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from zarr_datafusion_search_spark.plans.registry import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-style 6-way join
    (fact shuffle on orderkey, all dimensions broadcast) + aggregation."""
    spec = _registry()["q5_local_supplier_volume"]
    return spec.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted entries get the
    driver's weaker rows-only check (sketches, non-SQL-expressible ops)."""
    return {
        name: spec.oracle for name, spec in _registry().items() if spec.oracle
    }
