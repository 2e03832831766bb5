"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver runs at sf0.01 (CORRECTNESS_r{N}.json)."""

import duckdb
import pytest

from zarr_datafusion_search_spark.plans.registry import TABLES, load_all
from oracle_utils import compare

REGISTRY = load_all()
ORACLED = [n for n, s in REGISTRY.items() if s.oracle]
ROWS_ONLY = [n for n, s in REGISTRY.items() if not s.oracle]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    result = compare(df, duck, spec.oracle)
    assert result["rows_match"], (
        f"{name}: rows {result['spark_rows']} vs {result['duck_rows']}"
    )
    assert result["cols_match"], (
        f"{name}: cols {result['spark_cols']} vs {result['duck_cols']}"
    )
    assert result["values_match"], f"{name}: {result.get('first_diffs')}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
