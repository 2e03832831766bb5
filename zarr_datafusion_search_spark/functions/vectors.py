"""Vector math over ``array<float>`` columns, JVM-side (no Python UDFs).

Built on ``zip_with``/``aggregate`` higher-order functions so the hot path
stays inside whole-stage codegen. All arithmetic is double-precision (the
float32 inputs are upcast first) so results are reproducible against the
DuckDB oracle, which computes on ``DOUBLE[]``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(_to_double(_c(a)), _to_double(_c(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    # try_divide: cosine with a zero-norm vector is undefined -> NULL (under
    # Spark 4's default ANSI mode a plain `/` would instead fail the whole
    # job on the first zero vector)
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


#: DuckDB SQL fragments computing the same quantities on ``a``/``b`` list
#: expressions (upcast to DOUBLE[] to match the Spark path).
def duckdb_dot(a: str, b: str) -> str:
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def duckdb_cosine(a: str, b: str) -> str:
    # nullif mirrors the Spark try_divide: zero-norm vector -> NULL cosine
    return (
        f"({duckdb_dot(a, b)} / nullif("
        f"sqrt({duckdb_dot(a, a)}) * sqrt({duckdb_dot(b, b)}), 0))"
    )
