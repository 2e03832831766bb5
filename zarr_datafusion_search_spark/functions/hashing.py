"""Deterministic, engine-portable 60-bit hashing.

MinHash / SimHash / LSH need hash functions that the DuckDB oracle can
reproduce exactly. Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()``
are different algorithms, so we build hashes from md5 hex digests, which both
engines expose identically:

- Spark:  ``conv(substr(md5(x), 2, 15), 16, 10)`` cast to BIGINT
- DuckDB: ``('0x' || substr(md5(x), 2, 15))::BIGINT``

15 hex digits = 60 bits, always non-negative, well inside BIGINT range.
Seeded families come from prefixing the payload: ``md5(i || ':' || x)``.
This is the slow-but-portable choice for the correctness gate; a
production-only pipeline would use ``xxhash64`` (cheaper, JVM-side).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

H64_BITS = 60
H64_MAX = (1 << 60) - 1


def h64(col: Column | str) -> Column:
    """60-bit non-negative hash of a string column (portable to DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 2, 15), 16, 10).cast("long")


def h64_seeded(col: Column | str, seed: Column | int) -> Column:
    """Seeded member of the hash family: h_i(x) = h64(i || ':' || x)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(seed) if isinstance(seed, int) else seed
    return h64(F.concat(s.cast("string"), F.lit(":"), c))


def duckdb_h64(expr: str) -> str:
    """DuckDB SQL text computing the same hash as :func:`h64`."""
    return f"('0x' || substr(md5({expr}), 2, 15))::BIGINT"


def duckdb_h64_seeded(expr: str, seed_expr: str) -> str:
    """DuckDB SQL text matching :func:`h64_seeded`."""
    return duckdb_h64(f"{seed_expr}::VARCHAR || ':' || {expr}")
