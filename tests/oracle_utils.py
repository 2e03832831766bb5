"""Local reimplementation of the driver's Spark-vs-DuckDB comparison:
row count + column names + order-insensitive canonicalized value hash.

Canonicalization per FIXTURES.md: columns sorted by name, rows sorted,
doubles rounded to 12 significant digits, timestamps rendered as strings.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.12g}"
    if isinstance(v, Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    # materialize-then-fetch: DuckDB's streaming result path can be
    # pathologically slow for large window/join results (measured at 30x
    # scale: dedup_semantic full fetch >570 s streamed vs 8.6 s as
    # CREATE TABLE + SELECT *, identical rows). Fall back to the direct
    # cursor if materialization is impossible (e.g. duplicate column
    # names).
    try:
        con.execute(f"CREATE OR REPLACE TEMP TABLE _zdss_cmp AS ({sql})")
    except Exception:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    cur = con.execute("SELECT * FROM _zdss_cmp")
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.execute("DROP TABLE _zdss_cmp")
    return cols, rows


def compare(spark_df, duck_con, oracle_sql: str) -> dict:
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duckdb_result(duck_con, oracle_sql)
    result = {
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "values_match": False,
    }
    if result["rows_match"] and result["cols_match"]:
        s_canon = canonicalize(s_cols, s_rows)
        d_canon = canonicalize(d_cols, d_rows)
        result["values_match"] = s_canon == d_canon
        if not result["values_match"]:
            diffs = [
                (a, b) for a, b in zip(s_canon, d_canon) if a != b
            ][:3]
            result["first_diffs"] = diffs
    return result
