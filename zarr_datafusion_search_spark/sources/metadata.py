"""Driver-side metadata row counts: plan-build sizing without Spark jobs.

Operators that pick a regime by input size (all-pairs vs bucketed near-dup,
fold vs GEMM top-k dispatch) previously ran a small Spark job at plan-build
time. Parquet footers already carry exact ``num_rows``, and Spark's file
listing is driver-side — so for a bare (possibly projected) parquet scan the
count is available with zero jobs. Anything that can change cardinality
(filter, join, limit, sample, aggregate, union) returns ``None`` and the
caller falls back to its bounded Spark-job probe.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame

#: logical-plan nodes that never change the row count of their child
_COUNT_PRESERVING_NODES = ("Project", "Relation", "LogicalRelation")


def metadata_row_count(df: DataFrame) -> int | None:
    """Exact row count from parquet footers, or ``None`` when unknowable.

    Conservative by construction: every node of the *optimized* logical plan
    must be a Project or a parquet Relation (count-preserving), the scan must
    resolve to concrete files, and every footer must be readable locally.
    Plan analysis and footer reads run entirely on the driver — no job.
    """
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        saw_relation = False
        for line in plan.splitlines():
            node = line.strip().lstrip("+-: ").strip()
            if not node:
                continue
            if node.startswith("Relation") and "parquet" in node:
                saw_relation = True
                continue
            if not node.startswith(_COUNT_PRESERVING_NODES):
                return None
        if not saw_relation:
            return None
        files = df.inputFiles()
        if not files:
            return None
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            parsed = urlparse(f)
            if parsed.scheme not in ("", "file"):
                return None  # remote footer read would need IO config
            total += pq.ParquetFile(parsed.path or f).metadata.num_rows
        return total
    except Exception:
        return None
