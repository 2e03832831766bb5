"""Scan-parallelism repair for unsplittable inputs.

Spark assigns parquet byte-range splits, but a split only produces rows if
a row-group midpoint falls inside it. A file written as ONE row group
(pyarrow's default packs up to 1M rows per group — exactly how small
export files and the test tables are laid out) therefore scans as a single
task regardless of ``spark.sql.files.maxPartitionBytes``, and every
operator fused into that scan stage — n-gram explosion, skip-gram
alignment, per-row vector folds, partial aggregation — runs on one core
while the rest of the executor idles.

Operators whose per-row compute is heavily AMPLIFYING (output or work per
input row >> 1) call :func:`ensure_scan_parallelism` on their input: if
the plan's EFFECTIVE scan parallelism is materially below the session's
core count, one round-robin exchange spreads the rows before the
expensive stage. Measured at 10x test scale, local[32]:
``source_ngram_diversity`` 28.4 s -> 1.9 s, ``skipgram_cooccurrence``
12.0 s -> 1.0 s from this single exchange.

Effective parallelism is measured in ROW GROUPS when the plan is a file
scan (``df.inputFiles()`` + parquet footers): a 1 GB single-row-group
file presents ~8 byte-splits to the scheduler, but only the split holding
the row-group midpoint emits rows, so counting scheduled splits would let
exactly the pathological inputs escape the repair. Footers are only read
when the FILE count is already below the target (a handful of opens);
a many-file table short-circuits on file count alone.

Deliberately NOT applied at the table-loader level: for plain scans and
cheap per-row work the extra shuffle costs more than it recovers
(measured +40% on the TPC-H headline set when applied blanket), and at
production scale a large table is thousands of files so the gate is a
no-op there. The operator knows its amplification factor; the loader does
not.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)


def _effective_scan_units(df: DataFrame, target: int) -> int:
    """Best-effort count of units that can actually produce rows in
    parallel. For parquet file scans this is the total row-group count
    (footers read only when the file count is below ``target``); for
    everything else, the scheduled partition count."""
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    parquet_files = [f for f in files if f.endswith(".parquet")]
    if parquet_files and len(parquet_files) == len(files):
        if len(parquet_files) >= target:
            return len(parquet_files)
        try:
            import pyarrow.parquet as pq

            total = 0
            for f in parquet_files:
                path = f[7:] if f.startswith("file://") else f
                total += pq.read_metadata(path).num_row_groups
                if total >= target:
                    break
            return total
        except Exception:
            pass
    return df.rdd.getNumPartitions()


def ensure_scan_parallelism(df: DataFrame, width: int | None = None) -> DataFrame:
    """Round-robin ``df`` across the executor IF its input can produce
    rows from materially fewer units than the session has cores — i.e.
    the input is an unsplittable or under-split file. No-op (and no
    exchange) when the scan is already parallel enough, or when
    parallelism cannot be determined.

    An EXPLICIT ``width`` is a request, not a hint: the frame comes back
    with exactly that many partitions (no gate). The no-exchange fast
    path requires the EFFECTIVE scan units (row groups, not byte-range
    splits) to already cover the width — a single-row-group file can
    present exactly ``width`` scheduled splits while still materializing
    every row in one task, which is precisely the metric failure this
    module exists to repair (ADVICE r04 #1).

    Correctness-neutral: all engine operators are value-deterministic
    under any partitioning (they hash-match a serial DuckDB oracle through
    the engine's existing shuffles), and Spark local-sorts rows before
    round-robin distribution so task retries are deterministic as well.
    """
    if width is not None:
        if width <= 0:
            raise ValueError(f"width must be positive, got {width}")
        try:
            if df.rdd.getNumPartitions() == width:
                if _effective_scan_units(df, width) >= width:
                    return df
                # _effective_scan_units inspects SOURCE row groups, which
                # stay constant through shuffles — if the plan already
                # contains a row-redistributing exchange, the rows are
                # spread regardless of the source layout and repartitioning
                # again would add a redundant shuffle on every call
                # (idempotency: f(f(df)) must equal f(df))
                plan = df._jdf.queryExecution().executedPlan().toString()
                if (
                    "Exchange RoundRobinPartitioning" in plan
                    or "Exchange hashpartitioning" in plan
                    or "Exchange rangepartitioning" in plan
                ):
                    return df
        except Exception as exc:  # fall through to the unconditional fix
            _log.warning(
                "ensure_scan_parallelism width fast-path check failed "
                "(%s: %s); repartitioning to %d",
                type(exc).__name__,
                exc,
                width,
            )
        return df.repartition(width)
    try:
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        if _effective_scan_units(df, target) * 2 <= target:
            return df.repartition(target)
    except Exception as exc:
        # a silently-skipped gate turns a performance regression into an
        # invisible no-op — make the skip diagnosable (ADVICE r04 #2)
        _log.warning(
            "ensure_scan_parallelism gate skipped (%s: %s); plan may scan "
            "serially",
            type(exc).__name__,
            exc,
        )
    return df
