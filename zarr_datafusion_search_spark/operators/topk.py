"""Per-key top-k with map-side pruning (two-phase).

The plain window top-k (``row_number() OVER (PARTITION BY key ORDER BY
...) <= k``) shuffles EVERY row to its key's reducer and discards all but
k there. Spark's TakeOrderedAndProject does partial top-k map-side — but
only for a GLOBAL top-k, not per key. This operator generalizes the
trick: each task prunes its partition to at most k rows per key
(pandas sort + groupby-head, re-pruned incrementally so state stays at
k x |keys-in-partition| rows), and only that superset shuffles to the
final window. Shuffle volume drops from |rows| to at most
k x |keys| x |partitions| — the difference between moving a corpus and
moving a leaderboard at 100 TB.

Correctness: a row in the global per-key top-k is in its own partition's
per-key top-k (pruning only removes rows dominated by k same-key rows in
the same partition, which also dominate globally), so phase 2 sees every
winner; the final window re-ranks with the identical total order, making
the result partitioning-independent and equal to the one-phase window —
which is exactly what the DuckDB oracle computes.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def topk_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int = 5,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Top ``k`` rows per key by (``order_col`` DESC, ``id_col`` ASC),
    with the rank in ``rank_col``."""
    import pandas as pd

    cols = df.columns

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: pd.DataFrame | None = None
        for pdf in batches:
            merged = pdf if state is None else pd.concat([state, pdf])
            state = (
                merged.sort_values(
                    [order_col, id_col], ascending=[False, True]
                )
                # dropna=False: the one-phase window ranks NULL keys as
                # their own partition; pandas' default would silently drop
                # NaN-key rows map-side and break the equivalence
                .groupby(key_col, sort=False, dropna=False)
                .head(k)
            )
        if state is not None and len(state):
            yield state

    pruned = df.mapInPandas(prune, df.schema)
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        pruned.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
        .select(*cols, rank_col)
    )
