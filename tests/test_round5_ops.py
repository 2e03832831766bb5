"""Round-5 operator additions: token-window chunking, PII scan,
temperature mixture weights — semantic tests on hand-built inputs (the
registered queries carry the cross-engine oracle checks)."""

import pyspark.sql.functions as F


def test_chunk_dedup_stats_counts(spark):
    from zarr_datafusion_search_spark.operators.dedup import chunk_dedup_stats

    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, "p q r s")],
        "doc_id long, text string",
    )
    r = chunk_dedup_stats(df, window=4, stride=4).collect()[0]
    assert r.n_chunks == 3 and r.n_distinct_chunks == 2
    assert r.n_duplicated == 1 and r.max_copies == 2
    assert abs(r.dup_chunk_fraction - 2 / 3) < 1e-6
    # overlapping windows: 6 tokens at stride 2, window 4 -> 3 chunks/doc;
    # identical docs collapse to the same chunk hashes
    df2 = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string"
    )
    r2 = chunk_dedup_stats(df2, window=4, stride=2).collect()[0]
    assert r2.n_chunks == 6 and r2.n_distinct_chunks == 3
    assert r2.dup_chunk_fraction == 1.0


def test_pii_scan_counts_and_redaction(spark):
    from zarr_datafusion_search_spark.operators.governance import pii_scan

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@mail.example.org thanks"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +44 123 4567 or +1 555 0100"),
            (4, "no sensitive content here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scan(df).collect()}
    assert (got[1].n_emails, got[1].n_ipv4, got[1].n_phones) == (1, 0, 0)
    assert (got[2].n_emails, got[2].n_ipv4, got[2].n_phones) == (0, 2, 0)
    assert (got[3].n_emails, got[3].n_ipv4, got[3].n_phones) == (0, 0, 2)
    assert got[4].has_pii is False and got[1].has_pii is True
    # redaction fingerprint: two docs whose only difference is the PII
    # value must hash identically after redaction
    df2 = spark.createDataFrame(
        [(1, "mail a@b.io now"), (2, "mail c@d.org now")],
        "doc_id long, text string",
    )
    h = [r.redacted_hash for r in pii_scan(df2).collect()]
    assert h[0] == h[1]


def test_temperature_weights_limits(spark):
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        mixture_temperature_weights,
    )

    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, "src string, i long")
    # alpha=1 -> proportional
    w1 = {r.src: r for r in mixture_temperature_weights(df, "src", 1.0).collect()}
    assert abs(w1["big"].weight - 0.9) < 1e-6
    assert abs(w1["big"].sampling_factor - 1.0) < 1e-6
    # alpha=0 -> uniform
    w0 = {r.src: r for r in mixture_temperature_weights(df, "src", 0.0).collect()}
    assert abs(w0["small"].weight - 0.5) < 1e-6
    assert abs(w0["small"].sampling_factor - 5.0) < 1e-6
    # 0 < alpha < 1 -> small source strictly up-sampled, big down-sampled
    w = {r.src: r for r in mixture_temperature_weights(df, "src", 0.7).collect()}
    assert w["small"].sampling_factor > 1.0 > w["big"].sampling_factor
    assert abs(w["small"].weight + w["big"].weight - 1.0) < 2e-6


def test_label_consistency_audit(spark):
    from zarr_datafusion_search_spark.operators.text import (
        label_consistency_audit,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat is of and", "en"),      # en evidence, en label
            (2, "the cat is of and", "de"),      # en evidence, de label
            (3, "der hund ist und das", "de"),   # de evidence, de label
            (4, "some words here", "zh"),        # unsupported label
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r for r in label_consistency_audit(df).collect()}
    assert got[1].is_consistent is True and got[1].own_score == 4
    assert got[2].is_consistent is False
    assert got[2].best_other_lang == "en" and got[2].best_other_score == 4
    assert got[3].is_consistent is True
    assert got[4].label_supported is False
    assert got[4].is_consistent is None and got[4].own_score is None


def test_length_percentile_trim(spark):
    from zarr_datafusion_search_spark.operators.text import (
        length_percentile_trim,
    )

    # lengths 1..100 in one group: p5 = 5.95, p95 = 95.05 (interpolated);
    # 5 docs fall below, 5 above, keep rate 0.9
    rows = [("s", i, i) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    r = length_percentile_trim(df).collect()[0]
    assert r.n_docs == 100
    assert abs(r.p_lo - 5.95) < 1e-9 and abs(r.p_hi - 95.05) < 1e-9
    assert r.n_below == 5 and r.n_above == 5
    assert abs(r.keep_rate - 0.9) < 1e-9


def test_label_consistency_null_label(spark):
    """NULL labels are reported (label_supported false, NULL best-other),
    never dropped — and the oracle replays the same convention."""
    from zarr_datafusion_search_spark.operators.text import (
        label_consistency_audit,
    )

    df = spark.createDataFrame(
        [(1, "the cat is", "en"), (2, "the cat is", None)],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r for r in label_consistency_audit(df).collect()}
    assert got[2].label_supported is False
    assert got[2].own_score is None and got[2].is_consistent is None
    assert got[2].best_other_lang is None and got[2].best_other_score is None
    assert got[1].label_supported is True


def test_bpe_train_iterative_merges(spark):
    """Real iterative BPE on a tiny corpus: round 2 must count pairs over
    round 1's MERGED vocabulary (the 'aa' symbol exists only after merge
    1), which one-shot pair statistics cannot produce."""
    from zarr_datafusion_search_spark.operators.text import bpe_train

    # 'aaab' x3, 'ab' x2: pairs (a,a)=6, (a,b)=5 -> merge1 = a+a
    # after merge: ['aa','a','b'] x3, ['a','b'] x2 -> (aa,a)=3, (a,b)=5
    # -> merge2 = a+b; after: ['aa','a','b']? no — greedy: 'aa','a','b'
    # has (a,b) at the tail -> ['aa','ab'] x3, ['ab'] x2
    # -> merge3 = aa+ab (count 3)
    rows = [(i, "aaab aaab aaab ab ab") for i in range(1)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(df, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == [(1, "a", "a", 6), (2, "a", "b", 5), (3, "aa", "ab", 3)]
