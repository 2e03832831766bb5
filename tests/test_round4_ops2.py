"""Round-4 batch-6/7 tests: z-order interleave bit correctness and file
locality, compaction stride invariants, dynamic-partition-pruning plan
shape, Bloom filter no-false-negative guarantee, count-min lower-bound
invariant, and the evaluation metrics on hand-computable fixtures."""

import contextlib
import io

import pyspark.sql.functions as F
import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# z-order
# ---------------------------------------------------------------------------


def test_zorder_key_bit_interleave(spark):
    """Hand-checked Morton codes: bit i of a -> 2i, bit i of b -> 2i+1."""
    from zarr_datafusion_search_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (15, 15), (15, 0), (0, 15)],
        "a long, b long",
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15  # 0b1111
    assert got[(15, 15)] == 255
    assert got[(15, 0)] == 0b01010101
    assert got[(0, 15)] == 0b10101010


def test_zorder_sql_matches_column(spark):
    """The oracle-side SQL string computes the identical key."""
    from zarr_datafusion_search_spark.operators.layout import (
        zorder_key,
        zorder_sql,
    )

    df = spark.range(256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("long").alias("b")
    )
    mism = (
        df.select(
            zorder_key(F.col("a"), F.col("b")).alias("zc"),
            F.expr(zorder_sql("a", "b")).alias("zs"),
        )
        .filter(F.col("zc") != F.col("zs"))
        .count()
    )
    assert mism == 0


def test_zorder_files_bound_both_dims(spark):
    """On a full 16x16 grid, z-order files must bound BOTH dimensions:
    every 16-row file of a 256-cell grid is one 4x4 quadrant (span 4),
    where a row-major sort would give a_span 16 for every file."""
    from zarr_datafusion_search_spark.operators.layout import (
        zorder_locality_audit,
    )

    grid = spark.range(256).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 16).alias("a"),
        (F.col("id") / 16).cast("long").alias("b"),
    )
    rows = zorder_locality_audit(
        grid, "a", "b", n_files=16, order_col="event_id"
    ).collect()
    assert len(rows) == 16
    assert all(r.n_rows == 16 for r in rows)
    assert all(r.a_span == 4 and r.b_span == 4 for r in rows)


# ---------------------------------------------------------------------------
# compaction planner
# ---------------------------------------------------------------------------


def test_compaction_stride_invariants(spark):
    """Byte conservation, stride group assignment, and intra-group
    contiguity on a hand-built inventory."""
    from zarr_datafusion_search_spark.operators.layout import (
        plan_compaction_greedy,
    )

    files = spark.createDataFrame(
        [("s", i, 30) for i in range(10)],  # 300 bytes, target 100
        "source string, file_no long, bytes long",
    )
    rows = sorted(
        plan_compaction_greedy(
            files, "source", "file_no", "bytes", target_bytes=100
        ).collect(),
        key=lambda r: r.compaction_group,
    )
    assert sum(r.total_bytes for r in rows) == 300
    # exclusive cumsums 0,30,..,270 -> groups 0,0,0,0 | 1,1,1 | 2,2,2
    assert [(r.compaction_group, r.n_files) for r in rows] == [
        (0, 4),
        (1, 3),
        (2, 3),
    ]


# ---------------------------------------------------------------------------
# dynamic partition pruning
# ---------------------------------------------------------------------------


def test_dpp_plan_has_dynamic_pruning(spark, sf_dir):
    """The partitioned fact scan must carry a dynamicpruning expression
    in its PartitionFilters — proof the broadcast dim's hot tier reaches
    the directory listing at runtime."""
    from zarr_datafusion_search_spark.plans.registry import load_all

    df = load_all()["dpp_partitioned_join"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------


def test_bloom_never_false_negative(spark):
    """Every key folded into the bloom must pass its own probe."""
    from zarr_datafusion_search_spark.operators.sketches import (
        bloom64_prefilter_audit,
    )

    build = spark.range(0, 500, 7).select(F.col("id").alias("k"))
    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    row = bloom64_prefilter_audit(build, probe, "k", "k").collect()[0]
    n_members = build.distinct().count()
    assert row.n_members == n_members
    # no false negatives: every member passes, so passes >= members
    assert row.n_pass >= row.n_members
    assert row.n_false_pos == row.n_pass - row.n_members
    assert row.n_probe == 500


def test_countmin_estimate_is_upper_bound(spark):
    """CMS can only overcount: estimate >= exact for every key."""
    from zarr_datafusion_search_spark.operators.sketches import (
        countmin_error_audit,
    )

    df = spark.range(2000).select((F.col("id") % 97).alias("k"))
    rows = countmin_error_audit(df, "k").collect()
    assert len(rows) == 97
    assert all(r.estimate >= r.exact for r in rows)
    assert all(r.overcount == r.estimate - r.exact for r in rows)


# ---------------------------------------------------------------------------
# evaluation metrics
# ---------------------------------------------------------------------------


def test_auc_perfect_and_random(spark):
    """Perfectly separated scores -> AUC 1; all-tied scores -> 0.5 via
    midranks; single-class group -> NULL."""
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        groupwise_auc,
    )

    rows = [("sep", float(i), 1 if i >= 5 else 0) for i in range(10)]
    rows += [("tied", 1.0, i % 2) for i in range(10)]
    rows += [("onecls", float(i), 1) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, score double, y int")
    got = {r.g: r for r in groupwise_auc(df, "g", "score", "y").collect()}
    assert got["sep"].auc == 1.0
    assert got["tied"].auc == 0.5
    assert got["onecls"].auc is None
    assert got["onecls"].n_neg == 0


def test_kappa_known_values(spark):
    """Perfect agreement -> 1; hand-computed mixed case; degenerate
    (pe == 1) -> NULL."""
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        cohen_kappa_binary,
    )

    rows = [("perfect", i % 2, i % 2) for i in range(10)]
    # mixed: a = [1]*6+[0]*4, b agrees on 7 of 10
    mixed_a = [1, 1, 1, 1, 1, 1, 0, 0, 0, 0]
    mixed_b = [1, 1, 1, 1, 0, 0, 0, 0, 0, 1]
    rows += [("mixed", a, b) for a, b in zip(mixed_a, mixed_b)]
    rows += [("degen", 1, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, a int, b int")
    got = {r.g: r for r in cohen_kappa_binary(df, "g", "a", "b").collect()}
    assert got["perfect"].kappa == 1.0
    po, pa, pb = 0.7, 0.6, 0.5
    pe = pa * pb + (1 - pa) * (1 - pb)
    assert got["mixed"].kappa == pytest.approx((po - pe) / (1 - pe), abs=1e-6)
    assert got["degen"].kappa is None


def test_ess_uniform_and_skewed(spark):
    """Uniform mixture -> weights 1, ESS == n; heavy skew -> ESS well
    below n (Kish)."""
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        mixture_reweight_ess,
    )

    uni = spark.createDataFrame(
        [(f"g{i % 4}",) for i in range(40)], "g string"
    )
    rows = mixture_reweight_ess(uni, "g").collect()
    assert all(r.weight == 1.0 for r in rows)
    assert all(r.ess == 40.0 for r in rows)
    skew = spark.createDataFrame(
        [("big",)] * 90 + [("small",)] * 10, "g string"
    )
    ess = mixture_reweight_ess(skew, "g").collect()[0].ess
    # n1 w1 = 50, n2 w2 = 50 -> ESS = 100^2 / (90*(5/9)^2 + 10*5^2)
    expect = 100.0**2 / (90 * (50 / 90) ** 2 + 10 * (50 / 10) ** 2)
    assert ess == pytest.approx(expect, abs=0.01)


# ---------------------------------------------------------------------------
# governance / rollup / estimation
# ---------------------------------------------------------------------------


def test_k_anonymity_summary(spark):
    """3 groups: sizes 6, 2, 1 -> below k=5: two groups, 3 rows."""
    from zarr_datafusion_search_spark.operators.governance import (
        k_anonymity_audit,
    )

    rows = [("a", 1)] * 6 + [("b", 1)] * 2 + [("c", 2)]
    df = spark.createDataFrame(rows, "qa string, qb int")
    r = k_anonymity_audit(df, ["qa", "qb"], k=5).collect()[0]
    assert r.n_groups == 3
    assert r.n_below_k == 2
    assert r.n_rows_suppressed == 3
    assert r.suppression_rate == pytest.approx(3 / 9, abs=1e-6)
    assert r.min_group_size == 1


def test_contribution_cap_keeps_latest(spark):
    """User 1 has 5 rows, cap 3 -> the 3 latest timestamps survive."""
    from zarr_datafusion_search_spark.operators.governance import (
        cap_user_contributions,
    )

    df = spark.createDataFrame(
        [(1, t, t) for t in range(5)] + [(2, 0, 10)],
        "u long, ts long, id long",
    )
    kept = cap_user_contributions(df, "u", "ts", "id", cap=3).collect()
    by_user = {}
    for r in kept:
        by_user.setdefault(r.u, []).append(r.ts)
    assert sorted(by_user[1]) == [2, 3, 4]
    assert by_user[2] == [0]


def test_rollup_reuse_equals_direct(spark):
    """Hourly->daily merge must equal the direct daily aggregation."""
    import datetime

    from zarr_datafusion_search_spark.operators.timeseries import (
        rollup_reuse,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(hours=h, minutes=m), "t", 1.5)
        for h in range(30)
        for m in (0, 30)
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, g string, v double")
    got = sorted(
        rollup_reuse(df, "ts", "g", "v").collect(),
        key=lambda r: r.bucket_ts,
    )
    assert len(got) == 2  # 30 hours -> 2 days
    assert got[0].n_events == 48 and got[1].n_events == 12
    assert got[0].total_value == pytest.approx(72.0)
    assert got[0].avg_value == 1.5


def test_join_size_estimate_uniform_keys(spark):
    """1:1 join over keys 0..99 with mod-4 key sampling: 25 sampled
    pairs scale to exactly 100."""
    from zarr_datafusion_search_spark.operators.estimates import (
        join_size_estimate,
    )

    left = spark.range(100).select(F.col("id").alias("lk"))
    right = spark.range(100).select(F.col("id").alias("rk"))
    r = join_size_estimate(left, right, "lk", "rk", mod=4).collect()[0]
    assert r.exact_size == 100
    assert r.estimated_size == 100
    assert r.rel_error == 0.0


def test_freshness_stale_flag(spark):
    """A group whose latest row is 3 days behind the watermark is
    stale; the watermark group is not."""
    import datetime

    from zarr_datafusion_search_spark.operators.governance import (
        freshness_audit,
    )

    wm = datetime.datetime(2024, 6, 10)
    df = spark.createDataFrame(
        [("live", wm), ("live", wm - datetime.timedelta(days=1)),
         ("stale", wm - datetime.timedelta(days=3))],
        "g string, ts timestamp_ntz",
    )
    got = {r.g: r for r in freshness_audit(df, "g", "ts").collect()}
    assert not got["live"].is_stale and got["live"].lag_seconds == 0
    assert got["stale"].is_stale
    assert got["stale"].lag_seconds == 3 * 86400


# ---------------------------------------------------------------------------
# mix schedule / linkage / feature hashing / advisor
# ---------------------------------------------------------------------------


def test_mixture_anneal_endpoints(spark):
    """Epoch 0 reproduces natural shares; the final epoch is uniform."""
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        mixture_anneal_schedule,
    )

    df = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 10, "g string"
    )
    rows = mixture_anneal_schedule(df, "g", n_epochs=3).collect()
    by = {(r.epoch, r.g): r for r in rows}
    assert by[(0, "a")].target_share == 0.75
    assert by[(0, "a")].planned_docs == 30
    assert by[(2, "a")].target_share == 0.5
    assert by[(2, "a")].planned_docs == 20
    assert by[(1, "b")].target_share == pytest.approx(0.375, abs=1e-6)


def test_blocked_linkage_counts(spark):
    """Two blocks: one with a fuzzy match, one without."""
    from zarr_datafusion_search_spark.operators.linkage import (
        blocked_linkage_report,
    )

    df = spark.createDataFrame(
        [
            (1, "red ring", "x"),
            (2, "rad ring", "x"),   # dist 1 to red ring
            (3, "purple ring", "x"),  # dist > 2 to both
            (4, "blue bolt", "y"),
            (5, "steel bolt", "y"),  # dist > 2
        ],
        "id long, name string, blk string",
    )
    got = {r.blk: r for r in blocked_linkage_report(
        df, "id", "name", ["blk"], max_dist=2
    ).collect()}
    assert got["x"].n_pairs == 3
    assert got["x"].n_matches == 1
    assert got["y"].n_pairs == 1
    assert got["y"].n_matches == 0


def test_feature_hash_audit_partitions_features(spark):
    """Bucket feature counts must partition the distinct values and the
    row mass must be conserved."""
    from zarr_datafusion_search_spark.operators.sketches import (
        feature_hash_audit,
    )

    df = spark.range(300).select(
        F.concat(F.lit("f"), (F.col("id") % 30).cast("string")).alias("v")
    )
    rows = feature_hash_audit(df, "v", n_buckets=8).collect()
    assert sum(r.n_features for r in rows) == 30
    assert sum(r.n_rows for r in rows) == 300
    assert all(r.collisions == r.n_features - 1 for r in rows)


def test_partition_advisor_row_model(spark):
    """2 fixed cols (16 bytes) + one 4-char string -> 20 bytes/row."""
    from zarr_datafusion_search_spark.operators.estimates import (
        shuffle_partition_advisor,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("b"), F.lit("abcd").alias("s")
    )
    r = shuffle_partition_advisor(df).collect()[0]
    assert r.n_rows == 1000
    assert r.est_row_bytes == 20.0
    assert r.recommended_partitions == 1


# ---------------------------------------------------------------------------
# zone-map skipping / change-point
# ---------------------------------------------------------------------------


def test_zone_map_clustered_skips(spark):
    """Sorted layout must skip every file below the threshold file;
    shuffled natural layout skips none (every file spans the range)."""
    from zarr_datafusion_search_spark.operators.layout import (
        zone_map_skipping_audit,
    )

    # natural order interleaves small and large values everywhere
    df = spark.range(640).select(
        F.col("id").alias("oid"),
        ((F.col("id") * 7919) % 640).cast("double").alias("v"),
    )
    got = {r.layout: r for r in zone_map_skipping_audit(
        df, "oid", "v", n_files=8, threshold=560.0
    ).collect()}
    assert got["natural"].n_skipped == 0
    assert got["natural"].rows_scanned == 640
    # values 561..639 (79 rows) live in the last sorted file only
    assert got["clustered"].n_skipped == 7
    assert got["clustered"].rows_scanned == 80
    assert (
        got["clustered"].rows_matching == got["natural"].rows_matching == 79
    )


def test_cusum_finds_level_shift(spark):
    """Series 0..9 at level 10, then 10..19 at level 30: |cusum| peaks
    at the last pre-shift bucket."""
    import datetime

    from zarr_datafusion_search_spark.operators.timeseries import (
        cusum_changepoint,
    )

    base = datetime.datetime(2024, 5, 1)
    rows = [
        ("g", base + datetime.timedelta(days=d), 10.0 if d < 10 else 30.0)
        for d in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp_ntz, v double")
    r = cusum_changepoint(df, "g", "ts", "v").collect()[0]
    assert r.changepoint_bucket == base + datetime.timedelta(days=9)
    # mean of means = 20; cusum at day 9 = 10 * (10 - 20) = -100
    assert r.cusum == -100.0


# ---------------------------------------------------------------------------
# sessions / splits / card
# ---------------------------------------------------------------------------


def test_session_engagement_bounce(spark):
    """User with one lone event (bounce) + one 3-event session."""
    import datetime

    from zarr_datafusion_search_spark.operators.sessions import (
        session_engagement_metrics,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0, "view", 1.0),
        (1, 2, t0 + datetime.timedelta(minutes=5), "click", 1.0),
        (1, 3, t0 + datetime.timedelta(minutes=10), "purchase", 1.0),
        # gap > 30 min -> new session, single event = bounce
        (2, 4, t0, "click", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    )
    got = {r.landing_type: r for r in session_engagement_metrics(
        df, gap_minutes=30
    ).collect()}
    assert got["view"].n_sessions == 1
    assert got["view"].bounce_rate == 0.0
    assert got["view"].avg_events == 3.0
    assert got["view"].avg_duration_s == 600.0
    assert got["click"].bounce_rate == 1.0
    assert got["click"].avg_duration_s == 0.0


def test_temporal_embargo_partitions_rows(spark):
    import datetime

    from zarr_datafusion_search_spark.operators.governance import (
        temporal_split_embargo,
    )

    rows = [
        (datetime.datetime(2024, 1, 20),),   # train
        (datetime.datetime(2024, 1, 24, 6),),  # embargo
        (datetime.datetime(2024, 1, 26),),   # test
        (datetime.datetime(2024, 1, 23, 23, 59),),  # train
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz")
    r = temporal_split_embargo(df, "ts", "2024-01-25", 1).collect()[0]
    assert (r.n_train, r.n_embargo_dropped, r.n_test) == (2, 1, 1)
    assert r.train_frac == 0.5


def test_kfold_counts_partition_rows(spark):
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        kfold_assignment_counts,
    )

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("s")
    )
    rows = kfold_assignment_counts(df, "id", "s", k=5).collect()
    assert sum(r.n_docs for r in rows) == 500
    for s in ("0", "1"):
        assert sum(
            r.stratum_share for r in rows if r.s == s
        ) == pytest.approx(1.0, abs=1e-5)
