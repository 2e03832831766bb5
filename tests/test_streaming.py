"""Streaming operators: drain a file-source stream with availableNow and
compare against the batch twin computed on the same rows."""

import json
import os

import pyspark.sql.functions as F
import pytest

from zarr_datafusion_search_spark.plans.registry import table
from zarr_datafusion_search_spark.streaming import events as streaming_events


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    """events table spilled to JSON files (3 micro-batch files)."""
    d = tmp_path_factory.mktemp("event_stream")
    df = table(spark, sf_dir, "events")
    rows = sorted(df.collect(), key=lambda r: r.ts)
    # chronological micro-batches: in-order arrival, nothing falls behind
    # the watermark (late-data dropping is exercised in the batch twins)
    third = (len(rows) + 2) // 3
    chunks = [rows[i * third : (i + 1) * third] for i in range(3)]
    for i, chunk in enumerate(chunks):
        with open(d / f"batch_{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.isoformat(sep=" "),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
    # sentinel far in the future: pushes the watermark past every real
    # window so append-mode sinks flush them (the tail of an append-mode
    # stream otherwise stays in state forever)
    import datetime

    sentinel_ts = rows[-1].ts + datetime.timedelta(days=30)
    with open(d / "batch_sentinel.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "event_id": -1,
                    "ts": sentinel_ts.isoformat(sep=" "),
                    "user_id": -1,
                    "event_type": "sentinel",
                    "value": 0.0,
                    "props": "{}",
                }
            )
            + "\n"
        )
    return str(d)


def _batch_events(spark, event_dir):
    """Batch read of the same files, sentinel excluded."""
    return (
        spark.read.format("json")
        .schema(streaming_events.EVENTS_SCHEMA)
        .load(event_dir)
        .filter(F.col("event_id") >= 0)
    )


def test_tumbling_counts_matches_batch(spark, event_dir):
    stream = streaming_events.read_event_stream(spark, event_dir)
    assert stream.isStreaming
    out = streaming_events.tumbling_counts(stream, window="1 hour")
    streaming_events.run_to_memory_sink(out, "tumbling_test")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("tumbling_test").collect()
        if r.event_type != "sentinel"
    }
    batch = (
        _batch_events(spark, event_dir)
        .groupBy(F.window("ts", "1 hour").getField("start").alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    want = {(r.ws, r.event_type): (r.n, r.v) for r in batch.collect()}
    assert got == want


def test_session_window_stream(spark, event_dir):
    stream = streaming_events.read_event_stream(spark, event_dir)
    out = streaming_events.session_counts(stream, gap="30 minutes")
    streaming_events.run_to_memory_sink(out, "session_test")
    rows = [r for r in spark.table("session_test").collect() if r.user_id >= 0]
    assert len(rows) > 0
    n_events_total = sum(r.n_events for r in rows)
    assert n_events_total == _batch_events(spark, event_dir).count()
    for r in rows:
        assert r.session_start <= r.session_end


def test_sliding_window_stream(spark, event_dir):
    stream = streaming_events.read_event_stream(spark, event_dir)
    out = streaming_events.sliding_value_avg(stream, window="2 hours", slide="1 hour")
    streaming_events.run_to_memory_sink(out, "sliding_test")
    batch = _batch_events(spark, event_dir)
    max_real_ts = batch.agg(F.max("ts")).collect()[0][0]
    rows = [
        r
        for r in spark.table("sliding_test").collect()
        if r.window_start <= max_real_ts  # drop the sentinel's own windows
    ]
    assert len(rows) > 0
    # every event lands in exactly window/slide = 2 sliding windows
    assert sum(r.n_events for r in rows) == 2 * batch.count()


def test_stateful_running_totals(spark, event_dir):
    stream = streaming_events.read_event_stream(spark, event_dir)
    out = streaming_events.running_user_totals(stream)
    streaming_events.run_to_memory_sink(out, "state_test", output_mode="update")
    rows = spark.table("state_test").collect()
    assert len(rows) > 0
    # last emitted state per user equals the batch totals
    batch = (
        _batch_events(spark, event_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    want = {r.user_id: (r.n, r.v) for r in batch.collect()}
    last = {}
    for r in rows:  # memory sink appends in emission order; later wins
        if r.user_id >= 0:
            last[r.user_id] = (r.n_events, r.total_value)
    for uid, (n, v) in want.items():
        assert last[uid][0] == n
        assert abs(last[uid][1] - v) < 1e-6


def test_stream_stream_interval_join(spark, event_dir):
    stream = streaming_events.read_event_stream(spark, event_dir)
    out = streaming_events.interval_join_clicks_purchases(stream, window="1 HOUR")
    streaming_events.run_to_memory_sink(out, "ssj_test")
    got = {
        (r.click_id, r.purchase_ts): r.purchase_value
        for r in spark.table("ssj_test").collect()
    }
    # batch twin on the same rows
    e = _batch_events(spark, event_dir)
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("value").alias("pv")
    )
    want = {
        (r.cid, r.pts): r.pv
        for r in c.join(
            p, F.expr("cu = pu AND pts BETWEEN cts - INTERVAL 1 HOUR AND cts")
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_streaming_dedup_drops_in_watermark_dupes(spark, tmp_path):
    import datetime as dt

    d = tmp_path / "dup_stream"
    d.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        {"event_id": 1, "ts": base, "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 1, "ts": base + dt.timedelta(minutes=5), "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},  # dup within watermark
        {"event_id": 2, "ts": base + dt.timedelta(minutes=10), "user_id": 2, "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    with open(d / "b0.json", "w") as f:
        for r in rows:
            r2 = dict(r); r2["ts"] = r["ts"].isoformat(sep=" ")
            f.write(json.dumps(r2) + "\n")
    stream = streaming_events.read_event_stream(spark, str(d))
    out = streaming_events.dedup_event_stream(stream, watermark="1 hour")
    streaming_events.run_to_memory_sink(out, "dedup_stream_test")
    got = sorted(r.event_id for r in spark.table("dedup_stream_test").collect())
    assert got == [1, 2]


def test_foreach_batch_sink(spark, event_dir, tmp_path):
    out = str(tmp_path / "fb_out")
    stream = streaming_events.read_event_stream(spark, event_dir)
    streaming_events.write_stream_foreach_batch(stream, out)
    written = spark.read.parquet(out)
    src = spark.read.format("json").schema(streaming_events.EVENTS_SCHEMA).load(event_dir)
    assert written.count() == src.count()
    # partitioned layout by event_type exists
    assert written.filter(F.col("event_type") == "click").count() == src.filter(
        F.col("event_type") == "click"
    ).count()


def test_write_stream_to_zarr(spark, event_dir, tmp_path):
    from functools import reduce

    from zarr_datafusion_search_spark import ZarrTable

    root = str(tmp_path / "zarr_stream")
    stream = streaming_events.read_event_stream(spark, event_dir)
    stores = streaming_events.write_stream_to_zarr(stream, root, chunk_rows=256)
    assert stores, "no batch stores written"
    src = spark.read.format("json").schema(streaming_events.EVENTS_SCHEMA).load(event_dir)
    # readers union the immutable per-batch stores
    back = reduce(
        lambda a, b: a.unionByName(b),
        [ZarrTable(s).to_df(spark) for s in stores],
    )
    assert back.count() == src.count()
    want = {(r.event_id, r.user_id): r.value for r in src.collect()}
    got = {(r.event_id, r.user_id): r.value for r in back.collect()}
    assert got == want


def test_compact_batch_stores_to_sharded(spark, event_dir, tmp_path):
    from zarr_datafusion_search_spark import ZarrTable
    from zarr_datafusion_search_spark.sources.zarr_sink import (
        compact_zarr_stores,
    )

    root = str(tmp_path / "landing")
    stream = streaming_events.read_event_stream(spark, event_dir)
    stores = streaming_events.write_stream_to_zarr(stream, root, chunk_rows=128)
    out = str(tmp_path / "compacted.zarr")
    n = compact_zarr_stores(
        spark, stores, out, chunk_rows=512, inner_rows=128
    )
    src = spark.read.format("json").schema(streaming_events.EVENTS_SCHEMA).load(event_dir)
    assert n == src.count()
    back = ZarrTable(out).to_df(spark)
    assert back.count() == n
    # sharded layout: one object per 512-row shard, not per 128-row chunk
    import json as _json
    import os as _os

    meta = _json.load(open(_os.path.join(out, "event_id", "zarr.json")))
    codecs = [c["name"] for c in meta["codecs"]]
    assert "sharding_indexed" in codecs
    # value-level spot check survives the union + rewrite
    want = {r.event_id: r.value for r in src.collect()}
    got = {r.event_id: r.value for r in back.collect()}
    assert got == want


def test_stream_static_enrichment(spark, event_dir):
    # static dimension: per-user tier derived from user_id
    dim = spark.range(0, 10000).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, "gold").otherwise("standard").alias("tier"),
    )
    stream = streaming_events.read_event_stream(spark, event_dir)
    out = streaming_events.enrich_stream_with_dim(stream, dim)
    streaming_events.run_to_memory_sink(out, "enriched_stream_test")
    got = spark.table("enriched_stream_test")
    src = spark.read.format("json").schema(streaming_events.EVENTS_SCHEMA).load(event_dir)
    assert got.count() == src.count()
    # every gold row honors the dimension rule
    bad = got.filter(
        (F.col("tier") == "gold") & (F.col("user_id") % 3 != 0)
    ).count()
    assert bad == 0
    # null tier only where the key has no dimension row (e.g. the fixture's
    # far-future sentinel user) — exact match with the batch twin
    want_nulls = src.join(dim, "user_id", "left").filter(
        F.col("tier").isNull()
    ).count()
    assert got.filter(F.col("tier").isNull()).count() == want_nulls


def test_stateful_running_totals_tws(spark, event_dir):
    """transformWithStateInPandas twin of running_user_totals: final state
    per user must equal the batch aggregate. The TWS driver worker needs
    google.protobuf; without it the operator must fail fast with a clear
    error (not crash the streaming query mid-run)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="transformWithStateInPandas"):
            streaming_events.running_user_totals_tws(
                streaming_events.read_event_stream(spark, event_dir)
            )
        return
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = streaming_events.read_event_stream(spark, event_dir)
        out = streaming_events.running_user_totals_tws(stream)
        streaming_events.run_to_memory_sink(out, "tws_test", output_mode="update")
        rows = spark.table("tws_test").collect()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert len(rows) > 0
    batch = (
        _batch_events(spark, event_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    want = {r.user_id: (r.n, r.v) for r in batch.collect()}
    # totals are monotone in n_events, so the final state per user is the
    # row with max n_events — independent of sink row order across batches
    final = {}
    for r in rows:
        if r.user_id >= 0 and (
            r.user_id not in final or r.n_events > final[r.user_id][0]
        ):
            final[r.user_id] = (r.n_events, r.total_value)
    for uid, (n, v) in want.items():
        assert final[uid][0] == n
        assert abs(final[uid][1] - v) < 1e-6


def test_append_stream_to_zarr_single_store(spark, event_dir, tmp_path):
    """Each micro-batch appends into ONE growing store (first creates it);
    the merged store holds every event exactly once."""
    from zarr_datafusion_search_spark import ZarrTable

    store = str(tmp_path / "growing.zarr")
    stream = streaming_events.read_event_stream(spark, event_dir)
    n = streaming_events.append_stream_to_zarr(stream, store, chunk_rows=256)
    src = spark.read.format("json").schema(streaming_events.EVENTS_SCHEMA).load(event_dir)
    assert n == src.count()
    back = ZarrTable(store).to_df(spark)
    assert back.count() == n
    want = {(r.event_id, r.user_id): r.value for r in src.collect()}
    got = {(r.event_id, r.user_id): r.value for r in back.collect()}
    assert got == want


def test_zarr_stream_tail(spark, tmp_path):
    """readStream.format('zarr') tails a growing store: the first run
    reads everything, a checkpointed second run after an append reads
    ONLY the appended rows (offsets = committed row counts)."""
    from zarr_datafusion_search_spark.sources.zarr_datasource import (
        ZarrDataSource,
    )
    from zarr_datafusion_search_spark.sources.zarr_sink import (
        append_zarr_distributed,
        write_zarr_distributed,
    )

    spark.dataSource.register(ZarrDataSource)
    store = str(tmp_path / "tail.zarr")
    ck = str(tmp_path / "ck")
    write_zarr_distributed(
        spark.createDataFrame(
            [(i, f"s{i}") for i in range(25)], "id long, name string"
        ),
        store,
        chunk_rows=10,
    )

    def run_once():
        got = []
        q = (
            spark.readStream.format("zarr")
            .load(store)
            .writeStream.foreachBatch(
                lambda b, _i: got.append([tuple(r) for r in b.collect()])
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r[0] for batch in got for r in batch)

    assert run_once() == list(range(25))
    append_zarr_distributed(
        spark.createDataFrame(
            [(i, f"s{i}") for i in range(25, 42)], "id long, name string"
        ),
        store,
    )
    # second checkpointed run sees only the appended tail
    assert run_once() == list(range(25, 42))
    # third run with nothing new: no rows
    assert run_once() == []


def test_zarr_stream_rejects_shrunk_store(spark, tmp_path):
    from zarr_datafusion_search_spark.sources.zarr_datasource import (
        ZarrStreamReader,
    )
    from zarr_datafusion_search_spark.sources.zarr_sink import (
        write_zarr_distributed,
    )

    store = str(tmp_path / "shrink.zarr")
    write_zarr_distributed(
        spark.createDataFrame([(1,)], "id long"), store, chunk_rows=10
    )
    reader = ZarrStreamReader(
        store, "/", spark.read.format("zarr").load(store).schema, 1 << 21
    )
    with pytest.raises(ValueError, match="offset went backwards"):
        reader.partitions({"rows": 5}, {"rows": 2})


def test_stream_stream_left_outer_interval_join(spark, sf_dir, tmp_path):
    """Left-outer variant: matched rows equal the batch join; unmatched
    clicks appear exactly once, null-extended, once the watermark passes
    them. The generic fixture's 'sentinel'-typed row is filtered out of
    BOTH join inputs, so this test writes its own fixture whose sentinels
    are a far-future CLICK and PURCHASE — the query watermark is the min
    over both inputs, and each side only sees its own type."""
    import datetime

    d = tmp_path / "lo_stream"
    d.mkdir()
    df = table(spark, sf_dir, "events")
    rows = sorted(df.collect(), key=lambda r: r.ts)
    third = (len(rows) + 2) // 3
    far = rows[-1].ts + datetime.timedelta(days=30)
    for i in range(3):
        with open(d / f"b{i}.json", "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.isoformat(sep=" "),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
    with open(d / "b_sentinel.json", "w") as f:
        for eid, etype in ((-1, "click"), (-2, "purchase")):
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts": far.isoformat(sep=" "),
                        "user_id": -1,
                        "event_type": etype,
                        "value": 0.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )

    stream = streaming_events.read_event_stream(spark, str(d))
    out = streaming_events.interval_left_join_clicks_purchases(
        stream, window="1 HOUR"
    )
    streaming_events.run_to_memory_sink(out, "ssj_left_test")
    got = [
        (r.click_id, r.purchase_ts, r.purchase_value)
        for r in spark.table("ssj_left_test").collect()
        if r.click_id >= 0  # drop the sentinel click itself
    ]
    e = df
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        F.col("value").alias("pv"),
    )
    want = [
        (r.cid, r.pts, r.pv)
        for r in c.join(
            p,
            F.expr("cu = pu AND pts BETWEEN cts - INTERVAL 1 HOUR AND cts"),
            "left",
        ).collect()
    ]
    assert sorted(got, key=str) == sorted(want, key=str)
    # the left join must keep non-converting clicks (nulls present)
    assert any(pts is None for _, pts, _ in got)
