"""Structured Streaming operators over event streams.

The reference is strictly bounded (``Boundedness::Bounded``,
reference: src/table_provider.rs:238-239) — streaming is a beyond-parity
extension. Each transformation here takes a *streaming* DataFrame shaped
like the ``events`` table (event_id, ts, user_id, event_type, value, props)
and returns a streaming DataFrame; the batch twins in plans/sql_surface.py
and operators/sessions.py compute the same answers for the correctness gate.

Watermarks bound state: a 10-minute watermark means late events more than
10 minutes behind the max seen timestamp are dropped and window state older
than that is evicted — the knob that keeps unbounded streams in bounded
memory on a real cluster.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, directory: str, fmt: str = "json"
) -> DataFrame:
    """File-source event stream (each file dropped into ``directory`` is a
    micro-batch) — the local stand-in for a Kafka source; swap
    ``format("kafka")`` + ``from_json`` at deployment."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(directory)
    )


def tumbling_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-window, per-type counts/sums with late-data handling."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w").getField("start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_value_avg(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window running average of event values."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w").getField("start").alias("window_start"),
            F.col("w").getField("end").alias("window_end"),
            "avg_value",
            "n_events",
        )
    )


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Native streaming session windows (gap-based), the streaming twin of
    operators/sessions.py."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w").getField("start").alias("session_start"),
            F.col("w").getField("end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    lifetime event count and value total, emitted on every update."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id LONG, n_events LONG, total_value DOUBLE"
    state_schema = "n LONG, total DOUBLE"

    def update(key: Tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState):  # noqa: F821
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain all available input into an in-memory table (test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def interval_join_clicks_purchases(
    stream: DataFrame, window: str = "1 HOUR", watermark: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join: each click joined to the same user's
    purchases from the trailing ``window``. Both sides carry watermarks and
    the join condition bounds event-time distance, so the state store can
    evict rows older than watermark + window — the requirement for an
    append-mode stream-stream join to run unbounded.
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND purchase_ts BETWEEN "
            f"click_ts - INTERVAL {window} AND click_ts"
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def interval_left_join_clicks_purchases(
    stream: DataFrame, window: str = "1 HOUR", watermark: str = "10 minutes"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click emits — matched
    clicks as soon as the purchase arrives, UNMATCHED clicks with NULL
    purchase columns once the watermark proves no in-window purchase can
    still arrive. This is the attribution shape a funnel pipeline needs
    (conversion AND non-conversion rows), and it is exactly the case the
    inner join silently drops.

    Outer-side state semantics: Structured Streaming holds an unmatched
    left row until ``watermark + window`` passes its event time, then
    emits it null-extended — so the null rows are late-data-correct, not
    best-effort. Both sides need watermarks and the time-bound condition,
    same as the inner variant.
    """
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND purchase_ts BETWEEN "
            f"click_ts - INTERVAL {window} AND click_ts"
        ),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def dedup_event_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id: duplicates arriving within the
    watermark horizon are dropped; state for ids older than the watermark
    is evicted (``dropDuplicatesWithinWatermark``), so the dedup runs
    unbounded — the streaming twin of operators/dedup.exact_dedup."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def write_stream_foreach_batch(stream: DataFrame, out_dir: str) -> None:
    """Micro-batch escape hatch: route each micro-batch through an arbitrary
    batch writer (here: parquet partitioned by event_type) — the pattern for
    sinks without native streaming support (e.g. the zarr sink)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy("event_type")
            .parquet(out_dir)
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def write_stream_to_zarr(
    stream: DataFrame, store_root: str, chunk_rows: int = 65536
) -> list[str]:
    """Streaming Zarr ingest through foreachBatch + the distributed sink.

    Zarr's regular chunk grid has no cheap row-append, so the streaming
    model is one IMMUTABLE store per micro-batch under ``store_root``
    (``batch-<id>.zarr``) — the landing-zone layout streaming lakes use for
    append-only formats: each batch commits atomically (metadata last),
    readers union the stores, and a compaction job can later rewrite small
    batch stores into sharded ones with the same sink. Executors write the
    chunks of every batch in parallel; only metadata touches the driver.
    Returns the store paths written.
    """
    import os

    from zarr_datafusion_search_spark.sources.zarr_sink import (
        write_zarr_distributed,
    )

    written: list[str] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        path = os.path.join(store_root, f"batch-{batch_id:06d}.zarr")
        write_zarr_distributed(batch_df, path, chunk_rows=chunk_rows)
        written.append(path)

    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return written


def enrich_stream_with_dim(
    stream: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream-static dimension enrichment: each micro-batch joins against
    the (broadcast) static side with no state and no watermark — the
    standard streaming lookup-join. The static plan is re-resolved per
    batch, so a dimension refreshed in place (e.g. overwritten parquet) is
    picked up without restarting the query.
    """
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), key, "left")


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Per-user lifetime totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API that supersedes ``applyInPandasWithState``
    (typed state variables with per-variable TTL, timers, and
    initial-state support; state survives in the state store per key).
    Same semantics as :func:`running_user_totals`: emit the updated
    (n_events, total_value) for each user on every micro-batch.

    Environment gate: the TWS Python driver worker imports
    ``google.protobuf`` (absent in this container, so the operator raises
    a clear error up front instead of crashing the streaming query; the
    ``applyInPandasWithState`` twin above is the exercised path here).
    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf for its "
            "driver worker; install protobuf or use running_user_totals "
            "(applyInPandasWithState) instead"
        ) from e
    provider = stream.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if "RocksDB" not in (provider or ""):
        raise RuntimeError(
            "transformWithStateInPandas requires the RocksDB state store: "
            "set spark.sql.streaming.stateStore.providerClass to "
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider (the default HDFS-backed provider "
            "does not support it)"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n LONG, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
        outputMode="Update",
        timeMode="None",
    )


def append_stream_to_zarr(
    stream: DataFrame,
    store_path: str,
    chunk_rows: int = 65536,
    checkpoint_dir: str | None = None,
) -> int:
    """Streaming Zarr ingest into ONE growing store via row append.

    The original landing-zone layout (:func:`write_stream_to_zarr`) wrote
    one immutable store per micro-batch and relied on compaction to keep
    object counts sane. With distributed row append
    (``zarr_sink.append_zarr_distributed``) the stream can instead grow a
    single store: the first non-empty batch creates it, every later batch
    appends — only each batch's boundary chunk is rewritten, and the
    metadata-only commit keeps the store readable at the previous row
    count if a batch dies mid-write. foreachBatch runs batches
    sequentially, which is exactly the serialization append needs.

    Trade-off vs per-batch stores: no compaction debt and a single store
    path for readers, but ingest is serialized per micro-batch (fine — so
    is foreachBatch) and the store must not be written by anyone else.
    Returns the final row count.

    Restart safety: per-batch append commits are atomic, but across RUNS a
    checkpoint-less source replays from offset zero and re-appends rows the
    previous run already committed. Pass ``checkpoint_dir`` (forwarded as
    ``checkpointLocation``) for restart-safe ingest: Structured Streaming
    resumes from committed offsets, and a batch-id high-water mark
    persisted next to the store's metadata (``_zdss_hwm.json``, tmp+rename
    like chunk files) makes the one remaining window idempotent — the
    crash AFTER the append commit but BEFORE the offset commit, where the
    restarted query re-delivers the same batch id. The mark is consulted
    only WITH a checkpoint, because batch ids are stable only within one
    checkpoint lineage; a checkpoint-less rerun renumbers from 0, so
    skipping by id would drop genuinely new data there. Checkpoint-less
    runs therefore keep the documented duplicate-on-rerun hazard: use them
    only for one-shot ingest of a source that is never replayed.
    """
    import json
    import os

    from zarr_datafusion_search_spark.sources.zarr_sink import (
        append_zarr_distributed,
        write_zarr_distributed,
    )

    total = [0]
    hwm_path = os.path.join(store_path, "_zdss_hwm.json")

    def _read_hwm() -> int:
        # the mark is valid only for the SAME checkpoint lineage: a new
        # checkpoint renumbers batches from 0, so an old mark would
        # silently drop fresh data
        if os.path.exists(hwm_path):
            with open(hwm_path) as fh:
                doc = json.load(fh)
            if doc.get("checkpoint_dir") == checkpoint_dir:
                return int(doc["batch_id"])
        return -1

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if checkpoint_dir is not None and batch_id <= _read_hwm():
            return  # re-delivered batch: already appended by a prior run
        if not os.path.exists(os.path.join(store_path, "zarr.json")):
            total[0] = write_zarr_distributed(
                batch_df, store_path, chunk_rows=chunk_rows
            )
        else:
            total[0] = append_zarr_distributed(batch_df, store_path)
        if checkpoint_dir is not None:
            tmp = f"{hwm_path}.tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                json.dump(
                    {"batch_id": batch_id, "checkpoint_dir": checkpoint_dir},
                    fh,
                )
            os.replace(tmp, hwm_path)

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return total[0]
