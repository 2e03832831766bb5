"""Round-4 hardening regressions (VERDICT r03 / ADVICE r03):

* no forced broadcast of the corpus-proportional clustered-node set in
  ``dedup_cluster_size_histogram``
* hot-shingle guard is ON BY DEFAULT for ``ngram_containment_pairs``
* single-chunk partial stores are fill-padded to the full chunk_shape
  (zarr v3 interop — strict readers reject short edge-chunk buffers)
* ``dedup_with_cooldown`` groups NULL keys like SQL (one group), not one
  group per NaN object
* ``append_stream_to_zarr`` with a checkpoint is restart-idempotent
"""

import contextlib
import io
import json
import os

import pyspark.sql.functions as F
import pytest

from zarr_datafusion_search_spark.plans.registry import load_all, table

REG = load_all()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cluster_histogram_no_forced_broadcast(spark, sf_dir):
    """The singleton anti-join's build side (every doc in any near-dup
    pair) is corpus-proportional — it must not carry a broadcast HINT.
    Size-based broadcast (threshold/AQE) is fine and expected at test
    scale, so the test disables size-based broadcast and asserts the
    anti-join falls back to a shuffle join: a forced hint would survive
    threshold=-1, an unhinted plan cannot."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        plan = _plan(
            REG["dedup_cluster_size_histogram"].spark(spark, sf_dir)
        )
        anti_lines = [l for l in plan.splitlines() if "LeftAnti" in l]
        assert anti_lines, plan[:800]
        assert not any("Broadcast" in l for l in anti_lines), anti_lines
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_containment_guard_is_default():
    import inspect

    from zarr_datafusion_search_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    for fn in (ngram_containment_pairs, ngram_jaccard_pairs):
        assert inspect.signature(fn).parameters["max_df"].default == 100


def test_containment_default_plan_has_df_filter(spark, sf_dir):
    """The default plan must include the document-frequency pre-join (an
    extra aggregate on the shingle hash) vs the explicit max_df=None plan."""
    from zarr_datafusion_search_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    docs = table(spark, sf_dir, "documents").limit(50)
    guarded = _plan(ngram_containment_pairs(docs))
    unguarded = _plan(ngram_containment_pairs(docs, max_df=None))
    assert guarded.count("HashAggregate") > unguarded.count("HashAggregate")


@pytest.mark.parametrize("writer", ["batch", "append"])
def test_single_chunk_partial_store_is_padded(spark, tmp_path, writer):
    """total rows < chunk_rows with clamp_chunk=False metadata: the one
    edge chunk must still be a FULL chunk_rows buffer (fill-padded), as
    zarr v3 requires — strict readers decode exactly chunk_shape items."""
    from zarr_datafusion_search_spark.sources.zarr_sink import (
        append_zarr_distributed,
        write_zarr_distributed,
    )
    from zarr_datafusion_search_spark.sources.zarr_table import ZarrTable

    store = str(tmp_path / f"pad_{writer}.zarr")
    df = spark.range(0, 10).select(F.col("id").alias("v"))
    if writer == "batch":
        n = write_zarr_distributed(df, store, chunk_rows=128, zstd_level=0)
    else:
        n = write_zarr_distributed(
            df.limit(4), store, chunk_rows=128, zstd_level=0
        )
        n = append_zarr_distributed(
            spark.range(4, 10).select(F.col("id").alias("v")), store
        )
    assert n == 10
    chunk = os.path.join(store, "v", "c", "0")
    # the decoded buffer must hold the FULL chunk_shape (128 int64s),
    # not just the 10 real rows — strict readers decode exactly that
    from zarr_datafusion_search_spark.sources.zarrv3 import _zstd_decompress

    with open(chunk, "rb") as fh:
        decoded = _zstd_decompress(fh.read())
    assert len(decoded) == 128 * 8
    back = ZarrTable(store).to_df(spark)
    assert sorted(r.v for r in back.collect()) == list(range(10))


def test_cooldown_null_keys_group_as_one(spark):
    """NULL-keyed rows must share ONE fold key (SQL NULL-grouping), not
    each start their own via NaN identity."""
    import datetime

    from zarr_datafusion_search_spark.operators.sessions import (
        dedup_with_cooldown,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, None, "a", t0),
        (2, None, "a", t0 + datetime.timedelta(minutes=10)),  # inside cooldown
        (3, None, "a", t0 + datetime.timedelta(minutes=40)),  # past cooldown
        (4, 7, "a", t0 + datetime.timedelta(minutes=5)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    kept = sorted(
        r.event_id
        for r in dedup_with_cooldown(df, cooldown_minutes=30).collect()
    )
    assert kept == [1, 3, 4]


def test_append_stream_checkpoint_idempotent(spark, tmp_path):
    """With a checkpoint, a second invocation over the same source must
    not re-append already-committed batches; new files still flow."""
    from zarr_datafusion_search_spark.sources.zarr_table import ZarrTable
    from zarr_datafusion_search_spark.streaming import events as se

    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "grow.zarr")
    ck = str(tmp_path / "ck")

    def write_file(i, ids):
        with open(src / f"b{i}.json", "w") as fh:
            for j in ids:
                fh.write(
                    json.dumps(
                        {
                            "event_id": j,
                            "ts": "2024-01-01 00:00:00",
                            "user_id": j,
                            "event_type": "x",
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )

    write_file(0, range(0, 300))
    stream = se.read_event_stream(spark, str(src))
    n1 = se.append_stream_to_zarr(
        stream, store, chunk_rows=256, checkpoint_dir=ck
    )
    assert n1 == 300
    # rerun, same checkpoint, no new data: nothing appended
    se.append_stream_to_zarr(
        se.read_event_stream(spark, str(src)),
        store,
        chunk_rows=256,
        checkpoint_dir=ck,
    )
    assert ZarrTable(store).to_df(spark).count() == 300
    # hwm mark exists and is lineage-stamped
    with open(os.path.join(store, "_zdss_hwm.json")) as fh:
        doc = json.load(fh)
    assert doc["checkpoint_dir"] == ck
    # new file arrives: the checkpointed rerun appends ONLY the new rows
    write_file(1, range(300, 400))
    se.append_stream_to_zarr(
        se.read_event_stream(spark, str(src)),
        store,
        chunk_rows=256,
        checkpoint_dir=ck,
    )
    assert ZarrTable(store).to_df(spark).count() == 400
