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


# ---------------------------------------------------------------------------
# PNG codec (round-4: stdlib-zlib real decode, VERDICT r03 §6)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_shapes():
    import numpy as np

    from zarr_datafusion_search_spark.functions import media_codecs as mc

    rng = np.random.default_rng(0)
    # >=5 rows exercises every filter type (encoder cycles row % 5)
    for shape in [(1, 1, 3), (6, 8, 3), (13, 7, 4), (5, 5, 1), (3, 200, 4)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        out = mc.decode_png(mc.encode_png(arr))
        assert out.shape == arr.shape and (out == arr).all(), shape
    g = rng.integers(0, 256, (7, 9), dtype=np.uint8)  # 2-D gray input
    assert (mc.decode_png(mc.encode_png(g))[:, :, 0] == g).all()


def test_png_decoder_independent_of_encoder():
    """Decode a PNG built byte-by-byte from the spec (filter-0 rows), not
    by our encoder — guards against a self-consistent-but-wrong codec."""
    import struct
    import zlib

    import numpy as np

    from zarr_datafusion_search_spark.functions import media_codecs as mc

    w, h = 3, 2
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (mc.decode_png(png) == px).all()
    # corrupted CRC must be rejected, not silently decoded
    bad = bytearray(png)
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mc.decode_png(bytes(bad))


def test_png_unsupported_variants_named():
    import struct
    import zlib

    import numpy as np

    from zarr_datafusion_search_spark.functions import media_codecs as mc

    with pytest.raises(ValueError, match="not a PNG"):
        mc.decode_png(b"NOPE")

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # palette (color type 3) names the limitation
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color_type"):
        mc.decode_png(png)
    # Adam7 interlace named
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        mc.decode_png(png)


def test_mixed_format_attach_dispatches_per_row(spark, sf_dir):
    """fmt='mixed' routes each row through its own decoder; decoded
    features must be format-invariant (same closed-form pixels)."""
    from zarr_datafusion_search_spark.operators import multimodal

    docs = table(spark, sf_dir, "documents").limit(12)
    mixed = multimodal.attach_synthetic_images(docs, fmt="mixed")
    rows = {
        r.doc_id: r
        for r in multimodal.extract_media_features(
            mixed, fake=False
        ).collect()
    }
    bmp_rows = {
        r.doc_id: r
        for r in multimodal.extract_media_features(
            multimodal.attach_synthetic_images(docs, fmt="image/bmp"),
            fake=False,
        ).collect()
    }
    assert set(rows) == set(bmp_rows)
    for i, r in rows.items():
        want = ["image/bmp", "image/png", "image/x-portable-pixmap"][i % 3]
        assert r.media_format == want
        assert r.n_bytes == bmp_rows[i].n_bytes
        assert r.byte_checksum == bmp_rows[i].byte_checksum


def test_minhash_bucket_guard_subsets_unguarded(spark, sf_dir):
    """The degenerate-bucket guard must only REMOVE pairs (candidates from
    oversized buckets), never add or alter surviving (pair, jaccard)
    rows; default None keeps exact parity with the registered oracle."""
    from zarr_datafusion_search_spark.operators import dedup

    docs = table(spark, sf_dir, "documents")
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, num_hashes=16, rows_per_band=4, jaccard_threshold=0.5
        ).collect()
    }
    guarded = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs,
            num_hashes=16,
            rows_per_band=4,
            jaccard_threshold=0.5,
            max_bucket_size=2,
        ).collect()
    }
    assert guarded <= full
    # at a cap of 2 every bucket with >2 members is dropped, so with any
    # real boilerplate the guarded set is strictly smaller OR all buckets
    # were small anyway; either way the unguarded run found pairs
    assert full
