"""Multimodal columns: opaque binary payloads + typed metadata.

The convention mirrors the reference's geometry handling — a plain physical
type (there: WKT string, here: ``binary``) carrying semantics in column
metadata (reference: src/schema.rs:57-74). Media decode/feature-extract run
as Arrow-batched ``mapInPandas`` stages: the Spark-side plumbing (schema,
partitioning, batch shape) is real; the pixel/sample decode itself is
STUBBED because no image/audio codec libraries exist in this container —
the stub raises ``NotImplementedError`` unless ``fake=True``, which swaps in
a deterministic byte-level feature extractor with the same shape.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: column metadata convention for media columns (cf. geoarrow markers)
MEDIA_METADATA_KEY = "media:format"

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("byte_checksum", LongType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a synthetic binary media column derived from the text payload
    (deterministic stand-in for image/audio bytes) plus typed metadata."""
    return df.select(
        id_col,
        F.encode("text", "utf-8").alias("media_bytes"),
        F.struct(
            F.lit("image/png").alias("format"),
            (F.col(id_col) % 640 + 1).cast("int").alias("width"),
            (F.col(id_col) % 480 + 1).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def extract_media_features(
    media: DataFrame, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    With ``fake=True`` computes deterministic byte-level features (length,
    first byte, additive checksum) — exercising the exact partitioning, UDF
    signature, and batch shape a real decoder would use. With ``fake=False``
    raises ``NotImplementedError`` from the executors: real decode needs
    image/audio libraries not present in this container.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries (PIL/av/soundfile) "
                    "not available in this environment; pass fake=True for "
                    "the deterministic byte-level extractor"
                )
            payloads = pdf["media_bytes"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_format": pdf["fmt"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "byte_checksum": payloads.map(lambda b: int(sum(b)) % (1 << 31)),
                }
            )

    prepared = media.select(
        F.col(id_col),
        F.col("media_bytes"),
        F.col("media_meta").getField("format").alias("fmt"),
    )
    return prepared.mapInPandas(_extract, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# video frame sampling / audio windowing / resize
# ---------------------------------------------------------------------------

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_n_bytes", LongType()),
    ]
)

WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("start_byte", LongType()),
        StructField("window_bytes", BinaryType()),
        StructField("window_n_bytes", LongType()),
    ]
)


def attach_fake_video(
    df: DataFrame, id_col: str = "doc_id", n_frames_mod: int = 12
) -> DataFrame:
    """Synthetic video column: payload derived from text, frame count in
    typed metadata (a real pipeline would carry container metadata the same
    way — format + n_frames + fps — so samplers never parse the container
    on the planning side)."""
    return df.select(
        id_col,
        F.encode("text", "utf-8").alias("media_bytes"),
        F.struct(
            F.lit("video/mp4").alias("format"),
            (F.col(id_col) % n_frames_mod + 1).cast("int").alias("n_frames"),
            F.lit(4).alias("fps"),
        ).alias("media_meta"),
    )


def sample_frames(
    media: DataFrame,
    every_n: int = 2,
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video into its own row.

    Row explosion happens inside the Arrow-batched ``mapInPandas`` stage
    (one input video batch -> many frame rows), the shape a real
    container-parsing sampler (av/ffmpeg) would use: payload stays on the
    executor, output batches are frame-granular. The fake decoder models a
    video of ``n_frames`` equal byte slices and emits the sampled slices —
    deterministic, so the whole plumbing (explosion factor, offsets, batch
    schema) is oracle-checkable; the real decode is gated like
    :func:`extract_media_features`.
    """

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video frame decode requires av/ffmpeg, not available in "
                    "this environment; pass fake=True for the deterministic "
                    "slice-based sampler"
                )
            out = {k: [] for k in ("doc_id", "frame_idx", "frame_bytes", "frame_n_bytes")}
            for doc, payload, n_frames in zip(
                pdf[id_col], pdf["media_bytes"], pdf["n_frames"]
            ):
                n = int(n_frames)
                size = len(payload) // n if n else 0
                for i in range(0, n, every_n):
                    # last frame takes the remainder bytes
                    end = (i + 1) * size if i < n - 1 else len(payload)
                    frame = payload[i * size : end]
                    out["doc_id"].append(doc)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(frame)
                    out["frame_n_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    prepared = media.select(
        F.col(id_col),
        F.col("media_bytes"),
        F.col("media_meta").getField("n_frames").alias("n_frames"),
    )
    return prepared.mapInPandas(_sample, FRAME_SCHEMA)


def audio_windows(
    media: DataFrame,
    window_bytes: int = 64,
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Split each audio payload into fixed-size windows (ragged tail kept).

    Same contract as :func:`sample_frames`: Arrow-batched explosion with a
    deterministic fake (byte windows stand in for PCM sample windows), the
    real resample/decode gated on codec libraries.
    """

    def _windows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires soundfile/librosa, not available "
                    "in this environment; pass fake=True for the "
                    "deterministic byte-window splitter"
                )
            out = {
                k: []
                for k in (
                    "doc_id", "window_idx", "start_byte", "window_bytes", "window_n_bytes",
                )
            }
            for doc, payload in zip(pdf[id_col], pdf["media_bytes"]):
                for w, start in enumerate(range(0, len(payload), window_bytes)):
                    piece = payload[start : start + window_bytes]
                    out["doc_id"].append(doc)
                    out["window_idx"].append(w)
                    out["start_byte"].append(start)
                    out["window_bytes"].append(piece)
                    out["window_n_bytes"].append(len(piece))
            yield pd.DataFrame(out)

    prepared = media.select(F.col(id_col), F.col("media_bytes"))
    return prepared.mapInPandas(_windows, WINDOW_SCHEMA)


def resize_media(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """binary -> binary transform keeping the media column convention:
    payload replaced, metadata struct updated with the new dimensions.

    The fake resize stride-samples the payload down to ``width*height``
    bytes (padding with zeros when shorter) — same output cardinality and
    schema as a real thumbnailer; real pixel resampling is gated.
    """
    target = width * height

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL, not available in this "
                    "environment; pass fake=True for the deterministic "
                    "stride sampler"
                )

            def shrink(b: bytes) -> bytes:
                if len(b) >= target:
                    stride = len(b) / target
                    return bytes(b[int(i * stride)] for i in range(target))
                return bytes(b) + b"\x00" * (target - len(b))

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_bytes": pdf["media_bytes"].map(shrink),
                    "fmt": pdf["fmt"],
                }
            )

    prepared = media.select(
        F.col(id_col),
        F.col("media_bytes"),
        F.col("media_meta").getField("format").alias("fmt"),
    )
    resized = prepared.mapInPandas(
        _resize, f"{id_col} long, media_bytes binary, fmt string"
    )
    return resized.select(
        id_col,
        "media_bytes",
        F.struct(
            F.col("fmt").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def fake_embed_media(
    media: DataFrame, id_col: str = "doc_id", dim: int = 8
) -> DataFrame:
    """Deterministic stand-in for a CLIP-style media encoder: ``dim``
    pseudo-embedding components derived from the payload bytes through the
    engine-portable hash family (so the DuckDB oracle reproduces them
    bit-for-bit). The real encoder would be an Arrow-batched ``mapInPandas``
    model call with this exact output shape (id + array<double>); swapping
    it in changes nothing downstream — the point of the composition test:
    media -> embedding -> ANN runs entirely on the engine's vector ops.
    """
    from zarr_datafusion_search_spark.functions.hashing import h64_seeded

    payload = F.decode(F.col("media_bytes"), "utf-8")
    comps = [
        ((h64_seeded(payload, i) % 2001) - 1000) / F.lit(1000.0)
        for i in range(dim)
    ]
    return media.select(F.col(id_col), F.array(*comps).alias("embedding"))
