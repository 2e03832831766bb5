"""Multimodal columns: opaque binary payloads + typed metadata.

The convention mirrors the reference's geometry handling — a plain physical
type (there: WKT string, here: ``binary``) carrying semantics in column
metadata (reference: src/schema.rs:57-74). Media decode/feature-extract run
as Arrow-batched ``mapInPandas`` stages.

Two decode paths per operator:

- ``fake=True``: a deterministic byte-level stand-in with the production
  schema/batch shape — what the DuckDB oracle replays bit-for-bit;
- ``fake=False`` (default): REAL decode for the formats the container can
  handle without codec libraries (``functions.media_codecs``): 24-bit BMP,
  PNG (stdlib zlib), baseline JPEG (``functions.jpeg``), and binary PPM
  images, 16-bit PCM WAV audio, and ``video/ppm-stream`` (concatenated
  self-describing PPM frames) as the video container. Formats that
  genuinely require ffmpeg (mp4) raise ``NotImplementedError`` naming the
  supported set.
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

from zarr_datafusion_search_spark.operators.scanning import (
    ensure_scan_parallelism,
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


def _decoded_payload_bytes(payload: bytes, fmt: str) -> bytes:
    """Raw decoded content bytes (pixels / PCM samples / frame pixels) for
    the formats with dependency-free decoders; raises for the rest."""
    from zarr_datafusion_search_spark.functions.media_codecs import (
        SUPPORTED_IMAGE_FORMATS,
        decode_image,
        decode_ppm_stream,
        decode_wav,
    )

    if fmt in SUPPORTED_IMAGE_FORMATS:
        return decode_image(payload, fmt).tobytes()
    if fmt == "audio/wav":
        return decode_wav(payload)[0].tobytes()
    if fmt == "video/ppm-stream":
        return b"".join(f.tobytes() for f in decode_ppm_stream(payload))
    raise NotImplementedError(
        f"real decode of {fmt!r} needs codec libraries not in this "
        "environment; supported: image/bmp, image/png, image/jpeg, "
        "image/x-portable-pixmap, audio/wav, video/ppm-stream (or pass "
        "fake=True for the byte-level stand-in)"
    )


#: fmt="mixed": per-row format by id % 3 — exercises every real image
#: decoder (incl. the stdlib-zlib PNG path) in one pass
_MIXED_IMAGE_FORMATS = ("image/bmp", "image/png", "image/x-portable-pixmap")


def attach_synthetic_images(
    df: DataFrame, id_col: str = "doc_id", fmt: str = "image/bmp"
) -> DataFrame:
    """Attach REAL image bytes (BMP, PNG, or PPM — picked by ``fmt``, or
    per-row by ``id % 3`` with ``fmt="mixed"``) rendered from a closed-form
    pixel function of the row id:

        ``pixel[y, x, c] = (id*31 + 7*y + 3*x + c) % 256``,
        ``w = id % 8 + 1``, ``h = id % 6 + 1``

    Every byte downstream decoders see comes out of a real encoder, and the
    decoded content is predictable in closed form — which is what lets the
    DuckDB oracle verify the real decode path (sum the formula) instead of
    only the fake one. The mixed mode proves per-row format dispatch: the
    same feature pass must route each payload through its own decoder."""

    def _fmt_of(i: int) -> str:
        return (
            _MIXED_IMAGE_FORMATS[i % 3] if fmt == "mixed" else fmt
        )

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from zarr_datafusion_search_spark.functions.media_codecs import (
            encode_image,
        )

        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 8 + 1, i % 6 + 1
                arr = (
                    i * 31
                    + 7 * np.arange(h)[:, None, None]
                    + 3 * np.arange(w)[None, :, None]
                    + np.arange(3)[None, None, :]
                ) % 256
                payloads.append(
                    encode_image(arr.astype(np.uint8), _fmt_of(i))
                )
            yield pd.DataFrame({id_col: pdf[id_col], "media_bytes": payloads})

    if fmt == "mixed":
        fmt_col = (
            F.when(
                F.col(id_col) % 3 == 0, F.lit(_MIXED_IMAGE_FORMATS[0])
            )
            .when(F.col(id_col) % 3 == 1, F.lit(_MIXED_IMAGE_FORMATS[1]))
            .otherwise(F.lit(_MIXED_IMAGE_FORMATS[2]))
        )
    else:
        fmt_col = F.lit(fmt)
    gen = ensure_scan_parallelism(df.select(id_col)).mapInPandas(
        _gen, f"{id_col} long, media_bytes binary"
    )
    return gen.select(
        id_col,
        "media_bytes",
        F.struct(
            fmt_col.alias("format"),
            (F.col(id_col) % 8 + 1).cast("int").alias("width"),
            (F.col(id_col) % 6 + 1).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def attach_synthetic_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach REAL baseline-JPEG bytes (``functions.jpeg``) with per-row
    codec-path variation: subsampling alternates 4:4:4 / 4:2:0 by id
    parity, restart interval cycles ``id % 3`` (0 = none), sizes
    ``w = id % 12 + 4``, ``h = id % 10 + 4`` span multiple MCUs.

    Pixels are FLAT per channel — ``pixel[:, :, c] = (id*31 + 97*c) % 256``
    — because a constant block survives quality-100 JPEG EXACTLY (the DCT
    concentrates it in the DC coefficient, quantizer step 1, total
    reconstruction error < 0.5 before the final round; verified over the
    whole fixture grid in tests). That keeps the decoded content in closed
    form so the DuckDB oracle can verify the REAL lossy-codec path
    bit-for-bit, while gradients (where JPEG is genuinely lossy) are
    covered by tolerance round-trip unit tests."""

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from zarr_datafusion_search_spark.functions.jpeg import encode_jpeg

        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 12 + 4, i % 10 + 4
                img = np.zeros((h, w, 3), np.uint8)
                for c in range(3):
                    img[:, :, c] = (i * 31 + 97 * c) % 256
                payloads.append(
                    encode_jpeg(
                        img,
                        quality=100,
                        subsampling="4:2:0" if i % 2 else "4:4:4",
                        restart_interval=i % 3,
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], "media_bytes": payloads})

    gen = ensure_scan_parallelism(df.select(id_col)).mapInPandas(
        _gen, f"{id_col} long, media_bytes binary"
    )
    return gen.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("image/jpeg").alias("format"),
            (F.col(id_col) % 12 + 4).cast("int").alias("width"),
            (F.col(id_col) % 10 + 4).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def attach_synthetic_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach REAL mono 16-bit WAV bytes with closed-form PCM samples:
    ``n = id % 32 + 4`` samples, ``sample[k] = ((id*13 + 5*k) % 65536) -
    32768`` — stdlib ``wave``-encoded, so the decode path exercises a real
    RIFF parse while the oracle predicts the PCM content exactly."""

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from zarr_datafusion_search_spark.functions.media_codecs import encode_wav

        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                n = i % 32 + 4
                samples = ((i * 13 + 5 * np.arange(n)) % 65536 - 32768).astype(
                    "<i2"
                )
                payloads.append(encode_wav(samples))
            yield pd.DataFrame({id_col: pdf[id_col], "media_bytes": payloads})

    gen = ensure_scan_parallelism(df.select(id_col)).mapInPandas(
        _gen, f"{id_col} long, media_bytes binary"
    )
    return gen.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("audio/wav").alias("format"),
            (F.col(id_col) % 32 + 4).cast("int").alias("n_samples"),
        ).alias("media_meta"),
    )


def attach_synthetic_ppm_video(
    df: DataFrame, id_col: str = "doc_id", width: int = 4, height: int = 3
) -> DataFrame:
    """Attach a REAL ``video/ppm-stream`` container: ``id % 4 + 1``
    concatenated P6 frames, frame ``f`` pixels
    ``(id*31 + 11*f + 7*y + 3*x + c) % 256`` — samplers must parse the
    embedded PPM headers to find frame boundaries."""

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from zarr_datafusion_search_spark.functions.media_codecs import (
            encode_ppm_stream,
        )

        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                frames = [
                    (
                        (
                            i * 31
                            + 11 * f
                            + 7 * np.arange(height)[:, None, None]
                            + 3 * np.arange(width)[None, :, None]
                            + np.arange(3)[None, None, :]
                        )
                        % 256
                    ).astype(np.uint8)
                    for f in range(i % 4 + 1)
                ]
                payloads.append(encode_ppm_stream(frames))
            yield pd.DataFrame({id_col: pdf[id_col], "media_bytes": payloads})

    gen = ensure_scan_parallelism(df.select(id_col)).mapInPandas(
        _gen, f"{id_col} long, media_bytes binary"
    )
    return gen.select(
        id_col,
        "media_bytes",
        F.struct(
            F.lit("video/ppm-stream").alias("format"),
            (F.col(id_col) % 4 + 1).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


def extract_media_features(
    media: DataFrame, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``fake=True`` computes byte-level features over the RAW payload (the
    deterministic stand-in the oracle replays); the real path DECODES the
    payload per its typed format (BMP/PPM pixels, WAV PCM samples,
    PPM-stream frames) and computes the same features over the decoded
    content bytes — so e.g. BMP row padding and headers don't leak into
    the features, and a corrupt payload fails loudly in the decode.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        def content(b: bytes, fmt: str) -> bytes:
            return bytes(b) if fake else _decoded_payload_bytes(bytes(b), fmt)

        for pdf in batches:
            decoded = [
                content(b, f) for b, f in zip(pdf["media_bytes"], pdf["fmt"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_format": pdf["fmt"],
                    "n_bytes": [len(d) for d in decoded],
                    "first_byte": [d[0] if len(d) else -1 for d in decoded],
                    "byte_checksum": [
                        int(np.frombuffer(d, dtype=np.uint8).sum()) % (1 << 31)
                        if d
                        else 0
                        for d in decoded
                    ],
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
    executor, output batches are frame-granular.

    The real path (default) parses ``video/ppm-stream`` containers — frame
    boundaries come from each embedded PPM header, sampled frames are
    re-encoded as standalone PPM images (mp4 would need ffmpeg and raises).
    The fake decoder models a video of ``n_frames`` equal byte slices and
    emits the sampled slices — deterministic, so the whole plumbing
    (explosion factor, offsets, batch schema) is oracle-checkable.
    """

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "frame_bytes", "frame_n_bytes")}
            if fake:
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
            else:
                from zarr_datafusion_search_spark.functions.media_codecs import (
                    decode_ppm_stream,
                    encode_ppm,
                )

                for doc, payload, fmt in zip(
                    pdf[id_col], pdf["media_bytes"], pdf["fmt"]
                ):
                    if fmt != "video/ppm-stream":
                        raise NotImplementedError(
                            f"real frame decode of {fmt!r} requires "
                            "av/ffmpeg; supported: video/ppm-stream "
                            "(or pass fake=True)"
                        )
                    frames = decode_ppm_stream(bytes(payload))
                    for i in range(0, len(frames), every_n):
                        fb = encode_ppm(frames[i])
                        out["doc_id"].append(doc)
                        out["frame_idx"].append(i)
                        out["frame_bytes"].append(fb)
                        out["frame_n_bytes"].append(len(fb))
            yield pd.DataFrame(out)

    meta_col = (
        F.col("media_meta").getField("n_frames").alias("n_frames")
        if fake
        else F.col("media_meta").getField("format").alias("fmt")
    )
    prepared = media.select(F.col(id_col), F.col("media_bytes"), meta_col)
    return prepared.mapInPandas(_sample, FRAME_SCHEMA)


def audio_windows(
    media: DataFrame,
    window_bytes: int = 64,
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Split each audio payload into fixed-size windows (ragged tail kept).

    Same contract as :func:`sample_frames`: Arrow-batched explosion. The
    real path (default) DECODES ``audio/wav`` payloads with the stdlib
    ``wave`` reader and windows over the decoded PCM sample bytes — RIFF
    headers never leak into windows, and ``start_byte`` indexes the PCM
    stream; the fake path windows the raw payload bytes (the oracle
    stand-in).
    """

    def _windows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def pcm(payload: bytes, fmt: str) -> bytes:
            if fake:
                return bytes(payload)
            if fmt != "audio/wav":
                raise NotImplementedError(
                    f"real audio decode of {fmt!r} requires soundfile/"
                    "librosa; supported: audio/wav (or pass fake=True)"
                )
            from zarr_datafusion_search_spark.functions.media_codecs import (
                decode_wav,
            )

            return decode_wav(bytes(payload))[0].tobytes()

        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "window_idx", "start_byte", "window_bytes", "window_n_bytes",
                )
            }
            for doc, payload, fmt in zip(
                pdf[id_col], pdf["media_bytes"], pdf["fmt"]
            ):
                stream = pcm(payload, fmt)
                for w, start in enumerate(range(0, len(stream), window_bytes)):
                    piece = stream[start : start + window_bytes]
                    out["doc_id"].append(doc)
                    out["window_idx"].append(w)
                    out["start_byte"].append(start)
                    out["window_bytes"].append(piece)
                    out["window_n_bytes"].append(len(piece))
            yield pd.DataFrame(out)

    prepared = media.select(
        F.col(id_col),
        F.col("media_bytes"),
        F.col("media_meta").getField("format").alias("fmt"),
    )
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

    The real path (default) decodes BMP/PPM pixels, nearest-neighbor
    resamples to ``width x height``, and re-encodes in the SAME format —
    an actual thumbnailer on real bytes. The fake path stride-samples the
    payload down to ``width*height`` bytes (padding with zeros when
    shorter) — same output cardinality and schema, oracle-replayable.
    """
    target = width * height

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        def shrink_fake(b: bytes) -> bytes:
            if len(b) >= target:
                stride = len(b) / target
                return bytes(b[int(i * stride)] for i in range(target))
            return bytes(b) + b"\x00" * (target - len(b))

        def shrink_real(b: bytes, fmt: str) -> bytes:
            from zarr_datafusion_search_spark.functions.media_codecs import (
                decode_image,
                encode_image,
                nearest_resize,
            )

            return encode_image(
                nearest_resize(decode_image(bytes(b), fmt), width, height), fmt
            )

        for pdf in batches:
            if fake:
                payloads = pdf["media_bytes"].map(shrink_fake)
            else:
                payloads = [
                    shrink_real(b, f)
                    for b, f in zip(pdf["media_bytes"], pdf["fmt"])
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_bytes": payloads,
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


def image_channel_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-channel pixel statistics over REAL decoded images (mean/min/max
    per RGB channel) — the feature-extraction profile step an image-corpus
    pipeline runs for normalization constants and outlier gates. Decode is
    the real BMP/PPM parse; stats are exact integer sums divided in double,
    bit-identical cross-engine with no rounding (Python round() is
    banker's, SQL round() is half-up — skipping rounding sidesteps the
    disagreement entirely).

    Returns one row per (id, channel): long format keeps the schema stable
    for any channel count."""

    def _stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from zarr_datafusion_search_spark.functions.media_codecs import (
            decode_image,
        )

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "channel", "mean_value", "min_value", "max_value")}
            for doc, payload, fmt in zip(
                pdf[id_col], pdf["media_bytes"], pdf["fmt"]
            ):
                arr = decode_image(bytes(payload), fmt)
                flat = arr.reshape(-1, arr.shape[2]).astype(np.int64)
                for c in range(arr.shape[2]):
                    col = flat[:, c]
                    out["doc_id"].append(doc)
                    out["channel"].append(c)
                    out["mean_value"].append(float(col.sum()) / len(col))
                    out["min_value"].append(int(col.min()))
                    out["max_value"].append(int(col.max()))
            yield pd.DataFrame(out)

    prepared = media.select(
        F.col(id_col),
        F.col("media_bytes"),
        F.col("media_meta").getField("format").alias("fmt"),
    )
    return prepared.mapInPandas(
        _stats,
        f"{id_col} long, channel int, mean_value double, "
        "min_value int, max_value int",
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
