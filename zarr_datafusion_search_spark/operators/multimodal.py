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
