from zarr_datafusion_search_spark.operators import (
    asof,
    dedup,
    multimodal,
    sessions,
    similarity,
    text,
    timeseries,
)

__all__ = [
    "asof",
    "dedup",
    "multimodal",
    "sessions",
    "similarity",
    "text",
    "timeseries",
]
