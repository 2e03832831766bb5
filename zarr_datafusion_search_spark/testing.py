"""Test fixtures (mirrors the reference's test-only ``src/testing`` module).

``make_parity_fixture`` regenerates the reference's golden 3-row store with
the same recipe as reference scripts/generate_data.py:1-36: group ``meta``
with arrays ``date`` (datetime64[ms]), ``collection`` (vlen-utf8), ``bbox``
(WKT boxes ±10/±20/±30). Golden epoch millis asserted by the reference at
src/testing/load_into_arrow.rs:95-97.
"""

from __future__ import annotations

import numpy as np

from zarr_datafusion_search_spark.sources import zarrv3

GOLDEN_EPOCH_MS = [1672531200000, 1672617600000, 1672704000000]
GOLDEN_COLLECTIONS = ["collection_a", "collection_b", "collection_c"]


def _box_wkt(k: int) -> str:
    # shapely.box(-k,-k,k,k).wkt output shape, integer coordinates
    return (
        f"POLYGON (({k} -{k}, {k} {k}, -{k} {k}, -{k} -{k}, {k} -{k}))"
    )


GOLDEN_BBOXES = [_box_wkt(10), _box_wkt(20), _box_wkt(30)]


def make_parity_fixture(store_path: str) -> str:
    """Write the 3-row golden store; returns the store path."""
    zarrv3.write_group(
        store_path,
        "meta",
        {
            "date": np.array(
                ["2023-01-01", "2023-01-02", "2023-01-03"], dtype="datetime64[ms]"
            ),
            "collection": list(GOLDEN_COLLECTIONS),
            "bbox": list(GOLDEN_BBOXES),
        },
        chunk_rows=3,
        zstd_level=0,
    )
    return store_path


def make_scaled_fixture(store_path: str, n_rows: int, chunk_rows: int = 65536) -> str:
    """A larger store produced by the same recipe, for scan benchmarks."""
    rng = np.random.default_rng(42)
    base = np.datetime64("2023-01-01", "ms")
    dates = base + rng.integers(0, 365 * 24 * 3600 * 1000, n_rows).astype(
        "timedelta64[ms]"
    )
    letters = np.array(list("abcdefgh"))
    collections = [f"collection_{letters[i % 8]}" for i in rng.integers(0, 8, n_rows)]
    ks = rng.integers(1, 90, n_rows)
    bboxes = [_box_wkt(int(k)) for k in ks]
    zarrv3.write_group(
        store_path,
        "meta",
        {"date": dates.astype("datetime64[ms]"), "collection": collections, "bbox": bboxes},
        chunk_rows=chunk_rows,
        zstd_level=0,
    )
    return store_path
