"""Property-based tests (hypothesis) for the pure-Python Zarr v3 codec
stack: arbitrary values x dtypes x chunk geometries x slices round-trip
exactly through write_group / write_sharded_group -> open_array ->
read_range. No Spark involved — these hammer the byte-level edge cases
(partial last chunk, single-row chunks, empty slices, NaN, dtype extremes,
unicode) that example tests tend to miss."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zarr_datafusion_search_spark.sources import zarrv3

SETTINGS = dict(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

FIXED_DTYPES = [
    np.dtype("int8"),
    np.dtype("int32"),
    np.dtype("int64"),
    np.dtype("uint16"),
    np.dtype("float32"),
    np.dtype("float64"),
    np.dtype("datetime64[ms]"),
]


def _values(draw, dt: np.dtype, n: int) -> np.ndarray:
    if dt.kind == "f":
        fin = np.finfo(dt)
        elem = st.one_of(
            st.floats(
                min_value=float(-fin.max) / 2,
                max_value=float(fin.max) / 2,
                width=dt.itemsize * 8,
            ),
            st.just(float("nan")),
        )
        vals = draw(st.lists(elem, min_size=n, max_size=n))
        return np.array(vals, dtype=dt)
    if dt.kind in "iu":
        info = np.iinfo(dt)
        vals = draw(
            st.lists(
                st.integers(min_value=int(info.min), max_value=int(info.max)),
                min_size=n,
                max_size=n,
            )
        )
        return np.array(vals, dtype=dt)
    # datetime64: epoch ticks within a generous window
    vals = draw(
        st.lists(
            st.integers(min_value=-(2**48), max_value=2**48),
            min_size=n,
            max_size=n,
        )
    )
    return np.array(vals, dtype="int64").view(dt)


def _assert_equal(dt: np.dtype, got: np.ndarray, want: np.ndarray) -> None:
    if dt.kind == "M":
        # read_range returns raw epoch ticks; the Arrow assembly layer
        # applies the unit stored in array metadata
        np.testing.assert_array_equal(got, want.view("int64"))
        return
    assert got.dtype == want.dtype
    if dt.kind == "f":
        np.testing.assert_array_equal(
            np.isnan(got), np.isnan(want)
        )
        mask = ~np.isnan(want)
        np.testing.assert_array_equal(got[mask], want[mask])
    else:
        np.testing.assert_array_equal(got, want)


@settings(**SETTINGS)
@given(data=st.data())
def test_roundtrip_fixed_dtypes(data, tmp_path_factory):
    dt = data.draw(st.sampled_from(FIXED_DTYPES), label="dtype")
    n = data.draw(st.integers(min_value=1, max_value=120), label="n_rows")
    chunk = data.draw(st.integers(min_value=1, max_value=50), label="chunk")
    level = data.draw(st.sampled_from([0, 3]), label="zstd")
    arr = _values(data.draw, dt, n)
    store = str(tmp_path_factory.mktemp("prop") / "s.zarr")
    zarrv3.write_group(store, "/g", {"x": arr}, chunk_rows=chunk, zstd_level=level)
    meta = zarrv3.open_array(store, "/g/x")
    if dt.kind == "M":
        assert meta.dtype.unit == np.datetime_data(dt)[0]
    got = meta.read_range(0, n)
    _assert_equal(dt, got, arr)
    # arbitrary slice, including empty
    a = data.draw(st.integers(min_value=0, max_value=n), label="start")
    b = data.draw(st.integers(min_value=0, max_value=n), label="stop")
    got_slice = meta.read_range(a, b)
    want_slice = arr[a:b]
    if b <= a:
        assert len(got_slice) == 0
    else:
        _assert_equal(dt, got_slice, want_slice)


@settings(**SETTINGS)
@given(data=st.data())
def test_roundtrip_strings(data, tmp_path_factory):
    n = data.draw(st.integers(min_value=1, max_value=80), label="n_rows")
    chunk = data.draw(st.integers(min_value=1, max_value=30), label="chunk")
    vals = data.draw(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",)  # no lone surrogates
                ),
                max_size=20,
            ),
            min_size=n,
            max_size=n,
        ),
        label="strings",
    )
    store = str(tmp_path_factory.mktemp("prop") / "s.zarr")
    zarrv3.write_group(store, "/g", {"s": vals}, chunk_rows=chunk)
    meta = zarrv3.open_array(store, "/g/s")
    assert meta.read_range(0, n) == vals
    a = data.draw(st.integers(min_value=0, max_value=n), label="start")
    b = data.draw(st.integers(min_value=a, max_value=n), label="stop")
    assert meta.read_range(a, b) == vals[a:b]


@settings(**SETTINGS)
@given(data=st.data())
def test_roundtrip_sharded(data, tmp_path_factory):
    dt = data.draw(st.sampled_from([np.dtype("int64"), np.dtype("float64")]))
    n = data.draw(st.integers(min_value=1, max_value=200), label="n_rows")
    inner = data.draw(st.integers(min_value=1, max_value=16), label="inner")
    mult = data.draw(st.integers(min_value=1, max_value=6), label="mult")
    shard = inner * mult
    arr = _values(data.draw, dt, n)
    store = str(tmp_path_factory.mktemp("prop") / "s.zarr")
    zarrv3.write_sharded_group(
        store, "/g", {"x": arr}, shard_rows=shard, inner_rows=inner
    )
    meta = zarrv3.open_array(store, "/g/x")
    _assert_equal(dt, meta.read_range(0, n), arr)
    a = data.draw(st.integers(min_value=0, max_value=max(n - 1, 0)), label="start")
    b = data.draw(st.integers(min_value=a + 1, max_value=n), label="stop")
    _assert_equal(dt, meta.read_range(a, b), arr[a:b])


@pytest.mark.parametrize("n,chunk", [(1, 1), (1, 7), (7, 7), (8, 7), (100, 1)])
def test_chunk_geometry_edges(tmp_path, n, chunk):
    arr = np.arange(n, dtype="int64")
    store = str(tmp_path / "s.zarr")
    zarrv3.write_group(store, "/g", {"x": arr}, chunk_rows=chunk)
    meta = zarrv3.open_array(store, "/g/x")
    np.testing.assert_array_equal(meta.read_range(0, n), arr)
