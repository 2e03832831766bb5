"""Exercise the remote (fsspec) storage branch of zarrv3 with a stub
filesystem, so the object-store code path has real coverage even though
fsspec isn't installed in this environment (reference parity:
``Table.from_obstore``, reference python/src/table.rs:28-42)."""

import os
import sys
import types

import numpy as np
import pytest

from zarr_datafusion_search_spark.sources import zarrv3


class _DictFS:
    """Minimal fsspec-filesystem lookalike over an in-memory {path: bytes}."""

    def __init__(self, files: dict):
        self.files = files
        self.calls = []

    def cat_file(self, path):
        self.calls.append(("cat_file", path))
        try:
            return self.files[path]
        except KeyError:
            raise FileNotFoundError(path)

    def exists(self, path):
        self.calls.append(("exists", path))
        return path in self.files or self.isdir(path)

    def isdir(self, path):
        prefix = path.rstrip("/") + "/"
        return any(p.startswith(prefix) for p in self.files)

    def ls(self, path):
        prefix = path.rstrip("/") + "/"
        children = set()
        for p in self.files:
            if p.startswith(prefix):
                rest = p[len(prefix):]
                children.add(prefix + rest.split("/", 1)[0])
        return sorted(children)


@pytest.fixture()
def mem_store(tmp_path, monkeypatch):
    """A real store written locally, mirrored under mem://bucket/store."""
    local = str(tmp_path / "remote.zarr")
    zarrv3.write_group(
        local, "g",
        {"x": np.arange(1000, dtype=np.int64),
         "s": [f"v{i:04d}" for i in range(1000)]},
        chunk_rows=100,
    )
    files = {}
    for root, _dirs, names in os.walk(local):
        for n in names:
            p = os.path.join(root, n)
            rel = os.path.relpath(p, local)
            files["mem://bucket/store/" + rel.replace(os.sep, "/")] = open(p, "rb").read()
    fs = _DictFS(files)
    fake = types.ModuleType("fsspec")
    fake.filesystem = lambda proto: fs
    monkeypatch.setitem(sys.modules, "fsspec", fake)
    return fs


def test_remote_open_group_and_read(mem_store):
    group = zarrv3.open_group("mem://bucket/store", "g")
    assert set(group.arrays) == {"x", "s"}
    assert group.n_rows == 1000
    meta = group.arrays["x"]
    assert list(meta.read_range(0, 5)) == [0, 1, 2, 3, 4]
    # unaligned cross-chunk slice
    assert list(meta.read_range(95, 105)) == list(range(95, 105))
    s = group.arrays["s"].read_range(998, 1000)
    assert s == ["v0998", "v0999"]
    # every byte came through the stub fs, not the local filesystem
    assert any(c[0] == "cat_file" for c in mem_store.calls)


def test_remote_missing_chunk_fills(mem_store):
    # drop one chunk object: reads must fall back to the fill value
    del mem_store.files["mem://bucket/store/g/x/c/3"]
    meta = zarrv3.open_array("mem://bucket/store", "g/x")
    vals = list(meta.read_range(300, 400))
    assert vals == [0] * 100


def test_remote_chunk_pruning_partitions(mem_store):
    """The reader's stats-based pruning works identically through the
    remote branch (metadata reads only — no chunk data fetched)."""
    from pyspark.sql.datasource import GreaterThan
    from zarr_datafusion_search_spark.sources.zarr_datasource import ZarrReader
    from zarr_datafusion_search_spark.sources.typemap import group_schema

    group = zarrv3.open_group("mem://bucket/store", "g")
    schema = group_schema({n: m.dtype for n, m in group.arrays.items()})
    r = ZarrReader("mem://bucket/store", "g", schema, partition_rows=100)
    list(r.pushFilters([GreaterThan(("x",), 899)]))
    parts = [p for p in r.partitions() if p.stop > p.start]
    assert len(parts) == 1 and parts[0].start == 900
    data_fetches = [c for c in mem_store.calls if c[0] == "cat_file" and "/c/" in c[1]]
    assert not data_fetches  # planning touched metadata only


def test_remote_without_fsspec_errors():
    saved = sys.modules.pop("fsspec", None)
    try:
        with pytest.raises(zarrv3.ZarrError, match="fsspec"):
            zarrv3.open_group("s3://bucket/nope", "g")
    finally:
        if saved is not None:
            sys.modules["fsspec"] = saved
