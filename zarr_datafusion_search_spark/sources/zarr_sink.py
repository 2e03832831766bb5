"""Distributed (task-side) Zarr sink — the scale path for writing.

The ``zdss_zarr`` format writer (``zarr_datasource.ZarrWriter``) stages Arrow
files per task and assembles chunks serially on the driver: correct, but
throughput is driver-bound. This module implements the documented scale
shape (reference is read-only — the whole sink is a beyond-parity
extension):

1. **global row ids** — ``monotonically_increasing_id`` decomposes into
   (partition id, within-partition offset); one metadata-light pass counts
   rows per partition, a broadcast offset map turns the pair into a global
   contiguous row id. The input is persisted for the duration of the write
   so both passes see the same partition layout.
2. **repartition on chunk id** — ``row_id // chunk_rows``; a single hash
   shuffle groups every row of a chunk into one task.
3. **task-side chunk writes** — ``applyInPandas`` per chunk id: each group
   IS one complete chunk; the task sorts it by row id, encodes every column
   with the same codec stack as the streaming writer
   (:func:`zarrv3.encode_chunk_payload`), writes the chunk files, and
   returns one metadata row (chunk id, rows, per-column min/max).
4. **metadata-only commit** — the driver verifies chunk coverage from the
   returned rows (n_chunks rows, not data) and writes each array's
   ``zarr.json`` with the assembled chunk stats.

Nulls: the Zarr table model is non-nullable (every chunk is a dense typed
buffer). Null-bearing columns fail loudly task-side unless ``null_fill``
supplies a per-column substitute.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: monotonically_increasing_id() = partition_id << 33 | within-partition seq.
_MONO_PART_SHIFT = 33


def write_zarr_distributed(
    df: DataFrame,
    path: str,
    group_path: str = "/",
    chunk_rows: int = 65536,
    zstd_level: int = 0,
    null_fill: dict | None = None,
    overwrite: bool = False,
    inner_rows: int | None = None,
) -> int:
    """Write ``df`` as a Zarr v3 group of parallel 1-D arrays; returns the
    row count. Executors write whole chunks in parallel; the driver commits
    metadata only.

    With ``inner_rows`` the store is ``sharding_indexed``: each task's unit
    becomes one SHARD object of ``chunk_rows`` rows packing independently
    compressed ``inner_rows`` chunks plus a crc32c-checksummed index — the
    object-count-friendly layout for 100 TB stores (same read granularity,
    ~chunk_rows/inner_rows fewer objects)."""
    import numpy as np

    from zarr_datafusion_search_spark.sources import zarrv3
    from zarr_datafusion_search_spark.sources.zarr_datasource import ZarrWriter

    if inner_rows is not None and chunk_rows % inner_rows != 0:
        raise ValueError("chunk_rows (shard size) must be a multiple of inner_rows")
    schema = df.schema
    col_specs = {f.name: ZarrWriter._col_spec(f) for f in schema.fields}
    null_fill = dict(null_fill or {})
    for c in null_fill:
        if c not in col_specs:
            raise KeyError(f"null_fill column {c!r} not in DataFrame")

    if os.path.exists(os.path.join(path, "zarr.json")):
        if not overwrite:
            raise ValueError(
                f"zarr store already exists at {path}; pass overwrite=True "
                "(zarr's regular chunk grid does not support row append)"
            )
        import shutil

        shutil.rmtree(path)

    # ---- phase 1: global row ids -------------------------------------
    df = df.persist()
    try:
        mono = df.withColumn("_mono", F.monotonically_increasing_id())
        with_pid = mono.withColumn(
            "_pid", F.shiftright("_mono", _MONO_PART_SHIFT).cast("int")
        ).withColumn(
            "_local", F.col("_mono").bitwiseAND(F.lit((1 << _MONO_PART_SHIFT) - 1))
        )
        counts = {
            r._pid: r.n
            for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        total = sum(counts.values())
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        n_chunks = max(1, -(-total // chunk_rows))

        offset_expr = "CASE _pid " + " ".join(
            f"WHEN {pid} THEN {off}L" for pid, off in offsets.items()
        ) + " END"
        rows = with_pid.withColumn(
            "_row_id", F.expr(offset_expr) + F.col("_local")
        ).withColumn(
            "_chunk_id", (F.col("_row_id") / F.lit(chunk_rows)).cast("long")
        ).drop("_mono", "_pid", "_local")

        # ---- driver: store/group skeleton (metadata only) ------------
        group_dir = zarrv3.init_group(path, group_path)
        for f in schema.fields:
            os.makedirs(os.path.join(group_dir, f.name, "c"), exist_ok=True)

        # ---- phase 2+3: shuffle on chunk id, task-side chunk writes --
        names = [f.name for f in schema.fields]
        specs = col_specs
        is_multi = n_chunks > 1
        last_chunk = n_chunks - 1
        last_rows = total - last_chunk * chunk_rows

        def write_chunk(pdf):
            import pandas as pd

            cid = int(pdf["_chunk_id"].iloc[0])
            pdf = pdf.sort_values("_row_id")
            row_ids = pdf["_row_id"].to_numpy()
            expect = last_rows if cid == last_chunk else chunk_rows
            if len(pdf) != expect or row_ids[0] != cid * chunk_rows or (
                len(row_ids) > 1 and (np.diff(row_ids) != 1).any()
            ):
                raise ValueError(
                    f"chunk {cid}: non-contiguous row ids "
                    f"[{row_ids[0]}..{row_ids[-1]}], n={len(pdf)}, "
                    f"expected {expect} from {cid * chunk_rows}"
                )
            pad = chunk_rows - expect if (is_multi and expect < chunk_rows) else 0
            stats = {}
            for name in names:
                spec = specs[name]
                s = pdf[name]
                is_float = (
                    not spec["is_string"]
                    and not spec.get("datetime_unit")
                    and spec["np_dtype"].kind == "f"
                )
                # float nulls arrive as NaN (Arrow->pandas) and NaN is a
                # legal zarr float value, so floats pass through; every
                # other type must be dense or explicitly filled.
                if not is_float and s.isna().any():
                    if name in null_fill:
                        s = s.fillna(null_fill[name])
                    else:
                        raise ValueError(
                            f"column {name!r} has {int(s.isna().sum())} nulls "
                            f"in chunk {cid}: the zarr table model is "
                            "non-nullable — drop/fill nulls first or pass "
                            "null_fill={...}"
                        )
                if spec["is_string"]:
                    vals = s.astype(str).tolist()
                elif spec.get("datetime_unit"):
                    s = pd.to_datetime(s)
                    if getattr(s.dt, "tz", None) is not None:
                        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
                    vals = s.to_numpy().astype("datetime64[us]").astype("<i8")
                else:
                    vals = s.to_numpy().astype(spec["np_dtype"])
                lo, hi = zarrv3.chunk_stats(vals, spec["is_string"])
                stats[name] = [lo, hi]
                if inner_rows is not None:
                    payload = zarrv3.encode_shard_payload(
                        vals,
                        spec["is_string"],
                        inner_rows,
                        chunk_rows,
                        zstd_level,
                        index_crc32c=True,
                    )
                else:
                    payload = zarrv3.encode_chunk_payload(
                        vals, spec["is_string"], pad, zstd_level
                    )
                with open(os.path.join(group_dir, name, "c", str(cid)), "wb") as fh:
                    fh.write(payload)
            return pd.DataFrame(
                {"chunk_id": [cid], "n": [expect], "stats": [json.dumps(stats)]}
            )

        done = (
            rows.groupBy("_chunk_id")
            .applyInPandas(write_chunk, "chunk_id long, n long, stats string")
            .collect()
        )
    finally:
        df.unpersist()

    # ---- phase 4: metadata-only commit -------------------------------
    got = {r.chunk_id: r for r in done}
    missing = [c for c in range(n_chunks) if c not in got] if total else []
    if missing or len(got) != (n_chunks if total else 0):
        raise ValueError(
            f"chunk coverage mismatch: expected {n_chunks}, got "
            f"{sorted(got)}; missing {missing}"
        )
    written = sum(r.n for r in got.values())
    if written != total:
        raise ValueError(f"row count mismatch: wrote {written}, expected {total}")
    for f in schema.fields:
        if total:
            per_chunk = [json.loads(got[c].stats)[f.name] for c in range(n_chunks)]
            stat_min = [s[0] for s in per_chunk]
            stat_max = [s[1] for s in per_chunk]
        else:
            stat_min, stat_max = [], []
        zarrv3.write_array_metadata(
            os.path.join(group_dir, f.name),
            n_rows=total,
            chunk_rows=chunk_rows,
            is_string=col_specs[f.name]["is_string"],
            np_dtype=col_specs[f.name].get("np_dtype"),
            datetime_unit=col_specs[f.name].get("datetime_unit"),
            zstd_level=zstd_level,
            stat_min=stat_min,
            stat_max=stat_max,
            inner_rows=inner_rows,
            index_crc32c=inner_rows is not None,
        )
    return total


def compact_zarr_stores(
    spark,
    stores: list[str],
    out_path: str,
    group_path: str = "/",
    chunk_rows: int = 65536,
    inner_rows: int | None = None,
    zstd_level: int = 0,
) -> int:
    """Rewrite many small Zarr stores (e.g. streaming landing-zone batch
    stores from ``write_stream_to_zarr``) into ONE store, optionally
    sharded. The compaction job a landing zone needs: reads are a chunk-
    partitioned union scan (parallel across stores and chunks), the write
    is the distributed sink — both ends executor-side, metadata-only on
    the driver. Schemas must match across stores. Returns rows written."""
    from functools import reduce

    from zarr_datafusion_search_spark.sources.zarr_table import ZarrTable

    if not stores:
        raise ValueError("no stores to compact")
    dfs = [ZarrTable(s, group_path).to_df(spark) for s in stores]
    union = reduce(lambda a, b: a.unionByName(b), dfs)
    return write_zarr_distributed(
        union,
        out_path,
        group_path=group_path,
        chunk_rows=chunk_rows,
        inner_rows=inner_rows,
        zstd_level=zstd_level,
    )
