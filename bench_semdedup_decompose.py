#!/usr/bin/env python
"""Decompose the SemDeDup pair-stage wall into its components (VERDICT r09
ask #6): at 300x the within-cell math is ~2 core-minutes but the
applyInPandas stage walls at ~2-3 minutes — this harness measures WHERE
that wall is (shuffle vs Arrow/pandas group assembly vs the GEMM itself)
so optimization targets the real component instead of the guessed one.

Method — two independent probes of the same single run:

* **Python-side accumulators** (the ``instrument`` hook on
  :func:`semantic_dedup_pairs`): per-cell wall inside ``gemm_cell`` split
  into group prep (downsample + vstack + normalize), the blocked GEMM
  scoring loop, and result-frame assembly; plus the assignment UDF's GEMM
  time. These are *Python compute* seconds, summed across all tasks — on
  an idle 32-core host, divide by the task-concurrency to compare with
  wall time.
* **JVM stage metrics** (``/api/v1`` REST, ``spark.ui.enabled=true``):
  per-stage executorRunTime, shuffle write/read bytes and times. In
  applyInPandas the JVM task thread blocks while its Python worker
  computes, so

      stage executorRunTime
        = shuffle read/write + Arrow ser/de + pandas assembly
          + Python compute (accumulators) + scheduling slack

  and the **Arrow + assembly + pipe** component is the residual after
  subtracting the accumulator seconds and the JVM shuffle components.

Defaults to the 300x scale point on the strict (0.75) twin — the member
whose time isolates operator scaling (the 0.4 threshold's output is
quadratic on these tables by data construction). Writes
``BENCH_SEMDEDUP_DECOMP.json`` and prints one summary JSON line.

Usage::

    SPARK_GRAFT_SCALE_K=300 python bench_semdedup_decompose.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_SCALE_K", "300")

THRESHOLD = float(os.environ.get("SPARK_GRAFT_SEMDEDUP_THRESHOLD", "0.75"))
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_SEMDEDUP_DECOMP.json"
)


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.loads(resp.read().decode())


def main() -> None:
    import bench_scale
    from zarr_datafusion_search_spark import benchutil
    from zarr_datafusion_search_spark.engine import build_session
    from zarr_datafusion_search_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    counts = bench_scale.build_scale_dir()
    spark = build_session(
        app_name="zdss-semdedup-decompose",
        master=f"local[{bench_scale.CPUS}]",
        shuffle_partitions=int(bench_scale.CPUS),
        extra_conf={
            # UI on: the REST stage/SQL metrics ARE the measurement here
            "spark.ui.enabled": "true",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixed_cost_s, load1_start = benchutil.wait_for_idle(spark)

    sc = spark.sparkContext
    acc = {
        "assign_s": sc.accumulator(0.0),
        "prep_s": sc.accumulator(0.0),
        "gemm_s": sc.accumulator(0.0),
        "emit_s": sc.accumulator(0.0),
        "cells": sc.accumulator(0),
        "rows": sc.accumulator(0),
        "pairs": sc.accumulator(0),
    }

    emb = spark.read.parquet(
        os.path.join(bench_scale.SCALE_DIR, "embeddings.parquet")
    )

    def run(instrument):
        t0 = time.perf_counter()
        n = semantic_dedup_pairs(
            emb,
            threshold=THRESHOLD,
            n_centroids="auto",
            instrument=instrument,
        ).count()
        return time.perf_counter() - t0, n

    # warmup (uninstrumented), then the measured instrumented run
    warm_s, n_pairs = run(None)
    wall_s, n_pairs2 = run(acc)
    assert n_pairs == n_pairs2, (n_pairs, n_pairs2)

    # ---- JVM-side stage metrics for the measured run -------------------
    ui = sc.uiWebUrl  # e.g. http://host:4040
    app_id = sc.applicationId
    stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    # the measured run's stages are the most recent ones; keep every stage
    # and let the reader bucket by shape (scan+assign writes shuffle;
    # the pair stage reads it)
    stage_rows = []
    failed_tasks = killed_tasks = 0
    for st in stages:
        failed_tasks += st.get("numFailedTasks", 0)
        killed_tasks += st.get("numKilledTasks", 0)
        stage_rows.append(
            {
                "stage_id": st["stageId"],
                "name": st["name"].split("\n")[0][:80],
                "num_tasks": st["numCompleteTasks"],
                "executor_run_time_s": round(st["executorRunTime"] / 1e3, 3),
                "executor_cpu_time_s": round(
                    st.get("executorCpuTime", 0) / 1e9, 3
                ),
                "input_bytes": st.get("inputBytes", 0),
                "shuffle_write_bytes": st.get("shuffleWriteBytes", 0),
                "shuffle_write_time_s": round(
                    st.get("shuffleWriteTime", 0) / 1e9, 3
                ),
                "shuffle_read_bytes": st.get("shuffleReadBytes", 0),
                "shuffle_fetch_wait_s": round(
                    st.get("shuffleFetchWaitTime", 0) / 1e3, 3
                ),
                "submission_time": st.get("submissionTime"),
            }
        )
    stage_rows.sort(key=lambda r: r["stage_id"])

    py = {k: (v.value if k in ("cells", "rows", "pairs") else round(v.value, 3))
          for k, v in acc.items()}
    cores = int(bench_scale.CPUS)
    record = {
        "scale_k": bench_scale.SCALE_K,
        "threshold": THRESHOLD,
        "row_counts": counts,
        "cores": cores,
        "fixed_cost_s": round(fixed_cost_s, 4),
        "load1_start": load1_start,
        "warmup_wall_s": round(warm_s, 3),
        "measured_wall_s": round(wall_s, 3),
        "pairs": n_pairs,
        "python_accumulators": py,
        "python_compute_core_s": round(
            py["assign_s"] + py["prep_s"] + py["gemm_s"] + py["emit_s"], 3
        ),
        # accumulator updates in pandas UDFs are transformation-side, NOT
        # exactly-once under task retries/speculation (ADVICE r10) — a
        # retried task double-counts. Zero failed/killed tasks across the
        # run is the precondition for reading them as exact.
        "failed_tasks": failed_tasks,
        "killed_tasks": killed_tasks,
        "accumulators_exact": failed_tasks == 0 and killed_tasks == 0,
        "stages": stage_rows,
        "note": (
            "stages cover warmup+measured runs (two identical jobs, most "
            "recent stage ids are the measured run); accumulators cover "
            "ONLY the measured run. executorRunTime minus python "
            "accumulator seconds minus shuffle components = Arrow ser/de "
            "+ pandas group assembly + pipe/scheduling."
        ),
    }
    with open(OUT_PATH, "w") as fh:
        json.dump(record, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "semdedup_decompose_wall",
                "value": round(wall_s, 3),
                "unit": "sec",
                "scale_k": bench_scale.SCALE_K,
                "threshold": THRESHOLD,
                "pairs": n_pairs,
                "python_compute_core_s": record["python_compute_core_s"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
