#!/usr/bin/env python
"""Capture .explain("formatted") for every benched query into
plans/r12/<query>_{before,after}.txt (OPTIMIZATION_r12 deliverable).

Usage: python plans/r12/capture_plans.py before|after [query ...]

Headline/coverage queries are planned against $SPARK_GRAFT_SF_DIR
(default sf0.1); the extended sections are planned against the same 10x
scale-up directory bench.py uses, so the captured plan is the shape the
bench actually times (file split counts, AQE thresholds).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])
OUT_DIR = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def main() -> None:
    import bench
    from bench_scale import SCALE_DIR, build_scale_dir
    from zarr_datafusion_search_spark.engine import build_session
    from zarr_datafusion_search_spark.plans.registry import load_all

    registry = load_all()
    build_scale_dir()
    spark = build_session(
        app_name="zdss-capture-plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    at_10x = (
        set(bench.EXTENDED)
        | set(bench.EXTENDED_R3)
        | set(bench.EXTENDED_R4)
        | set(bench.EXTENDED_R5)
        | set(bench.COVERAGE_HEAVY_10X)
    )
    names = sorted(registry) if not ONLY else sorted(ONLY & set(registry))
    for name in names:
        data_dir = SCALE_DIR if name in at_10x else SF_DIR
        try:
            df = registry[name].spark(spark, data_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # plan-build failure is itself a finding
            text = f"PLAN BUILD FAILED: {type(e).__name__}: {e}\n"
        with open(os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(f"-- query: {name}\n-- data: {data_dir}\n\n{text}")
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
