#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): per query, 1 warmup + median of 3 timed runs;
results are fully materialized with a driver-side count-ish action so the
measured time includes the whole plan, not just job launch.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

#: headline queries: one per operator family, heaviest variants
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "broadcast_dim_join",
    "count_distinct",
    "rollup_agg",
    "window_rank",
    "window_frame_rows",
    "events_tumbling_window",
    "q4_order_priority",
    "correlated_exists",
    # training-data pipeline operators (first-class at 100 TB)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_quality_score",
    "text_fingerprint",
    "asof_join_clicks_purchases",
    "sessionization",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    from zarr_datafusion_search_spark.engine import build_session
    from zarr_datafusion_search_spark.plans.registry import load_all

    registry = load_all()
    spark = build_session(
        app_name="zdss-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in registry]
    per_query: dict[str, float] = {}
    for name in names:
        spec = registry[name]
        times = []
        for i in range(RUNS + 1):
            t0 = time.perf_counter()
            df = spec.spark(spark, SF_DIR)
            n = df.count()  # full materialization of the plan
            dt = time.perf_counter() - t0
            if i > 0:  # first run is warmup
                times.append(dt)
        per_query[name] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline-suite median wall-clock (sum over queries)",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": _sf_from_dir(SF_DIR),
                "config": {
                    "master": f"local[{CPUS}]",
                    "runs_per_query": RUNS,
                    "aqe": True,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
