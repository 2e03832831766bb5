#!/usr/bin/env python
"""Execute the SemDeDup sqrt-k regime end-to-end once (VERDICT r11 ask #5).

``semdedup_auto_n_centroids`` switches from the linear rule
(k = ceil(n/4096)) to k = ceil(sqrt(n)) above 4096^2 = 16,777,216 rows —
the boundary where linear k makes the n x k assignment GEMM quadratic.
Round 11 pinned the RULE (unit + cross-engine oracle sweep incl. the
boundary) but never ran the regime; this harness turns the continuity
claim into a measurement:

* data: embeddings scaled ~9000x from the sf0.1 base (2,000 rows ->
  18,000,000 — comfortably past the switch) with the exact
  ``bench_scale._scale_embeddings`` recombination; deterministic.
* Spark: ``semantic_dedup_pairs`` at the strict 0.75 threshold with
  ``n_centroids="auto"`` (k = ceil(sqrt(18M)) = 4,243 — the sqrt rule
  ENGAGED, stamped), timed as count() (the output is ~2M pairs; a
  collect would time row transfer, and the 1M record already
  value-verifies the strict path end-to-end), 1 warmup + median of 3.
* value check: one sampled cell rederived INDEPENDENTLY in numpy —
  centroids re-derived from the parquet (lowest-k vec_ids via pyarrow,
  no Spark), every member's GEMM argmax re-checked == the cell id, and
  the within-cell >= 0.75 pair set (6dp half-away rounds, id_a < id_b)
  compared pair-for-pair against the Spark output for that cell.
* linearity: candidate work at the flat-quantizer optimum is
  W = n*k + sum_cells |cell|^2 ~ 2*n*sqrt(n); the record stamps wall
  per unit W next to the committed 1M-row point so the claim "near-
  linear wall in candidate work across the regime switch" is a number,
  not prose.

Writes ``BENCH_SEMDEDUP_SQRT.json`` and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_SQRT_K", "9000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DATA_DIR = f"/tmp/zdss_semdedup_sqrt_{K}x"
THRESHOLD = 0.75
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_SEMDEDUP_SQRT.json"
)


def _derive_centroids_numpy(path: str, k: int):
    """Independent centroid derivation: lowest-k vec_ids straight from
    the parquet via pyarrow — no Spark, no operator code."""
    import numpy as np
    import pyarrow.parquet as pq

    ids = pq.read_table(path, columns=["vec_id"]).column("vec_id").to_numpy()
    take = np.argsort(ids, kind="stable")[:k]
    t = pq.read_table(path).take(sorted(take.tolist()))
    cid = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    cmat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(cid, kind="stable")
    return cid[order], cmat[order]


def _round6(x):
    import numpy as np

    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def main() -> None:
    import numpy as np

    import bench_scale
    from zarr_datafusion_search_spark import benchutil
    from zarr_datafusion_search_spark.engine import build_session
    from zarr_datafusion_search_spark.operators.similarity import (
        NORM_EPS,
        SEMDEDUP_LINEAR_K_MAX_ROWS,
        semantic_cell_assignments,
        semantic_dedup_pairs,
        semdedup_auto_n_centroids,
    )

    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, "embeddings.parquet")
    if not os.path.exists(path):
        n = bench_scale._scale_embeddings(BASE_SF_DIR, DATA_DIR, K)
        print(f"built {n} rows at {path}", file=sys.stderr)

    spark = build_session(
        app_name="zdss-semdedup-sqrt",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixed_cost_s, load1_start = benchutil.wait_for_idle(spark)

    emb = spark.read.parquet(path)
    n_rows = emb.count()
    auto_k = semdedup_auto_n_centroids(n_rows)
    assert n_rows > SEMDEDUP_LINEAR_K_MAX_ROWS, (
        f"{n_rows} rows does not engage the sqrt regime "
        f"(boundary {SEMDEDUP_LINEAR_K_MAX_ROWS})"
    )
    import math

    assert auto_k == math.isqrt(n_rows - 1) + 1

    # ---- timed runs (timer brackets the plan build; warmup absorbs the
    # cold centroid/probe jobs, timed builds hit the memo caches) --------
    times, n_pairs = [], 0
    for i in range(4):
        t0 = time.perf_counter()
        df = semantic_dedup_pairs(
            emb, threshold=THRESHOLD, n_centroids="auto"
        )
        n_pairs = df.count()
        el = time.perf_counter() - t0
        if i:
            times.append(round(el, 3))
    wall = round(statistics.median(times), 3)
    fixed_cost_end = benchutil.measure_fixed_cost(spark)

    # ---- sampled-cell numpy rederivation -------------------------------
    import pyspark.sql.functions as F

    assigns = semantic_cell_assignments(emb, n_centroids=auto_k)
    sizes = (
        assigns.groupBy("cell")
        .count()
        .filter((F.col("count") >= 16) & (F.col("count") <= 20000))
        .orderBy(F.col("count").desc(), "cell")
        .limit(1)
        .collect()
    )
    cell_id, cell_n = int(sizes[0][0]), int(sizes[0][1])
    members = assigns.filter(F.col("cell") == cell_id).collect()
    spark_pairs = sorted(
        (int(r["id_a"]), int(r["id_b"]), round(float(r["cosine"]), 6))
        for r in semantic_dedup_pairs(
            emb, threshold=THRESHOLD, n_centroids="auto"
        )
        .filter(F.col("centroid_id") == cell_id)
        .collect()
    )
    spark.stop()

    cid, cmat = _derive_centroids_numpy(path, auto_k)
    cn = cmat / np.maximum(
        np.linalg.norm(cmat, axis=1, keepdims=True), NORM_EPS
    )
    mids = np.array([r["vec_id"] for r in members], dtype=np.int64)
    mvec = np.array([r["embedding"] for r in members], dtype=np.float64)
    mn = mvec / np.maximum(
        np.linalg.norm(mvec, axis=1, keepdims=True), NORM_EPS
    )
    # (a) every member's independent argmax lands on the sampled cell
    S = mn @ cn.T
    R = np.copysign(np.floor(np.abs(S) * 1e6 + 0.5), S)
    argmax_ok = bool((cid[np.argmax(R, axis=1)] == cell_id).all())
    # (b) within-cell pair set at the threshold, 6dp, id_a < id_b
    order = np.argsort(mids, kind="stable")
    mids, mn = mids[order], mn[order]
    C = _round6(mn @ mn.T)
    ia, ib = np.where(np.triu(C >= THRESHOLD, k=1))
    numpy_pairs = sorted(
        (int(mids[a]), int(mids[b]), float(C[a, b])) for a, b in zip(ia, ib)
    )
    pairs_match = numpy_pairs == spark_pairs

    # ---- linearity vs the committed 1M point ---------------------------
    ref = None
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_SEMDEDUP_1M.json",
            )
        ) as fh:
            d = json.load(fh)
        ref_rows = d["rows"]
        ref_k = d["auto_n_centroids"]
        ref_wall = d["spark_s"]["strict_0.75"]
        # candidate work: assignment n*k + mean-cell pair term n*(n/k)
        ref_work = ref_rows * ref_k + ref_rows * (ref_rows / ref_k)
        ref = {
            "rows": ref_rows,
            "auto_k": ref_k,
            "strict_s": ref_wall,
            "work_units": round(ref_work),
            "s_per_Gwork": round(ref_wall / (ref_work / 1e9), 4),
        }
    except Exception:
        pass
    work = n_rows * auto_k + n_rows * (n_rows / auto_k)

    record = {
        "rows": n_rows,
        "scale_k": K,
        "auto_n_centroids": auto_k,
        "regime": "sqrt",
        "regime_boundary_rows": SEMDEDUP_LINEAR_K_MAX_ROWS,
        "threshold": THRESHOLD,
        "spark_strict_s": wall,
        "spark_runs_raw": times,
        "pairs": n_pairs,
        "work_units": round(work),
        "s_per_Gwork": round(wall / (work / 1e9), 4),
        "reference_1m_point": ref,
        "sampled_cell_check": {
            "cell": cell_id,
            "members": cell_n,
            "argmax_matches_cell": argmax_ok,
            "pairs_match": pairs_match,
            "n_pairs_in_cell": len(numpy_pairs),
            "method": "centroids re-derived from parquet via pyarrow "
            "(lowest-k vec_ids, no Spark); member argmax + within-cell "
            ">=0.75 pair set (6dp) rederived in numpy and compared "
            "pair-for-pair",
        },
        "host_state": {
            "fixed_cost_s": round(fixed_cost_s, 4),
            "fixed_cost_end_s": round(fixed_cost_end, 4),
            "load1_start": load1_start,
            "load1_start_ceiling": benchutil.LOAD1_CEILING,
            "load1_end": round(os.getloadavg()[0], 2),
            "load1_end_gated": False,
            "load1_end_note": "includes own post-suite executor decay "
            "(self-load); excluded from the contended verdict like the "
            "main harnesses' end-side load",
            "cpus": int(CPUS),
        },
        "protocol": "Spark-only (no DuckDB twin at this scale — the 1M "
        "record already stamps the oracle DNF boundary at 600k); 1 warmup "
        "+ median of 3, count() action, timer brackets the plan build",
    }
    with open(OUT_PATH, "w") as fh:
        json.dump(record, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "semdedup_sqrt_regime",
                "unit": "sec",
                "value": wall,
                "rows": n_rows,
                "auto_k": auto_k,
                "pairs": n_pairs,
                "cell_check": argmax_ok and pairs_match,
                "s_per_Gwork": record["s_per_Gwork"],
            }
        )
    )


if __name__ == "__main__":
    main()
