#!/usr/bin/env python
"""Skew-stress benchmark for the scale guards (VERDICT r07 ask #5).

The uniform synthetic scale-up (`bench_scale.py`) recombines word slices
with roughly uniform sources — but real 100 TB corpora are zipfian. This
harness builds a SKEWED twin of the 30x tables and measures the three
default guards under the exact pathologies they exist for:

* **documents**: 80% of rows reassigned to one source (``doc_id % 5 != 0``
  -> ``src_hot``) — stresses the per-group aggregations
  (`source_ngram_diversity`'s biggest group is now 24x larger); and one
  hot near-dup TEMPLATE FAMILY (every ``doc_id % 83 == 0`` rewritten to a
  fixed 60-word template with a single doc-unique token) — the degenerate
  LSH-bucket / dense-clique case the MinHash auto bucket cap and the LPA
  auto degree cap are built for (~1.8k members at 30x; unguarded, that one
  clique alone is ~1.6M verify pairs PER BAND).
* **embeddings**: every ``vec_id % 100 == 0`` snapped to one common
  direction plus deterministic 1e-3 jitter (norm preserved) — one hot
  semantic cell for `dedup_semantic`'s hot-cell downsample cap.
* **events**: unchanged (no guard under test reads them).

All mutations are deterministic (pure functions of ids), so the DuckDB
oracle runs on the identical parquet and the full canonicalized
value-compare (the driver's rows+schema+hash contract) is recorded per
query per dataset — a guard that silently changed semantics under skew
would fail the compare, not just look slow.

Protocol: for each of {uniform 30x, skew 30x}: one full canonicalized
value-compare per query (its single DuckDB oracle execution is timed and
recorded as ``compare_s`` — wall-clock of the whole compare, Spark collect plus the single DuckDB oracle execution, watchdog-bounded on the DuckDB side), then 1 warmup + median
of $SPARK_GRAFT_SCALE_RUNS (default 2) Spark count(*) runs. There is no
separate DuckDB timing phase: the heavy oracles cost ~40 s EACH at 30x
(BENCH_SCALE_30x), so a paired-median protocol would take ~25 min of pure
DuckDB re-execution for numbers the uniform record already holds — this
record's substance is the skew/uniform SPARK ratio (same host session, so
host weather cancels) and the oracle greenness under skew.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
)

os.environ.setdefault("SPARK_GRAFT_SCALE_K", "30")

from bench_scale import (  # noqa: E402
    SCALE_DIR as UNIFORM_DIR,
    SCALE_K,
    build_scale_dir,
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
SKEW_DIR = os.path.join("/tmp", f"zdss_scale_skew{SCALE_K}x")
DETAIL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALE_skew.json"
)
DUCK_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_DUCK_TIMEOUT", "180"))

#: the guard-exercising set: both minhash variants (auto + fixed cap),
#: both LPA variants (auto + fixed cap), the hot-cell-capped semantic
#: dedup, the group-skew-sensitive diversity audit, and an exact-dedup
#: anchor whose plan has no guard (its skew ratio calibrates "time class").
SKEW_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_guarded",
    "label_propagation_sources",
    "label_propagation_sources_guarded",
    # the scale-suite member (r9): auto-sized quantizer; the hot-cell cap
    # guard under stress is shared with the pinned-16 twin
    "dedup_semantic_auto",
    "source_ngram_diversity",
]

HOT_SOURCE = "src_hot"
TEMPLATE_STRIDE = 83
HOT_VEC_STRIDE = 100
_TEMPLATE = (
    "terms of service agreement this document governs the use of the "
    "platform and all associated services the user agrees to the "
    "following conditions without modification any dispute arising from "
    "this agreement shall be resolved through binding arbitration the "
    "provider reserves the right to update these terms at any time "
    "continued use constitutes acceptance of the revised terms"
).split()


def _skew_documents(src_dir: str, out_dir: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    n_hot_src = n_clique = 0
    half = len(_TEMPLATE) // 2
    for i, d in enumerate(doc_id):
        if d % 5 != 0:
            source[i] = HOT_SOURCE
            n_hot_src += 1
        if d % TEMPLATE_STRIDE == 0:
            text[i] = " ".join(
                _TEMPLATE[:half] + [f"tok{d}"] + _TEMPLATE[half:]
            )
            n_clique += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "text": pa.array(text, pa.string()),
                "lang": pa.array(lang, pa.string()),
                "source": pa.array(source, pa.string()),
                "n_chars": pa.array([len(s) for s in text], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )
    return {"rows": len(doc_id), "hot_source": n_hot_src, "clique": n_clique}


def _skew_embeddings(src_dir: str, out_dir: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    vec_id = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    label = t.column("label")
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    hot = vec_id % HOT_VEC_STRIDE == 0
    base_dir_vec = np.ones(dim) / np.sqrt(dim)
    # deterministic per-(vector, component) jitter; norm preserved so the
    # mutation only concentrates DIRECTION mass into one cell
    ids_h = vec_id[hot]
    jit = 1e-3 * np.sin(
        ids_h[:, None] * 31.0 + np.arange(dim)[None, :] * 7.0
    )
    mixed = base_dir_vec[None, :] + jit
    mixed /= np.linalg.norm(mixed, axis=1, keepdims=True)
    norms = np.linalg.norm(emb[hot].astype(np.float64), axis=1, keepdims=True)
    emb[hot] = (mixed * np.maximum(norms, 1e-12)).astype(np.float32)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(emb.reshape(-1), pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    pq.write_table(
        pa.table({"vec_id": pa.array(vec_id), "embedding": arr, "label": label}),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    return {"rows": int(len(vec_id)), "hot_cell": int(hot.sum())}


def build_skew_dir() -> dict:
    """Materialize the skewed tables from the (cached) uniform scale dir.
    Idempotent via a _READY marker keyed on the uniform dir's fingerprint."""
    import shutil

    build_scale_dir()
    marker = os.path.join(SKEW_DIR, "_READY")
    with open(os.path.join(UNIFORM_DIR, "_READY")) as fh:
        base_fp = json.load(fh)
    if os.path.exists(marker):
        with open(marker) as fh:
            saved = json.load(fh)
        if saved.get("base") == base_fp:
            return saved["stats"]
    os.makedirs(SKEW_DIR, exist_ok=True)
    stats = {
        "documents": _skew_documents(UNIFORM_DIR, SKEW_DIR),
        "embeddings": _skew_embeddings(UNIFORM_DIR, SKEW_DIR),
    }
    for tname in (
        "events",
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        src = os.path.join(UNIFORM_DIR, f"{tname}.parquet")
        dst = os.path.join(SKEW_DIR, f"{tname}.parquet")
        if not os.path.exists(dst):
            try:
                os.link(src, dst)
            except OSError:
                shutil.copyfile(src, dst)
    with open(marker, "w") as fh:
        json.dump({"stats": stats, "base": base_fp}, fh)
    return stats


def _duck_con(data_dir: str):
    import duckdb

    from zarr_datafusion_search_spark.plans.registry import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{data_dir}/{t}.parquet'"
        )
    return con


def _run_dataset(spark, registry, data_dir: str) -> dict:
    """One dataset: per query, one watchdog-bounded value-compare (its
    DuckDB execution timed as compare_s) + Spark warmup/median."""
    import threading

    from oracle_utils import compare

    from zarr_datafusion_search_spark.operators.cache import (
        release_operator_caches,
    )

    st: dict[str, float] = {}
    checks: dict[str, dict] = {}
    duck_s: dict[str, float] = {}
    dnf: list[str] = []
    con = _duck_con(data_dir)
    for name in SKEW_QUERIES:
        spec = registry[name]
        fired: list[int] = []

        def _interrupt():
            fired.append(1)
            con.interrupt()

        watchdog = threading.Timer(DUCK_TIMEOUT_S, _interrupt)
        watchdog.start()
        t0 = time.perf_counter()
        try:
            r = compare(spec.spark(spark, data_dir), con, spec.oracle)
            duck_s[name] = round(time.perf_counter() - t0, 4)
            checks[name] = {
                "rows_match": r["rows_match"],
                "cols_match": r["cols_match"],
                "values_match": r["values_match"],
                "spark_rows": r["spark_rows"],
            }
        except Exception as exc:
            if fired:
                dnf.append(name)
                checks[name] = {"values_match": False, "duck_dnf": True}
            else:
                checks[name] = {
                    "values_match": False,
                    "err": f"{type(exc).__name__}: {exc}"[:200],
                }
        finally:
            watchdog.cancel()
        if fired:
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass
        release_operator_caches()
        times = []
        for i in range(RUNS + 1):
            t0 = time.perf_counter()
            spec.spark(spark, data_dir).count()
            if i > 0:
                times.append(time.perf_counter() - t0)
        st[name] = round(statistics.median(times), 4)
        release_operator_caches()
    con.close()
    return {
        "spark": st,
        "oracle_checks": checks,
        "compare_s": duck_s,
        "duck_dnf": dnf,
    }


def main() -> None:
    from zarr_datafusion_search_spark.engine import build_session
    from zarr_datafusion_search_spark.plans.registry import load_all

    stats = build_skew_dir()
    registry = load_all()
    spark = build_session(
        app_name="zdss-bench-skew",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # contention-gated measurement (VERDICT r08 ask #4 — the r8 skew
    # record stamped contended because this harness probed but never
    # gated): wait for an idle start (probe + load1 ceiling; the skew/
    # uniform dataset build right before timing leaves decaying load),
    # re-probe after both datasets, retry the pass once if contended.
    from zarr_datafusion_search_spark import benchutil

    for attempt in range(1, benchutil.BENCH_ATTEMPTS + 1):
        fixed_cost_s, load1_start = benchutil.wait_for_idle(spark)
        loadavg_start = [round(x, 2) for x in os.getloadavg()]
        steal_start = benchutil.cpu_stat_snapshot()
        uniform = _run_dataset(spark, registry, UNIFORM_DIR)
        skew = _run_dataset(spark, registry, SKEW_DIR)
        steal_pct = benchutil.steal_pct_between(
            steal_start, benchutil.cpu_stat_snapshot()
        )
        fixed_cost_end_s = benchutil.measure_fixed_cost(spark)
        contended = benchutil.is_contended(
            fixed_cost_s, fixed_cost_end_s, load1_start
        )
        if not contended:
            break
    spark.stop()

    ratios = {
        n: round(
            skew["spark"][n] / max(uniform["spark"][n], 1e-9), 2
        )
        for n in SKEW_QUERIES
    }
    all_green = all(
        c["values_match"]
        for ds in (uniform, skew)
        for c in ds["oracle_checks"].values()
    )
    # no separate duck_pass bracket here: this harness runs its DuckDB
    # compares INSIDE the gated attempt (before the end-side fixed-cost
    # re-probe), so the Spark-side probes already bound the denominator
    host_state = benchutil.host_state_stamp(
        loadavg_start,
        fixed_cost_s,
        fixed_cost_end_s,
        contended,
        attempt,
        load1_start_gated=load1_start,
        steal={"spark_window_steal_pct": steal_pct},
    )
    detail = {
        "host_state": host_state,
        "scale_k": SCALE_K,
        "skew_stats": stats,
        "uniform": {
            "spark_queries": uniform["spark"],
            "compare_s": uniform["compare_s"],
            "oracle_checks": uniform["oracle_checks"],
            "duck_compare_dnf": uniform["duck_dnf"],
        },
        "skew": {
            "spark_queries": skew["spark"],
            "compare_s": skew["compare_s"],
            "oracle_checks": skew["oracle_checks"],
            "duck_compare_dnf": skew["duck_dnf"],
        },
        "skew_over_uniform_spark": ratios,
        "all_oracles_green": all_green,
        "duck_timeout_s": DUCK_TIMEOUT_S,
        "runs_per_query": RUNS,
        "protocol": "per dataset per query: ONE watchdog-bounded "
        "canonicalized value-compare (compare_s = spark collect + single "
        "duckdb oracle execution), then 1 warmup + median of runs Spark "
        "count(*); both datasets in ONE session so skew/uniform ratios "
        "cancel host weather; paired DuckDB medians live in the uniform "
        "BENCH_SCALE records",
    }
    with open(DETAIL_PATH, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": f"skew-stress guard suite ({SCALE_K}x, "
                "skew/uniform spark ratios)",
                "ratios": ratios,
                "worst": max(ratios.values()),
                "all_oracles_green": all_green,
                "spark_skew_total_s": round(
                    sum(skew["spark"].values()), 4
                ),
                "spark_uniform_total_s": round(
                    sum(uniform["spark"].values()), 4
                ),
                "duck_compare_dnf": skew["duck_dnf"],
                "fixed_cost_s": fixed_cost_s,
                "contended": host_state["contended"],
                "detail_file": os.path.basename(DETAIL_PATH),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
