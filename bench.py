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

#: round-3 additions — separate section, same reasoning as EXTENDED
EXTENDED_R3 = [
    "text_tfidf_search",
    "text_bigram_perplexity",
    "pagerank_event_types",
    "multimodal_real_image_features",
    "multimodal_real_wav_features",
    "multimodal_real_frame_features",
    "multimodal_real_resize",
    "dedup_minhash_cross_corpus",
    "multimodal_image_channel_stats",
    "snapshot_diff_user_state",
    # round-3 second batch (sink roundtrips stay out of bench sections —
    # their oracles aggregate parquet, not a comparable workload)
    "frequent_terms_heavy_hitters",
    "bpe_merge_candidates",
    "frequent_itemset_pairs",
    "dedup_event_cooldown",
    "embedding_centroid_drift",
    "outliers_mad_value",
    "topk_per_source_twophase",
    "dedup_cluster_size_histogram",
    "time_decayed_engagement",
    "label_propagation_sources",
]

#: round-2 additions, timed and reported separately so the headline total
#: stays comparable across rounds (same 23-query membership as BASELINE.md)
EXTENDED = [
    "text_bm25_search",
    "decontaminate_against_eval",
    "interval_join_attribution",
    "bucketed_colocated_join",
    "profile_documents",
    "funnel_stages",
    "mixture_sample_domains",
    "bigram_pmi_top",
    "scd2_user_state",
    "merge_apply_snapshot",
    "dedup_semantic",
    "dedup_duplicate_spans",
    "dedup_remove_spans",
    "text_vocab_coverage",
    "shard_by_token_budget",
    "ann_hard_negatives",
    "embedding_random_projection",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


#: per-run wall-clock cap for a DuckDB oracle during the paired measurement;
#: a query that can't finish one run inside this is recorded as skipped
#: (e.g. the recursive-CTE replays that are verification-only by design)
DUCK_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_DUCK_TIMEOUT", "30"))


def _duckdb_times(registry, names: list[str]) -> tuple[dict, list]:
    """Median DuckDB wall-clock per oracle (same protocol as the Spark side:
    1 warmup + median of RUNS) over views on the SAME parquet files.

    Each oracle is timed as ``SELECT count(*) FROM (<oracle>)`` — the exact
    symmetric of the Spark side's ``.count()`` action: both engines fully
    execute joins/aggregations/windows (they define the cardinality), both
    get the same chance to prune unused final projections, and neither pays
    client-side row conversion. Returns (times, skipped)."""
    import threading

    import duckdb

    from zarr_datafusion_search_spark.plans.registry import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    times_by_query: dict[str, float] = {}
    skipped: list[str] = []
    for name in names:
        sql = registry[name].oracle
        if not sql:
            skipped.append(name)
            continue
        counted = f"SELECT count(*) FROM ({sql}) AS _q"
        times = []
        ok = True
        for i in range(RUNS + 1):
            fired = []

            def _interrupt():
                fired.append(1)
                con.interrupt()

            watchdog = threading.Timer(DUCK_TIMEOUT_S, _interrupt)
            watchdog.start()
            t0 = time.perf_counter()
            try:
                con.execute(counted).fetchall()
            except Exception:
                ok = False
            finally:
                watchdog.cancel()
            if fired and ok:
                # timer fired in the window after the query finished but
                # before cancel(): the interrupt flag would abort the NEXT
                # statement — drain it on a throwaway query
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
            if not ok:
                break
            if i > 0:
                times.append(time.perf_counter() - t0)
        if ok:
            times_by_query[name] = round(statistics.median(times), 4)
        else:
            skipped.append(name)
    con.close()
    return times_by_query, skipped


ZARR_BENCH_ROWS = 1_000_000
ZARR_BENCH_STORE = "/tmp/zdss_bench_zarr_1m.zarr"


def _zarr_scan_bench(spark) -> dict:
    """Zarr-scan microbench (BASELINE.md): ~1M-row store produced by the
    same recipe as the reference's generator, scanned chunk-partitioned.
    Dates are written sorted so the filtered scan exercises chunk pruning."""
    import statistics as st

    import numpy as np

    from zarr_datafusion_search_spark import ZarrTable
    from zarr_datafusion_search_spark.sources import zarrv3

    if not os.path.exists(os.path.join(ZARR_BENCH_STORE, "zarr.json")):
        rng = np.random.default_rng(42)
        n = ZARR_BENCH_ROWS
        base = np.datetime64("2023-01-01", "ms")
        dates = np.sort(
            base + rng.integers(0, 365 * 24 * 3600 * 1000, n).astype("timedelta64[ms]")
        )
        letters = "abcdefgh"
        colls = [f"collection_{letters[i % 8]}" for i in rng.integers(0, 8, n)]
        ks = rng.integers(1, 90, n)
        bboxes = [
            f"POLYGON (({k} -{k}, {k} {k}, -{k} {k}, -{k} -{k}, {k} -{k}))"
            for k in ks
        ]
        zarrv3.write_group(
            ZARR_BENCH_STORE,
            "meta",
            {"date": dates, "collection": colls, "bbox": bboxes},
            chunk_rows=65536,
        )

    table = ZarrTable(ZARR_BENCH_STORE, "/meta")
    cases = {
        "zarr_scan_full": lambda: table.to_df(spark).count(),
        "zarr_scan_projected": lambda: table.to_df(spark, columns=["collection"])
        .filter("collection = 'collection_a'")
        .count(),
        # sorted dates + per-chunk stats -> most chunks pruned at planning
        "zarr_scan_filtered": lambda: table.to_df(spark)
        .filter("date >= timestamp_ntz'2023-12-15 00:00:00'")
        .count(),
    }
    out = {}
    for name, fn in cases.items():
        times = []
        for i in range(RUNS + 1):
            t0 = time.perf_counter()
            fn()
            if i > 0:
                times.append(time.perf_counter() - t0)
        out[name] = round(st.median(times), 4)
    return out


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

    def _time_section(section_names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in (n for n in section_names if n in registry):
            spec = registry[name]
            times = []
            for i in range(RUNS + 1):
                t0 = time.perf_counter()
                spec.spark(spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                if i > 0:
                    times.append(dt)
            out[name] = round(statistics.median(times), 4)
        return out

    from zarr_datafusion_search_spark.operators.cache import (
        release_operator_caches,
    )

    release_operator_caches()  # drop headline-section pipeline caches
    extended = _time_section(EXTENDED)
    release_operator_caches()
    extended_r3 = _time_section(EXTENDED_R3)
    # release before the in-process DuckDB timing so its measurements don't
    # run under pinned-cache memory pressure
    release_operator_caches()

    zarr_micro = _zarr_scan_bench(spark)

    # paired DuckDB measurement (VERDICT r02 §6): identical SQL over the
    # same parquet, same warmup+median protocol, one comparable ratio per
    # section instead of prose ranges. Runs AFTER all Spark timing so the
    # DuckDB process-side work never contends with Spark executors.
    duck_headline, duck_skipped_h = _duckdb_times(registry, names)
    duck_extended, duck_skipped_e = _duckdb_times(
        registry, [n for n in EXTENDED if n in registry]
    )
    duck_r3, duck_skipped_r3 = _duckdb_times(
        registry, [n for n in EXTENDED_R3 if n in registry]
    )

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline-suite median wall-clock (sum over queries)",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                # zarr scan microbench (BASELINE.md) — no DuckDB counterpart,
                # reported separately and EXCLUDED from the headline total
                # round-2 operators — reported separately, EXCLUDED from the
                # headline total (fixed 23-query membership per BASELINE.md)
                "extended": extended,
                "extended_total": round(sum(extended.values()), 4),
                "extended_r3": extended_r3,
                "extended_r3_total": round(sum(extended_r3.values()), 4),
                # paired DuckDB (same SQL, same parquet, same protocol);
                # ratio = spark_total / duckdb_total over the queries BOTH
                # engines completed — the <=2x gate from BASELINE.md
                "duckdb": {
                    "headline_queries": duck_headline,
                    "headline_total": round(sum(duck_headline.values()), 4),
                    "ratio_headline": round(
                        sum(v for k, v in per_query.items() if k in duck_headline)
                        / max(sum(duck_headline.values()), 1e-9),
                        4,
                    ),
                    "extended_queries": duck_extended,
                    "extended_total": round(sum(duck_extended.values()), 4),
                    "ratio_extended": round(
                        sum(v for k, v in extended.items() if k in duck_extended)
                        / max(sum(duck_extended.values()), 1e-9),
                        4,
                    ),
                    "extended_r3_queries": duck_r3,
                    "extended_r3_total": round(sum(duck_r3.values()), 4),
                    "ratio_extended_r3": round(
                        sum(v for k, v in extended_r3.items() if k in duck_r3)
                        / max(sum(duck_r3.values()), 1e-9),
                        4,
                    ),
                    "skipped": duck_skipped_h + duck_skipped_e + duck_skipped_r3,
                    "timeout_s": DUCK_TIMEOUT_S,
                    "protocol": "1 warmup + median of runs_per_query; both "
                    "engines timed via count(*) over the full query (same "
                    "pruning opportunities, no client row conversion), "
                    "DuckDB run after all Spark timing in the same process; "
                    "fresh-session numbers in BASELINE.md",
                },
                "zarr_microbench": zarr_micro,
                "zarr_microbench_total": round(sum(zarr_micro.values()), 4),
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
