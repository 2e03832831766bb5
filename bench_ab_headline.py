#!/usr/bin/env python
"""A/B attribution for the r11 headline regression (VERDICT r11 ask #1).

``BENCH_r11.json`` recorded 12.01 s / 1.89x raw against r10's 9.98 s /
1.46x — a UNIFORM +20-45% on all 23 headline queries including TPC-H SQL
no round-11 code touches, while the same-session DuckDB denominator got
7% FASTER. That signature reads as host weather that slipped through the
contention gate, but the gate exists so the committed record is quotable,
so the cause must be pinned, not presumed. This harness applies the exact
method ``BENCH_SCALE_300x_semauto.json`` used to clear
``dedup_semantic_auto``: run the UNCHANGED r10 package and the current
package on the SAME suite in ONE session window, interleaved and
counterbalanced, so any code-attributable difference survives averaging
while shared host weather cancels.

Protocol:

* each "suite run" is a fresh subprocess (its own Spark JVM — package
  versions cannot share one interpreter) that imports the package from a
  given checkout root, times every ``bench.HEADLINE`` query at sf0.1 with
  bench.py's own per-query protocol (1 warmup + median of 3, count()
  action, same session conf), and prints one JSON line;
* run order is counterbalanced ``A B B A A B`` (3 suites per package) so
  slow drift within the window biases neither side;
* both subprocesses gate on the shared ``benchutil.wait_for_idle`` (the
  CURRENT module — the protocol under test is the package code, not the
  gate) and stamp their probes;
* the verdict is the per-package suite-total median and the per-query
  ratio spread: code-attributable regressions show as a consistent
  per-query B/A ratio away from 1.0; host weather shows as matched
  totals (and the committed r11 record re-attributes to host drift).

Writes ``BENCH_AB_HEADLINE.json`` and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

A_ROOT = os.environ.get("SPARK_GRAFT_AB_A", "/tmp/zdss_r10_ab")
A_LABEL = os.environ.get("SPARK_GRAFT_AB_A_LABEL", "r10@4acfa67")
B_ROOT = os.environ.get("SPARK_GRAFT_AB_B", REPO)
B_LABEL = os.environ.get("SPARK_GRAFT_AB_B_LABEL", "current")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
#: override so follow-up A/Bs (e.g. r11-vs-r12) don't clobber the
#: committed r10-attribution record this module was written for
OUT_PATH = os.environ.get(
    "SPARK_GRAFT_AB_OUT", os.path.join(REPO, "BENCH_AB_HEADLINE.json")
)

#: the inner suite: executed with cwd/sys.path pointed at ONE checkout, so
#: `zarr_datafusion_search_spark` and `bench` resolve to that package.
_INNER = r"""
import json, os, statistics, sys, time
root = sys.argv[1]
sf_dir = sys.argv[2]
cpus = sys.argv[3]
runs = int(sys.argv[4])
sys.path.insert(0, root)
from zarr_datafusion_search_spark.engine import build_session
from zarr_datafusion_search_spark.plans.registry import load_all
from zarr_datafusion_search_spark.benchutil import (
    measure_fixed_cost, wait_for_idle,
)
from zarr_datafusion_search_spark.operators.cache import (
    release_operator_caches,
)
from bench import HEADLINE
# optional subset (comma-separated registered names): a focused A/B on the
# queries a change touched fits inside ONE clean host window — an unknown
# name raises KeyError in the timing loop, loudly
only = os.environ.get("SPARK_GRAFT_AB_QUERIES")
if only:
    HEADLINE = [q.strip() for q in only.split(",") if q.strip()]

# inlined (not benchutil — the r10 side predates cpu_stat_snapshot):
# hypervisor STEAL share of the timing window, the drift class load1 and
# the trivial-job probe both miss (round-12 finding: ~1% idle, 11%+ busy)
def _stat():
    try:
        with open("/proc/stat") as fh:
            v = list(map(int, fh.readline().split()[1:]))
        return v
    except OSError:
        return None

registry = load_all()
spark = build_session(
    app_name="zdss-ab",
    master=f"local[{cpus}]",
    shuffle_partitions=int(cpus),
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
fc, load1 = wait_for_idle(spark)
s0 = _stat()
times = {}
for name in HEADLINE:
    spec = registry[name]
    ts = []
    for i in range(runs + 1):
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        if i:
            ts.append(dt)
    times[name] = round(statistics.median(ts), 4)
s1 = _stat()
release_operator_caches()
fc_end = measure_fixed_cost(spark)
spark.stop()
steal_pct = None
if s0 and s1 and sum(s1) > sum(s0):
    steal_pct = round(100.0 * (s1[7] - s0[7]) / (sum(s1) - sum(s0)), 2)
print(json.dumps({
    "queries": times,
    "total_s": round(sum(times.values()), 4),
    "fixed_cost_s": fc,
    "fixed_cost_end_s": fc_end,
    "load1_start": load1,
    "steal_pct": steal_pct,
}))
"""


def _run_suite(root: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    # the A/B verdict is the RATIO under shared weather, so a suite must
    # not burn the full 240 s gate budget when the host (or hypervisor —
    # steal is stamped per suite) refuses to go idle; 60 s keeps suites
    # adjacent, which is what makes the weather shared
    env.setdefault("SPARK_GRAFT_CONTENTION_WAIT_S", "60")
    out = subprocess.run(
        [sys.executable, "-c", _INNER, root, SF_DIR, CPUS, str(RUNS)],
        capture_output=True,
        text=True,
        env=env,
        cwd=root,
        timeout=1800,
    )
    last = out.stdout.strip().splitlines()[-1]
    return json.loads(last)


def main() -> None:
    order = ["A", "B", "B", "A", "A", "B"]
    roots = {"A": A_ROOT, "B": B_ROOT}
    labels = {"A": A_LABEL, "B": B_LABEL}
    runs: list[dict] = []
    t_start = time.time()
    load_start = [round(x, 2) for x in os.getloadavg()]
    for i, side in enumerate(order, 1):
        r = _run_suite(roots[side])
        r["side"] = side
        r["order_pos"] = i
        runs.append(r)
        print(
            f"[{i}/{len(order)}] {labels[side]}: {r['total_s']} s "
            f"(fc {r['fixed_cost_s']}, load1 {r['load1_start']}, "
            f"steal {r.get('steal_pct')}%)",
            file=sys.stderr,
        )
    load_end = [round(x, 2) for x in os.getloadavg()]

    by_side = {s: [r for r in runs if r["side"] == s] for s in ("A", "B")}
    med = {
        s: round(statistics.median(r["total_s"] for r in rs), 4)
        for s, rs in by_side.items()
    }
    # per-query medians and the B/A ratio distribution — a code regression
    # is a consistent per-query shift; host weather is a matched spread
    qnames = list(runs[0]["queries"])
    per_q = {}
    for q in qnames:
        a = statistics.median(r["queries"][q] for r in by_side["A"])
        b = statistics.median(r["queries"][q] for r in by_side["B"])
        per_q[q] = {
            "A": round(a, 4),
            "B": round(b, 4),
            "ratio_b_over_a": round(b / max(a, 1e-9), 3),
        }
    ratios = sorted(v["ratio_b_over_a"] for v in per_q.values())
    record = {
        "labels": {"A": labels["A"], "B": labels["B"]},
        "roots": roots,
        "order": order,
        "suite_totals": {
            s: [r["total_s"] for r in rs] for s, rs in by_side.items()
        },
        "suite_total_median_s": med,
        "total_ratio_b_over_a": round(med["B"] / max(med["A"], 1e-9), 3),
        "per_query": per_q,
        "per_query_ratio_median": round(statistics.median(ratios), 3),
        "per_query_ratio_minmax": [ratios[0], ratios[-1]],
        "host_state": {
            "loadavg_start": load_start,
            "loadavg_end": load_end,
            "window_s": round(time.time() - t_start, 1),
            "cpus": int(CPUS),
            "probes": [
                {
                    "side": r["side"],
                    "fixed_cost_s": r["fixed_cost_s"],
                    "fixed_cost_end_s": r["fixed_cost_end_s"],
                    "load1_start": r["load1_start"],
                    "steal_pct": r.get("steal_pct"),
                }
                for r in runs
            ],
        },
        "protocol": "fresh subprocess per suite (own JVM), counterbalanced "
        "A B B A A B, bench.py per-query protocol (1 warmup + median of "
        f"{RUNS}, count() action) over bench.HEADLINE at {SF_DIR}; both "
        "sides gated by the shared wait_for_idle",
        "sf_dir": SF_DIR,
    }
    with open(OUT_PATH, "w") as fh:
        json.dump(record, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "ab_headline",
                "unit": "sec",
                "A": med["A"],
                "B": med["B"],
                "ratio_b_over_a": record["total_ratio_b_over_a"],
                "per_query_ratio_median": record["per_query_ratio_median"],
            }
        )
    )


if __name__ == "__main__":
    main()
