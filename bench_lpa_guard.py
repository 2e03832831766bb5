#!/usr/bin/env python
"""Current-code receipt for the label-propagation degree cap (VERDICT r09
ask #4).

The guard's original value story cited r5's 235.9 s unguarded run at 100x
— stale: the eager symmetrized-edge checkpoint (r6) made the UNIFORM
100x fixture fast for every variant (r9 record: auto 14.8 s, explicit
16.3 s, unguarded 15.9 s — within noise, because on a uniform-density
graph the p99.5 rule trims nothing and round 10 additionally skips the
no-op trim). So where does the cap actually pay on current code? On the
shape it was designed for: a **heavy-tailed adjacency** — a few hub nodes
whose degree is orders of magnitude above the population percentile, so
every propagation round drags |hub degree| edge rows through the
labeled-edge join. This harness builds that shape at a size where the
divergence is unambiguous and measures unguarded / auto / explicit on the
same session.

Graph (all JVM-side ``spark.range`` expressions, no Python in the build):

* ``N`` ring nodes, each with 3 base edges (degree ~6 symmetrized) —
  the population the percentile sees;
* ``H`` hubs, each wired to ``K`` pseudo-randomly spread distinct
  neighbors (affine stride mod N) — ``H*K`` edges that symmetrize into
  ``2*H*K`` rows, >90% of all edge rows when ``H*K >> 3*N``;
* optionally (``SPARK_GRAFT_LPA_CLIQUE > 0``) a C-member CLIQUE —
  ``C*(C-1)/2`` edges concentrated on C nodes. This is the operator
  docstring's motivating shape (the quadratic near-dup community a
  template family induces): the outlier degree lands on <0.5% of nodes,
  so the percentile stays at the population degree and the cap removes
  ~all of the clique's O(C^2) rows from every round's join.
* seeds: every 97th node labeled with one of 5 classes.

Shape matters, and the record keeps both regimes honest: hub edges have
TWO endpoints, so total hub mass M spread uniformly over the population
raises MEAN degree by ~M/N — push M past ~N*degree and the p99.5 rule
itself inflates (the round-10 41M-edge hub record: cap 106, trim saved
too little for its window+checkpoint cost at 3 rounds and auto LOST to
unguarded by 1.33x). Round 11 answers that regime with the COST GATE
(graph.label_propagation): from the same degree histogram, trim only
when ``n_rounds * removed_rows > LPA_TRIM_COST_FACTOR * (heavy_rows +
kept_rows)`` — the
dense-hub shapes skip (auto == unguarded semantics, full vote coverage,
only the bounded rule-derivation aggregation as overhead), while the
clique shapes the cap is FOR (quadratic near-dup communities: removal
is ~all rows) still trim, now via the heavy/light broadcast split that
sorts only heavy-node rows. The trade when trimming remains explicit:
trimmed edges do not vote, so labels may differ from unguarded (that is
the point — SemDeDup-style bounded work); value parity of the trim
machinery itself is pinned by the uniform-clique parity test in
``tests/test_round10_ops.py`` and the split-vs-window parity test in
``tests/test_round11_ops.py``.

Writes ``BENCH_LPA_GUARD.json`` and prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("SPARK_GRAFT_LPA_N", "400000"))
H = int(os.environ.get("SPARK_GRAFT_LPA_HUBS", "50"))
K = int(os.environ.get("SPARK_GRAFT_LPA_HUB_DEGREE", "200000"))
CLIQUE = int(os.environ.get("SPARK_GRAFT_LPA_CLIQUE", "0"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_LPA_ROUNDS", "3"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
TAG = os.environ.get("SPARK_GRAFT_LPA_TAG", "")
OUT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    f"BENCH_LPA_GUARD{('_' + TAG) if TAG else ''}.json",
)


def main() -> None:
    import pyspark.sql.functions as F

    from zarr_datafusion_search_spark import benchutil
    from zarr_datafusion_search_spark.engine import build_session
    from zarr_datafusion_search_spark.operators.graph import (
        LPA_TRIM_COST_FACTOR,
        _cap_from_hist,
        label_propagation,
    )

    spark = build_session(
        app_name="zdss-lpa-guard",
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

    # ring edges: (i, i+1..i+3 mod N), weight 0.5
    ring = (
        spark.range(N)
        .select(
            F.col("id").alias("doc_a"),
            F.explode(
                F.array(*[(F.col("id") + d) % N for d in (1, 2, 3)])
            ).alias("doc_b"),
        )
        .withColumn("jaccard", F.lit(0.5))
    )
    # hub edges: hub h = N + h; neighbor j -> (h*7919 + j*104729) % N.
    # 104729 is coprime with any N not divisible by it, so for K <= N the
    # neighbor set per hub is distinct; weights 0.9 so hubs dominate votes
    hubs = (
        spark.range(H * K)
        .select(
            (F.lit(N) + (F.col("id") % H)).alias("doc_a"),
            (
                ((F.col("id") % H) * 7919 + (F.col("id") / H).cast("long") * 104729
                 ) % N
            ).alias("doc_b"),
        )
        .withColumn("jaccard", F.lit(0.9))
    )
    edges = ring.unionByName(hubs)
    if CLIQUE > 0:
        # clique members are nodes N+H .. N+H+CLIQUE-1: all unordered
        # pairs, built as a JVM range cross-join (no Python in the build)
        base = F.lit(N + H)
        members = spark.range(CLIQUE).select(
            (base + F.col("id")).alias("doc_a")
        )
        partners = spark.range(CLIQUE).select(
            (base + F.col("id")).alias("doc_b")
        )
        clique = (
            members.crossJoin(partners)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("jaccard", F.lit(0.9))
        )
        # bridge edges (clique member i <-> ring node i) so labels flow
        # into the community and the dense rounds actually vote
        bridge = spark.range(CLIQUE).select(
            (base + F.col("id")).alias("doc_a"),
            F.col("id").alias("doc_b"),
            F.lit(0.5).alias("jaccard"),
        )
        edges = edges.unionByName(clique).unionByName(bridge)
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    seeds = (
        spark.range(0, N + H + CLIQUE, 97)
        .select(
            F.col("id").alias("node"),
            F.concat(F.lit("L"), (F.col("id") % 5).cast("string")).alias(
                "label"
            ),
        )
        .localCheckpoint(eager=True)
    )
    n_seeds = seeds.count()

    # what the auto rule decides on this shape (bounded histogram collect)
    und = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), "jaccard"
    )
    und = und.unionByName(
        und.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "jaccard"
        )
    ).withColumnRenamed("jaccard", "w")
    hist = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("_d"))
        .groupBy("_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    cap, max_deg, heavy_nodes, heavy_rows, removed, total = _cap_from_hist(
        hist.collect()
    )
    # the round-11 cost gate's decision on this shape (graph.py replays
    # the identical integer arithmetic inside label_propagation)
    dotrim = ROUNDS * removed > LPA_TRIM_COST_FACTOR * (
        heavy_rows + (total - removed)
    )

    variants = {"unguarded": None, "auto": "auto", "explicit_32": 32}
    times: dict[str, float] = {}
    labeled: dict[str, int] = {}
    for name, dc in variants.items():
        for i in range(2):  # 1 warmup + 1 timed (divergence >> variance)
            t0 = time.perf_counter()
            cnt = label_propagation(
                edges, seeds, n_rounds=ROUNDS, degree_cap=dc
            ).count()
            el = time.perf_counter() - t0
        times[name] = round(el, 3)
        labeled[name] = cnt

    load1_end = os.getloadavg()[0]
    record = {
        "shape": {
            "nodes": N,
            "hubs": H,
            "hub_degree": K,
            "clique": CLIQUE,
            "edges": n_edges,
            "symmetrized_rows": 2 * n_edges,
            "seeds": n_seeds,
            "rounds": ROUNDS,
        },
        "auto_rule": {
            "cap": cap,
            "max_degree": max_deg,
            "heavy_nodes": heavy_nodes,
            "heavy_rows": heavy_rows,
            "removed_rows": removed,
            "total_rows": total,
            "cost_gate_trims": dotrim,
        },
        "host_state": {
            "fixed_cost_s": round(fixed_cost_s, 4),
            "load1_start": load1_start,
            "load1_end": round(load1_end, 2),
            "cpus": int(CPUS),
        },
        "spark_s": times,
        "labeled_nodes": labeled,
        "protocol": "1 warmup + 1 timed per variant, count() over the "
        "labeled relation, one session",
        "note": (
            "labeled_nodes legitimately differs between unguarded and "
            "capped variants: trimmed hub edges do not vote (the "
            "documented bounded-work trade). The uniform-shape parity of "
            "the trim machinery is pinned in tests/test_round10_ops.py."
        ),
    }
    with open(OUT_PATH, "w") as fh:
        json.dump(record, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "lpa_guard_divergence",
                "unit": "sec",
                "value": times.get("unguarded"),
                "auto_s": times.get("auto"),
                "explicit_s": times.get("explicit_32"),
                "auto_cap": cap,
                "max_degree": max_deg,
                "cost_gate_trims": dotrim,
                "edges": n_edges,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
