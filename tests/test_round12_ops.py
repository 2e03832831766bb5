"""Round-12 pins: the bench anchor gate, the bounded components oracle,
the LPA split's null-safe keys, and the duck settle short-circuit.

Reference parity context: the reference repo has no bench harness or
graph operators (it is a Zarr scan provider, `src/table_provider.rs`);
these pins guard the repo's own measurement protocol and LLM-pipeline
extensions.
"""

from __future__ import annotations

import time

import pytest


# ---------------------------------------------------------------------------
# anchor gate (VERDICT r11 ask #2)
# ---------------------------------------------------------------------------


def test_anchor_gate_catches_loaded_session(monkeypatch):
    """A deliberately slow anchor (simulating the ~20-45% drift the probe
    + load1 gate admitted in r8 and r11) must come back breached after the
    wait budget, and the stamped reading must be the measured median."""
    from zarr_datafusion_search_spark import benchutil

    monkeypatch.setattr(benchutil, "CONTENTION_WAIT_S", 0.2)
    monkeypatch.setattr(benchutil, "ANCHOR_CEILING_S", 0.02)
    calls = []

    def slow_anchor():
        calls.append(1)
        time.sleep(0.05)

    anchor_s, breached = benchutil.wait_for_anchor(slow_anchor)
    assert breached is True
    assert anchor_s > 0.02
    # protocol: 1 warmup + 3 timed per poll
    assert len(calls) % 4 == 0


def test_anchor_gate_passes_idle_session(monkeypatch):
    from zarr_datafusion_search_spark import benchutil

    monkeypatch.setattr(benchutil, "CONTENTION_WAIT_S", 0.2)
    monkeypatch.setattr(benchutil, "ANCHOR_CEILING_S", 0.05)
    anchor_s, breached = benchutil.wait_for_anchor(lambda: None)
    assert breached is False
    assert anchor_s <= 0.05


def test_anchor_query_is_registered_and_breach_contends():
    """bench.py's anchor must exist in the registry (a rename would
    silently disable the gate), and its breach must fold into the
    record's contended verdict (the code path asserted by reading the
    module source would be fragile — instead pin the constants bench.py
    consumes)."""
    import bench
    from zarr_datafusion_search_spark.benchutil import host_state_stamp
    from zarr_datafusion_search_spark.plans.registry import load_all

    assert bench.ANCHOR_QUERY in load_all()
    hs = host_state_stamp(
        [0.1, 0.1, 0.1],
        0.12,
        0.12,
        True,  # contended already folded by bench.py: is_contended or anchor
        1,
        anchor={
            "anchor_query": bench.ANCHOR_QUERY,
            "anchor_s": 0.55,
            "anchor_ceiling_s": 0.44,
            "anchor_breached": True,
        },
    )
    assert hs["contended"] is True
    assert hs["anchor"]["anchor_breached"] is True
    assert hs["anchor"]["anchor_s"] == 0.55


# ---------------------------------------------------------------------------
# bounded components oracle (VERDICT r11 ask #3)
# ---------------------------------------------------------------------------


def _run_components_oracle(pairs_values: str, n_rounds: int):
    import duckdb

    from zarr_datafusion_search_spark.plans.pipeline_ops import (
        components_oracle_ctes,
    )

    sql = (
        f"WITH pairs(doc_a, doc_b) AS (VALUES {pairs_values}),\n"
        f"{components_oracle_ctes(n_rounds)}\n"
        "SELECT node, component FROM comp ORDER BY node"
    )
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_components_oracle_path_graph_converges():
    """A 12-node path needs 11 propagation rounds for the far end to see
    the min label; 12 rounds (11 + the equality round) converge and every
    node labels 0."""
    chain = ", ".join(f"({i}, {i + 1})" for i in range(11))
    rows = _run_components_oracle(chain, 12)
    assert rows == [(i, 0) for i in range(12)]


def test_components_oracle_sentinel_fails_loud_not_wrong():
    """Under-provisioned rounds must EMPTY the result (a loud row-count
    collapse the driver's compare cannot miss), never return
    nearly-converged labels."""
    chain = ", ".join(f"({i}, {i + 1})" for i in range(11))
    assert _run_components_oracle(chain, 11) == []
    assert _run_components_oracle(chain, 3) == []


def test_components_oracle_matches_engine_fixpoint(spark):
    """Value parity with operators.components.connected_components on a
    multi-component graph (two clusters + a bridge-free singleton pair),
    at the shipped default round count."""
    from zarr_datafusion_search_spark.operators.components import (
        connected_components,
    )
    from zarr_datafusion_search_spark.plans.pipeline_ops import (
        COMPONENTS_ORACLE_ROUNDS,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)]
    engine = sorted(
        map(
            tuple,
            connected_components(
                spark.createDataFrame(pairs, "doc_a long, doc_b long")
            ).collect(),
        )
    )
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    oracle = _run_components_oracle(values, COMPONENTS_ORACLE_ROUNDS)
    assert engine == [(n, c) for n, c in oracle]
    assert len(engine) == 9


# ---------------------------------------------------------------------------
# LPA split null-safe keys (ADVICE r11)
# ---------------------------------------------------------------------------


def test_lpa_split_trims_null_keyed_group_like_full_window(spark, monkeypatch):
    """A NULL-src edge group above the cap must be trimmed identically by
    the broadcast split and the full row_number window — a plain equi
    anti/semi join never matches NULL and would leak the whole group
    through the split path untrimmed (ADVICE r11)."""
    import zarr_datafusion_search_spark.operators.graph as graph_mod
    from zarr_datafusion_search_spark.operators.graph import label_propagation

    # hub 0 (degree 200) + NULL hub (degree 200) + sparse chain: cap lands
    # at the floor, both hubs are heavy, the cost gate trims at 8 rounds
    rows = [(0, i, 1.0 - i * 1e-6) for i in range(1, 201)]
    rows += [(None, i, 1.0 - i * 1e-6) for i in range(1, 201)]
    base = 10_000
    for i in range(40):
        rows.append((base + i, base + i + 1, 0.5))
    edges = spark.createDataFrame(
        rows, "doc_a long, doc_b long, jaccard double"
    )
    seeds = spark.createDataFrame(
        [(1, "a"), (10_000, "b")], "node long, label string"
    )
    split = sorted(
        map(tuple, label_propagation(edges, seeds, n_rounds=8).collect()),
        key=str,
    )
    monkeypatch.setattr(graph_mod, "LPA_HEAVY_SPLIT_MAX", 0)
    full = sorted(
        map(tuple, label_propagation(edges, seeds, n_rounds=8).collect()),
        key=str,
    )
    assert split == full
    assert len(split) > 0


# ---------------------------------------------------------------------------
# per-worker BLAS thread pinning (round 12)
# ---------------------------------------------------------------------------


def test_engine_pins_one_blas_thread_per_worker(spark):
    """Every task slot runs its own Python worker, so an n-thread BLAS
    pool per worker oversubscribes cores n-fold — and this numpy's
    OpenBLAS spin-yields that pool in the kernel (measured 43 s user /
    467 s SYSTEM on a 108-GFLOP dgemm loop). build_session must pin one
    BLAS thread per worker: driver env (local-mode daemons inherit it)
    AND executorEnv (cluster deployments)."""
    import os

    assert os.environ.get("OPENBLAS_NUM_THREADS") == "1"
    assert (
        spark.conf.get("spark.executorEnv.OPENBLAS_NUM_THREADS") == "1"
    )


# ---------------------------------------------------------------------------
# duck settle short-circuit (ADVICE r11)
# ---------------------------------------------------------------------------


def test_duck_settle_loop_skipped_when_raw_breach_is_final(monkeypatch):
    """When the raw end probe already exceeds DUCK_RAW_BREACH_FACTOR x the
    envelope the verdict is contended no matter what a settle re-probe
    would read — the stamp must return immediately (no 60 s loop) with
    settle_wait_s == 0."""
    from zarr_datafusion_search_spark import benchutil

    calls = []
    monkeypatch.setattr(
        benchutil, "measure_duck_probe", lambda: calls.append(1) or 0.1
    )
    raw = benchutil.DUCK_RAW_BREACH_FACTOR * benchutil.DUCK_PROBE_ENVELOPE_S
    t0 = time.monotonic()
    stamp = benchutil.duck_pass_stamp(0.1, raw + 0.01)
    assert time.monotonic() - t0 < 1.0
    assert stamp["duck_contended"] is True
    assert stamp["duck_probe_end_settle_wait_s"] == 0.0
    assert stamp["duck_probe_end_raw_s"] == raw + 0.01
    assert calls == []  # settle loop never probed


def test_duck_settle_loop_still_runs_on_moderate_breach(monkeypatch):
    """A moderate breach (teardown-decay class) still settles and clears."""
    from zarr_datafusion_search_spark import benchutil

    readings = iter([0.1])
    monkeypatch.setattr(
        benchutil, "measure_duck_probe", lambda: next(readings)
    )
    monkeypatch.setattr(benchutil.time, "sleep", lambda s: None)
    env = benchutil.DUCK_PROBE_ENVELOPE_S
    stamp = benchutil.duck_pass_stamp(0.1, env + 0.01)
    assert stamp["duck_contended"] is False
    assert stamp["duck_probe_end_s"] == 0.1
    assert stamp["duck_probe_end_raw_s"] == pytest.approx(env + 0.01)
