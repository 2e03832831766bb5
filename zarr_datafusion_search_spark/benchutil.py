"""Shared host-contention gating for the bench harnesses.

All three harnesses (``bench.py``, ``bench_scale.py``, ``bench_skew.py``)
stamp their records with a direct contention measurement; bench.py grew a
pre-flight wait + post-probe + retry protocol in round 8 while the scale
and skew harnesses still stamped-but-did-not-gate (VERDICT r08 ask #4).
This module is that protocol, shared, plus a load-average ceiling:

* **fixed-cost probe** — median wall-clock of a warmed trivial Spark job:
  the planning/scheduling constant every bench query pays. Under host
  contention it inflates directly, so it is the primary gate. Idle hosts
  on this 32-cpu box measure 0.11-0.13 s; the envelope is 0.15 s.
* **load1 ceiling** — the r8 driver record passed the 0.15 s probe with
  ``load1 = 4.18`` and showed uniform +15-30 % drift on UNTOUCHED queries
  vs the r6 idle record (VERDICT r08 "what's wrong" #4): a handful of
  runnable background threads steal cycles from 32-way task bursts without
  moving a 10-task trivial-job median. The start-side gate therefore also
  waits for ``load1 <= SPARK_GRAFT_LOAD1_CEILING`` (default 3.0). Only the
  START probe applies it — by suite end our own executors have pushed
  load1 into the tens, which is self-load, not contention.

``wait_for_idle`` polls until both conditions hold or the wait budget runs
out; callers re-probe the fixed cost AFTER their suite and mark the record
``contended`` if either probe breached the envelope or the start load was
over the ceiling, then retry the measurement once (a contended record is
not quotable, so one retry is cheaper than a round without an arms-length
number).
"""

from __future__ import annotations

import os
import statistics
import time

#: idle envelope for the warmed fixed-cost probe — see module docstring.
IDLE_FIXED_COST_S = float(
    os.environ.get("SPARK_GRAFT_IDLE_FIXED_COST", "0.15")
)
#: start-side 1-minute load-average ceiling (r8 drift postmortem).
LOAD1_CEILING = float(os.environ.get("SPARK_GRAFT_LOAD1_CEILING", "3.0"))
#: pre-flight wait budget (seconds). Load1 decays with a ~1-minute time
#: constant, so recovering from e.g. a 30-load dataset build to the 3.0
#: ceiling needs ~ln(30/3)*60 = 140 s of genuine idle.
CONTENTION_WAIT_S = float(
    os.environ.get("SPARK_GRAFT_CONTENTION_WAIT_S", "240")
)
#: total measurement attempts when a completed pass turns out contended.
BENCH_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "2"))


def measure_fixed_cost(spark) -> float:
    """Median wall-clock of a trivial Spark job — the per-query constant
    (planning + job scheduling + task launch) every bench query pays on
    top of its actual work.

    Measured AFTER a short JIT warm-up burst: on a fresh session the
    first dozen jobs include interpreter/codegen compilation that real
    bench queries (each preceded by their own warmup run) never pay, and
    the resulting constant swung 0.16-0.34 s between same-day runs,
    moving every section's ratio_net. 10 warm jobs + median of 10."""
    for _ in range(10):
        spark.range(8).count()
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        spark.range(8).count()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


#: sustained one-core memory-write floor for the idle gate (round 12):
#: this VM's hypervisor intermittently write-fault-taxes DRAM-bound work
#: in EPOCHS minutes long (measured 1.2 GB/s at 94% sys inside an epoch
#: vs 17 GB/s at 0 sys outside, same session) — the residual mechanism
#: behind the r11 uniform headline drift. The floor makes the idle wait
#: sit out a taxed epoch instead of timing through it.
MEM_BW_FLOOR_GBS = float(os.environ.get("SPARK_GRAFT_MEM_BW_FLOOR", "4.0"))

#: first-touch floor for the idle gate: fresh anonymous pages are the
#: sharper signal (healthy 2.6-3 GB/s on this box; taxed epochs measured
#: 0.06 and 0.011 GB/s — 16 to 340 us PER 4K PAGE billed as sys). Fresh
#: pages are what a starting JVM heap, a growing shuffle buffer, and
#: every un-retained allocator hit pay, so a record timed inside such an
#: epoch is uniformly inflated while load1 and the trivial-job probe
#: stay clean.
MEM_FIRST_TOUCH_FLOOR_GBS = float(
    os.environ.get("SPARK_GRAFT_MEM_FT_FLOOR", "0.5")
)


def wait_for_idle(spark) -> tuple[float, float]:
    """Poll until the host looks idle (fixed-cost probe inside the
    envelope, load1 under the ceiling, AND the memory-write probe above
    its floor — see :data:`MEM_BW_FLOOR_GBS`) or the wait budget runs
    out.

    Returns ``(fixed_cost_s, load1)`` from the final poll — the values the
    record should stamp as its start-side host state."""
    deadline = time.monotonic() + CONTENTION_WAIT_S
    fc = measure_fixed_cost(spark)
    load1 = os.getloadavg()[0]
    mem = measure_mem_write_bandwidth()
    while (
        fc > IDLE_FIXED_COST_S
        or load1 > LOAD1_CEILING
        or mem["mem_rw_gb_per_s"] < MEM_BW_FLOOR_GBS
        or mem["mem_first_touch_gb_per_s"] < MEM_FIRST_TOUCH_FLOOR_GBS
    ) and time.monotonic() < deadline:
        time.sleep(15)
        fc = measure_fixed_cost(spark)
        load1 = os.getloadavg()[0]
        mem = measure_mem_write_bandwidth()
    return fc, round(load1, 2)


def is_contended(
    fixed_cost_s: float, fixed_cost_end_s: float, load1_start: float
) -> bool:
    """A record is quotable only if both probes sat inside the envelope
    and the suite STARTED under the load ceiling (end-side load is our own
    executors — self-load, not contention)."""
    return (
        fixed_cost_s > IDLE_FIXED_COST_S
        or fixed_cost_end_s > IDLE_FIXED_COST_S
        or load1_start > LOAD1_CEILING
    )


def cpu_stat_snapshot() -> dict | None:
    """Cumulative /proc/stat CPU ticks — the raw material for the STEAL
    share of a measurement window. Round-12 finding while A/B-attributing
    the r11 headline regression: this box is a VM whose hypervisor steals
    ~1% of cycles at idle but 11%+ while the suite is busy — invisible to
    load1 AND mostly invisible to the 10-task trivial-job probe, yet it
    inflates every query wall uniformly, which is exactly the r8/r11
    drift signature. Returns None on non-Linux (no /proc/stat)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
    except OSError:
        return None
    vals = list(map(int, parts))
    names = [
        "user", "nice", "system", "idle", "iowait",
        "irq", "softirq", "steal",
    ]
    return {n: v for n, v in zip(names, vals)}


def measure_mem_write_bandwidth() -> dict:
    """Sustained memory-WRITE bandwidth of one core over a 64 MB buffer
    (re-traversed, so first-touch faults are excluded) plus the sys-time
    share of the window. Round-12 forensic: on this VM, DRAM-bound writes
    intermittently crawl at ~1.2 GB/s with the stall billed as SYSTEM
    time — the signature of hypervisor write-fault taxation (dirty-page
    tracking), while cache-resident compute stays at full speed. That
    taxes every shuffle/scan/GEMM uniformly, which is the residual
    mechanism behind the r11 headline drift beyond the steal share.
    Healthy hardware measures several GB/s here with ~0 sys."""
    import numpy as np
    import resource

    buf = np.ones(8 * 1024 * 1024, dtype=np.float64)  # 64 MB
    buf += 1.0  # touch everything before timing
    r0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.perf_counter()
    passes = 8
    for _ in range(passes):
        buf += 1.0
    wall = time.perf_counter() - t0
    r1 = resource.getrusage(resource.RUSAGE_SELF)
    gb = passes * buf.nbytes * 2 / 1e9  # read + write per pass
    sys_s = r1.ru_stime - r0.ru_stime
    out = {
        "mem_rw_gb_per_s": round(gb / max(wall, 1e-9), 2),
        "mem_probe_sys_share": round(sys_s / max(wall, 1e-9), 2),
    }
    # FIRST-TOUCH probe via raw anonymous mmap (bypasses every allocator
    # cache, so heap retention cannot mask it): write one byte per 4K
    # page of a fresh 64 MB mapping. This is the discriminating signal —
    # inside a taxed epoch this box measured 0.06 and later 0.011 GB/s
    # here (16 -> 340 us PER PAGE, billed as sys) while the reused-buffer
    # number above stayed at 17 GB/s.
    import mmap as _mmap

    size = 64 * 1024 * 1024
    m = _mmap.mmap(-1, size)
    t0 = time.perf_counter()
    for off in range(0, size, 4096):
        m[off] = 1
    ft_wall = time.perf_counter() - t0
    m.close()
    out["mem_first_touch_gb_per_s"] = round(
        size / 1e9 / max(ft_wall, 1e-9), 3
    )
    return out


def steal_pct_between(start: dict | None, end: dict | None) -> float | None:
    """Steal share (%) of all CPU ticks elapsed between two
    :func:`cpu_stat_snapshot` readings; None if either is unavailable or
    no ticks elapsed."""
    if not start or not end:
        return None
    total = sum(end.values()) - sum(start.values())
    if total <= 0:
        return None
    return round(100.0 * (end["steal"] - start["steal"]) / total, 2)


#: cross-round ANCHOR ceiling (VERDICT r11 ask #2): the probe + load1
#: gate demonstrably admitted two sessions ~20% apart (the r10 and r11
#: driver records both stamped contended:false while every headline
#: query moved +20-45%). The anchor is a REAL headline query
#: (q1_pricing_summary at sf0.1) timed with the bench's own per-query
#: protocol after the idle wait — a direct measurement of the thing the
#: gate exists to protect. Committed idle history r04-r10: 0.32-0.38 s
#: (0.321/0.323/0.351/0.364/0.376/0.379); the two retro-identified
#: drift sessions measured 0.50 (r07) and 0.476 (r11). The ceiling is
#: idle-max + ~16%, below both drift readings.
ANCHOR_CEILING_S = float(os.environ.get("SPARK_GRAFT_ANCHOR_CEILING", "0.44"))


def wait_for_anchor(anchor_fn) -> tuple[float, bool]:
    """Anchor-query gate (VERDICT r11 ask #2): time ``anchor_fn`` (a
    zero-arg callable that runs the anchor query to completion) with the
    bench's per-query protocol — 1 warmup + median of 3 — and poll until
    the median sits under :data:`ANCHOR_CEILING_S` or the shared wait
    budget runs out. Returns ``(anchor_s, breached)``; the caller folds
    ``breached`` into the record's ``contended`` verdict and stamps the
    reading, so a session 20% off the cross-round band RETRIES instead of
    committing a non-comparable number with ``contended: false``.

    Runs AFTER :func:`wait_for_idle`: the probe/load1 gate screens cheap
    and fast, the anchor then verifies the one signal the cheap gate has
    twice been shown to miss (uniform ~20-45% drift on real query plans
    with a clean trivial-job probe)."""

    def _median() -> float:
        anchor_fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            anchor_fn()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 4)

    deadline = time.monotonic() + CONTENTION_WAIT_S
    a = _median()
    while a > ANCHOR_CEILING_S and time.monotonic() < deadline:
        time.sleep(15)
        a = _median()
    return a, a > ANCHOR_CEILING_S


#: idle envelope for the DuckDB-side probe (ADVICE r9: the DuckDB timing
#: pass — the ratio DENOMINATOR — ran after spark.stop() with no probe, so
#: contention arriving during it silently inflated duck_s and flattered
#: every ratio while the record still said contended:false). The probe is
#: a fixed parallel aggregation; calibrated on this 32-cpu host (round
#: 10): idle median 0.28-0.29 s across repeated sessions, 0.32 s with 24
#: single-core hogs running (25% of cores still free), 0.58 s
#: oversubscribed (40 hogs). The 0.32 envelope therefore trips at
#: roughly the same partial-load level the Spark-side load1 ceiling
#: exists to catch, and definitively on real oversubscription.
DUCK_PROBE_ENVELOPE_S = float(
    os.environ.get("SPARK_GRAFT_DUCK_PROBE_ENVELOPE", "0.32")
)

_DUCK_PROBE_SQL = "SELECT sum(range % 7) FROM range(60000000)"


def measure_duck_probe() -> float:
    """Median wall-clock of a fixed parallel DuckDB aggregation — the
    denominator-side twin of :func:`measure_fixed_cost`. Runs on its own
    connection (default thread pool = all cores) so it measures the same
    CPU availability the timed oracle queries see."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(_DUCK_PROBE_SQL).fetchall()  # JIT/alloc warm-up
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            con.execute(_DUCK_PROBE_SQL).fetchall()
            times.append(time.perf_counter() - t0)
    finally:
        con.close()
    return round(statistics.median(times), 4)


def wait_for_duck_idle() -> tuple[float, float]:
    """Denominator-side twin of :func:`wait_for_idle`: poll until the
    DuckDB probe sits inside its envelope AND load1 is under the ceiling,
    or the wait budget runs out. Returns ``(probe_s, load1)`` — the final
    probe value and the load1 reading it was gated with, both stamped so
    a budget-timeout start (probe clean, load1 still high) is
    reconstructible from the record (ADVICE r10, the denominator twin of
    ``load1_start_gated``).

    Why wait instead of only stamping (round 10): the duck pass starts
    right after ``spark.stop()``, when the JVM teardown and page-cache
    writeback are still settling — the first refreshed 100x record this
    round breached the start probe by 17% (0.374 s vs 0.32) from exactly
    that decay while the Spark side was clean, flagging an otherwise
    quotable record. The probe-then-wait turns that transient into a
    short delay instead of a discarded 45-minute run."""
    deadline = time.monotonic() + CONTENTION_WAIT_S
    p = measure_duck_probe()
    load1 = os.getloadavg()[0]
    while (
        p > DUCK_PROBE_ENVELOPE_S or load1 > LOAD1_CEILING
    ) and time.monotonic() < deadline:
        time.sleep(15)
        p = measure_duck_probe()
        load1 = os.getloadavg()[0]
    return p, round(load1, 2)


#: an end-probe breach this large is no longer attributable to DuckDB's
#: own few-second teardown decay — the settle loop may still bring the
#: reading down, but the record stays contended (ADVICE r10: the settle
#: wait must not be able to launder a genuinely contended denominator)
DUCK_RAW_BREACH_FACTOR = 1.5


def duck_pass_stamp(
    probe_start_s: float,
    probe_end_s: float,
    load1_start_gated: float | None = None,
) -> dict:
    """Auditable host-state block bracketing the DuckDB timing pass. A
    breach of either probe marks the DENOMINATOR contended — load1 is
    stamped for forensics only (it still carries our own decaying
    post-suite self-load, so it is not gated).

    The end probe is taken twice when the first reading breaches: a
    120 s watchdog-interrupted DNF query (the common last suite member at
    extreme scale) leaves DuckDB's own thread pool and buffer teardown
    decaying for a few seconds, which is SELF-load — the same class the
    Spark-side gate excludes from its end stamp. Both readings are
    recorded (``duck_probe_end_raw_s`` / ``duck_probe_end_s``) and the
    gate uses the settled one, with two ADVICE-r10 hardenings: a raw
    breach beyond :data:`DUCK_RAW_BREACH_FACTOR` x the envelope stays
    contended even if it settles (teardown decay is a ~10-20% effect;
    a 50%+ breach is external), and the settle wait's duration is
    stamped so auditors can distinguish instant-clean from
    decayed-to-clean. ``load1_start_gated`` is the load1 reading
    :func:`wait_for_duck_idle` gated its start on."""
    raw_end = probe_end_s
    settle_wait_s = 0.0
    # a raw breach past the factor makes the contended verdict final no
    # matter what the settle loop would read — skip the up-to-60 s wait
    # and stamp immediately (ADVICE r11)
    if (
        probe_end_s > DUCK_PROBE_ENVELOPE_S
        and raw_end <= DUCK_RAW_BREACH_FACTOR * DUCK_PROBE_ENVELOPE_S
    ):
        t0 = time.monotonic()
        deadline = t0 + 60
        while (
            probe_end_s > DUCK_PROBE_ENVELOPE_S
            and time.monotonic() < deadline
        ):
            time.sleep(10)
            probe_end_s = measure_duck_probe()
        settle_wait_s = round(time.monotonic() - t0, 1)
    return {
        "duck_probe_s": probe_start_s,
        "duck_probe_end_raw_s": raw_end,
        "duck_probe_end_s": probe_end_s,
        "duck_probe_end_settle_wait_s": settle_wait_s,
        "duck_probe_envelope_s": DUCK_PROBE_ENVELOPE_S,
        "duck_load1_start_gated": load1_start_gated,
        "load1_after_duck": round(os.getloadavg()[0], 2),
        "duck_contended": (
            probe_start_s > DUCK_PROBE_ENVELOPE_S
            or probe_end_s > DUCK_PROBE_ENVELOPE_S
            or raw_end > DUCK_RAW_BREACH_FACTOR * DUCK_PROBE_ENVELOPE_S
        ),
    }


def host_state_stamp(
    loadavg_start: list[float],
    fixed_cost_s: float,
    fixed_cost_end_s: float,
    contended: bool,
    attempts: int,
    load1_start_gated: float | None = None,
    duck_pass: dict | None = None,
    anchor: dict | None = None,
    steal: dict | None = None,
    query_start_offsets_s: dict | None = None,
) -> dict:
    """The common ``host_state`` block every bench record carries.

    ``load1_start_gated`` is the load1 value :func:`wait_for_idle`
    actually gated on (ADVICE r9: the re-read ``loadavg_start`` can drift
    from it, so borderline records were not reconstructible).
    ``duck_pass`` is the :func:`duck_pass_stamp` block; its breach folds
    into the top-level ``contended`` — a flattered denominator is just as
    unquotable as an inflated numerator. ``anchor`` is the
    :func:`wait_for_anchor` reading (``{"anchor_s", "anchor_ceiling_s",
    "anchor_breached", "anchor_query"}``); the caller is expected to have
    already folded its breach into ``contended``."""
    out = {
        "loadavg_start": loadavg_start,
        "load1_start_gated": load1_start_gated,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cpus": os.cpu_count(),
        "fixed_cost_s": fixed_cost_s,
        "fixed_cost_end_s": fixed_cost_end_s,
        "idle_fixed_cost_envelope_s": IDLE_FIXED_COST_S,
        "load1_ceiling": LOAD1_CEILING,
        "contended": contended,
        "attempts": attempts,
        "contention_wait_s": CONTENTION_WAIT_S,
    }
    if anchor is not None:
        out["anchor"] = anchor
    if steal is not None:
        # forensics, not gated: steal during our own busy window is
        # hypervisor-level contention the guest cannot control; the
        # anchor gate catches its symptom (real-query wall drift), this
        # stamp names the cause so a drifted record is attributable
        # without an A/B session.
        out["steal"] = steal
    if query_start_offsets_s is not None:
        # round 13 (VERDICT r12 what's-wrong #5): each query's start
        # offset into the Spark timing window, so a contended epoch
        # arriving MID-suite localizes to specific members post-hoc
        out["query_start_offsets_s"] = query_start_offsets_s
    if duck_pass is not None:
        out["duck_pass"] = duck_pass
        out["contended_spark_side"] = contended
        out["contended"] = contended or duck_pass["duck_contended"]
    return out
