"""Round-4 batch-6/7 queries: physical-layout optimization (z-order
locality, compaction planning, dynamic partition pruning), sketch-based
join/count reduction (Bloom pre-filter, count-min error audit), and
evaluation metrics over curation signals (group-wise AUC, annotator
agreement, mixture reweighting).

Same contract as ``pipeline_ops``: every entry is a Spark DataFrame plan
plus a DuckDB oracle computing the identical result (column names aliased
identically on both sides; floats pinned with both-side rounding; hash
constants shared between the plan and the oracle through the operator
module so neither side can drift).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zarr_datafusion_search_spark.operators.layout import zorder_sql
from zarr_datafusion_search_spark.operators.sketches import (
    bloom_hash_sql,
    cms_hash_sql,
    BLOOM_BITS,
    CMS_HASHES,
    CMS_WIDTH,
)
from zarr_datafusion_search_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# batch 6: physical layout + sketches
# ---------------------------------------------------------------------------

_ZA = "user_id % 16"
_ZB = "CAST(floor(value) AS BIGINT) % 16"


@register(
    "zorder_locality_audit",
    oracle=f"""
    WITH keyed AS (
      SELECT event_id, {_ZA} AS da, {_ZB} AS db,
             {zorder_sql(_ZA, _ZB)} AS z
      FROM events
    ),
    filed AS (
      SELECT da, db,
             ((row_number() OVER (ORDER BY z, event_id) - 1) * 16)
               // (count(*) OVER ()) + 1 AS file_id
      FROM keyed
    )
    SELECT file_id, count(*) AS n_rows,
           min(da) AS a_min, max(da) AS a_max,
           min(db) AS b_min, max(db) AS b_max,
           max(da) - min(da) + 1 AS a_span,
           max(db) - min(db) + 1 AS b_span
    FROM filed GROUP BY 1
    """,
    doc="Z-order (Morton) layout audit: events keyed on the bit-interleave "
    "of two bucketed dimensions (user, value), striped into 16 equal-row "
    "'files' in z order, reporting each file's min/max extent on BOTH "
    "axes — the per-file statistics a reader prunes on. The interleave is "
    "pure JVM bit arithmetic (operators/layout.py:zorder_key) and the "
    "oracle replays the identical expression, so the audit doubles as a "
    "cross-engine proof of the key. File assignment is the two-phase "
    "distributed prefix-rank (never a single-task global window), "
    "replayed in the oracle as the identical integer bucketing over "
    "row_number(). At 100 TB the z-sort is the write-once layout shuffle "
    "every later 2-D range scan amortizes.",
)
def zorder_locality_audit_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.layout import (
        zorder_locality_audit,
    )

    ev = table(spark, sf, "events").selectExpr(
        "event_id", f"{_ZA} as da", f"{_ZB} as db"
    )
    return zorder_locality_audit(
        ev, "da", "db", n_files=16, bits=4, order_col="event_id"
    )


@register(
    "compaction_plan_greedy",
    oracle="""
    WITH files AS (
      SELECT source, CAST(floor(doc_id / 50.0) AS BIGINT) AS file_no,
             CAST(sum(n_chars) AS BIGINT) AS bytes
      FROM documents GROUP BY 1, 2
    ),
    planned AS (
      SELECT source, bytes,
             CAST(floor(coalesce(sum(bytes) OVER (
                 PARTITION BY source ORDER BY file_no
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 20000.0) AS BIGINT) AS grp
      FROM files
    )
    SELECT source, grp AS compaction_group,
           count(*) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           round(CAST(sum(bytes) AS DOUBLE) * 10000.0 / 20000.0)
             / 10000.0 AS fill_ratio
    FROM planned GROUP BY 1, 2
    """,
    doc="Small-file compaction planner: a simulated per-source file "
    "inventory (50-doc parquet files sized by their text bytes) packed "
    "into ~20 KB compaction groups by striding the cumulative byte "
    "stream with one window function — one shuffle on the partition key "
    "regardless of file count, no driver-side loop "
    "(operators/layout.py:plan_compaction_greedy). The standard "
    "maintenance job against ingest read-amplification on a 100 TB lake.",
)
def compaction_plan_greedy_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.layout import (
        plan_compaction_greedy,
    )

    files = (
        table(spark, sf, "documents")
        .groupBy(
            "source",
            F.floor(F.col("doc_id") / F.lit(50.0)).cast("long").alias(
                "file_no"
            ),
        )
        .agg(F.sum("n_chars").alias("bytes"))
    )
    return plan_compaction_greedy(
        files, "source", "file_no", "bytes", target_bytes=20_000
    )


@register(
    "dpp_partitioned_join",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY 1
    """,
    doc="Dynamic partition pruning: the hive-partitioned events dataset "
    "joined to a tiny broadcast dim filtered to its 'hot' tier — Spark "
    "turns the broadcast side into a runtime partition filter on the "
    "fact scan (dynamicpruningexpression in PartitionFilters, asserted "
    "in tests/test_round4_ops2.py), so only the matching event_type "
    "directories are read even though the pruning values are not "
    "literals in the query. THE mechanism that makes star-schema joins "
    "survive a 100 TB partitioned fact table.",
)
def dpp_partitioned_join(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.layout import (
        partitioned_events_dir,
    )

    facts = spark.read.parquet(partitioned_events_dir(spark, sf))
    dim = spark.createDataFrame(
        [
            ("click", "hot"),
            ("purchase", "hot"),
            ("view", "cold"),
            ("signup", "cold"),
            ("error", "cold"),
        ],
        "event_type string, tier string",
    )
    return (
        facts.join(
            F.broadcast(dim.filter(F.col("tier") == "hot")), "event_type"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


_BH1, _BH2 = bloom_hash_sql("cast(o_custkey as bigint)")
_PH1, _PH2 = bloom_hash_sql("cast(c_custkey as bigint)")


@register(
    "bloom_join_prefilter",
    oracle=f"""
    WITH bloom AS (
      SELECT bit_or((1::BIGINT << ({_BH1})) | (1::BIGINT << ({_BH2})))
               AS bloom
      FROM orders WHERE o_totalprice > 400000
    ),
    truth AS (
      SELECT DISTINCT o_custkey AS _k
      FROM orders WHERE o_totalprice > 400000
    ),
    probed AS (
      SELECT c.c_custkey AS _k,
             ((b.bloom >> ({_PH1})) & 1) = 1
               AND ((b.bloom >> ({_PH2})) & 1) = 1 AS bloom_pass,
             t._k IS NOT NULL AS is_member
      FROM customer c CROSS JOIN bloom b
      LEFT JOIN truth t ON t._k = c.c_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probe,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(sum(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0
                    END) AS BIGINT) AS n_false_pos,
           round(CAST(sum(CASE WHEN bloom_pass AND NOT is_member
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / greatest(sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END),
                            1), 6) AS fp_rate
    FROM probed
    """,
    doc=f"Bloom-filter join pre-reduction, audited: a {BLOOM_BITS}-bit "
    "bloom of high-value orders' customer keys built as ONE bit_or "
    "aggregate (8 bytes cross the wire per task), probed by every "
    "customer via a broadcast 1-row cross join; reports passes, exact "
    "ground-truth members, false positives, and the FP rate among true "
    "negatives. Mirrors Spark's runtime bloom-join pruning in an "
    "oracle-replayable form (operators/sketches.py) — at 100 TB the "
    "probe rows the bloom drops never enter the join shuffle.",
)
def bloom_join_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.sketches import (
        bloom64_prefilter_audit,
    )

    orders = table(spark, sf, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    customer = table(spark, sf, "customer")
    return bloom64_prefilter_audit(orders, customer, "o_custkey", "c_custkey")


# ---------------------------------------------------------------------------
# batch 7: evaluation metrics + count-min audit
# ---------------------------------------------------------------------------


@register(
    "groupwise_auc_score",
    oracle="""
    WITH ranked AS (
      SELECT source,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS _y,
             rank() OVER (PARTITION BY source ORDER BY n_chars)
               + (count(*) OVER (PARTITION BY source, n_chars) - 1) / 2.0
               AS _mr
      FROM documents
    ),
    agg AS (
      SELECT source,
             sum(CASE WHEN _y = 1 THEN _mr END) AS rpos,
             CAST(sum(_y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(_y) AS BIGINT) AS n_neg
      FROM ranked GROUP BY 1
    )
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN round((rpos - n_pos * (n_pos + 1) / 2.0)
                           / (n_pos * n_neg), 6)
           END AS auc
    FROM agg
    """,
    doc="Group-wise ROC AUC via the midrank Mann-Whitney identity "
    "(operators/evalmetrics.py:groupwise_auc): per source, does document "
    "length rank the English docs above the rest? Midranks make tie "
    "handling exact and order-independent — the property that lets a "
    "rank statistic over a distributed shuffle match an external oracle "
    "bit-for-bit. One rank shuffle on (group, score); O(1) state per "
    "group after, so the metric holds at any corpus size.",
)
def groupwise_auc_score(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        groupwise_auc,
    )

    docs = table(spark, sf, "documents").select(
        "source",
        "n_chars",
        (F.col("lang") == "en").cast("int").alias("is_en"),
    )
    return groupwise_auc(docs, "source", "n_chars", "is_en")


@register(
    "annotator_agreement_kappa",
    oracle="""
    WITH lab AS (
      SELECT source,
             CASE WHEN n_chars >= 200 THEN 1.0 ELSE 0.0 END AS a,
             CASE WHEN n_chars - length(replace(text, ' ', '')) >= 30
                  THEN 1.0 ELSE 0.0 END AS b
      FROM documents
    ),
    agg AS (
      SELECT source, count(*) AS n, avg(a) AS pa, avg(b) AS pb,
             avg(CASE WHEN a = b THEN 1.0 ELSE 0.0 END) AS po
      FROM lab GROUP BY 1
    )
    SELECT source, n, round(po, 6) AS po,
           round(pa * pb + (1 - pa) * (1 - pb), 6) AS pe,
           round((po - (pa * pb + (1 - pa) * (1 - pb)))
                 / nullif(1 - (pa * pb + (1 - pa) * (1 - pb)), 0.0), 6)
             AS kappa
    FROM agg
    """,
    doc="Cohen's kappa between two label heuristics (char-length vs "
    "whitespace-word-count document quality), per source "
    "(operators/evalmetrics.py:cohen_kappa_binary). Chance-corrected "
    "agreement is the standard check that two cheap curation labelers "
    "measure the same thing; for binary labels the whole metric folds "
    "into three group averages — map-side combinable, no second "
    "shuffle, O(groups) output at any scale.",
)
def annotator_agreement_kappa(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        cohen_kappa_binary,
    )

    docs = table(spark, sf, "documents").select(
        "source",
        (F.col("n_chars") >= 200).cast("int").alias("lab_len"),
        (
            F.col("n_chars")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            >= 30
        )
        .cast("int")
        .alias("lab_words"),
    )
    return cohen_kappa_binary(docs, "source", "lab_len", "lab_words")


@register(
    "mixture_reweight_ess",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS DOUBLE) AS total, count(*) AS k
      FROM counts
    ),
    w AS (
      SELECT c.lang, c.n_docs, t.total,
             c.n_docs / t.total AS share,
             (1.0 / t.k) / (c.n_docs / t.total) AS wt
      FROM counts c CROSS JOIN tot t
    ),
    summ AS (
      SELECT pow(sum(n_docs * wt), 2) / sum(n_docs * wt * wt) AS ess
      FROM w
    )
    SELECT w.lang, CAST(w.n_docs AS BIGINT) AS n_docs,
           round(w.share, 6) AS share, round(w.wt, 6) AS weight,
           round(s.ess, 2) AS ess,
           round(s.ess / w.total, 6) AS ess_fraction
    FROM w CROSS JOIN summ s
    """,
    doc="Mixture rebalancing to a uniform language target with Kish "
    "effective sample size (operators/evalmetrics.py:mixture_reweight_"
    "ess): per-language importance weights plus the honest 'how much "
    "data survives the reweighting' number. Two tiny aggregations — "
    "per-group counts then a k-row rollup broadcast back — the corpus "
    "itself never reshuffles, so the plan scales with the number of "
    "languages, not rows.",
)
def mixture_reweight_ess_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        mixture_reweight_ess,
    )

    return mixture_reweight_ess(
        table(spark, sf, "documents").select("lang"), "lang"
    )


_CMS_UNION = "\n      UNION ALL ".join(
    f"SELECT {d} AS d, {cms_hash_sql('_k', d)} AS bucket FROM hashed"
    for d in range(len(CMS_HASHES))
)
_CMS_JOINS = "\n    ".join(
    f"JOIN cells c{d} ON c{d}.d = {d} AND "
    f"c{d}.bucket = {cms_hash_sql('k._k', d)}"
    for d in range(len(CMS_HASHES))
)
_CMS_LEAST = "least(" + ", ".join(
    f"c{d}.cnt" for d in range(len(CMS_HASHES))
) + ")"


@register(
    "countmin_sketch_error",
    oracle=f"""
    WITH hashed AS (
      SELECT CAST(user_id AS BIGINT) AS _k FROM events
    ),
    cells AS (
      SELECT d, bucket, count(*) AS cnt FROM (
        {_CMS_UNION}
      ) GROUP BY 1, 2
    ),
    keys AS (SELECT _k, count(*) AS exact FROM hashed GROUP BY 1)
    SELECT k._k AS key, CAST(k.exact AS BIGINT) AS exact,
           CAST({_CMS_LEAST} AS BIGINT) AS estimate,
           CAST({_CMS_LEAST} - k.exact AS BIGINT) AS overcount
    FROM keys k
    {_CMS_JOINS}
    """,
    doc=f"Count-min sketch audit over event user ids: a "
    f"{len(CMS_HASHES)}x{CMS_WIDTH} counter table built as one "
    "group-by over unioned per-depth bucket ids (fixed memory at any "
    "cardinality, map-side combinable), then every key's estimate "
    "joined to its exact count (operators/sketches.py:countmin_error_"
    "audit). estimate >= exact always holds (tested); the overcount "
    "column is the price of fixed memory, which is the trade a 100 TB "
    "frequency pass makes when exact per-key counts would be their own "
    "full shuffle. Hash constants are shared between the plan and the "
    "oracle so the bits cannot drift.",
)
def countmin_sketch_error(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.sketches import (
        countmin_error_audit,
    )

    return countmin_error_audit(
        table(spark, sf, "events").select("user_id"), "user_id"
    )


# ---------------------------------------------------------------------------
# batch 8: governance, rollup reuse, cardinality estimation
# ---------------------------------------------------------------------------


@register(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
      SELECT lang, CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket,
             count(*) AS sz
      FROM documents GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k,
           CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_suppressed,
           round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
                 / sum(sz), 6) AS suppression_rate,
           CAST(min(sz) AS BIGINT) AS min_group_size
    FROM g
    """,
    doc="k-anonymity audit (k=5) over the (lang, length-bucket) "
    "quasi-identifier: how many QI groups isolate fewer than k "
    "documents and what fraction of rows suppression would cost "
    "(operators/governance.py:k_anonymity_audit). Only counts reach the "
    "driver — the sensitive below-k groups themselves stay distributed, "
    "which is the correct privacy posture for the audit itself.",
)
def k_anonymity_audit_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.governance import (
        k_anonymity_audit,
    )

    docs = table(spark, sf, "documents").select(
        "lang",
        F.floor(F.col("n_chars") / F.lit(100.0))
        .cast("long")
        .alias("len_bucket"),
    )
    return k_anonymity_audit(docs, ["lang", "len_bucket"], k=5)


@register(
    "contribution_cap_report",
    oracle="""
    WITH ranked AS (
      SELECT event_type, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    raw AS (SELECT event_type, count(*) AS n_raw FROM events GROUP BY 1),
    kept AS (
      SELECT event_type, count(*) AS n_capped
      FROM ranked WHERE rn <= 20 GROUP BY 1
    )
    SELECT r.event_type, CAST(n_raw AS BIGINT) AS n_raw,
           CAST(n_capped AS BIGINT) AS n_capped,
           round((n_raw - n_capped) * 1.0 / n_raw, 6) AS clipped_rate
    FROM raw r JOIN kept k ON r.event_type = k.event_type
    """,
    doc="Per-user contribution bounding (cap 20 most-recent events, "
    "deterministic ts/event_id ranking) with a per-type before/after "
    "report (operators/governance.py:contribution_cap_report) — the "
    "DP-style preprocessing that stops any single user dominating the "
    "training signal. One window shuffle on the user key; the report "
    "shows where the bound actually bit.",
)
def contribution_cap_report_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.governance import (
        contribution_cap_report,
    )

    return contribution_cap_report(
        table(spark, sf, "events"),
        user_col="user_id",
        order_col="ts",
        tiebreak_col="event_id",
        group_col="event_type",
        cap=20,
    )


@register(
    "rollup_reuse_hourly_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_ts, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total_value,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="Continuous-aggregate reuse: the daily grain answered FROM the "
    "materialized hourly rollup by merging (count, sum) partials — "
    "facts are scanned once at the fine grain, every coarser grain is "
    "O(partials) (operators/timeseries.py:rollup_reuse). The oracle "
    "recomputes daily directly from raw events, proving the reuse is "
    "indistinguishable from a rescan — the additivity contract a "
    "hypertable depends on at 100 TB.",
)
def rollup_reuse_hourly_daily(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.timeseries import (
        rollup_reuse,
    )

    return rollup_reuse(
        table(spark, sf, "events"),
        ts_col="ts",
        group_col="event_type",
        value_col="value",
        fine="hour",
        coarse="day",
    )


@register(
    "join_size_estimate_sampled",
    oracle="""
    WITH s AS (
      SELECT count(*) AS sn
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey % 4 = 0 AND l.l_orderkey % 4 = 0
    ),
    e AS (
      SELECT count(*) AS exact_size
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT CAST(s.sn * 4 AS BIGINT) AS estimated_size,
           CAST(e.exact_size AS BIGINT) AS exact_size,
           round(abs(s.sn * 4 - e.exact_size) * 1.0
                 / greatest(e.exact_size, 1), 6) AS rel_error
    FROM s CROSS JOIN e
    """,
    doc="Join cardinality estimation from a correlated key sample "
    "(operators/estimates.py:join_size_estimate): sampling KEYS "
    "(orderkey % 4 = 0) on both sides keeps the sample join equal to "
    "the true join restricted to sampled keys, so scale-by-4 is "
    "unbiased over key subsets — one pass over a quarter of each side "
    "tells you whether the full 100 TB join is safe to run. The audit "
    "also measures the exact size so rel_error is observed, not "
    "claimed.",
)
def join_size_estimate_sampled(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.estimates import (
        join_size_estimate,
    )

    return join_size_estimate(
        table(spark, sf, "orders"),
        table(spark, sf, "lineitem"),
        "o_orderkey",
        "l_orderkey",
        mod=4,
    )


@register(
    "data_freshness_audit",
    oracle="""
    WITH wm AS (SELECT max(ts) AS wmts FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
           max(ts) AS latest_ts,
           (epoch_us(w.wmts) - epoch_us(max(ts))) // 1000000
             AS lag_seconds,
           round(sum(CASE WHEN ts >= w.wmts - INTERVAL 7 DAY
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS recent_share,
           ((epoch_us(w.wmts) - epoch_us(max(ts))) // 1000000) > 86400
             AS is_stale
    FROM events CROSS JOIN wm w
    GROUP BY event_type, w.wmts
    """,
    doc="Freshness audit per event type against the corpus watermark "
    "(global max ts, so the audit is reproducible — corpus time, not "
    "wall time): lag seconds, trailing-7-day share, staleness flag "
    "(operators/governance.py:freshness_audit). Two tiny aggregations "
    "with a broadcast 1-row watermark; rows never reshuffle.",
)
def data_freshness_audit(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.governance import (
        freshness_audit,
    )

    return freshness_audit(
        table(spark, sf, "events"),
        group_col="event_type",
        ts_col="ts",
        recent_days=7,
        stale_days=1,
    )


# ---------------------------------------------------------------------------
# batch 9: mix scheduling, record linkage, feature hashing, capacity planning
# ---------------------------------------------------------------------------

from zarr_datafusion_search_spark.functions.hashing import duckdb_h64  # noqa: E402


@register(
    "training_mix_anneal",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS DOUBLE) AS total, count(*) AS k
      FROM counts
    ),
    ep AS (SELECT epoch FROM range(0, 5) r(epoch))
    SELECT e.epoch, c.lang, CAST(c.n_docs AS BIGINT) AS n_docs,
           round((1 - e.epoch / 4.0) * (c.n_docs / t.total)
                 + (e.epoch / 4.0) * (1.0 / t.k), 6) AS target_share,
           CAST(floor(((1 - e.epoch / 4.0) * (c.n_docs / t.total)
                 + (e.epoch / 4.0) * (1.0 / t.k)) * t.total + 0.5)
             AS BIGINT) AS planned_docs
    FROM counts c CROSS JOIN tot t CROSS JOIN ep e
    """,
    doc="Mid-training mixture annealing: a 5-epoch schedule "
    "interpolating each language's share from its natural frequency to "
    "the uniform target (operators/evalmetrics.py:mixture_anneal_"
    "schedule) — the up-weight-rare-slices-late-in-training curriculum "
    "LLM data teams run. O(langs x epochs) after one share count; "
    "floor(x+0.5) rounding keeps planned counts engine-identical.",
)
def training_mix_anneal(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        mixture_anneal_schedule,
    )

    return mixture_anneal_schedule(
        table(spark, sf, "documents").select("lang"), "lang", n_epochs=5
    )


@register(
    "record_linkage_blocked",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name, p_brand,
             string_split(p_name, ' ')[2] AS noun
      FROM part
    )
    SELECT a.noun, a.p_brand, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
           round(sum(CASE WHEN levenshtein(a.p_name, b.p_name) <= 2
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS match_rate
    FROM p a JOIN p b ON a.noun = b.noun AND a.p_brand = b.p_brand
                      AND a.p_partkey < b.p_partkey
    GROUP BY 1, 2
    """,
    doc="Blocked record linkage over part names: candidate pairs only "
    "inside (name-noun, brand) blocks, Levenshtein <= 2 as the match "
    "predicate, per-block match-rate report "
    "(operators/linkage.py:blocked_linkage_report). The block equi-join "
    "is the only shuffle and the output is O(blocks) — the pair list "
    "itself never leaves the executors, which is the posture that "
    "survives a hot block holding millions of candidates.",
)
def record_linkage_blocked(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.linkage import (
        blocked_linkage_report,
    )

    parts = table(spark, sf, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
    )
    return blocked_linkage_report(
        parts, "p_partkey", "p_name", ["noun", "p_brand"], max_dist=2
    )


@register(
    "feature_hash_collisions",
    oracle=f"""
    WITH b AS (
      SELECT props AS f, {duckdb_h64('props')} % 16 AS bucket FROM events
    )
    SELECT bucket, CAST(count(DISTINCT f) AS BIGINT) AS n_features,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT f) - 1 AS BIGINT) AS collisions
    FROM b GROUP BY 1
    """,
    doc="Hashing-trick collision audit: event property payloads hashed "
    "into 16 feature buckets with the portable 60-bit hash; per bucket "
    "the distinct features sharing it and the row mass it carries "
    "(operators/sketches.py:feature_hash_audit). The audit a "
    "feature-hashed model needs before trusting bucket counts; one "
    "group-by on the bucket id at any corpus size.",
)
def feature_hash_collisions(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.sketches import (
        feature_hash_audit,
    )

    return feature_hash_audit(
        table(spark, sf, "events").select("props"), "props", n_buckets=16
    )


@register(
    "shuffle_partition_advisor",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(72 + avg(length(l_returnflag))
                 + avg(length(l_linestatus)), 2) AS est_row_bytes,
           round(count(*) * (72 + avg(length(l_returnflag))
                 + avg(length(l_linestatus))) / 1048576.0, 2)
             AS est_total_mb,
           CAST(greatest(1, ceil(count(*) * (72 + avg(length(l_returnflag))
                 + avg(length(l_linestatus))) / 134217728.0)) AS BIGINT)
             AS recommended_partitions
    FROM lineitem
    """,
    doc="Shuffle-partition capacity advisor over lineitem: estimate "
    "in-flight bytes from the schema (8 bytes per fixed-width column, "
    "measured average length for strings) in ONE aggregation pass and "
    "recommend a partition count targeting 128 MB each "
    "(operators/estimates.py:shuffle_partition_advisor). The sizing "
    "discipline that keeps a 100 TB shuffle out of spill; the oracle "
    "hand-encodes lineitem's 9 fixed + 2 string columns, pinning the "
    "schema-derived arithmetic.",
)
def shuffle_partition_advisor_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.estimates import (
        shuffle_partition_advisor,
    )

    return shuffle_partition_advisor(table(spark, sf, "lineitem"))


# ---------------------------------------------------------------------------
# batch 10: zone-map skipping, change-point detection
# ---------------------------------------------------------------------------


@register(
    "zone_map_skipping_audit",
    oracle="""
    WITH lay AS (
      SELECT value AS _v,
             ((row_number() OVER (ORDER BY event_id) - 1) * 64)
               // (count(*) OVER ()) + 1 AS f_nat,
             ((row_number() OVER (ORDER BY value, event_id) - 1) * 64)
               // (count(*) OVER ()) + 1 AS f_clu
      FROM events
    ),
    nat AS (
      SELECT f_nat AS f, max(_v) AS mx, count(*) AS n,
             sum(CASE WHEN _v > 250 THEN 1 ELSE 0 END) AS nm
      FROM lay GROUP BY 1
    ),
    clu AS (
      SELECT f_clu AS f, max(_v) AS mx, count(*) AS n,
             sum(CASE WHEN _v > 250 THEN 1 ELSE 0 END) AS nm
      FROM lay GROUP BY 1
    ),
    u AS (
      SELECT 'natural' AS layout, * FROM nat
      UNION ALL SELECT 'clustered', * FROM clu
    )
    SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN mx <= 250 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_skipped,
           CAST(sum(CASE WHEN mx > 250 THEN n ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(sum(nm) AS BIGINT) AS rows_matching
    FROM u GROUP BY 1
    """,
    doc="Zone-map file-skipping audit for value > 250, comparing the "
    "natural (ingest-order) layout against a clustered (sorted) layout "
    "of the SAME rows (operators/layout.py:zone_map_skipping_audit): "
    "per layout, files whose max can't match (skippable without "
    "opening), rows a scan still reads, and the exact matches. Random "
    "arrival gives ~zero skipping while clustering skips all but the "
    "boundary files — the measured, not asserted, argument for "
    "sort-on-write at 100 TB.",
)
def zone_map_skipping_audit_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.layout import (
        zone_map_skipping_audit,
    )

    return zone_map_skipping_audit(
        table(spark, sf, "events").select("event_id", "value"),
        natural_order_col="event_id",
        value_col="value",
        n_files=64,
        threshold=250.0,
    )


@register(
    "event_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS b,
             avg(value) AS m
      FROM events GROUP BY 1, 2
    ),
    mu AS (SELECT event_type, avg(m) AS mu FROM daily GROUP BY 1),
    cus AS (
      SELECT d.event_type, d.b,
             round(sum(d.m - s.mu) OVER (
               PARTITION BY d.event_type ORDER BY d.b), 6) AS cusum
      FROM daily d JOIN mu s USING (event_type)
    ),
    ranked AS (
      SELECT event_type, b, cusum,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(cusum) DESC, b) AS rn
      FROM cus
    )
    SELECT event_type, b AS changepoint_bucket, cusum
    FROM ranked WHERE rn = 1
    """,
    doc="CUSUM change-point detection per event type: daily means, "
    "cumulative deviation from the mean-of-means, argmax |cusum| as the "
    "level-shift location (operators/timeseries.py:cusum_changepoint). "
    "One bucket aggregation + a bucket-count window — the raw series "
    "never reshuffles; cusums round to 6dp BEFORE the argmax so both "
    "engines rank identical values.",
)
def event_changepoint_cusum(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.timeseries import (
        cusum_changepoint,
    )

    return cusum_changepoint(
        table(spark, sf, "events"), "event_type", "ts", "value", grain="day"
    )


# ---------------------------------------------------------------------------
# batch 11: engagement sessions, temporal split, k-fold, dataset card
# ---------------------------------------------------------------------------


@register(
    "session_engagement_metrics",
    oracle="""
    WITH w1 AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                         ))) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
               AS session_id
      FROM w1
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, session_id
               ORDER BY ts, event_id) AS rn
      FROM s
    ),
    sess AS (
      SELECT user_id, session_id,
             max(CASE WHEN rn = 1 THEN event_type END) AS landing_type,
             count(*) AS n,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM r GROUP BY 1, 2
    )
    SELECT landing_type, CAST(count(*) AS BIGINT) AS n_sessions,
           round(avg(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END), 6)
             AS bounce_rate,
           round(avg(n), 6) AS avg_events,
           round(avg(dur_us / 1000000.0), 6) AS avg_duration_s
    FROM sess GROUP BY 1
    """,
    doc="Per-landing-type session engagement: gap-based sessions (30 min) "
    "rolled up by the event type that OPENED each session — sessions "
    "started, bounce rate, average depth and duration "
    "(operators/sessions.py:session_engagement_metrics). One user-key "
    "shuffle for sessionization, then an O(sessions) reduction; "
    "durations in integer microseconds so both engines average exact "
    "values.",
)
def session_engagement_metrics_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.sessions import (
        session_engagement_metrics,
    )

    return session_engagement_metrics(
        table(spark, sf, "events"), gap_minutes=30
    )


@register(
    "temporal_split_embargo",
    oracle="""
    SELECT CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-24' THEN 1 ELSE 0
                    END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-24'
                          AND ts < TIMESTAMP '2024-01-25'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_embargo_dropped,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-25' THEN 1 ELSE 0
                    END) AS BIGINT) AS n_test,
           round(sum(CASE WHEN ts < TIMESTAMP '2024-01-24' THEN 1 ELSE 0
                     END) * 1.0 / count(*), 6) AS train_frac
    FROM events
    """,
    doc="Temporal train/test split with a 1-day embargo before the "
    "2024-01-25 test window (operators/governance.py:temporal_split_"
    "embargo): the in-between rows are dropped so temporally-correlated "
    "signal can't leak across the boundary. One pushed-down filter "
    "pass, 1-row summary.",
)
def temporal_split_embargo_q(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.governance import (
        temporal_split_embargo,
    )

    return temporal_split_embargo(
        table(spark, sf, "events"), "ts", "2024-01-25", embargo_days=1
    )


@register(
    "stratified_kfold_counts",
    oracle="""
    WITH f AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 2, 15))::BIGINT
               % 5 AS fold,
             source
      FROM documents
    )
    SELECT fold, source, CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY source),
                 6) AS stratum_share
    FROM f GROUP BY 1, 2
    """,
    doc="Deterministic stratified 5-fold assignment audit: fold = "
    "portable 60-bit hash of doc_id, counted per (fold, source) with "
    "each fold's share of its stratum "
    "(operators/evalmetrics.py:kfold_assignment_counts) — the balance "
    "table to check before trusting cross-validation on a skewed "
    "corpus. Replayable across engines and runs; one group-by.",
)
def stratified_kfold_counts(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        kfold_assignment_counts,
    )

    return kfold_assignment_counts(
        table(spark, sf, "documents"), "doc_id", "source", k=5
    )


@register(
    "dataset_card_metrics",
    oracle="""
    WITH a AS (
      SELECT count(*) AS c1, count(DISTINCT lang) AS c2,
             count(DISTINCT source) AS c3, round(avg(n_chars), 6) AS c4,
             round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6)
               AS c5,
             round(avg(CASE WHEN text IS NULL THEN 1.0 ELSE 0.0 END), 6)
               AS c6
      FROM documents
    )
    SELECT 'n_docs' AS metric, CAST(c1 AS DOUBLE) AS value FROM a
    UNION ALL SELECT 'n_langs', CAST(c2 AS DOUBLE) FROM a
    UNION ALL SELECT 'n_sources', CAST(c3 AS DOUBLE) FROM a
    UNION ALL SELECT 'mean_chars', c4 FROM a
    UNION ALL SELECT 'english_share', c5 FROM a
    UNION ALL SELECT 'null_text_rate', c6 FROM a
    """,
    doc="Dataset-card headline metrics in ONE aggregation pass, "
    "unpivoted to (metric, value) rows: corpus size, language/source "
    "cardinality, mean length, English share, null-text rate — the "
    "summary block a release's data card leads with. stack() unpivot "
    "keeps it a single scan however many metrics ride along.",
)
def dataset_card_metrics(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    a = docs.agg(
        F.count(F.lit(1)).cast("double").alias("c1"),
        F.countDistinct("lang").cast("double").alias("c2"),
        F.countDistinct("source").cast("double").alias("c3"),
        F.round(F.avg("n_chars"), 6).alias("c4"),
        F.round(F.avg((F.col("lang") == "en").cast("double")), 6).alias(
            "c5"
        ),
        F.round(F.avg(F.col("text").isNull().cast("double")), 6).alias(
            "c6"
        ),
    )
    return a.selectExpr(
        "stack(6, 'n_docs', c1, 'n_langs', c2, 'n_sources', c3, "
        "'mean_chars', c4, 'english_share', c5, 'null_text_rate', c6) "
        "as (metric, value)"
    )


# oracle VALUES list derives from the SAME constant the Spark plan passes,
# so cross-engine parity can't silently depend on two defaults staying in
# sync (ADVICE r04 #3)
from zarr_datafusion_search_spark.operators.packing import (  # noqa: E402
    DEFAULT_CONTEXT_LENGTHS,
)

_CTX_VALUES = ", ".join(f"({int(l)})" for l in DEFAULT_CONTEXT_LENGTHS)


@register(
    "padding_waste_audit",
    oracle=f"""
    WITH lens(context_length) AS (VALUES {_CTX_VALUES}),"""
    + """
    d AS (
      SELECT len(list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> len(t) > 0)) AS n_tokens
      FROM documents
    ),
    j AS (
      SELECT context_length, n_tokens,
             least(n_tokens, context_length) AS kept,
             greatest(n_tokens - context_length, 0) AS truncated,
             greatest(context_length - n_tokens, 0) AS padded
      FROM d CROSS JOIN lens
    )
    SELECT context_length,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(kept) AS BIGINT) AS kept_tokens,
           CAST(sum(truncated) AS BIGINT) AS truncated_tokens,
           CAST(sum(padded) AS BIGINT) AS padding_tokens,
           round(sum(padded) * 1000000.0 / (count(*) * context_length))
             / 1000000.0 AS padding_ratio,
           round(sum(truncated) * 1000000.0 / sum(n_tokens))
             / 1000000.0 AS truncation_ratio
    FROM j GROUP BY context_length
    """,
    doc="Context-length selection audit: per candidate sequence length, "
    "the pad-token share of the compute budget and the truncated share "
    "of the corpus under one-doc-per-sequence batching "
    "(operators/packing.py:padding_waste_audit) — the measurement that "
    "justifies sequence packing and picks L before a training run. One "
    "corpus scan, broadcast |lengths| relation, |lengths|-group "
    "aggregation.",
)
def padding_waste_audit(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.packing import (
        padding_waste_audit as _audit,
    )

    return _audit(
        table(spark, sf, "documents"),
        context_lengths=DEFAULT_CONTEXT_LENGTHS,
    )
