"""Round-4 pipeline-operator queries: graph structure diagnostics
(triangles / clustering coefficient, 2-hop neighborhood aggregation),
distribution drift (per-source smoothed unigram KL), Heaps'-law vocabulary
growth via the distributed prefix sum, rolling z-score anomaly detection,
and the embedding covariance redundancy diagnostic.

Same contract as ``pipeline_ops``: every entry is a Spark DataFrame plan
plus a DuckDB oracle computing the identical result (column names aliased
identically on both sides; floats pinned with both-side rounding).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zarr_datafusion_search_spark.plans.pipeline_ops import (
    _MH_CTES,
    _MH_SELECT,
    components_oracle_ctes as _components_oracle_ctes,
)
from zarr_datafusion_search_spark.plans.pipeline_ops3 import _TOKS
from zarr_datafusion_search_spark.plans.registry import register, table


@register(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_MH_CTES},
    pairs AS ({_MH_SELECT}),
    canon AS MATERIALIZED (
      SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
      FROM pairs WHERE doc_a <> doc_b
    ),
    deg AS MATERIALIZED (
      SELECT node, count(*) AS degree FROM (
        SELECT a AS node FROM canon UNION ALL SELECT b FROM canon
      ) GROUP BY 1
    ),
    -- canonical a < b edges: e1=(a,b), e2=(b,c), e3=(a,c) enumerates each
    -- triangle exactly once with a < b < c
    tri AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM canon e1
      JOIN canon e2 ON e2.a = e1.b
      JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tcnt AS (
      SELECT node, count(*) AS triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY 1
    )
    SELECT d.node, d.degree,
           coalesce(t.triangles, 0) AS triangles,
           CASE WHEN d.degree >= 2
                THEN round(2.0 * coalesce(t.triangles, 0)
                           / (d.degree * (d.degree - 1)), 6)
                ELSE 0.0 END AS clustering
    FROM deg d LEFT JOIN tcnt t USING (node)
    """,
    doc="Per-node triangle count + local clustering coefficient over the "
    "minhash near-dup graph — template families read as dense clusters, "
    "borderline-match chains as sparse ones. Spark side uses the "
    "degree-ORIENTED wedge join (out-degree bounded by O(sqrt(m)) under "
    "orientation), so the candidate join is m^1.5 instead of Sum(deg^2) "
    "under power-law hubs; triangles are orientation-invariant, so the "
    "id-ordered oracle enumerates the identical set.",
)
def graph_clustering_coefficient(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators import dedup
    from zarr_datafusion_search_spark.operators.graph import (
        triangle_clustering,
    )

    docs = table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, rows_per_band=4, jaccard_threshold=0.5
    )
    return triangle_clustering(pairs)


@register(
    "neighbor_chars_2hop",
    oracle=f"""
    WITH {_MH_CTES},
    pairs AS ({_MH_SELECT}),
    sym AS MATERIALIZED (
      SELECT DISTINCT doc_a AS s, doc_b AS d FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    a AS (SELECT doc_id AS d, CAST(n_chars AS DOUBLE) AS val FROM documents),
    m1 AS (
      SELECT s, count(*) AS n_1hop, round(avg(val), 6) AS mean_1hop
      FROM sym JOIN a USING (d) GROUP BY s
    ),
    h2 AS (
      SELECT DISTINCT s1.s, s2.d
      FROM sym s1 JOIN sym s2 ON s1.d = s2.s
      WHERE s1.s <> s2.d
    ),
    m2 AS (
      SELECT s, count(*) AS n_2hop, round(avg(val), 6) AS mean_2hop
      FROM h2 JOIN a USING (d) GROUP BY s
    )
    SELECT m1.s AS doc_id, n_1hop, mean_1hop,
           coalesce(n_2hop, 0) AS n_2hop, mean_2hop
    FROM m1 LEFT JOIN m2 USING (s)
    """,
    doc="GNN-style 2-hop neighborhood aggregation without a GNN: per doc, "
    "mean n_chars over distinct 1-hop and distinct <=2-hop near-dup "
    "neighbors (self excluded) — two equi-joins + distinct on (node, "
    "neighbor), the exact shuffle bound a 2-hop GNN sampler pays.",
)
def neighbor_chars_2hop(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators import dedup
    from zarr_datafusion_search_spark.operators.graph import (
        neighborhood_mean_2hop,
    )

    docs = table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, rows_per_band=4, jaccard_threshold=0.5
    )
    return neighborhood_mean_2hop(pairs, docs)


@register(
    "source_term_kl_drift",
    oracle=f"""
    WITH {_TOKS},
    tstream AS (SELECT doc_id, unnest(t) AS term FROM toks),
    g AS MATERIALIZED (
      SELECT d.source AS grp, s.term, count(*) AS cg
      FROM tstream s JOIN documents d USING (doc_id) GROUP BY 1, 2
    ),
    c AS MATERIALIZED (SELECT term, sum(cg) AS c FROM g GROUP BY 1),
    scal AS MATERIALIZED (
      SELECT count(*)::DOUBLE AS v, sum(c)::DOUBLE AS n FROM c
    ),
    q AS MATERIALIZED (
      SELECT term, (c + 0.5) / (n + 0.5 * v) AS qt FROM c CROSS JOIN scal
    ),
    lsum AS MATERIALIZED (SELECT sum(ln(qt)) AS l_all FROM q),
    pg AS MATERIALIZED (
      SELECT grp, sum(cg) AS ng, count(*) AS vg, sum(ln(qt)) AS l_g
      FROM g JOIN q USING (term) GROUP BY grp
    ),
    pt AS (
      -- fixed-point (1e-12) per-term rounding + exact BIGINT sum mirrors
      -- the engine's partition-order-insensitive aggregation
      SELECT g.grp,
             sum(CAST(round(((cg + 0.5) / (ng + 0.5 * v))
                 * (ln((cg + 0.5) / (ng + 0.5 * v)) - ln(qt))
                 * 1000000000000.0) AS BIGINT)) / 1000000000000.0
               AS kl_present
      FROM g JOIN q USING (term) JOIN pg USING (grp) CROSS JOIN scal
      GROUP BY g.grp
    )
    SELECT pg.grp AS source,
           CAST(pg.ng AS BIGINT) AS n_tokens,
           CAST(pg.vg AS BIGINT) AS n_terms,
           round(kl_present
                 + (0.5 / (ng + 0.5 * v))
                   * ((v - vg) * ln(0.5 / (ng + 0.5 * v)) - (l_all - l_g)),
                 6) AS kl_divergence
    FROM pg JOIN pt USING (grp) CROSS JOIN scal CROSS JOIN lsum
    """,
    doc="Per-source smoothed unigram KL drift from the corpus "
    "distribution — flags a source whose language shifted before it "
    "contaminates a training mix. The sum over the full vocabulary "
    "factorizes (absent terms contribute through two scalars), so the "
    "plan is one (group, term) shuffle + one term shuffle + broadcast "
    "scalars — never a group x vocabulary cross join.",
)
def source_term_kl_drift(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.text import source_term_kl

    return source_term_kl(table(spark, sf, "documents"))


@register(
    "vocab_growth_curve",
    oracle=f"""
    WITH {_TOKS},
    tstream AS (SELECT doc_id, unnest(t) AS term FROM toks),
    pdt AS (SELECT doc_id, count(*) AS n_tokens FROM tstream GROUP BY 1),
    fs AS (SELECT term, min(doc_id) AS doc_id FROM tstream GROUP BY 1),
    nt AS (SELECT doc_id, count(*) AS n_new FROM fs GROUP BY 1)
    SELECT p.doc_id,
           CAST(sum(p.n_tokens) OVER (ORDER BY p.doc_id) AS BIGINT)
             AS cum_tokens,
           CAST(sum(coalesce(nt.n_new, 0)) OVER (ORDER BY p.doc_id)
                AS BIGINT) AS cum_vocab
    FROM pdt p LEFT JOIN nt USING (doc_id)
    """,
    doc="Heaps'-law vocabulary growth curve: cumulative tokens and "
    "cumulative distinct vocabulary per document in doc_id order. A "
    "term's contribution is fixed by its FIRST occurrence (min doc_id "
    "per term), reducing the curve to a prefix sum over per-doc counts; "
    "the prefix sum is the two-phase range-partitioned cumsum (local "
    "cumsum + broadcast partition offsets), never a single-task global "
    "window.",
)
def vocab_growth_curve(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.text import (
        vocab_growth_curve as vgc,
    )

    return vgc(table(spark, sf, "documents"))


_Z_WINDOW = 20
_Z_MIN_HIST = 5
_Z_THRESHOLD = 2.5


@register(
    "event_value_anomalies",
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, ts, value,
             count(value) OVER w AS n_hist,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sigma
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_Z_WINDOW} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, value,
           round((value - mu) / sigma, 6) AS zscore
    FROM s
    WHERE n_hist >= {_Z_MIN_HIST} AND sigma > 0
      AND abs(round((value - mu) / sigma, 6)) > {_Z_THRESHOLD}
    """,
    doc="Per-user rolling z-score anomaly detection: each event scored "
    "against the mean/sample-stddev of its own trailing 20-event window "
    "(current row excluded so an outlier cannot mask itself), flagged at "
    "|z| > 2.5 after both-side 6dp rounding. One key shuffle, one "
    "ROWS-frame window pass computing both aggregates together.",
)
def event_value_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    return rolling_zscore_anomalies(
        table(spark, sf, "events"),
        window_rows=_Z_WINDOW,
        min_history=_Z_MIN_HIST,
        threshold=_Z_THRESHOLD,
    )


_EMB_DIM = 64


@register(
    "embedding_covariance_top_pairs",
    oracle=f"""
    WITH dims AS (SELECT unnest(range(0, {_EMB_DIM})) AS i),
    p AS (SELECT i.i AS i, j.i AS j FROM dims i JOIN dims j ON i.i < j.i),
    nr AS (SELECT count(*)::DOUBLE AS n FROM embeddings),
    sums AS MATERIALIZED (
      SELECT i, j,
             sum(CAST(embedding[i + 1] AS DOUBLE)
                 * CAST(embedding[j + 1] AS DOUBLE)) AS sxy
      FROM embeddings CROSS JOIN p GROUP BY i, j
    ),
    means AS MATERIALIZED (
      SELECT i, avg(CAST(embedding[i + 1] AS DOUBLE)) AS m
      FROM embeddings CROSS JOIN dims GROUP BY i
    )
    SELECT CAST(s.i AS INT) AS i, CAST(s.j AS INT) AS j,
           round(sxy / nr.n - mi.m * mj.m, 6) AS cov
    FROM sums s
    JOIN means mi ON mi.i = s.i
    JOIN means mj ON mj.i = s.j
    CROSS JOIN nr
    ORDER BY abs(round(sxy / nr.n - mi.m * mj.m, 6)) DESC, s.i, s.j
    LIMIT 10
    """,
    doc="Top-10 most-correlated embedding dimension pairs by |covariance| "
    "(population) — the redundancy diagnostic behind dimension pruning "
    "and whitening. Spark accumulates the d x d Gram matrix as one "
    "flattened partial per task inside mapInPandas (BLAS X^T X per Arrow "
    "batch): the shuffle moves n_partitions * d^2 doubles, vectors never "
    "cross the network. Oracle replays the algebra over DuckDB's "
    "1-indexed lists; both sides rank by the 6dp-rounded value with "
    "(i, j) tiebreak.",
)
def embedding_covariance_top_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.similarity import (
        covariance_top_pairs,
    )

    return covariance_top_pairs(
        table(spark, sf, "embeddings"), dim=_EMB_DIM, top_k=10
    )


from zarr_datafusion_search_spark.functions.hashing import duckdb_h64  # noqa: E402


@register(
    "leakage_safe_split",
    oracle=f"""
    WITH {_MH_CTES},
    pairs AS MATERIALIZED ({_MH_SELECT}),
    {_components_oracle_ctes()}
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS representative,
           CASE WHEN {duckdb_h64("coalesce(c.component, d.doc_id)::VARCHAR")}
                     % 100 < 80 THEN 'train'
                WHEN {duckdb_h64("coalesce(c.component, d.doc_id)::VARCHAR")}
                     % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
    doc="Near-dup-aware 80/10/10 train/val/test split: every doc is "
    "assigned by the portable hash of its near-dup CLUSTER representative "
    "(component min-label; own id if unclustered), so near-duplicates can "
    "never straddle train and eval — the leakage a per-doc hash split "
    "silently ships. Deterministic, no RNG. Oracle replays components via "
    "bounded min-label rounds (components_oracle_ctes) + the same "
    "md5-derived hash.",
)
def leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators import dedup
    from zarr_datafusion_search_spark.operators.components import (
        leakage_safe_split as lss,
    )

    docs = table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, rows_per_band=4, jaccard_threshold=0.5
    )
    return lss(docs, pairs)


_XL_MAX_DF = 20
_XL_MIN_SHARED = 2


@register(
    "crosslingual_align_candidates",
    oracle=f"""
    WITH {_TOKS},
    td AS (
      SELECT DISTINCT doc_id, lang,
             t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS term
      FROM (SELECT tk.doc_id, d.lang, tk.t
            FROM toks tk JOIN documents d USING (doc_id)),
           unnest(generate_series(1, len(t) - 2)) AS r(i)
      WHERE len(t) >= 3
    ),
    dfreq AS (SELECT term, count(*) AS df FROM td GROUP BY 1),
    rare AS MATERIALIZED (
      SELECT doc_id, lang, term FROM td JOIN dfreq USING (term)
      WHERE df <= {_XL_MAX_DF}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.lang AS lang_a, b.lang AS lang_b,
           count(*) AS n_shared
    FROM rare a
    JOIN rare b ON a.term = b.term AND a.doc_id < b.doc_id
                AND a.lang <> b.lang
    GROUP BY 1, 2, 3, 4
    HAVING count(*) >= {_XL_MIN_SHARED}
    """,
    doc="Translation-pair candidate mining: cross-language doc pairs "
    "sharing >= 2 distinct RARE word trigrams (global df <= 20) — names, "
    "numbers, and quoted phrases survive translation verbatim, the "
    "standard cheap parallel-corpus signal; trigram anchors because one "
    "shared word is weak evidence while a shared rare trigram is nearly "
    "unique. The df cap is applied BEFORE the inverted-index self-join "
    "(bounds candidates by max_df^2 per anchor), same discipline as the "
    "n-gram dedup family.",
)
def crosslingual_align_candidates(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.text import (
        crosslingual_align_candidates as xl,
    )

    return xl(
        table(spark, sf, "documents"),
        n=3,
        max_df=_XL_MAX_DF,
        min_shared=_XL_MIN_SHARED,
    )


_SPAN_LEN = 5


@register(
    "span_corruption_pairs",
    oracle=f"""
    WITH {_TOKS},
    base AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > {2 * _SPAN_LEN}
    ),
    st AS (
      SELECT doc_id, t, n,
             {duckdb_h64("doc_id::VARCHAR")} % (n - {_SPAN_LEN} + 1) AS s
      FROM base
    )
    SELECT doc_id, CAST(s AS INT) AS span_start,
           array_to_string(
             list_concat(list_concat(t[1:s], ['<extra_id_0>']),
                         t[s + {_SPAN_LEN} + 1:n]), ' ') AS input_text,
           array_to_string(t[s + 1:s + {_SPAN_LEN}], ' ') AS target_text
    FROM st
    """,
    doc="T5-style span-corruption training pairs: one contiguous 5-token "
    "span per document (with > 10 tokens) replaced by a sentinel; "
    "(input_text, target_text) emitted. Span start = portable hash of "
    "doc_id modulo the valid range — deterministic across engines, runs, "
    "and partitionings, which per-partition rand() cannot give. Pure "
    "built-in array slicing, zero Python in the row path.",
)
def span_corruption_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.text import (
        span_corruption_pairs as scp,
    )

    return scp(table(spark, sf, "documents"), span_len=_SPAN_LEN)


@register(
    "source_ngram_diversity",
    oracle=f"""
    WITH {_TOKS},
    g AS (
      SELECT d.source AS grp,
             t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
      FROM toks JOIN documents d USING (doc_id),
           unnest(generate_series(1, len(t) - 2)) AS r(i)
      WHERE len(t) >= 3
    )
    SELECT grp AS source,
           count(*) AS total_ngrams,
           count(DISTINCT gram) AS distinct_ngrams,
           round(count(DISTINCT gram)::DOUBLE / count(*), 6) AS diversity
    FROM g GROUP BY 1
    """,
    doc="Per-source trigram diversity (distinct/total) — the "
    "self-repetition audit separating varied sources from template "
    "stampers. The distinct shuffles xxhash64(gram) longs (strings are "
    "hashed and dropped inside the scan stage); the oracle counts the "
    "exact strings, equal modulo the 2^-64 per-pair collision bound "
    "(~7e-5 cumulative at 50M distinct grams).",
)
def source_ngram_diversity(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.text import (
        source_ngram_diversity as sngd,
    )

    return sngd(table(spark, sf, "documents"))


_QS_BINS = 256
_QS_QUANTILES = (0.5, 0.9, 0.99)


@register(
    "event_value_quantile_sketch",
    oracle=f"""
    WITH b AS (
      SELECT min(value) AS lo, max(value) AS hi, count(value)::DOUBLE AS n
      FROM events
    ),
    bins AS (
      SELECT CAST(least(greatest(
               floor((value - lo) / ((hi - lo) / {_QS_BINS})), 0),
               {_QS_BINS - 1}) AS INT) AS bin,
             count(*) AS c
      FROM events CROSS JOIN b GROUP BY 1
    ),
    cum AS (SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM bins),
    q(quantile) AS (VALUES {", ".join(f"({q})" for q in _QS_QUANTILES)}),
    hit AS (
      SELECT q.quantile, c2.bin, c2.c, c2.cum,
             row_number() OVER (
               PARTITION BY q.quantile ORDER BY c2.bin) AS rn
      FROM q JOIN cum c2
        ON c2.cum > q.quantile * ((SELECT n FROM b) - 1)
    )
    SELECT quantile,
           round(lo + ((hi - lo) / {_QS_BINS})
                 * (bin + (quantile * (n - 1) - (cum - c)) / c), 6)
             AS estimate
    FROM hit CROSS JOIN b WHERE rn = 1
    """,
    doc="Mergeable fixed-grid quantile sketch (p50/p90/p99 of event "
    "values): per-partition equal-width bin counts (map-side combinable "
    "vector add — the shape exact sort-based percentiles cannot give at "
    "100 TB) + within-bin linear interpolation. Deterministic by "
    "construction — unlike t-digest, whose centroids depend on merge "
    "order — so the oracle replays it bit-for-bit.",
)
def event_value_quantile_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.outliers import (
        quantile_sketch,
    )

    return quantile_sketch(
        table(spark, sf, "events"),
        quantiles=_QS_QUANTILES,
        n_bins=_QS_BINS,
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ),
    chf AS (
      SELECT doc_id, c, count(*) AS k FROM ch
      WHERE length(c) > 0 GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id, sum(k) AS n, sum(k * log2(k)) AS s FROM chf GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(n, 0) AS BIGINT) AS n_chars_text,
           coalesce(round(log2(n) - s / n, 6), 0.0) AS entropy_bits
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    doc="Character-level Shannon entropy per doc (bits/char) — mojibake / "
    "base64-blob / repeated-char-spam detector. Spark computes it row-"
    "locally with a sorted-array run-length fold (whole-stage codegen, no "
    "corpus shuffle at all); the oracle replays the identical "
    "log2(n) - sum(k log2 k)/n algebra over grouped char counts.",
)
def text_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.text import char_entropy

    return char_entropy(table(spark, sf, "documents"))


@register(
    "dedup_pairs_editdist_verify",
    oracle=f"""
    WITH {_MH_CTES},
    pairs AS ({_MH_SELECT}),
    ta AS (SELECT doc_id AS doc_a, text AS _ta FROM documents),
    tb AS (SELECT doc_id AS doc_b, text AS _tb FROM documents)
    SELECT p.doc_a, p.doc_b,
           levenshtein(_ta, _tb) AS edit_distance,
           round(levenshtein(_ta, _tb)::DOUBLE
                 / greatest(length(_ta), length(_tb)), 6) AS rel_distance,
           levenshtein(_ta, _tb)
             <= CAST(round(greatest(length(_ta), length(_tb)) * 0.4)
                     AS INT) AS verified
    FROM pairs p JOIN ta USING (doc_a) JOIN tb USING (doc_b)
    """,
    doc="Precision audit on the LSH near-dup pairs: exact Levenshtein "
    "distance per pair (JVM built-in, integer-exact cross-engine), "
    "flagging pairs beyond 40% relative distance — the false-positive "
    "check (shuffled bag-of-shingles class) run before mass deletion. "
    "O(len^2) per PAIR, bounded by the LSH-reduced pair count, never "
    "corpus-quadratic.",
)
def dedup_pairs_editdist_verify(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators import dedup
    from zarr_datafusion_search_spark.operators.text import (
        neardup_editdist_verify,
    )

    docs = table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, rows_per_band=4, jaccard_threshold=0.5
    )
    return neardup_editdist_verify(pairs, docs)


@register(
    "source_vocab_similarity",
    oracle=f"""
    WITH {_TOKS},
    g AS MATERIALIZED (
      SELECT d.source AS grp, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM toks) s
      JOIN documents d USING (doc_id)
      GROUP BY 1, 2
    ),
    ng AS (SELECT count(DISTINCT grp)::DOUBLE AS ng FROM g),
    dfc AS (SELECT term, count(*) AS gdf FROM g GROUP BY 1),
    w AS MATERIALIZED (
      SELECT grp, term, tf * (ln((1.0 + ng) / (1.0 + gdf)) + 1.0) AS w
      FROM g JOIN dfc USING (term) CROSS JOIN ng
    ),
    nrm AS MATERIALIZED (SELECT grp, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
    dots AS (
      SELECT a.grp AS group_a, b.grp AS group_b, sum(a.w * b.w) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.grp < b.grp
      GROUP BY 1, 2
    )
    SELECT group_a, group_b,
           round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN nrm na ON na.grp = group_a
    JOIN nrm nb ON nb.grp = group_b
    """,
    doc="Pairwise cosine similarity between per-source unigram tf-idf "
    "vectors — which sources speak the same language (the complement of "
    "the KL drift score: KL says who drifted from the corpus, this says "
    "who drifts together). One (source, term) shuffle; the pair dot "
    "product self-joins on TERM (vocabulary-bounded, never corpus-sized).",
)
def source_vocab_similarity(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.text import (
        source_vocab_similarity as svs,
    )

    return svs(table(spark, sf, "documents"))


@register(
    "frequent_event_paths",
    oracle="""
    SELECT path, n_paths FROM (
      SELECT s1 || ' > ' || s2 || ' > ' || s3 AS path,
             count(*) AS n_paths
      FROM (
        SELECT event_type AS s1,
               lead(event_type, 1) OVER w AS s2,
               lead(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ) WHERE s3 IS NOT NULL GROUP BY 1
    ) ORDER BY n_paths DESC, path LIMIT 20
    """,
    doc="Top-20 most common 3-step event-type paths across user timelines "
    "— the second-order sequence model above the Markov transition matrix "
    "(first-order cannot distinguish view->cart->buy from "
    "view->cart->abandon). One window pass with lead columns (no "
    "self-joins), map-side-combinable counting, TakeOrderedAndProject "
    "top-k.",
)
def frequent_event_paths(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.sessions import (
        frequent_event_paths as fep,
    )

    return fep(table(spark, sf, "events"))


@register(
    "cross_source_duplication",
    oracle=f"""
    WITH {_MH_CTES},
    pairs AS ({_MH_SELECT}),
    ga AS (SELECT doc_id AS doc_a, source AS _ga FROM documents),
    gb AS (SELECT doc_id AS doc_b, source AS _gb FROM documents)
    SELECT least(_ga, _gb) AS source_a, greatest(_ga, _gb) AS source_b,
           count(*) AS n_pairs
    FROM pairs JOIN ga USING (doc_a) JOIN gb USING (doc_b)
    GROUP BY 1, 2
    """,
    doc="Provenance audit: the near-dup pair relation collapsed into a "
    "(source_a, source_b) duplication matrix — off-diagonal mass reveals "
    "syndication/mirror relationships between sources, diagonal mass a "
    "source duplicating itself. Two id-keyed joins of the LSH-reduced "
    "pairs against the (id, source) projection; incremental cost is "
    "pairs-sized, never corpus-sized.",
)
def cross_source_duplication(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators import dedup

    docs = table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=16, rows_per_band=4, jaccard_threshold=0.5
    )
    return dedup.cross_source_duplication_matrix(pairs, docs)


@register(
    "user_max_inactivity_gap",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id, count(*) AS n_gaps,
           round(max(gap_us) / 86400000000.0, 6) AS max_gap_days,
           max(gap_us) > 7.0 * 86400000000.0 AS is_dormant
    FROM g WHERE gap_us IS NOT NULL GROUP BY 1
    """,
    doc="Per-user longest inter-event gap with a dormancy flag (> 7 days) "
    "— the churn signal behind re-engagement cohorts and stale-account "
    "cleanup. One key shuffle, one lag window, one max aggregation; exact "
    "integer-microsecond gaps on both engines.",
)
def user_max_inactivity_gap(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.sessions import (
        max_inactivity_gaps,
    )

    return max_inactivity_gaps(table(spark, sf, "events"))


@register(
    "partitioned_dataset_prune",
    oracle="""
    SELECT user_id, count(*) AS n_clicks,
           round(sum(value), 6) AS total_value
    FROM events WHERE event_type = 'click'
    GROUP BY user_id
    """,
    doc="Hive-partitioned dataset + partition-pruned read: events written "
    "partitionBy(event_type) (memoized; the bench times the READ), then "
    "aggregated for ONE type — the scan must list only the matching "
    "partition directory, visible as PartitionFilters in the physical "
    "plan (asserted in tests/test_round4_ops.py). At 100 TB this is the "
    "difference between scanning one type's share and the whole dataset.",
)
def partitioned_dataset_prune(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.layout import (
        partitioned_events_dir,
    )

    d = partitioned_events_dir(spark, sf)
    return (
        spark.read.parquet(d)
        .filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


@register(
    "schema_evolution_union",
    oracle="""
    WITH g1 AS (
      SELECT doc_id, source, n_chars, CAST(NULL AS VARCHAR) AS quality_tier
      FROM documents WHERE doc_id % 2 = 0
    ),
    g2 AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN n_chars >= 200 THEN 'long' ELSE 'short' END
               AS quality_tier
      FROM documents WHERE doc_id % 2 = 1
    ),
    u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
    SELECT source, coalesce(quality_tier, 'unknown') AS tier,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM u GROUP BY 1, 2
    """,
    doc="Additive schema evolution: a two-generation parquet dataset "
    "(generation 2 adds quality_tier) read with mergeSchema=true — "
    "generation-1 rows surface NULL for the added column, aggregated "
    "with an explicit unknown bucket. The reconciliation a long-lived "
    "corpus needs without rewriting history; oracle replays the union "
    "semantics from the original table.",
)
def schema_evolution_union(spark: SparkSession, sf: str) -> DataFrame:
    from zarr_datafusion_search_spark.operators.layout import (
        read_evolved_docs,
    )

    return (
        read_evolved_docs(spark, sf)
        .groupBy(
            "source",
            F.coalesce("quality_tier", F.lit("unknown")).alias("tier"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
