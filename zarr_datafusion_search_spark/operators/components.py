"""Connected components over a near-duplicate pair graph.

Pairwise near-dup detection (MinHash/SimHash/embedding buckets) yields
EDGES; a curation pipeline needs GROUPS — "A~B and B~C" must collapse A, B
and C into one cluster even when A and C never collided — and then one
survivor per group. This is the step that turns near-dup pairs into an
actual deduplicated corpus.

Algorithm: iterative min-label propagation, pure DataFrame ops. Every node
starts labeled with itself; each round every node takes the min of its own
label and its neighbors' labels; fixpoint = components, and each component's
label IS its minimum member id (so the label doubles as the canonical
survivor id). Rounds needed = graph diameter — for near-dup clusters
(dense, tiny diameter) a handful; each round is one equi-join + one
aggregation, both shuffling on node id, nothing ever materializes on the
driver. Intermediate labels are persisted and the previous round
unpersisted, so lineage stays bounded. (The classic large-star/small-star
variant [Kiveris et al., "Connected Components in MapReduce and Beyond"]
halves round count on high-diameter graphs; near-dup graphs don't have
those, so the simple propagation is the right cost here.)

The DuckDB oracle computes the same fixpoint via a recursive transitive
closure — feasible at verification scale, quadratic at production scale,
which is exactly why the Spark side iterates instead.
"""

from __future__ import annotations

from zarr_datafusion_search_spark.operators.cache import (
    lineage_barrier as _lb,
)

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from zarr_datafusion_search_spark.operators.cache import tracked_persist


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component
    ids are each component's minimum node id."""
    # eagerly checkpoint the pair projection FIRST: the symmetrize union
    # references it twice, and with a lazy persist both branches would
    # race to compute the (possibly minhash-expensive) pair plan inside
    # round 1's job — the same materialize-once discipline as
    # graph.label_propagation
    pair2 = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).transform(_lb, eager=True)
    edges = (
        pair2.union(
            pair2.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .persist()
    )
    try:
        for _ in range(max_iter):
            neighbor_labels = edges.join(
                labels, edges.b == labels.node
            ).select(F.col("a").alias("node"), "component")
            new_labels = (
                labels.unionByName(neighbor_labels)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:  # pragma: no cover - diameter > max_iter
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
        # the returned fixpoint stays persisted (it is already materialized
        # by the convergence count) but is TRACKED, so the consumer can
        # release it via release_operator_caches() after its action
        tracked_persist(labels)
        return labels
    finally:
        edges.unpersist()


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Drop every near-dup cluster member except the minimum-id survivor;
    rows never mentioned in ``pairs`` pass through untouched."""
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Near-dup-aware train/val/test split: every document is assigned by
    hashing its near-dup CLUSTER representative, not its own id — so two
    near-duplicates can never straddle train and eval (the evaluation-
    leakage failure mode a plain per-doc hash split silently ships).

    Unclustered documents are their own representative. The split is the
    deterministic portable hash (``h64(representative) % 100``) against
    cumulative percentage cuts — reproducible across engines and runs,
    no RNG. Cost on top of the pair generation: the component fixpoint
    plus one left join of the corpus against the (pairs-sized, not
    corpus-sized) component relation.
    """
    from zarr_datafusion_search_spark.functions.hashing import h64

    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    rep = F.coalesce(F.col("component"), F.col(id_col))
    bucket = h64(rep.cast("string")) % 100
    return (
        docs.select(id_col)
        .join(
            comp.withColumnRenamed("node", id_col), id_col, "left"
        )
        .select(
            id_col,
            rep.alias("representative"),
            F.when(bucket < train_pct, "train")
            .when(bucket < train_pct + val_pct, "val")
            .otherwise("test")
            .alias("split"),
        )
    )
