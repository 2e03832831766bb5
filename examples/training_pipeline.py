#!/usr/bin/env python
"""End-to-end training-data preparation: the composition the individual
operators exist for. Raw corpus in, training-ready shards out:

  profile -> normalize -> quality score + per-domain calibration ->
  exact dedup -> near-dup dedup (MinHash-LSH -> connected components ->
  survivors, with a cluster-size audit) -> benchmark decontamination ->
  sequence packing -> deterministic training-order shuffle -> sharded
  Zarr store, then an INCREMENTAL batch appended in place and picked up
  by the streaming zarr source

Every step is a DataFrame transformation — one lazy plan per stage, no
driver materialization until the final write. Run from the repo root:

  python examples/training_pipeline.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from zarr_datafusion_search_spark import SessionContext, ZarrTable  # noqa: E402
from zarr_datafusion_search_spark.functions.hashing import h64_seeded  # noqa: E402
from zarr_datafusion_search_spark.operators import (  # noqa: E402
    components,
    dedup,
    packing,
    text,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    work = tempfile.mkdtemp(prefix="zdss_train_")
    ctx = SessionContext(
        master="local[8]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    spark = ctx.spark
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 0. know the data before touching it
    print("== profile ==")
    text.profile_columns(docs, ["doc_id", "lang", "source", "n_chars"]).show()

    # 0.5 normalize text before anything downstream tokenizes it
    docs = (
        docs.join(text.normalize_text(docs), "doc_id")
        .drop("text")
        .withColumnRenamed("norm_text", "text")
    )

    # 0.7 provenance + release hygiene up front: does the labeled
    #     language match the text evidence, and is there PII to redact
    #     before anything else caches a copy of the raw text
    print("== label consistency (mislabel rate by source) ==")
    text.label_consistency_audit(docs).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.coalesce("is_consistent", F.lit(True))).cast("long")).alias(
            "n_mislabeled"
        ),
    ).orderBy("lang").show()
    from zarr_datafusion_search_spark.operators.governance import pii_scan

    print("== PII scan (docs flagged) ==")
    pii_scan(docs).agg(
        F.sum(F.col("has_pii").cast("long")).alias("n_with_pii"),
        F.sum("n_emails").alias("emails"),
        F.sum("n_ipv4").alias("ipv4"),
        F.sum("n_phones").alias("phones"),
    ).show()

    # 1. quality gate, CALIBRATED per source: raw scores are not
    #    comparable across domains, so rank-normalize within each source
    #    and apply ONE global threshold to the calibrated score
    scored = text.quality_score(docs).select("doc_id", "quality")
    calibrated = text.quantile_calibrate(
        docs.join(scored, "doc_id"), group_col="source", value_col="quality"
    )
    kept = calibrated.filter(
        (F.col("calibrated") >= 0.1) & F.col("lang").isNotNull()
    ).drop("calibrated", "chars_removed")

    # 2. exact dedup: lowest-id survivor per text fingerprint
    survivors_exact = dedup.exact_dedup(kept).select("doc_id")
    kept = kept.join(survivors_exact, "doc_id")

    # 3. near-dup dedup: LSH pairs -> components -> keep cluster minima;
    #    publish the cluster-size audit before deleting anything
    pairs = dedup.minhash_lsh_pairs(kept)
    comp = components.connected_components(pairs)
    print("== near-dup cluster sizes ==")
    comp.groupBy("component").count().groupBy("count").agg(
        F.count(F.lit(1)).alias("n_clusters")
    ).orderBy("count").show()
    # survivors from the SAME component labels (dedup_survivors would
    # re-run the whole pair + iteration pipeline a second time)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = kept.join(losers, "doc_id", "left_anti")

    # 3.5 graph-structure audit on the SAME pair relation: dense clusters
    #     (high clustering coefficient) are template families — worth a
    #     human look before mass deletion
    from zarr_datafusion_search_spark.operators.graph import (
        triangle_clustering,
    )

    print("== near-dup graph structure (top clustering) ==")
    triangle_clustering(pairs).orderBy(
        F.desc("clustering"), F.desc("degree")
    ).show(5)

    # 3.6 drift check per source BEFORE mixing: a drifted source gets
    #     flagged here, not discovered post-training
    print("== per-source KL drift (top 3) ==")
    text.source_term_kl(kept).orderBy(F.desc("kl_divergence")).show(3)

    # 4. benchmark decontamination: drop anything sharing an 8-gram with
    #    the held-out eval slice (source 'src0' stands in for the benchmark)
    contaminated = dedup.decontaminate(kept).select("doc_id")
    train = kept.filter(F.col("source") != "src0").join(
        contaminated, "doc_id", "left_anti"
    )

    # 4.5 leakage-safe split: assign by near-dup cluster representative so
    #     no near-duplicate straddles train/eval (reuses the SAME pairs)
    split = components.leakage_safe_split(train.select("doc_id"), pairs)
    train = train.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )

    # 5. pack into ~512-token sequences, then shuffle pack order
    #    deterministically (seeded hash -> reproducible epoch order)
    packed = packing.pack_documents_cumsum(train, budget=512)
    ordered = (
        train.join(packed.select("doc_id", "pack_id", "n_tokens"), "doc_id")
        .withColumn(
            "shuffle_key", h64_seeded(F.col("pack_id").cast("string"), 42)
        )
        .orderBy("shuffle_key", "pack_id", "doc_id")
        .select("doc_id", "pack_id", "n_tokens", "source", "lang", "text")
    )

    # 6. land as a sharded Zarr store (task-side writes, metadata commit)
    out = f"{work}/training.zarr"
    t = ZarrTable.write(ordered, out, chunk_rows=4096)
    n_final = t.n_rows

    print("== funnel ==")
    print(f"  raw docs:        {n0}")
    print(f"  after filters:   {kept.count()} (quality/lang + exact + near-dup)")
    print(f"  training rows:   {n_final} (post decontamination, packed + shuffled)")
    print(f"  packs:           {packed.select('pack_id').distinct().count()}")
    print(f"  store:           {out}")
    print("read-back check:", ZarrTable(out).to_df(spark).count() == n_final)

    # 7. tomorrow's crawl: the next increment appends IN PLACE (only the
    #    boundary chunk rewrites; metadata commit = visibility barrier),
    #    and a checkpointed stream tails the growth incrementally
    from zarr_datafusion_search_spark.sources.zarr_datasource import (
        ZarrDataSource,
    )
    from zarr_datafusion_search_spark.sources.zarr_sink import (
        append_zarr_distributed,
    )

    spark.dataSource.register(ZarrDataSource)
    ck = f"{work}/tail_ck"
    seen = []

    def run_tail():
        q = (
            spark.readStream.format("zarr")
            .load(out)
            .writeStream.foreachBatch(
                lambda b, _i: seen.append(b.count())
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_tail()  # initial catch-up over the landed store
    # next increment, derived from the landed store (clean lineage — the
    # full pipeline plan does not re-execute inside the append)
    increment = (
        ZarrTable(out)
        .to_df(spark)
        .limit(500)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    n_after = append_zarr_distributed(increment, out)
    run_tail()  # picks up ONLY the appended rows
    print("== incremental ==")
    print(f"  appended:        {n_after - n_final} rows in place")
    print(f"  stream batches:  {seen} (initial catch-up, then the delta)")

    # 8. release governance + mix planning on the final training set:
    #    does any (lang, length-bucket) cell isolate fewer than k docs,
    #    how much effective data survives rebalancing the language mix,
    #    and what per-epoch mixture schedule anneals it to uniform
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        mixture_anneal_schedule,
        mixture_reweight_ess,
    )
    from zarr_datafusion_search_spark.operators.governance import (
        k_anonymity_audit,
    )

    print("== k-anonymity audit (lang x length bucket, k=5) ==")
    k_anonymity_audit(
        train.select(
            "lang",
            F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        ),
        ["lang", "len_bucket"],
        k=5,
    ).show()
    print("== language mixture reweighting (Kish ESS) ==")
    mixture_reweight_ess(train.select("lang"), "lang").orderBy("lang").show()
    from zarr_datafusion_search_spark.operators.evalmetrics import (
        mixture_temperature_weights,
    )

    print("== temperature (alpha=0.7) sampling weights by language ==")
    mixture_temperature_weights(train.select("lang"), "lang").orderBy(
        "lang"
    ).show()
    from zarr_datafusion_search_spark.operators.dedup import chunk_dedup_stats

    print("== chunk-level duplication (RAG-index granularity) ==")
    chunk_dedup_stats(train).show()
    print("== 3-epoch anneal to uniform ==")
    mixture_anneal_schedule(train.select("lang"), "lang", n_epochs=3).orderBy(
        "epoch", "lang"
    ).show(15)

    # 9. context-length selection: quantify what each candidate sequence
    #    length wastes (pad share of compute, truncated share of data)
    #    under naive batching — the measurement that justifies the
    #    sequence-packing stage above and picks L for the run
    from zarr_datafusion_search_spark.operators.packing import (
        padding_waste_audit,
    )

    print("== padding/truncation waste by context length ==")
    padding_waste_audit(train, context_lengths=(32, 64, 128)).orderBy(
        "context_length"
    ).show()


if __name__ == "__main__":
    main()
