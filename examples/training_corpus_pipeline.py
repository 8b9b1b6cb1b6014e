"""End-to-end training-corpus preparation, runnable on the driver
fixtures: the pipeline a 100 TB corpus job runs, at toy scale, with
every stage an oracle-proven engine operator.

Run: python examples/training_corpus_pipeline.py [sf_dir] [out_dir]

Stages (each maps to a `queries()` entry the driver value-checks):
1. quality gates + model-based filter        (x12 / x20)
2. PII scrub                                 (x11)
3. near-dup collapse, keep BEST member       (d2/d6/d10)
4. DSIR importance resampling toward target  (x23/x24)
5. context packing into fixed token budgets  (x16)
6. publish: zstd parquet + txlog ACID commit (S8 / txlog)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import hi_csa_db_spark.queries as q
from hi_csa_db_spark.catalog import load_table
from hi_csa_db_spark.operators import dedup, graph
from hi_csa_db_spark.session import get_spark
from hi_csa_db_spark.sources import txlog


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark("training-corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1-2. quality + PII: keep docs the broadcast linear model accepts
    scored = q.x20_quality_classifier(spark, sf_dir).select("doc_id", "keep")
    from hi_csa_db_spark.operators.textstats import pii_scrub

    clean = pii_scrub(docs).select("doc_id", "scrubbed")

    # 3. near-dup clusters -> drop everything but the best member
    pairs = dedup.minhash_lsh_dedup(docs, n=3, num_hashes=16, bands=8, threshold=0.05)
    labels = graph.connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        iterations=3,
    )
    logits = q.x20_quality_classifier(spark, sf_dir).select(
        F.col("doc_id").alias("id"), "logit"
    )
    mem = labels.join(logits, "id")
    best = mem.groupBy("lbl").agg(F.max("logit").alias("mx"))
    surv = (
        mem.join(best, "lbl")
        .filter(F.col("logit") == F.col("mx"))
        .groupBy("lbl")
        .agg(F.min("id").alias("survivor_id"))
    )
    drops = (
        labels.join(surv, "lbl")
        .filter(F.col("id") != F.col("survivor_id"))
        .select(F.col("id").alias("doc_id"))
    )

    # 4. DSIR resample (pure-integer keep rule — reruns keep the same set)
    w = q._dsir_weight_frame(spark, sf_dir)
    wi = F.floor(F.col("dsir_weight") * 1000000 + F.lit(0.5)).cast("long")
    p = F.greatest(F.lit(0), F.least(F.lit(1000000), F.lit(500000) + 10 * wi))
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    dsir_keep = w.filter(u * 1000000 < p * F.lit(4294967296)).select("doc_id")

    kept = (
        docs.select("doc_id", "lang", "source")
        .join(scored.filter(F.col("keep") == 1), "doc_id")
        .join(dsir_keep, "doc_id")
        .join(drops, "doc_id", "left_anti")
        .join(clean, "doc_id")
    )

    # 5. pack into fixed token budgets (x16's prefix-sum chunking:
    # partition by lang — parallel across slices, ONE shuffle)
    toks = kept.select(
        "doc_id",
        "lang",
        "scrubbed",
        F.size(F.split(F.col("scrubbed"), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = toks.withColumn("chunk", F.floor(before / F.lit(2048.0)).cast("int"))

    # 6. publish: parquet partitioned by lang + an ACID txlog commit
    pq_path = os.path.join(out_dir, "corpus_parquet")
    packed.write.mode("overwrite").partitionBy("lang").parquet(pq_path)
    tbl = os.path.join(out_dir, "corpus_txlog")
    txlog.write_table(packed, tbl)
    snap = txlog.read_table(spark, tbl)

    n_kept = kept.count()
    print(f"docs in: {n0}, kept after gates+dedup+resample: {n_kept}")
    print(f"parquet: {pq_path}")
    print(f"txlog:   {tbl} (snapshot rows: {snap.count()})")
    per_lang = kept.groupBy("lang").count().orderBy("lang").collect()
    print("per-lang:", {r["lang"]: r["count"] for r in per_lang})


if __name__ == "__main__":
    main()
