"""RAG retrieval pipeline, runnable: the engine's full
retrieval-augmented-generation preprocessing story in one script —
hybrid retrieval, diversity re-ranking, and context assembly, every
stage a proven operator.

Run: python examples/rag_retrieval_pipeline.py [sf_dir]

Steps:
1. sparse retrieval — BM25 top-k over the token index (ret1)
2. dense retrieval — cosine top-k over the embedding column (s1)
3. hybrid fusion — reciprocal-rank fusion of both lists (ret2)
4. diversity re-rank — Maximal Marginal Relevance over the dense
   pool, so the final context window is not near-duplicates of one
   hit (ret4 / similarity.mmr_rerank)
5. context assembly — fetch the selected documents, chunk them with
   overlapping windows (rag1's chunker shape), and report the token
   budget the packed context consumes
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hi_csa_db_spark.catalog import load_table
from hi_csa_db_spark.operators import similarity
from hi_csa_db_spark.queries import queries
from hi_csa_db_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("rag-retrieval-example")
    qs = queries()

    # 1-3: sparse, dense, and fused retrieval (each independently
    # oracle-checked as ret1 / s1 / ret2).
    fused = qs["ret2_rrf_fusion"](spark, sf_dir)
    top_fused = fused.limit(5).collect()
    print("hybrid RRF top-5:", [(r[0], float(r[-1])) for r in top_fused])

    # 4: diversity re-rank of the dense pool (ret4's operator).
    emb = load_table(spark, sf_dir, "embeddings")
    picks = similarity.mmr_rerank(emb, query_id=0, pool=8, k=3, lam=0.5)
    sel = picks.collect()
    print("MMR-selected context docs:", [(r["rank"], r["vec_id"], r["score"]) for r in sel])

    # 5: assemble the context — selected docs (vec_id == doc_id in the
    # fixtures), overlapping 200-char chunks, token budget report.
    ids = [r["vec_id"] for r in sel]
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isin(ids))
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(greatest(length(text) - 1, 0) AS INT) div 150),"
                " i -> substring(text, i * 150 + 1, 200))"
            )
        ).alias("chunk"),
    ).filter(F.col("chunk") != "")
    stats = chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("chunk")).alias("context_chars"),
    ).collect()[0]
    print(
        f"packed context: {stats['n_chunks']} chunks, "
        f"{stats['context_chars']} chars from {len(ids)} docs"
    )
    assert stats["n_chunks"] > 0 and len(sel) == 3
    print("rag pipeline complete")
    spark.stop()


if __name__ == "__main__":
    main()
