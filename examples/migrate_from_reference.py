"""The switch story, runnable: a reference (ecoFw/hi-csa-db) user
points this engine at the artifacts their R pipeline already produced
and keeps working — no R process, no refetch, same outputs, plus the
scale path (parquet/txlog) from day one.

Run: python examples/migrate_from_reference.py [reference_data_dir]

Steps mirror the reference's own lifecycle (SURVEY.md section 3):
1. load the published csa_db table straight from hi-csa-db.rds
2. reuse an existing crawl cache (nrcs.rds) without fetching
3. run the engine's operators over both (classification-style filter,
   link-graph degrees)
4. publish to parquet with an observed quality gate, and commit the
   table to the txlog ACID format
5. hand results back to R as a data.frame RDS
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hi_csa_db_spark.catalog import publish
from hi_csa_db_spark.operators import graph
from hi_csa_db_spark.session import get_spark
from hi_csa_db_spark.sources import rds, txlog
from hi_csa_db_spark.sources.crawl import crawl_or_cache


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data"
    spark = get_spark("migrate-example")
    out_dir = tempfile.mkdtemp(prefix="hi_csa_db_spark_migrate_")

    # 1. the published table, straight from the RDS artifact
    csa_db = rds.rds_to_spark(spark, os.path.join(ref, "hi-csa-db.rds"))
    print("csa_db:", csa_db.count(), "rows", csa_db.columns)

    # 2. the crawl cache, reused without refetching
    index, edges = crawl_or_cache(
        spark, ref, seeds=[], fetcher=None  # cache hit: fetcher unused
    )
    print("crawl cache:", index.count(), "pages,", edges.count(), "edges")

    # 3. engine operators over the artifacts
    support = csa_db.filter(F.col("Type") == "Support")
    top_hubs = (
        graph.degrees(edges).orderBy(F.col("out_deg").desc()).limit(5)
    )
    print("support rows:", support.count())
    print("top hub out-degrees:", [r["out_deg"] for r in top_hubs.collect()])

    # 4. the scale-path sinks
    metrics = publish(
        csa_db, os.path.join(out_dir, "csa_db"), partition_by=["Type"],
        observe=True,
    )
    print("published with quality gate:", metrics)
    v = txlog.write_table(csa_db, os.path.join(out_dir, "csa_db_acid"))
    print("txlog commit version:", v)

    # 5. hand back to R
    rds.spark_to_rds(support, os.path.join(out_dir, "support.rds"))
    back = rds.rds_to_spark(spark, os.path.join(out_dir, "support.rds"))
    assert back.count() == support.count()
    print("round-trip to RDS ok; outputs in", out_dir)


if __name__ == "__main__":
    main()
