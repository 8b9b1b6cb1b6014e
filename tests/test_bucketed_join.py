"""Bucketed-table co-located join: the SCALE.md storage-layout claim
("bucket edges by src so per-level joins are shuffle-free") made
executable — two tables bucketed on the join key sort-merge-join with
NO hash-partitioning exchange in the physical plan.
"""

from pyspark.sql import functions as F


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.range(0, 20000).withColumn(
            "v", F.pmod(F.col("id") * 31, F.lit(997))
        )
        for name in ("bkt_a", "bkt_b"):
            (
                df.write.mode("overwrite")
                .option("path", str(tmp_path / name))
                .bucketBy(8, "id")
                .sortBy("id")
                .saveAsTable(name)
            )
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
