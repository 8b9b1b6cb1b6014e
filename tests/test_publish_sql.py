"""publish() sink spec + SQL front-end equivalence."""

import os

from pyspark.sql import functions as F

from hi_csa_db_spark.catalog import publish, register_tables
from hi_csa_db_spark.flagship import flagship_query


def test_publish_partitioned_zstd(spark, sf_dir, tmp_path):
    out = flagship_query(spark, sf_dir)
    path = str(tmp_path / "csa_db")
    publish(out, path, partition_by=["type"])
    dirs = {d for d in os.listdir(path) if d.startswith("type=")}
    assert dirs == {"type=Policy", "type=Support", "type=Technical"}
    back = spark.read.parquet(path)
    assert back.count() == out.count()
    # dynamic partition overwrite: republishing one stream leaves the
    # other partitions intact
    publish(out.filter(F.col("type") == "Policy"), path, partition_by=["type"])
    assert spark.read.parquet(path).count() == out.count()


def test_sql_frontend_matches_dataframe(spark, sf_dir):
    register_tables(spark, sf_dir)
    sql_result = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    from hi_csa_db_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df_result = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    assert sorted(map(tuple, sql_result.collect())) == sorted(
        map(tuple, df_result.collect())
    )
