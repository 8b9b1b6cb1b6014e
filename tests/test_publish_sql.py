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


def test_compact_small_files(spark, sf_dir, tmp_path):
    from hi_csa_db_spark.catalog import compact, load_table

    path = str(tmp_path / "shattered")
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    docs.repartition(64).write.parquet(path)
    import pathlib

    assert len(list(pathlib.Path(path).rglob("*.parquet"))) == 64
    new_count = compact(spark, path, target_files=4)
    assert new_count == 4
    assert spark.read.parquet(path).count() == n


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    import pathlib

    from hi_csa_db_spark.catalog import write_zordered

    df = (
        spark.range(0, 4096)
        .select(
            (F.col("id") % 64).cast("double").alias("x"),
            (F.col("id") / 64).cast("long").cast("double").alias("y"),
        )
    )
    path = str(tmp_path / "zord")
    write_zordered(df, path, [("x", 0.0, 64.0), ("y", 0.0, 64.0)], n_files=16)
    files = list(pathlib.Path(path).rglob("*.parquet"))
    assert len(files) == 16
    # each file must span a narrow range in BOTH x and y — a plain
    # sort by x would leave y ranges full-width in every file
    spans_x, spans_y = [], []
    for f in files:
        pdf = spark.read.parquet(str(f)).agg(
            F.max("x") - F.min("x"), F.max("y") - F.min("y")
        ).collect()[0]
        spans_x.append(pdf[0])
        spans_y.append(pdf[1])
    assert sum(spans_x) / len(spans_x) < 32
    assert sum(spans_y) / len(spans_y) < 32


def test_publish_observed_metrics_ride_the_write(spark, sf_dir, tmp_path):
    from hi_csa_db_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "props")
    metrics = publish(ev, str(tmp_path / "out"), observe=True)
    assert metrics["n_rows"] == ev.count()
    assert metrics["nulls__event_id"] == 0
    expected_null_props = ev.filter(F.col("props").isNull()).count()
    assert metrics["nulls__props"] == expected_null_props
