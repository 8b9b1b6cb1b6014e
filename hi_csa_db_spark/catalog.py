"""Table registry over the driver's parquet fixtures.

Mirrors the reference's "global environment as catalog" lifecycle
(hi-csa-db.Rmd chunk evaluation, SURVEY.md section 3 E1) as explicit
Spark catalog registration: each table becomes a temp view; queries
compose over views, keeping the whole plan lazy for Catalyst.

Normalization performed at ingest (the reference does schema-on-read;
we type at the boundary — SURVEY.md section 1.2):
- ``events.ts`` arrives as INT64 TIMESTAMP(NANOS) parquet, which Spark
  reads as a long (see session.py). We keep the raw nanos as ``ts_ns``
  (deterministic ordering key, no timestamp arithmetic ambiguity) and
  expose ``ts`` truncated to microseconds as a proper timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view and return the dict."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def publish(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
) -> None:
    """The engine's sink spec (SCALE.md): zstd parquet, optional
    partition columns (e.g. the published csa_db partitioned by Type),
    bounded file sizes so downstream scans parallelize evenly.

    Overwrite is dynamic-partition-scoped when partitioning: a re-run
    replaces only the partitions it produced (the idempotent-stage
    pattern, reference crawl-or-cache S2)."""
    writer = (
        df.write.mode("overwrite")
        .option("compression", "zstd")
        .option("maxRecordsPerFile", max_records_per_file)
        .option("partitionOverwriteMode", "dynamic")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
