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


def compact(
    spark: SparkSession, path: str, target_files: int | None = None
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files (default: size-based, ~128 MB each). The
    operational fix for the many-tiny-files problem that kills scan
    parallelism accounting and NameNode/listing overhead at fleet
    scale. Returns the new file count.

    Rewrites via a temp sibling directory then atomic-ish rename, so a
    failed compaction never destroys the source."""
    import shutil

    df = spark.read.parquet(path)
    if target_files is None:
        total_bytes = sum(
            f.stat().st_size for f in __import__("pathlib").Path(path).rglob("*.parquet")
        )
        target_files = max(1, total_bytes // (128 * 1024 * 1024))
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(int(target_files)).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return len(
        [f for f in __import__("pathlib").Path(path).rglob("*.parquet")]
    )


def zorder_value(cols: list, bits: int = 8):
    """Z-order (Morton) value: interleave the bits of per-column
    bucket ids so files sorted by the result are clustered in EVERY
    listed dimension at once — min/max row-group pruning then skips
    effectively for filters on any of the columns, not just the first
    sort key. ``cols``: (column, lo, hi) triples; linear width_bucket
    binning (at fleet scale, swap in approx-quantile boundaries for
    skewed columns)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for ci, (col, lo, hi) in enumerate(cols):
        bucket = (
            F.width_bucket(col, F.lit(lo), F.lit(hi), F.lit(2**bits)) - 1
        ).cast("long")
        for b in range(bits):
            bit = F.shiftright(bucket, b) % 2
            z = z + F.shiftleft(bit, b * len(cols) + ci)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Range-partition + sort by the Z-value, then write: each output
    file covers a compact hyper-rectangle of the listed dimensions."""
    z = zorder_value(cols, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
