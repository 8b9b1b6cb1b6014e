"""Concurrent fetcher + LSH band planner + partition pruning."""

import time

from pyspark.sql import functions as F

from hi_csa_db_spark.operators.dedup import plan_lsh_bands
from hi_csa_db_spark.sources import crawl


def test_concurrent_fetcher_overlaps_requests(spark):
    def slow_fetcher(url: str) -> str:
        time.sleep(0.05)
        return f"<a href='/x'>{url}</a>"

    frontier = spark.createDataFrame(
        [(f"https://h.org/{i}",) for i in range(16)], ["url"]
    ).coalesce(1)
    # warm the Python workers with the SERIAL path, then compare: the
    # fetch portion is 16x0.05s serial vs ~2x0.05s with 8 workers.
    t0 = time.time()
    crawl.fetch_pages(frontier, slow_fetcher).collect()
    serial = time.time() - t0
    t0 = time.time()
    pages = crawl.fetch_pages_concurrent(
        frontier, slow_fetcher, max_workers=8
    ).collect()
    concurrent = time.time() - t0
    assert len(pages) == 16
    assert all(p.hrefs == ["https://h.org/x"] for p in pages)
    assert concurrent < serial


def test_plan_lsh_bands_hits_threshold():
    bands, rows = plan_lsh_bands(16, 0.5)
    assert bands * rows == 16
    implied = (1.0 / bands) ** (1.0 / rows)
    assert abs(implied - 0.5) < 0.15
    # high threshold -> more rows per band (stricter); low -> more bands
    b_hi, r_hi = plan_lsh_bands(16, 0.9)
    b_lo, r_lo = plan_lsh_bands(16, 0.2)
    assert r_hi > r_lo
    assert b_lo > b_hi


def test_partition_pruning_visible_in_scan(spark, tmp_path):
    df = spark.range(0, 1000).withColumn("part_key", F.col("id") % 4)
    path = str(tmp_path / "pruned")
    df.write.mode("overwrite").partitionBy("part_key").parquet(path)
    q = spark.read.parquet(path).filter(F.col("part_key") == 2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert q.count() == 250
    # only one of four partition directories is read
    assert "part_key=2" in plan or "(part_key" in plan
