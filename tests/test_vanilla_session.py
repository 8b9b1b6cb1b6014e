"""Fixture-vintage regression gate.

Rounds 1 and 2 were both lost to the same blind spot: the driver's
``events.parquet`` fixture changed physical type (r1: INT64
TIMESTAMP(NANOS); r2: TIMESTAMP(MICROS, isAdjustedToUTC=false) ==
Spark TIMESTAMP_NTZ) and the catalog only handled the vintage the
builder tested locally. These tests load the REAL fixture through a
**vanilla** SparkSession — zero engine confs beyond what
``load_table`` sets itself at runtime — so local green predicts
driver green.

Also pins the catalog contract for every vintage the fixture has ever
shipped as, via synthetic parquet files written in each physical type.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def vanilla_spark():
    # Deliberately NOT session.get_spark: the driver's harness builds its
    # own SparkSession, so the catalog must self-provision every conf it
    # needs (nanosAsLong, UTC tz) inside load_table.
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-vintage-gate")
        .getOrCreate()
    )
    yield spark


def test_real_events_fixture_loads_vanilla(vanilla_spark):
    from hi_csa_db_spark.catalog import load_table

    df = load_table(vanilla_spark, SF_DIR, "events")
    dt = dict(df.dtypes)
    # Contract: ts is a zone-aware timestamp, ts_ns is int64 nanos.
    assert dt["ts"] == "timestamp"
    assert dt["ts_ns"] == "bigint"
    row = (
        df.select(
            F.count("*").alias("n"),
            F.min("ts_ns").alias("lo"),
            F.max("ts_ns").alias("hi"),
        )
        .collect()[0]
    )
    assert row["n"] > 0
    # 2024-ish epoch nanos: consistency check that ts_ns really is nanos.
    assert row["lo"] > 1_500_000_000 * 10**9
    # ts and ts_ns agree to the microsecond (UTC session tz).
    bad = df.filter(
        F.unix_micros(F.col("ts")) != F.expr("ts_ns div 1000")
    ).count()
    assert bad == 0


@pytest.mark.parametrize(
    "vintage",
    [
        "ntz_micros",
        "ltz_micros",
        "int64_nanos",
        # hypothetical future vintages: plain BIGINT epoch columns at
        # other magnitudes — normalize_events must band by magnitude
        "int64_micros",
        "int64_millis",
        "int64_seconds",
    ],
)
def test_every_vintage_normalizes(vanilla_spark, vintage, tmp_path):
    """Write the events ts column in each physical parquet type the
    driver has ever shipped, and assert load_table normalizes all of
    them to the same (ts timestamp, ts_ns bigint) values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1704067200_000_001, 1704067201_500_000, 1704153599_999_999]
    if vintage in ("int64_millis", "int64_seconds"):
        # sub-unit precision can't survive a coarser epoch unit
        micros = [1704067200_000_000, 1704067201_000_000, 1704153599_000_000]
    if vintage == "ntz_micros":
        ts_arr = pa.array(micros, type=pa.timestamp("us"))
    elif vintage == "ltz_micros":
        ts_arr = pa.array(micros, type=pa.timestamp("us", tz="UTC"))
    elif vintage == "int64_micros":
        ts_arr = pa.array(micros, type=pa.int64())
    elif vintage == "int64_millis":
        ts_arr = pa.array([m // 1000 for m in micros], type=pa.int64())
    elif vintage == "int64_seconds":
        ts_arr = pa.array([m // 1_000_000 for m in micros], type=pa.int64())
    else:
        ts_arr = pa.array([m * 1000 for m in micros], type=pa.timestamp("ns"))
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([10, 20, 30], type=pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    d = tmp_path / vintage
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    from hi_csa_db_spark.catalog import load_table

    df = load_table(vanilla_spark, str(tmp_path / vintage), "events")
    got = sorted(
        (r["event_id"], r["ts_ns"]) for r in df.select("event_id", "ts_ns").collect()
    )
    assert got == [(i + 1, m * 1000) for i, m in enumerate(micros)]
    dt = dict(df.dtypes)
    assert dt["ts"] == "timestamp" and dt["ts_ns"] == "bigint"
    # unix_micros(ts) must reproduce the original micros exactly —
    # including the div-vs-double edge at nanos magnitude (ADVICE r2).
    back = sorted(
        r[0] for r in df.select(F.unix_micros("ts")).collect()
    )
    assert back == micros
