"""load_table schema memoization (r12 optimization).

Catalyst's ResolveDataSource re-reads parquet footers on every
schema-less ``spark.read.parquet`` call (~100-135 ms per call in a
warm local session). ``catalog.load_table`` therefore memoizes the
once-inferred schema per (path, mtime) and hands it back to the
reader. These tests pin the contract:

- repeated loads return the identical schema and identical values;
- the memo actually engages (keyed on the resolved path+mtime);
- a REWRITTEN fixture (different schema, new mtime) is re-inferred,
  never served the stale schema.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import SparkSession

from hi_csa_db_spark import catalog
from hi_csa_db_spark.catalog import _TABLE_SCHEMAS, load_table


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[2]")
        .appName("catalog-schema-memo-test")
        .getOrCreate()
    )
    yield s


def _write(path: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, path)


def test_repeated_load_identical_and_memoized(spark, tmp_path):
    p = str(tmp_path / "customer.parquet")
    _write(p, pa.table({"c_custkey": [1, 2, 3], "c_name": ["a", "b", "c"]}))

    df1 = load_table(spark, str(tmp_path), "customer")
    st = os.stat(p)
    assert p in _TABLE_SCHEMAS, "first load must record the schema memo"
    assert _TABLE_SCHEMAS[p][0] == (st.st_mtime_ns, st.st_size)

    df2 = load_table(spark, str(tmp_path), "customer")
    assert df1.schema == df2.schema
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))


def test_rewritten_fixture_reinfers_schema(spark, tmp_path):
    p = str(tmp_path / "part.parquet")
    _write(p, pa.table({"p_partkey": [1, 2]}))
    df1 = load_table(spark, str(tmp_path), "part")
    assert df1.columns == ["p_partkey"]

    # rewrite the SAME path with a different schema and a provably
    # newer mtime (utime guards against same-tick rewrites)
    _write(p, pa.table({"p_partkey": [7], "p_name": ["bolt"]}))
    st = os.stat(p)
    os.utime(p, (st.st_atime, st.st_mtime + 2))

    df2 = load_table(spark, str(tmp_path), "part")
    assert df2.columns == ["p_partkey", "p_name"]
    assert [tuple(r) for r in df2.collect()] == [(7, "bolt")]


def test_same_mtime_rewrite_reinfers_via_size(spark, tmp_path):
    """r13 (ADVICE r12): a rewrite that PRESERVES the mtime (cp -p /
    rsync -t / coarse-mtime filesystems) must still invalidate the
    memo — the key includes st_size."""
    p = str(tmp_path / "region.parquet")
    _write(p, pa.table({"r_regionkey": [1, 2]}))
    st0 = os.stat(p)
    df1 = load_table(spark, str(tmp_path), "region")
    assert df1.columns == ["r_regionkey"]

    _write(p, pa.table({"r_regionkey": [7], "r_name": ["EMEA"]}))
    # force the ORIGINAL mtime back onto the new file
    os.utime(p, ns=(st0.st_atime_ns, st0.st_mtime_ns))
    assert os.stat(p).st_mtime_ns == st0.st_mtime_ns
    assert os.stat(p).st_size != st0.st_size

    df2 = load_table(spark, str(tmp_path), "region")
    assert df2.columns == ["r_regionkey", "r_name"]


def test_memo_keeps_one_entry_per_path(spark, tmp_path):
    """r13 (ADVICE r12): rewrites replace the path's entry instead of
    accumulating one per (path, stamp)."""
    p = str(tmp_path / "supplier.parquet")
    _write(p, pa.table({"s_suppkey": [1]}))
    load_table(spark, str(tmp_path), "supplier")
    for i in range(3):
        _write(p, pa.table({"s_suppkey": [i], "s_extra": [i]}))
        st = os.stat(p)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + (i + 1) * 10**9))
        load_table(spark, str(tmp_path), "supplier")
    assert sum(1 for k in _TABLE_SCHEMAS if k == p) == 1


def test_missing_path_errors_like_before(spark, tmp_path):
    with pytest.raises(Exception) as exc:
        load_table(spark, str(tmp_path), "nation").collect()
    # same failure class as the plain reader: path-does-not-exist
    assert "PATH_NOT_FOUND" in str(exc.value) or "does not exist" in str(
        exc.value
    )


def test_memoized_read_preserves_events_normalization(spark, tmp_path):
    """events goes through normalize_events on BOTH the inference and
    the memoized branch — ts_ns must appear each time."""
    import datetime

    p = str(tmp_path / "events.parquet")
    ts = pa.array(
        [datetime.datetime(2024, 1, 1, 12, 0, 0)], type=pa.timestamp("us", tz="UTC")
    )
    _write(p, pa.table({"event_id": pa.array([1], pa.int64()), "ts": ts}))

    for _ in range(2):
        df = load_table(spark, str(tmp_path), "events")
        assert "ts_ns" in df.columns
        row = df.select("ts_ns").collect()[0]
        assert row["ts_ns"] == 1704110400000000000
