"""Catalog hygiene: every query runs at sf0.001, names/aliases line up."""

import pytest

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) == 5
    assert df.count() > 0


@pytest.mark.slow  # r13: slow tier (467 cases; oracle-gate redundant)
@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    if name.startswith("stream_"):
        pytest.skip("streaming covered in test_streaming_multimodal")
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.columns  # resolvable plan with named output
    df.limit(5).collect()
