"""Canonicalization smoke tests (round-1 lesson).

The driver compares Spark and DuckDB outputs through a canonicalizer;
round 1 lost two queries to engine-side type widening (DuckDB HUGEINT
sums, ceil/floor DOUBLE-vs-BIGINT) that was invisible locally. These
tests pin the repo rule from NOTES.md: query output schemas carry no
raw DOUBLE (round them) and no integer values above 2^53 (hex-string
or BIGINT-cast them), because such values survive SOME canonicalizers
and not others.
"""

import os
import sys

from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import canon


def test_canon_integer_valued_floats_fold_to_int():
    assert canon(5.0) == canon(5) == "5"
    assert canon(-0.0) == canon(0) == "0"
    assert canon(True) == canon(1)


def test_canon_python_ints_are_exact_at_any_size():
    big = 2**60 + 1
    assert canon(big) == str(big)


def test_canon_decimal_goes_through_float_and_is_lossy_above_2_53():
    # THE hazard: a Decimal/HUGEINT-shaped 2^60+1 canonicalizes via
    # float64 and silently loses its low bits — while the same value as
    # a Python/int64 int canonicalizes exactly. Any >2^53 aggregate can
    # therefore hash-match locally and mismatch in the driver (d4
    # round-1 failure). Outputs must emit hex strings or BIGINT casts.
    big = 2**60 + 1
    assert canon(Decimal(big)) != canon(big)


def test_canon_boundary_1e15():
    # the int-folding shortcut stops at 1e15; both sides of the
    # boundary must still be deterministic
    assert canon(float(10**15 - 1)) == str(10**15 - 1)
    assert canon(float(10**15 + 2)) == repr(float(10**15 + 2))


def test_duckdb_hugeint_sum_vs_bigint_cast():
    con = duckdb.connect()
    big = 2**60 + 1
    q = f"SELECT SUM(x) AS s FROM (SELECT CAST({big} AS BIGINT) AS x)"
    raw = con.execute(q).fetchone()[0]
    capped = con.execute(
        f"SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT CAST({big} AS BIGINT) AS x)"
    ).fetchone()[0]
    # the BIGINT-cast path is exact in every client; the raw HUGEINT
    # path is exact only in clients that keep Python ints
    assert capped == big
    assert canon(capped) == str(big)
    # pandas materialization is where HUGEINT degrades: accept either
    # exact (int-preserving client) or demonstrate the documented loss
    pdf = con.execute(q).df()
    v = pdf["s"].iloc[0]
    if isinstance(v, float):
        assert int(v) != big  # the loss d4's hex output guards against

def test_duckdb_hex_matches_spark_hex_format():
    # d4 emits lpad(hex(bigint),16,'0') on both engines; formats must agree
    con = duckdb.connect()
    out = con.execute(
        "SELECT lpad(hex(CAST(1152921504606846975 AS BIGINT)), 16, '0')"
    ).fetchone()[0]
    assert out == "0FFFFFFFFFFFFFFF"  # uppercase, fixed width — Spark's F.hex ditto
