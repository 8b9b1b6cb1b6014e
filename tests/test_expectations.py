"""Unit tests for the declarative expectations engine
(operators/expectations.py) on synthetic frames with KNOWN violation
counts — the dq1 oracle proves the fixture-scale composition; these
prove each rule type's exact semantics, including NULL handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from hi_csa_db_spark.operators import expectations as ex


def _rows(df):
    return {r["rule"]: (r["n_checked"], r["n_violations"]) for r in df.collect()}


def test_row_rules_one_pass_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (None, 5.0, "bad"), (4, 999.0, None)],
        "id bigint, price double, code string",
    )
    out = _rows(
        ex.check_rows(
            df,
            [
                ex.not_null("id"),
                ex.in_range("price", 0, 100),  # NULL and 999 both violate
                ex.accepted_values("code", ["A", "B"]),  # 'bad' and NULL violate
                ex.matches("code", "^[AB]$"),
            ],
        )
    )
    assert out["not_null:id"] == (4, 1)
    assert out["range:price"] == (4, 2)
    assert out["accepted:code"] == (4, 2)
    assert out["regex:code"] == (4, 2)


def test_unique_counts_extra_rows_per_key(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (3,)], "k bigint"
    )
    out = _rows(ex.check_unique(df, ["k"]))
    assert out["unique:k"] == (6, 3)  # 2 extra of key 1, 1 extra of key 3


def test_fk_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    out = _rows(ex.check_fk(child, "fk", parent, "pk"))
    # 9 has no parent; NULL never matches an equi-join -> orphan too
    assert out["fk:fk->pk"] == (4, 2)


def test_report_schema_stable(spark):
    df = spark.createDataFrame([(1,)], "x bigint")
    a = ex.check_rows(df, [ex.not_null("x")])
    b = ex.check_unique(df, ["x"])
    c = ex.check_fk(df, "x", df.select(F.col("x").alias("y")), "y")
    merged = a.unionByName(b).unionByName(c)
    assert merged.columns == ["rule", "n_checked", "n_violations"]
    assert merged.count() == 3
