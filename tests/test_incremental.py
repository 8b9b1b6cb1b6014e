"""Incremental aggregation: merge(state(A), state(B)) == state(A+B)."""

from pyspark.sql import functions as F

from hi_csa_db_spark.catalog import load_table
from hi_csa_db_spark.operators.incremental import agg_state, finalize, merge_states


def test_merged_state_equals_full_recompute(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 3 != 0)
    delta = orders.filter(F.col("o_orderkey") % 3 == 0)
    keys = ["o_orderpriority"]
    merged = merge_states(
        agg_state(old, keys, "o_totalprice"),
        agg_state(delta, keys, "o_totalprice"),
        keys,
    )
    full = agg_state(orders, keys, "o_totalprice")
    m = {tuple(r) for r in finalize(merged).collect()}
    f = {tuple(r) for r in finalize(full).collect()}
    assert m == f  # bit-exact, decimal sums


def test_merge_handles_new_and_missing_keys(spark):
    a = spark.createDataFrame([("x", 1.0), ("x", 2.0)], ["k", "v"])
    b = spark.createDataFrame([("y", 10.0)], ["k", "v"])
    merged = merge_states(agg_state(a, ["k"], "v"), agg_state(b, ["k"], "v"), ["k"])
    rows = {r.k: (r.n_rows, float(r.sum_v), r.min_v, r.max_v) for r in merged.collect()}
    assert rows == {"x": (2, 3.0, 1.0, 2.0), "y": (1, 10.0, 10.0, 10.0)}
