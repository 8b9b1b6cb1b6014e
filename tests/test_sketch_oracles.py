"""Bounds-checked sketch oracles (round 12, VERDICT r11 item 5).

The three sketch queries used to be rows-only; they now emit exact
twins plus ok-flag columns the DuckDB oracle asserts as constant 1,
so a drifting estimate fails the driver's value hash. These tests pin
(a) the registry invariant — exactly ONE rows-only name remains —
and (b) that the flags genuinely bite: every flag is 1 on the test
fixture, and the flag expressions are computed Spark-side (not
literals), so an estimator regression flips them.
"""

from __future__ import annotations

from hi_csa_db_spark import queries as Q


def test_only_reference_replay_lacks_an_oracle():
    missing = [n for n in Q._QUERIES if n not in Q._ORACLES]
    assert missing == ["pipe_reference_replay"]


def test_sketch_flags_all_pass_on_fixture(spark, sf_dir):
    qs = Q._QUERIES
    card = {r["l_returnflag"]: r for r in qs["sketch_cardinality"](spark, sf_dir).collect()}
    assert card and all(r["ok_orders"] == 1 and r["ok_parts"] == 1 for r in card.values())

    merge = qs["sketch_hll_merge"](spark, sf_dir).collect()
    assert merge and all(r["ok_merge"] == 1 for r in merge)
    assert all(r["n_shards"] >= 1 for r in merge)

    quant = qs["sketch_quantiles"](spark, sf_dir).collect()
    assert quant and all(
        r["ok_p50"] == 1 and r["ok_p90"] == 1 and r["ok_p99"] == 1 for r in quant
    )
    # exact percentiles must be ordered — a twin that went wrong
    # (e.g. wrong array index) shows up as an inversion
    assert all(r["p50"] <= r["p90"] <= r["p99"] for r in quant)


def test_sketch_flag_columns_are_not_constant_folded(spark, sf_dir):
    """The ok flags must be computed from the estimate, not emitted as
    literal 1s (which would make the oracle check vacuous). The
    optimized plan of each query must still reference the sketch
    aggregate that feeds the flag."""
    plans = {
        "sketch_cardinality": "approx_count_distinct",
        "sketch_hll_merge": "hll_union_agg",
        "sketch_quantiles": "percentile_approx",
    }
    for name, marker in plans.items():
        df = Q._QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert marker in plan, f"{name}: {marker} missing from optimized plan"
