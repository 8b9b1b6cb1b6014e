"""Structural invariants of the round-7 session-2 operators — the
properties that must hold on ANY input, checked on the driver fixture
(the oracle harness proves value parity; these prove the MATH is the
math the docstrings claim)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _rows(spark, sf_dir, name):
    return entrymod.queries()[name](spark, sf_dir).collect()


def test_cms_join_estimate_never_underestimates(spark, sf_dir):
    r = _rows(spark, sf_dir, "j14_selfjoin_size_estimate")[0]
    assert r["cms_est"] >= r["exact_pairs"] > 0
    assert r["over_bps"] >= 0


def test_log_histogram_brackets_exact_quantiles(spark, sf_dir):
    for r in _rows(spark, sf_dir, "a18_log_histogram_quantiles"):
        # bucket upper bound must sit at or above the exact quantile,
        # within one bucket's relative width below it is impossible
        for q in ("p50", "p90", "p99"):
            assert r[f"est_{q}_micro"] >= r[f"exact_{q}_micro"]
        assert 0 < r["n_buckets"] <= r["n_rows"]


def test_blocking_eval_metric_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "er4_blocking_eval")
    assert {r["family"] for r in rows} == {
        "lsh_bands", "sorted_neighborhood", "soundex_block",
    }
    truths = {r["truth_pairs"] for r in rows}
    assert len(truths) == 1  # same ground truth for every family
    for r in rows:
        assert r["hits"] <= r["truth_pairs"]
        assert r["hits"] <= r["n_candidates"]
        if r["recall_bps"] is not None:
            assert 0 <= r["recall_bps"] <= 10000


def test_dim_truncation_full_width_is_exact(spark, sf_dir):
    rec = {r["dims"]: r["recall_pct"] for r in
           _rows(spark, sf_dir, "s18_dim_truncation_recall")}
    assert rec[64] == 100
    assert all(0 <= v <= 100 for v in rec.values())


def test_bitemporal_corrections_preserve_valid_rowcounts(spark, sf_dir):
    g = {(r["valid_at"], r["known_at"]): r for r in
         _rows(spark, sf_dir, "u25_bitemporal_grid")}
    # a retroactive correction changes WHAT we knew, never HOW MANY
    # facts were valid — row counts depend on valid time only
    assert g[(1, 1)]["n_rows"] == g[(1, 2)]["n_rows"]
    assert g[(2, 1)]["n_rows"] == g[(2, 2)]["n_rows"]
    # corrections are -500 cents each: later-knowledge totals are lower
    assert g[(1, 2)]["total_cents"] < g[(1, 1)]["total_cents"]
    assert g[(2, 2)]["total_cents"] < g[(2, 1)]["total_cents"]


def test_partial_agg_merge_is_lossless(spark, sf_dir):
    for r in _rows(spark, sf_dir, "u24_partial_agg_merge"):
        assert r["states_match"] == 1
        assert 1 <= r["n_batches"] <= 3


def test_tombstone_purge_leaves_no_residue(spark, sf_dir):
    r = _rows(spark, sf_dir, "u26_tombstone_delete")[0]
    assert r["residue"] == 0
    assert r["cust_purged"] == r["n_tombstones"]
    assert r["cust_kept"] > 0


def test_retention_matrix_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "t47_retention_matrix")
    assert rows, "matrix must not be empty"
    for r in rows:
        assert 0 < r["active_users"] <= r["cohort_users"]
        assert 0 <= r["retention_bps"] <= 10000
        if r["age_wk"] == 0:
            # every cohort member is active the week they first order
            assert r["retention_bps"] == 10000


def test_srm_counts_are_a_partition(spark, sf_dir):
    r = _rows(spark, sf_dir, "stats_srm")[0]
    assert r["o_a"] + r["o_b"] == r["n"]
    assert r["srm_chi2_micro"] >= 0


def test_ktruss_edge_counts_monotone(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "graph_ktruss_peel"), key=lambda r: r["round"]
    )
    counts = [r["n_edges"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_time_to_convert_deciles_monotone(spark, sf_dir):
    rows = sorted(
        _rows(spark, sf_dir, "t48_time_to_convert"), key=lambda r: r["decile"]
    )
    lats = [r["latency_min"] for r in rows]
    assert all(v is not None and v >= 0 for v in lats)
    assert all(a <= b for a, b in zip(lats, lats[1:]))


def test_association_rule_bounds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "j15_association_rules")
    assert len(rows) == 20  # both directions of the top-10 pairs
    for r in rows:
        assert 0 < r["conf_micro"] <= 1000000
        assert r["lift_milli"] > 0


def test_prf_expansion_keeps_some_seed_docs(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ret6_prf_expansion")
    assert len(rows) == 10
    # expansion reweights but the seed query's signal persists: at
    # least one seed doc must survive into the expanded top-10
    assert any(r["was_seed"] == 1 for r in rows)


def test_column_profile_key_column(spark, sf_dir):
    prof = {r["col"]: r for r in _rows(spark, sf_dir, "dq19_column_profile")}
    assert prof["doc_id"]["n_distinct"] == prof["doc_id"]["n_rows"]
    for r in prof.values():
        assert 0 <= r["top_share_bps"] <= 10000
        assert r["n_nulls"] + 1 <= r["n_rows"] or r["n_distinct"] == 0
