"""Registry-wide OUTPUT SCHEMA RULE enforcement (r4 verdict item 2).

The driver's canonicalizer materializes DuckDB results through pandas,
where HUGEINT degrades to lossy floats (proven by
tests/test_canon_rules.py) — while the local gate replica fetches
Python ints via fetchall() and can never see the difference. The r4
driver round shipped six reds (plus three latent) because nine oracle
SQL strings surfaced an uncast ``SUM(bigint)`` (DuckDB widens integer
SUM — including window SUM — to HUGEINT).

This test converts that whole bug class from "driver-round surprise"
to "local red": it binds EVERY registered oracle against the sf0.001
DuckDB views and asserts the final relation's types contain

- no HUGEINT / UHUGEINT / UBIGINT column (cast the output-surfacing
  SUM/cardinality to BIGINT — all real values here are far below
  2^53, so the cast is exact), and
- no DOUBLE column that is not on the deliberate-rounding whitelist
  below (the OUTPUT SCHEMA RULE: floats must be ROUND(...,k)'d or
  exact-decimal on BOTH engines before surfacing; every whitelisted
  column has been value-hash green against Spark at >=2 scale
  factors, so its rounding discipline is proven).

Binding is duckdb's relational API (``con.sql`` is lazy), so the scan
touches only the binder — the whole registry checks in seconds.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from hi_csa_db_spark.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason=f"driver-generated testdata absent at {SF_DIR}",
)

# Integer families the driver's pandas canonicalization handles
# exactly. Everything wider (HUGEINT) or unsigned (UBIGINT — numpy
# uint64 vs Spark's signed long) is banned from final relations.
_BANNED_INT = ("HUGEINT", "UHUGEINT", "UBIGINT")


def _is_floaty(type_str: str) -> bool:
    """Substring match, like _BANNED_INT (ADVICE r5): catches DOUBLE /
    FLOAT nested inside LIST(...)/STRUCT(...) type strings too, so a
    future ``LIST(DOUBLE)`` oracle column can't bypass the OUTPUT
    SCHEMA RULE gate."""
    return "DOUBLE" in type_str or "FLOAT" in type_str

# (query -> columns) allowed to surface DOUBLE: each is a deliberately
# rounded / exact-decimal value, proven value-hash green vs Spark.
# Adding a NEW double column to any oracle fails this test until the
# author consciously whitelists it — i.e. confirms it follows the
# ROUND-before-surface rule (NOTES.md, OUTPUT SCHEMA RULE).
_DOUBLE_WHITELIST: dict[str, set[str]] = {
    "a10_weighted_deciles": {"value"},
    "a3_first_order_per_customer": {"o_totalprice"},
    "a6_conditional_agg": {"qty_finished"},
    "a9_weighted_median": {"median_price"},
    "agg_pandas_median": {"med_price"},
    "d12_containment_pairs": {"contain_a", "contain_b"},
    "d14_minhash_calibration": {"mae", "max_err"},
    "d17_line_dedup": {"boilerplate_frac"},
    "d18_dedup_cluster_stats": {"doc_share"},
    "d20_lsh_s_curve": {"p_candidate"},
    "d2_minhash_lsh_pairs": {"jaccard"},
    "d3_ngram_jaccard_topk": {"jaccard"},
    "d5_embedding_neardup": {"cos_sim"},
    "d9_incremental_lsh": {"jaccard"},
    "dq2_psi_drift": {"psi"},
    "dq4_skew_report": {"skew_ratio"},
    "f_conditional_suite": {"bal_cap5k", "bal_floor0"},
    "f_math_suite": {"abs_bal", "ln_bal", "sqrt_bal"},
    "f_null_suite": {"bal_filled", "bal_or_null"},
    "g1_rollup_region_nation": {"total_acctbal"},
    "g2_grouping_sets_orders": {"total_price"},
    "g5_unpivot": {"v"},
    "graph_assortativity": {"assortativity"},
    "graph_jaccard_neighbors": {"jaccard"},
    "graph_pagerank": {"rank"},
    "j11_bucketed_join": {"revenue"},
    "j1_lookup_join": {"total_acctbal"},
    "j3_star_join": {"sum_qty"},
    "j4_forward_fill": {"last_signup_value", "purchase_since_error"},
    "j5_salted_join": {"sum_price"},
    "mm4_feature_knn": {"cos_sim"},
    "pipe_training_prep": {"avg_tokens"},
    "profile_columns": {"max_v", "min_v"},
    "q10_returned_items": {"revenue"},
    "q11_important_parts": {"part_value"},
    "q14_promo_revenue": {"promo_revenue"},
    "q15_top_supplier": {"total_revenue"},
    "q17_small_quantity_revenue": {"avg_yearly"},
    "q18_large_orders": {"o_totalprice", "total_qty"},
    "q19_disjunctive_revenue": {"revenue"},
    "q1_pricing_summary": {
        "avg_disc", "avg_qty", "sum_base_price",
        "sum_charge", "sum_disc_price", "sum_qty",
    },
    "q22_prospect_customers": {"totacctbal"},
    "q2_min_cost_supplier": {"s_acctbal", "supplycost"},
    "q3_top_revenue_orders": {"revenue"},
    "q5_local_supplier_volume": {"revenue"},
    "q6_forecast_revenue": {"revenue"},
    "q7_volume_shipping": {"revenue"},
    "q8_market_share": {"mkt_share"},
    "q9_product_type_profit": {"sum_profit"},
    "ret1_bm25_topk": {"bm25"},
    "ret2_rrf_fusion": {"rrf"},
    "ret4_mmr_rerank": {"score"},
    "ret5_hard_negatives": {"bm25"},
    "ret6_prf_expansion": {"bm25"},
    # r12 bounds-checked conversion: exact interpolated percentiles,
    # ROUND(..., 6) on both engines (the stats_percentiles pattern)
    "sketch_quantiles": {"p50", "p90", "p99"},
    "s10_ivfpq_topk": {"cos_sim"},
    "s11_knn_join": {"cos_sim"},
    "s12_filtered_topk": {"cos_sim"},
    "s14_mips_topk": {"dot"},
    "s15_mips_ivf_topk": {"dot"},
    "s1_cosine_topk": {"cos_sim"},
    "s2_ivf_topk": {"cos_sim"},
    "s5_batch_knn": {"cos_sim"},
    "s6_srp_lsh_pairs": {"cos_sim"},
    "s7_sq8_topk": {"cos_sim"},
    "s8_pq_topk": {"cos_sim"},
    "sq_correlated_subquery": {"c_acctbal"},
    "sq_lateral_topn": {"bal"},
    "sq_scalar_subquery": {"o_totalprice"},
    "stats_chi2_assoc": {"chi2"},
    "stats_chi2_independence": {"chi2_stat"},
    "stats_cohen_kappa": {"kappa"},
    "stats_gini": {"gini"},
    "stats_histogram": {"hi", "lo"},
    "stats_kendall_grid": {"kendall_tau_b"},
    "stats_ks_test": {"d"},
    "stats_linreg": {"intercept", "r2", "slope"},
    "stats_mannwhitney": {"z_score"},
    "stats_moments": {"corr_qty_price", "mean_qty", "var_qty"},
    "stats_percentiles": {"hi", "lo", "p25", "p50", "p75"},
    "stats_runs_test": {"z_score"},
    "stats_spearman": {"spearman_rho"},
    "stats_wilcoxon": {"z_score"},
    "stream_ohlc_daily": {"close", "high", "low", "open"},
    "stream_sliding_counts": {"sum_value"},
    "stream_stateful_totals": {"total_value"},
    "t11_ewma_smoothing": {"ewma"},
    "t12_time_rollup": {"total"},
    "t13_ship_latency": {"p50_days", "p90_days"},
    "t14_dow_seasonality": {"total"},
    "t16_trend_ma7": {"residual", "revenue", "trend7"},
    "t17_ohlc_daily": {"close", "high", "low", "open"},
    "t18_interp_align": {"interp_value"},
    "t1_tumbling_window": {"total_value"},
    "t22_hazard_table": {"hazard"},
    "t23_burstiness": {"fano"},
    "t26_rolling_median": {"median7", "revenue"},
    "t27_autocorrelation": {"r_autocorr"},
    "t7_zscore_outliers": {"value", "zscore"},
    "t9_robust_outliers": {"mad", "med"},
    "u10_cdc_apply": {"current_val"},
    "u1_db_merge": {"acctbal"},
    "u2_union_streams": {"o_totalprice"},
    "w10_rank_distributions": {"cume", "pct_rank"},
    "w2_topk_orders": {"o_totalprice"},
    "w5_window_suite": {"mov_avg", "mov_sum"},
    "w6_range_frame": {"spend_30d"},
    "w7_rank_fractions": {"cd", "pr"},
    "w9_ntile_quartiles": {"max_bal", "min_bal"},
    "x10_sparse_cosine_topk": {"cos_sim"},
    "x12_quality_rules": {"frac_alpha_words", "mean_word_len"},
    "x13_repetition_stats": {"dup_sentence_frac", "top_bigram_frac"},
    "x14_contamination": {"contamination_frac"},
    "x15_bigram_logprob": {"avg_logprob"},
    "x21_temperature_mixture": {"keep_rate"},
    "x29_weighted_sample": {"es_key"},
    "x31_dataset_card": {"frac_en", "mean_doc_chars"},
    "x32_source_overlap": {"vocab_jaccard"},
    "x36_syllable_complexity": {"avg_word_len", "syll_per_word"},
    "x37_density_filter": {"cos_c"},
    "x3_quality_score": {
        "mean_word_len", "punct_ratio", "quality_score", "stopword_ratio",
    },
    "x40_source_normalized_quality": {"z"},
    "x42_perplexity_buckets": {"avg_logprob"},
    "x46_ngram_novelty": {"novelty"},
    "x62_split_leakage": {"jaccard"},
    "x6_tfidf_topk": {"tfidf"},
}


@pytest.fixture(scope="module")
def oracle_types():
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    out = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)  # lazy: binder only, no execution
        out[name] = list(zip(rel.columns, [str(t).upper() for t in rel.types]))
    con.close()
    return out


def test_no_hugeint_or_unsigned_outputs(oracle_types):
    """The r4 red class: any HUGEINT/UBIGINT in a final relation is a
    driver-canonicalizer hazard regardless of value magnitude."""
    offenders = {
        name: [c for c, t in cols if any(b in t for b in _BANNED_INT)]
        for name, cols in oracle_types.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, (
        "oracles surface HUGEINT/UBIGINT columns — CAST the "
        f"output-surfacing aggregate to BIGINT: {offenders}"
    )


def test_double_outputs_are_whitelisted(oracle_types):
    """Every DOUBLE output column must be consciously whitelisted as a
    deliberately rounded value (OUTPUT SCHEMA RULE, NOTES.md)."""
    offenders = {}
    for name, cols in oracle_types.items():
        allowed = _DOUBLE_WHITELIST.get(name, set())
        bad = [c for c, t in cols if _is_floaty(t) and c not in allowed]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "un-whitelisted DOUBLE oracle outputs — ROUND them on both "
        "engines, then add to _DOUBLE_WHITELIST with the rounding "
        f"argument: {offenders}"
    )


def test_whitelist_has_no_stale_entries(oracle_types):
    """Whitelist hygiene: every entry must still name a registered
    oracle and at least one of its current DOUBLE columns."""
    stale = {}
    for name, cols in _DOUBLE_WHITELIST.items():
        if name not in oracle_types:
            stale[name] = "query gone"
            continue
        actual = {c for c, t in oracle_types[name] if _is_floaty(t)}
        extra = cols - actual
        if extra:
            stale[name] = f"columns no longer DOUBLE: {sorted(extra)}"
    assert not stale, f"stale _DOUBLE_WHITELIST entries: {stale}"
