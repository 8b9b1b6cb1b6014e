"""Results must not depend on the shuffle partition count — the
property that lets the same plan run on 32 local threads or 1000
executors. This is what the decimal-sum / round-then-rank discipline
buys; these tests pin it.
"""

import pytest

# r13: slow tier — 117 parametrized value-invariance replays (~7 min),
# excluded from the default run so the driver's window fits
# (pytest.ini; run with -m "" or -m slow).
pytestmark = pytest.mark.slow


FLOAT_SENSITIVE = [
    "q1_pricing_summary",
    "x6_tfidf_topk",
    "graph_pagerank",
    "s1_cosine_topk",
    "stats_moments",
    "stats_linreg",
    "t6_cohort_retention",
    "q8_market_share",
    # round-2 additions
    "d2_minhash_lsh_pairs",
    "d3_ngram_jaccard_topk",
    "x12_quality_rules",
    "x13_repetition_stats",
    "s4_hamming_topk",
    "x14_contamination",
    "x15_bigram_logprob",
    "x16_context_packing",
    "x17_domain_mixture",
    "q14_promo_revenue",
    "d9_incremental_lsh",
    "pipe_training_prep_v2",
    "x18_global_shuffle_order",
    # round-2 session additions
    "x19_chunk_dedup",
    "sem1_semdedup_survivors",
    "x20_quality_classifier",
    "x21_temperature_mixture",
    "x22_stratified_sample",
    # round-3 additions (float scores / global ranks / keep rules)
    "ret1_bm25_topk",
    "x23_dsir_weights",
    "x24_dsir_resample",
    "x25_classifier_auc",
    "d10_quality_survivors",
    "t8_session_sequences",
    "pipe_training_prep_v3",
    "t9_robust_outliers",
    "u7_scd2_history",
    "t10_interval_overlap",
    "x29_weighted_sample",
    "x26_quality_quantile_filter",
    "x28_bpe_first_merges",
    "x30_bpe_training_round2",
    "stats_chi2_assoc",
    "w10_rank_distributions",
    "t11_ewma_smoothing",
    "q19_disjunctive_revenue",
    # round-3 (this session) additions: float scores, quantized codes,
    # greedy selections, integer credit splits, min-label clusters
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_parts",
    "q21_waiting_suppliers",
    "j9_bloom_prune_semi",
    "d15_sorted_neighborhood",
    "graph_hits",
    "s7_sq8_topk",
    "x42_perplexity_buckets",
    "t20_attribution",
    "er1_entity_resolution",
    "ret4_mmr_rerank",
    "x43_cdc_chunk_dedup",
    "t21_rfm_segmentation",
    "x47_priority_dedup",
    "stats_gini",
    "x46_ngram_novelty",
    # round-4 (this session) additions
    "s8_pq_topk",
    "a13_quantile_sketch",
    "x52_token_budget_select",
    "s10_ivfpq_topk",
    "stats_spearman",
    "x51_domain_cap",
    # round-8 additions (global ranks / rolling sketch merges / signed
    # delta merges / integer plans)
    "a19_hll_rolling_distinct",
    "j16_salting_plan",
    "u27_retractable_agg",
    "a20_minhash_set_ops",
    "x91_budget_apportionment",
    "t50_twap",
    "u28_snapshot_expiry_plan",
    "dq23_wap_gate",
    "graph_scc",
    "x95_source_overlap_matrix",
    "er6_bcubed_quality",
    "u29_shard_rebalance_plan",
    "a21_cms_planner",
    "dq24_duplicate_payments",
    "graph_reciprocity",
    # round-9 additions (bounded-round convergence shares, linkage
    # rate estimates, rank metrics, wedge-count ratios)
    "graph_convergence_audit",
    "er7_fellegi_sunter",
    "ret7_mrr_eval",
    "graph_local_clustering",
    "graph_link_prediction",
    "u30_zone_map_skipping",
    "opt2_histogram_selectivity",
    "u31_bloom_skipping",
    "ret8_ndcg_eval",
    "ml_decision_stump",
    "t51_event_regex_match",
    "a22_kmv_distinct",
    "a23_decayed_counts",
    "u32_incremental_topk",
    "x96_kneser_ney_mass",
    "stats_cuped",
    "ml_gbdt_round",
    "stats_power_mde",
    "dq25_fd_discovery",
    "ml_pca_power",
    "er8_fs_decisions",
    "graph_modularity",
    "j17_coordinated_sample_join",
    "t53_business_day_latency",
    "u33_mor_cow_planner",
    "ml_bandit_replay",
    "graph_simrank",
    "dq26_metric_decomposition",
    "f_rounding_suite",
    "graph_robustness",
    "ml_permutation_importance",
    "u34_partition_evolution",
    "dq27_key_discovery",
    "graph_spectral_bisection",
    "stats_diff_in_diff",
]


@pytest.mark.parametrize("name", FLOAT_SENSITIVE)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
