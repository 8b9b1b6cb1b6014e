"""Generate PLANS.md: the physical-plan evidence for every headline
query — what actually reaches the parquet scan (pushed filters, read
schema width), which join strategies Catalyst picked, how many
exchanges (shuffles) the plan contains, and how much of it runs inside
WholeStageCodegen. This is the at-a-glance proof that the plans keep
their scale properties (SURVEY.md section 4, SCALE.md) as the catalog
evolves; tests/test_plans.py pins the hard requirements, this report
shows the whole picture.

Usage: python tools/plan_report.py [sf_dir]   (writes PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hi_csa_db_spark.session import get_spark
import __spark_entry__ as entrymod
from bench import HEADLINE


def _plan(spark, sf_dir: str, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    # Execute first (cheap at sf0.001) so AQE finalizes: the report
    # shows the plan that actually ran — final join strategies,
    # coalesced exchanges, and codegen ids, not the tentative plan.
    df.collect()
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def summarize(plan: str) -> dict:
    scans = re.findall(r"^\s*\(\d+\) Scan parquet", plan, re.M)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    joins = sorted(
        {
            m
            for m in re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        }
    )
    n_exchange = len(re.findall(r"^\s*\(\d+\) Exchange", plan, re.M))
    n_codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    cols = max((len(s.split(",")) for s in schemas), default=0)
    return {
        "scans": len(scans),
        "pushed": "; ".join(p for p in pushed if p)[:80] or "—",
        "max_read_cols": cols,
        "joins": ", ".join(joins) or "—",
        "exchanges": n_exchange,
        "codegen_stages": n_codegen,
    }


# Non-headline queries whose plan shape is still scale-critical:
# the round-2 training-mix / incremental / SQL-surface additions.
EXTRA = [
    "x16_context_packing",
    "x17_domain_mixture",
    "d9_incremental_lsh",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "sq_lateral_topn",
    "w9_ntile_quartiles",
    "pipe_training_prep_v2",
    # round 3 additions
    "html_css_select",
    "ret1_bm25_topk",
    "rag1_chunk_overlap",
    "x23_dsir_weights",
    "x24_dsir_resample",
    "mm5_codec_roundtrip",
    "x25_classifier_auc",
    "t8_session_sequences",
    "d10_quality_survivors",
    "pipe_training_prep_v3",
    "graph_kcore",
    "x26_quality_quantile_filter",
    "x28_bpe_first_merges",
    "x29_weighted_sample",
    "t9_robust_outliers",
    "t10_interval_overlap",
    "u7_scd2_history",
    # round-3 late-session additions
    "d13_dup_spans",
    "j8_nearest_click",
    "stats_ks_test",
    "ret2_rrf_fusion",
    "t15_cusum_changepoint",
    "a9_weighted_median",
    "x35_shard_manifest",
    "t16_trend_ma7",
    "t17_ohlc_daily",
    "mm6_jpeg_roundtrip",
    # session-4 additions
    "q17_small_quantity_revenue",
    "q22_prospect_customers",
    "ret3_phrase_search",
    "t18_interp_align",
    "t19_temporal_split",
    "graph_jaccard_neighbors",
    "s6_srp_lsh_pairs",
    "x37_density_filter",
    "x38_k_anonymity",
    "x40_source_normalized_quality",
    "stats_cohen_kappa",
    "mm9_perceptual_dedup",
    # round-3 (this session) additions
    "q2_min_cost_supplier",
    "q4_priority_count",
    "q9_product_type_profit",
    "q11_important_parts",
    "q12_late_priority_split",
    "q16_supplier_part_counts",
    "q20_excess_stock_suppliers",
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
    "a11_cms_heavy_hitters",
    "x46_ngram_novelty",
    "t21_rfm_segmentation",
    "stats_gini",
    # round-4 session-3 additions
    "dq7_referential_integrity",
    "stats_chi2_independence",
    "stats_kendall_grid",
    "x55_stratified_sample",
    "x56_heaps_law",
    "s11_knn_join",
    "j10_fuzzy_neighbor_join",
    "q_skyline_pareto",
    "t25_debounce",
    "stats_benford",
    "graph_closeness",
    # round-4 session-4 additions
    "j11_bucketed_join",
    "t27_autocorrelation",
    "stats_mannwhitney",
    "x59_length_buckets",
    "t28_stl_decompose",
    "x61_rouge_bigram_recall",
    "x62_split_leakage",
    "er2_blocking_recall",
    "u15_schema_evolution",
    "pipe_training_prep_v6",
    "dq9_join_fanout",
    "t30_growth_streaks",
    "s12_filtered_topk",
    "a14_grouped_median",
    "s13_recall_vs_probes",
    "u16_ivm_join_counts",
    "a15_bitmap_distinct",
    "graph_ppr",
    "stats_poisson_bootstrap",
    "u18_partition_pruned_read",
    "t34_sliding_distinct",
    "dq11_reconciliation",
    "dq12_pk_uniqueness",
    "x70_vocab_coverage",
    "graph_matching",
    "u19_multi_format_union",
    "stats_theil_sen",
    "w11_grouped_percentiles",
    # round-6 additions: the planning tier + new operators
    "d21_band_planner",
    "pipe_training_prep_v7",
    "graph_ppr_seed_expansion",
    "ml_naive_bayes_model",
    "t38_watermark_planner",
    "t39_session_gap_planner",
    "t40_auto_gap_sessionize",
    "u21_compaction_plan",
    "u22_zorder_layout",
    "graph_components_star",
    "er3_golden_record",
    "x75_rake_keyphrases",
    "f18_soundex_blocks",
    "t41_cohort_ltv",
    "dq13_volume_anomaly",
    "x76_boilerplate_strip",
    "x78_dedup_mixture_shift",
    "t42_outage_intervals",
    "mm17_silence_trim",
    "x79_gate_length_grid",
    "s14_mips_topk",
    "x80_eval_decontam",
    # round-7 additions
    "s15_mips_ivf_topk",
    "s16_mips_recall_report",
    "s17_mips_recall_vs_probes",
    "t43_markov_transitions",
    "t44_top_event_paths",
    "dq14_benford_audit",
    "dq15_cusum_drift",
    "dq16_k_anonymity",
    "x81_cluster_safe_split",
    "ml_auc_ranking",
    "ml_calibration_table",
    # round-7 session-2 additions
    "graph_link_prediction",
    "graph_assortativity",
    "a18_log_histogram_quantiles",
    "s18_dim_truncation_recall",
    "dq18_l_diversity",
    "j14_selfjoin_size_estimate",
    "er4_blocking_eval",
    "dq19_column_profile",
    "u24_partial_agg_merge",
    "ret6_prf_expansion",
    "mm18_image_resize",
    "u25_bitemporal_grid",
    "graph_ktruss_peel",
    "t47_retention_matrix",
    "j15_association_rules",
    "u26_tombstone_delete",
    "stats_srm",
    "t48_time_to_convert",
    "x86_temperature_sweep",
    "x87_embedding_drift",
    # round-8 additions (stream_hll_daily excluded: streaming plans
    # are exercised by the streaming suite, not the batch explain)
    "j16_salting_plan",
    "a19_hll_rolling_distinct",
    "u27_retractable_agg",
    "f_levenshtein_suite",
    "opt1_join_order_costs",
    "a20_minhash_set_ops",
    "t50_twap",
    "u28_snapshot_expiry_plan",
    "x91_budget_apportionment",
    "dq23_wap_gate",
    "x95_source_overlap_matrix",
    "graph_scc",
    "er6_bcubed_quality",
    "u29_shard_rebalance_plan",
    "a21_cms_planner",
    "dq24_duplicate_payments",
    "graph_reciprocity",
    # round-9 additions
    "graph_convergence_audit",
    "er7_fellegi_sunter",
    "ret7_mrr_eval",
    "graph_local_clustering",
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
    # round-10 additions
    "graph_scc_convergence",
]


# --- Scan-count outlier guard (VERDICT r10 item 7) ----------------
# graph_matching sat in PLANS.md for rounds at 220 scans (a per-round
# re-derivation bug) without any reader noticing — a pathological row
# must PAGE, not wait for a judge. Rule: a query is an outlier when
# its scan count exceeds 3x its family median AND an absolute floor
# (families with median 0-2 would otherwise flag routine 4-8 scan
# multi-table plans; the pathology class this guard exists for is the
# 10x-plus lineage blow-up, not a wide star join). Families are the
# leading alphabetic prefix (graph_, dq, stats, ...).
# tests/test_plan_outliers.py recomputes this over the committed
# PLANS.md and pins the outlier list empty modulo the allowlist.

_OUTLIER_ABS_FLOOR = 12

# name -> WHY the scan count is legitimately high (each entry must
# explain itself; an unexplained entry defeats the pager).
_OUTLIER_ALLOWLIST: dict[str, str] = {}


def _family(name: str) -> str:
    m = re.match(r"^[a-z]+", name)
    return m.group(0) if m else name


def parse_plans_table(text: str) -> list[tuple[str, int]]:
    """(query, scan_count) rows from a PLANS.md table body."""
    out = []
    for line in text.splitlines():
        m = re.match(r"\| (\w+) \| (\d+) \|", line)
        if m:
            out.append((m.group(1), int(m.group(2))))
    return out


def scan_outliers(rows: list[tuple[str, int]]) -> list[tuple[str, int, float]]:
    """Non-allowlisted (query, scans, family_median) rows breaching
    the outlier rule."""
    import statistics

    fam: dict[str, list[int]] = {}
    for name, scans in rows:
        fam.setdefault(_family(name), []).append(scans)
    med = {f: statistics.median(v) for f, v in fam.items()}
    return [
        (name, scans, med[_family(name)])
        for name, scans in rows
        if name not in _OUTLIER_ALLOWLIST
        and scans > max(3 * med[_family(name)], _OUTLIER_ABS_FLOOR)
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-report")
    rows = []
    for name in HEADLINE + EXTRA:
        s = summarize(_plan(spark, sf_dir, name))
        rows.append((name, s))
    out = [
        "# PLANS — physical-plan properties of the headline queries",
        "",
        "Generated by `tools/plan_report.py` (explain mode: formatted).",
        "Columns: parquet scans in the plan; filters pushed to the scan;",
        "widest ReadSchema (column pruning evidence); join strategies",
        "Catalyst chose; shuffle (Exchange) count; distinct",
        "WholeStageCodegen spans.",
        "",
        "Since round 7 the composite dedup pipelines lazily checkpoint",
        "their shared stage outputs (connected-components labels, the",
        "quality/survivor frames, d3's shingle arrays), so a composite's",
        "reported plan is the post-checkpoint TAIL: the truncated lineage",
        "executes exactly once inside the checkpoint instead of being",
        "re-derived per consumer (d10 was 73 reported Exchanges before,",
        "5 after; the checkpointed subtree itself runs ~8 more once).",
        "Scan/pushed-filter evidence for those subtrees lives in their",
        "component queries' rows (d2/x20/graph_components).",
        "",
        "| query | scans | pushed filters | read cols | joins | shuffles | codegen |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, s in rows:
        out.append(
            f"| {name} | {s['scans']} | {s['pushed']} | {s['max_read_cols']} "
            f"| {s['joins']} | {s['exchanges']} | {s['codegen_stages']} |"
        )
    out.append("")
    outliers = scan_outliers([(n, s["scans"]) for n, s in rows])
    out.append("## Scan-count outliers")
    out.append("")
    out.append(
        "Queries whose scan count exceeds max(3x family median, "
        f"{_OUTLIER_ABS_FLOOR}) — the lineage-blow-up pager "
        "(VERDICT r10 item 7). Expected EMPTY; "
        "tests/test_plan_outliers.py pins it."
    )
    out.append("")
    if outliers:
        for name, scans, med in outliers:
            out.append(
                f"- **{name}**: {scans} scans (family median {med})"
            )
    else:
        out.append("(none)")
    out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("\n".join(out))
    if outliers:
        print(f"\nWARNING: {len(outliers)} scan-count outlier(s) flagged",
              file=sys.stderr)


if __name__ == "__main__":
    main()
