"""Physical-plan regression tests: the scale properties SURVEY.md
section 4 promises must be visible in explain() output — filter
pushdown reaching the parquet scan, column pruning, broadcast joins
for dimension lookups, and no accidental nested-loop/cartesian plans.
"""

import re

import pytest

import __spark_entry__ as entrymod


def _plan(spark, sf_dir, name: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    # only the 7 needed columns are read, not all 16
    assert len(m.group(1).split(",")) <= 7


def test_dimension_joins_broadcast(spark, sf_dir):
    for name in ("j1_lookup_join", "j3_star_join"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_keyword_classify_is_narrow(spark, sf_dir):
    # the J2 scale rewrite, r12 form: the literal dictionary compiles
    # to narrow per-row expressions — no join of ANY kind (the r11
    # shape was a shingle equi-join; an rlike nested loop was never
    # acceptable), and no shuffle
    plan = _plan(spark, sf_dir, "j2_keyword_classify")
    # NB: the dictionary's "Join Tuning" label appears as a map
    # literal in the plan text, so match operator names, not "Join"
    assert not re.search(
        r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct",
        plan,
    )
    assert "Exchange" not in plan


def test_lsh_pairs_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "d2_minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_has_no_join_at_all(spark, sf_dir):
    plan = _plan(spark, sf_dir, "asof_purchase_click")
    assert not re.search(r"Join", plan), "as-of should be pure window"
    assert "Window" in plan


def test_range_join_is_hash_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "range_error_clicks")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_graph_matching_rounds_are_checkpointed(spark, sf_dir):
    # VERDICT r10 item 2: the two-round greedy-matching unroll
    # re-derived its round state (round 2's frontier derives from
    # round 1's match, which references the frontier 3x), multiplying
    # the round-1 subtree until the plan held 220 parquet scans / 487
    # shuffles for a 21-row result. With the mst_boruvka-style
    # localCheckpoint on the per-round frontier and match, the final
    # plan is a union over checkpointed LogicalRDD tails: ZERO
    # parquet scans and zero exchanges survive in the reported plan
    # (the truncated subtrees each execute exactly once inside their
    # checkpoint). Pin that collapse.
    plan = _plan(spark, sf_dir, "graph_matching")
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("Exchange") == 0, plan
    assert "Union" in plan


def test_simrank_joins_all_broadcast(spark, sf_dir):
    # VERDICT r9 item 8: the r9 builder root-caused AQE falling back
    # to sort-merge for graph_simrank's iteration joins because the
    # localCheckpoint hides the (cap-bounded) adjacency's size — the
    # fix was explicit broadcast() on every adjacency/degree side.
    # Pin that plan: pure BroadcastHashJoin, never SortMergeJoin.
    plan = _plan(spark, sf_dir, "graph_simrank")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


# queries where a broadcast nested-loop IS the intended plan (1-row or
# few-row broadcast side); everything else must stay NLJ-free
_NLJ_ALLOWED = {
    "sq_scalar_subquery",  # 1-row global aggregate broadcast
    "mm4_feature_knn",  # 1-row probe vector broadcast
    "s1_cosine_topk",  # 1-row probe vector broadcast
    "d5_embedding_neardup",  # 8-row centroid table broadcast
    "s2_ivf_topk",  # 8-row centroid table broadcast
    "p6_ordered_slice",  # 1-row scalar min-marker broadcast
    "t5_funnel",  # three 1-row stage counts cross-combined
    "ml_kmeans",  # 8-row centroid table broadcast per Lloyd round
    "s4_hamming_topk",  # 1-row query-code broadcast
    "x17_domain_mixture",  # 1-row global-min-tokens broadcast
    "pipe_training_prep_v2",  # same 1-row min-tokens broadcast (via x17)
    "sem1_semdedup_survivors",  # 8-row centroid table broadcast (via ivf_assign)
    "x21_temperature_mixture",  # 1-row global (sum_w, grand) broadcast
    "x10_sparse_cosine_topk",  # 1-row corpus-size (n_docs) broadcast
    "ret1_bm25_topk",  # 1-row corpus length-stats broadcast
    "x23_dsir_weights",  # 1-row LM-normalizer (t_s, t_t, v) broadcast
    "x24_dsir_resample",  # same 1-row normalizer broadcast (via x23's frame)
    "pipe_training_prep_v3",  # same 1-row DSIR normalizer broadcast
    "pipe_training_prep_v4",  # same 1-row DSIR normalizer broadcast (via x24)
    "x30_bpe_training_round2",  # 1-row learned-top-merge broadcast
    "stats_chi2_assoc",  # 1-row grand-total broadcast
    "u8_fk_conformance",  # four 1-row orphan-count aggregates composed
    "f15_table_checksum",  # two 1-row checksum aggregates composed
    "s5_batch_knn",  # 5-row probe-batch broadcast
    "stats_ks_test",  # 1-row (n1, n2) sample-size broadcast
    "t15_cusum_changepoint",  # 1-row (total, n) broadcast
    "a9_weighted_median",  # 1-row total-weight broadcast
    "a10_weighted_deciles",  # same 1-row total-weight broadcast
    "ret2_rrf_fusion",  # 1-row broadcasts inside ret1/s1 subplans
    "q22_prospect_customers",  # 1-row (cents_sum, n) balance broadcast
    "x37_density_filter",  # 8-row centroid table broadcast (via ivf_assign)
    "t19_temporal_split",  # 1-row total-count broadcast
    "dq1_expectations",  # two 1-row count aggregates composed (fk rule)
    "dq2_psi_drift",  # 1-row histogram-totals broadcast
    "x6_tfidf_topk",  # 1-row corpus-size broadcast (replaced eager .count())
    "q11_important_parts",  # 1-row (total_v, n_parts) threshold broadcast
    "j9_bloom_prune_semi",  # 1-row bloom bit-array map broadcast
    "s7_sq8_topk",  # 1-row per-dim quantization-bounds broadcast
    "s8_pq_topk",  # 1-row codebook + 1-row ADC-table broadcasts
    "s9_ann_recall_report",  # composes s1/s2/s7/s8 subplans (their 1-row broadcasts)
    "x52_token_budget_select",  # 1-row token-budget broadcast
    "s10_ivfpq_topk",  # 1-row query/codebook/ADC broadcasts (s2 x s8 composition)
    "ret5_hard_negatives",  # composes ret1/s1 subplans (their 1-row broadcasts)
    "ret4_mmr_rerank",  # 1-row greedy-pick broadcasts per MMR round
    "a11_cms_heavy_hitters",  # 1-row total/500 threshold broadcast
    "t21_rfm_segmentation",  # 1-row max-orderdate broadcast
    "stats_gini",  # global_row_numbers' 1-row offset broadcast
    "dq4_skew_report",  # 1-row key-stats broadcast
    "d18_dedup_cluster_stats",  # 1-row doc-total broadcast
    "dq8_freshness",  # 1-row global-max-timestamp broadcast
    "t27_autocorrelation",  # 4-row lag-offset + daily-series broadcasts
    "stats_mannwhitney",  # global_prefix_sums' 1-row offset broadcast
    "pipe_training_prep_v5",  # composes x20/quantile-gate 1-row broadcasts
    "q_skyline_pareto",  # triangular broadcast join over |distinct sizes| rows
    "s11_knn_join",  # centroid/query-side tiny broadcasts
    "stats_benford",  # 9-row digit table + 1-row total broadcasts
    "stats_chi2_independence",  # 25/5/5-group margin + 1-row broadcasts
    "stats_kendall_grid",  # grid-bucket broadcasts + 1-row offset broadcast
    "x56_heaps_law",  # decile-threshold broadcast theta join (10 rows)
    "x57_term_lift",  # tiny term-df broadcasts + 1-row total
    "x58_calibration_bins",  # 1-row doc-count broadcast
    "er2_blocking_recall",  # 1-row truth x 1-row found broadcast
    "dq9_join_fanout",  # 1-row predicted x 1-row actual broadcast
    "t29_seasonal_anomaly",  # 1-row residual-moment broadcast
    "s12_filtered_topk",  # 1-row query-vector broadcast (the s1 shape)
    "a14_grouped_median",  # triangular broadcast join over |groups| rows
    "x66_threshold_sensitivity",  # 4-row threshold-list broadcast
    "graph_clustering_coeff",  # 1-row triangles x 1-row wedges broadcast
    "stats_runs_test",  # 1-row flips x 1-row margins broadcast
    "x67_token_frequency_spectrum",  # 1-row totals broadcast
    "s13_recall_vs_probes",  # centroid/query/probe-list tiny broadcasts
    "stats_poisson_bootstrap",  # 16-row replicate-list broadcast
    "stats_theil_sen",  # calendar-bounded daily-series pair broadcast
    "w11_grouped_percentiles",  # triangular broadcast join over |groups| rows
    "t34_sliding_distinct",  # 1-row span broadcast window filter
    "x70_vocab_coverage",  # 5-row topn-list + 1-row total broadcasts
    "t35_retention_downsample",  # 1-row max-day broadcast
    "j13_nullsafe_join",  # four 1-row count broadcasts
    "x73_langid_confusion",  # 1-row accuracy broadcast
    "t37_dow_hour_heatmap",  # 1-row total broadcast
    "d21_band_planner",  # 5-row geometry x 19-row grid literal broadcasts
    "ml_naive_bayes_model",  # 1-row (total, vocab) + doc-count broadcasts
    "t38_watermark_planner",  # 5-row watermark-grid broadcast
    "t39_session_gap_planner",  # 5-row gap-grid + 1-row user-count broadcasts
    "t40_auto_gap_sessionize",  # grid/floor/user-count/chosen-gap 1-row broadcasts
    "x78_dedup_mixture_shift",  # 1-row before/after total broadcasts
    "s14_mips_topk",  # 1-row query-vector broadcast (the s1 shape)
    "s15_mips_ivf_topk",  # 1-row norm-max + query-vector broadcasts
    "s16_mips_recall_report",  # composes s14/s15's 1-row broadcasts
    "dq14_benford_audit",  # 1-row total broadcast
    "ml_knn_classifier",  # centroid/query-side tiny broadcasts (via ivf_knn_join, the s11 shape)
    "s18_dim_truncation_recall",  # 1-row query-vector + 10-row truth broadcasts (the s1/s9 shape)
    "j14_selfjoin_size_estimate",  # 1-row exact x 1-row sketch-estimate broadcast
    "ret6_prf_expansion",  # 1-row corpus length-stats broadcast (via ret1's shape, twice)
    "t47_retention_matrix",  # 1-row cohort-window-limit broadcast
    "j15_association_rules",  # 1-row basket-count broadcast over the 20-row rule set
    "u26_tombstone_delete",  # six 1-row purge-count aggregates composed
    "t48_time_to_convert",  # 9-row decile grid broadcast over the bounded CDF
    "dq15_cusum_drift",  # 1-row target (mean) broadcast
    "x81_cluster_safe_split",  # 1-row leak-count broadcast
    "s17_mips_recall_vs_probes",  # s13's tiny probe-grid broadcasts
    "a17_audience_matrix",  # |types| x |types| count-row broadcast
    # round-8 additions
    "j16_salting_plan",  # 1-row replication-total broadcast
    "opt1_join_order_costs",  # 1-row stats x audit-count broadcasts
    "a20_minhash_set_ops",  # 1-row exact-audit broadcast over the 1-row sketch row
    "u28_snapshot_expiry_plan",  # 1-row vmax + reclaim-total broadcasts
    "x91_budget_apportionment",  # 1-row seats-left + total-check broadcasts
    "er6_bcubed_quality",  # 1-row metric x cluster-count broadcast
    "f_levenshtein_suite",  # dim x dim (150-type) broadcast theta join by design
    # round-9 additions
    "ret7_mrr_eval",  # 5-row query-term literal broadcast (the s5 shape)
    "er7_fellegi_sunter",  # 1-row m-rates x 1-row u-rates broadcast
    "u30_zone_map_skipping",  # 1-row bounds + 4-row predicate-grid broadcasts
    "a19_hll_rolling_distinct",  # day-grid x 256-bucket-range broadcast + 1-row audit
    "u29_shard_rebalance_plan",  # doc x 24-ring-point broadcast + 1-row totals
    "a21_cms_planner",  # width/hash-grid broadcasts + 1-row total
    "dq24_duplicate_payments",  # 1-row exposure-totals broadcast
    "graph_reciprocity",  # 1-row edges x 1-row mutual broadcast
    "opt2_histogram_selectivity",  # 1-row bounds + 32-cell x 4-predicate grid broadcasts
    "u31_bloom_skipping",  # 3-multiplier grid + 1-row stats + 5-probe broadcasts
    "ml_decision_stump",  # 1-row bounds + 15-row threshold grid + 1-row argmin broadcasts
    "ret8_ndcg_eval",  # 5-row query-term + 10-row discount-table broadcasts (the ret7 shape)
    "t51_event_regex_match",  # 3-row pattern-dimension literal broadcast
    "a23_decayed_counts",  # 1-row reference-day broadcast
    "u32_incremental_topk",  # 1-row split-day + 1-row sizes broadcasts
    "x96_kneser_ney_mass",  # vocab-dimension (31-row) grid + 1-row type-count broadcasts
    "stats_cuped",  # 1-row split/moment/mean broadcasts over the user panel
    "ml_gbdt_round",  # 15-row threshold grid + 1-row argmin/model broadcasts (x2 rounds)
    "stats_power_mde",  # 1-row moments x 4-row size-grid broadcast
    "ml_pca_power",  # 1-row n/scale/norm broadcasts over the 64x64 grid
    "er8_fs_decisions",  # 1-row bucket-count + 1-row weight broadcasts
    "graph_modularity",  # 1-row edge-total broadcast over the community grid
    "j17_coordinated_sample_join",  # 2-row report from four 1-row count broadcasts
    "u33_mor_cow_planner",  # 1-row bounds + 3-share x 2-strategy literal grids
    "ml_bandit_replay",  # 1-row logged-total broadcast over the day-arm grid
    "dq26_metric_decomposition",  # 1-row total-delta broadcast over the segment grid
    "graph_robustness",  # 1-row size/component-stat broadcasts per scenario
    "ml_permutation_importance",  # 1-row bounds/argmin broadcasts + 15-row grid (x2 passes)
    "u34_partition_evolution",  # 1-row bounds/stats x 2-strategy literal broadcasts
    "graph_spectral_bisection",  # 1-row c/mean/norm/cut/balance broadcasts per iteration
    "stats_diff_in_diff",  # 1-row cutover + 1-row wide-pivot broadcasts over the 2x2 cells
}


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in entrymod.queries()
        if not n.startswith("stream_") and n not in _NLJ_ALLOWED
    ),
)
def test_no_accidental_nested_loops(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_fact_fact_join_shuffles_when_too_big_to_broadcast(spark, sf_dir):
    # with broadcast off (as at real fact-table scale), the engine picks
    # a shuffled join for lineitem x orders — fact tables are never
    # forced through a broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "q18_large_orders")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bucketed_join_has_no_exchange_on_inputs(spark, sf_dir):
    # j11: both sides bucketed+sorted on the join key -> the sort-merge
    # join reads co-located buckets directly; the ONLY exchange in the
    # whole plan is the final 5-group aggregation shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "j11_bucketed_join")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    # formatted explain prints each node twice (tree + detail section);
    # count distinct Exchange NODES via their detail headers
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 1, f"expected only the agg exchange, got {n_exchange}:\n{plan}"


def test_filtered_ann_pushes_predicate_to_scan(spark, sf_dir):
    # s12: the metadata filter must reach the parquet scan so the
    # similarity pass only ever reads the qualifying fraction
    plan = _plan(spark, sf_dir, "s12_filtered_topk")
    assert re.search(r"PushedFilters:.*EqualTo\(label,3\)", plan), plan


def test_partitioned_layout_prunes_at_listing(spark, sf_dir):
    # u18: the day filter must resolve to PartitionFilters (directory
    # pruning), never a row-level Filter over the partition column
    plan = _plan(spark, sf_dir, "u18_partition_pruned_read")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day_n" in m.group(1), plan


def test_edit_distance_is_banded_equi_join(spark, sf_dir):
    # d8 scale guard: length-band blocking makes the pair join an
    # equi-join on the band key — never a nested loop over the full
    # distinct-source square.
    plan = _plan(spark, sf_dir, "d8_edit_distance")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jaccard_and_sparse_cosine_no_nested_loop(spark, sf_dir):
    # d3: fully NLJ-free.  x10: the only NLJ allowed is the intended
    # 1-row corpus-size broadcast (replacing the old eager .count());
    # the doc-pair join itself must stay an equi-join.
    plan = _plan(spark, sf_dir, "d3_ngram_jaccard_topk")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    plan = _plan(spark, sf_dir, "x10_sparse_cosine_topk")
    assert "CartesianProduct" not in plan
    # the `w` branch (tf-idf weights) recurs in norms/a/b subtrees, so
    # its 1-row n_docs broadcast appears several times — but every NLJ
    # in the plan must be that Cross BuildRight shape (tree lines) or
    # the matching detail-section header, never a fallback pair join
    import re

    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" not in line:
            continue
        assert (
            "BroadcastNestedLoopJoin Cross BuildRight" in line
            or re.match(r"^\(\d+\) BroadcastNestedLoopJoin", line.strip())
        ), line


def test_runtime_bloom_filter_join_pruning_available(spark, sf_dir):
    """Runtime bloom-filter semi-join reduction (on by default in the
    session) injects a might_contain filter on the fact side of a
    shuffle join when the dim side is selective. The size thresholds
    are scaled down here because they are calibrated for cluster-scale
    scans (applicationSideScanSizeThreshold defaults to 10GB) — at
    100 TB the DEFAULTS fire; this pins that our session/plan shape
    lets them."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_splitting_available(spark):
    """AQE skew-join splitting (on in the session defaults) divides an
    oversized shuffle partition across extra tasks at runtime — the
    engine's native answer to hot keys, alongside the explicit salted
    join (j5). Thresholds are byte-calibrated for cluster scale, so
    they are scaled down here; at 100 TB the defaults fire on real
    skew with no code change."""
    import re

    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        a = spark.range(0, 500_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.col("id").alias("v"),
        )
        b = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = a.join(b, "k").select(F.sum("v").alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"skew=true", plan), plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
