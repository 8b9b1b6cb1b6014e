"""Semantic invariants for the training-mix operators: context packing
(x16) and domain-mixture balancing (x17). The oracle gate proves
cross-engine value equality; these pin the properties the values are
supposed to have."""

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from hi_csa_db_spark.catalog import load_table
from hi_csa_db_spark.functions.text import tokenize


def _source_token_totals(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return {
        r["source"]: r["total"]
        for r in docs.select(
            "source", F.size(tokenize(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("total"))
        .collect()
    }


def test_packing_conserves_tokens_and_bins_are_contiguous(spark, sf_dir):
    rows = entrymod.queries()["x16_context_packing"](spark, sf_dir).collect()
    totals = _source_token_totals(spark, sf_dir)
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for source, bins in by_source.items():
        # nothing lost or duplicated by the chunking
        assert sum(b["bin_tokens"] for b in bins) == totals[source]
        # prefix-sum binning yields contiguous bin ids from 0
        ids = sorted(b["bin_id"] for b in bins)
        assert ids == list(range(len(ids)))
        assert all(b["n_docs"] >= 1 for b in bins)


def test_mixture_is_a_deterministic_downsample(spark, sf_dir):
    fn = entrymod.queries()["x17_domain_mixture"]
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b  # same hash -> same kept set, run to run
    totals = _source_token_totals(spark, sf_dir)
    min_tokens = min(totals.values())
    for source, n_kept, kept_tokens in a:
        assert 0 < kept_tokens <= totals[source]
        # the target is the smallest slice's budget; the hash keeps
        # ~min/src of each slice, so no slice should blow far past it
        # (loose statistical bound: 3x on tiny fixture slices)
        assert kept_tokens <= 3 * min_tokens


def test_eval_gram_tokenize_runs_once_per_row(spark, sf_dir):
    """The 5-gram stage of _eval_split_hits (x80/x82) must keep its
    token array behind a projection boundary: higher-order functions
    run interpreted (no codegen CSE), so an inlined tokenize re-runs
    the punct-strip regex for every toks[i] access inside the window
    lambda (measured 128.6s -> 4.7s at sf0.1, r12). If CollapseProject
    ever inlines the array again, the regex count in the optimized
    plan jumps from once per gram source to ~5x."""
    from hi_csa_db_spark.catalog import load_table
    from hi_csa_db_spark.queries._shared import _eval_split_hits

    docs = load_table(spark, sf_dir, "documents")
    _corpus, hits = _eval_split_hits(docs)
    plan = hits._jdf.queryExecution().optimizedPlan().toString()
    # two tokenizes per side of the gram join (the projection itself
    # plus the size>=5 predicate pushed through it by substitution —
    # both once per ROW), never one per window position: the inlined
    # form shows ~6 per side (5 toks[i] accesses + the sequence
    # bound), i.e. >= 12 total
    assert plan.count("regexp_replace") == 4, plan.count("regexp_replace")
