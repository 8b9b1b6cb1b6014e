"""Behavioral tests for the round-2 corpus-pipeline additions:
span-level dedup, semantic dedup, classifier filtering, temperature
mixtures, stratified sampling, snapshot diff, URL canonicalization.

The oracle harness proves cross-engine value equality; these pin the
SEMANTICS (survivor rules, exact stratum sizes, changelog algebra)
against hand-built micro-fixtures where the expected answer is
obvious by inspection.
"""

from pyspark.sql import functions as F

from hi_csa_db_spark.operators import dedup


def test_chunk_spans_fixed_width_and_ragged_tail(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "")], ["doc_id", "text"]
    )
    rows = dedup.chunk_spans(docs, width=4).orderBy("doc_id", "chunk_idx").collect()
    # doc 1: two full chunks + ragged tail; doc 2 (empty) vanishes
    assert [(r.doc_id, r.chunk_idx, r.chunk) for r in rows] == [
        (1, 0, "a b c d"),
        (1, 1, "e f g h"),
        (1, 2, "i j"),
    ]


def test_chunk_dedup_keeps_global_first_occurrence(spark):
    # the same span appears in docs 1, 2 and twice in doc 3: only its
    # first occurrence (doc 1, position 0) survives
    docs = spark.createDataFrame(
        [
            (1, "dup span one two unique alpha beta gamma"),
            (2, "dup span one two other words here now"),
            (3, "dup span one two dup span one two"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.n_chunks, r.n_kept)
        for r in dedup.chunk_dedup(docs, width=4).collect()
    }
    assert out[1] == (2, 2)  # both chunks first occurrences
    assert out[2] == (2, 1)  # dup chunk dropped, tail kept
    assert out[3] == (2, 0)  # both positions carry the dup span


def test_stratified_sample_exact_n_per_stratum(spark, sf_dir):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["x22_stratified_sample"](spark, sf_dir)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(sizes.values()) == {5}
    # ranks are exactly 1..5 in every stratum
    ranks = out.groupBy("lang").agg(F.collect_set("rn").alias("rns")).collect()
    assert all(sorted(r.rns) == [1, 2, 3, 4, 5] for r in ranks)


def test_snapshot_diff_changelog_algebra(spark, sf_dir):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["u6_snapshot_diff"](spark, sf_dir)
    by_type = {r.change_type: r.n for r in out.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    # keys %10==0 exist only in new (added); %10==1 only in old (removed);
    # %7==0 surviving in both are changed; everything else unchanged/absent
    assert set(by_type) == {"added", "removed", "changed"}
    # added/removed partitions are disjoint deciles of the same key space
    # so their counts are within 1 bucket-size of each other
    assert abs(by_type["added"] - by_type["removed"]) < max(
        by_type["added"], by_type["removed"]
    )
    # no key appears twice in the changelog
    assert out.count() == out.select("o_orderkey").distinct().count()


def test_url_canonicalize_folds_variants(spark, sf_dir):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["f14_url_canonicalize"](spark, sf_dir)
    rows = out.collect()
    # canonical forms are clean: lowercase, no port, no fragment, no tracking
    for r in rows:
        assert r.canonical_url.startswith("https://src")
        assert ":443" not in r.canonical_url
        assert "#" not in r.canonical_url
        assert "utm_" not in r.canonical_url and "ref=" not in r.canonical_url
    # variants actually folded: fewer canonical urls than documents
    n_docs = out.sparkSession.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert out.count() < n_docs
    assert sum(r.n_occurrences for r in rows) == n_docs


def test_temperature_mixture_rates_bounded_and_small_domains_upweighted(
    spark, sf_dir
):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["x21_temperature_mixture"](spark, sf_dir).collect()
    assert all(0.0 < r.keep_rate <= 1.0 for r in out)
    # alpha=0.5 squashes the distribution: every domain keeps SOME docs
    assert all(r.n_kept > 0 for r in out)


def test_semdedup_survivor_is_component_min(spark, sf_dir):
    import __spark_entry__ as entrymod

    out = entrymod.queries()["sem1_semdedup_survivors"](spark, sf_dir)
    rows = out.collect()
    assert all(r.n_members >= 1 for r in rows)
    # survivors are distinct canonical ids
    assert len({r.survivor_id for r in rows}) == len(rows)


def test_quality_classifier_keep_matches_logit_sign(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["x20_quality_classifier"](spark, sf_dir).collect()
    for r in rows:
        # keep = sign of the EXACT rational logit; the integer
        # micro-logit is floor(1e6*logit), so keep==1 implies
        # logit_micro >= 0 and keep==0 implies logit_micro <= 0
        # (floor of a negative rational can land on 0 only at 0).
        if r.keep == 1:
            assert r.logit_micro >= 0
        else:
            assert r.logit_micro <= 0
