"""Scale-guard property tests for the hot-key quadratic paths
(round-1 verdict items 4-5): jaccard_pairs' document-frequency cap
and the length-banded edit-distance join."""

import pytest
from pyspark.sql import functions as F

from hi_csa_db_spark.operators import dedup


def test_hot_shingle_corpus_emits_no_candidates(spark):
    # 60 identical single-shingle docs: unguarded, the inverted-index
    # self-join would emit 60*59/2 pairs from ONE shingle; with the df
    # cap the hot shingle never enters candidate generation.
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma").alias("text")
    )
    sh = dedup.shingles(docs, n=3)
    guarded = dedup.jaccard_pairs(sh, max_df=10)
    assert guarded.count() == 0


def test_df_cap_keeps_jaccard_exact_over_full_sets(spark):
    # docs share one hot shingle (df=4 > cap) and pairwise rare ones;
    # candidates come only from rare shingles but the SCORE must still
    # count the hot shingle — full-set verify, not capped-set verify.
    rows = [
        (1, "common base phrase unique alpha one"),
        (2, "common base phrase unique alpha two"),
        (3, "common base phrase other beta one"),
        (4, "totally different words entirely here now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dedup.shingles(docs, n=3)
    guarded = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(sh, max_df=3).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(sh).collect()
    }
    for pair, j in guarded.items():
        assert j == pytest.approx(exact[pair]), pair


def test_candidate_rows_bounded_by_df_cap(spark):
    # the guard's contract: candidate pairs <= sum over kept shingles
    # of df^2 — a skewed corpus cannot blow past n_shingles * cap^2.
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shared shingle text plus word "), F.col("id").cast("string")).alias("text"),
    )
    sh = dedup.shingles(docs, n=3)
    cap = 5
    kept = (
        sh.groupBy("shingle").count().filter(F.col("count") <= cap)
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    ) or 0
    pairs = dedup.jaccard_pairs(sh, max_df=cap)
    assert pairs.count() <= kept


def test_hashed_candidates_match_string_candidates(spark):
    # r13: jaccard_pairs_hashed runs the whole max_df pipeline over a
    # 64-bit hashed inverted index — candidate set AND scores must
    # match the string operator for every max_df on a
    # hash-collision-free corpus (the fixtures were verified
    # collision-free at every SF).
    rows = [
        (1, "common base phrase unique alpha one"),
        (2, "common base phrase unique alpha two"),
        (3, "common base phrase other beta one"),
        (4, "totally different words entirely here now"),
        (5, "common base phrase unique alpha one extra"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dedup.shingles(docs, n=3)
    arrs = dedup.shingle_arrays(docs, n=3)
    for cap in (2, 3, 100):
        hashed = {
            (r["id_a"], r["id_b"]): (r["inter_cnt"], r["jaccard"])
            for r in dedup.jaccard_pairs_hashed(arrs, max_df=cap).collect()
        }
        stringy = {
            (r["id_a"], r["id_b"]): (r["inter_cnt"], r["jaccard"])
            for r in dedup.jaccard_pairs(sh, max_df=cap).collect()
        }
        assert set(hashed) == set(stringy), cap
        for pair, (ic, j) in hashed.items():
            assert ic == stringy[pair][0], (cap, pair)
            assert j == pytest.approx(stringy[pair][1]), (cap, pair)


def test_hashed_hot_shingle_corpus_emits_no_candidates(spark):
    # hashed twin of the df-cap guard: 60 identical docs, every
    # shingle hot, zero candidate pairs.
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma").alias("text")
    )
    arrs = dedup.shingle_arrays(docs, n=3)
    assert dedup.jaccard_pairs_hashed(arrs, max_df=10).count() == 0


def test_hashed_hot_shingle_never_reaches_collect_set_in_plan(spark):
    # bounded-memory contract carries over: the LeftAnti join must sit
    # below the collect_set aggregate in the hashed operator too.
    rows = [(i, "hot hot hot hot filler unique%d word" % i) for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    arrs = dedup.shingle_arrays(docs, n=3)
    pairs = dedup.jaccard_pairs_hashed(arrs, max_df=5)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan
    assert "xxhash64" in plan


def test_edit_distance_pairs_equals_unblocked_join(spark):
    vals = [
        ("kitten",), ("sitting",), ("kitchen",), ("mitten",),
        ("a",), ("ab",), ("abcde",), ("abcdefghij",), ("zzzzzzzzzzzzzzz",),
    ]
    df = spark.createDataFrame(vals, ["source"])
    banded = {
        (r["src_a"], r["src_b"], r["dist"])
        for r in dedup.edit_distance_pairs(df, "source", max_dist=4).collect()
    }
    s = df.select("source").distinct()
    a = s.select(F.col("source").alias("src_a"))
    b = s.select(F.col("source").alias("src_b"))
    unblocked = {
        (r["src_a"], r["src_b"], r["dist"])
        for r in a.join(b, F.col("src_a") < F.col("src_b"))
        .select("src_a", "src_b", F.levenshtein("src_a", "src_b").alias("dist"))
        .filter(F.col("dist") <= 4)
        .collect()
    }
    assert banded == unblocked


def test_hot_shingle_never_reaches_collect_set_in_plan(spark):
    """VERDICT r3 item 3: the df cap must live in the PLAN, not the
    docs — collect_set may only aggregate the anti-joined (rare-only)
    shingle stream, so no group can materialize an unbounded doc set
    at fleet scale. Assert the optimized plan puts a LeftAnti join
    below the set aggregate, and value-exactness survives with an
    ultra-hot shingle present."""
    rows = [(i, "hot hot hot hot filler unique%d word" % i) for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = dedup.shingles(docs, n=3)
    pairs = dedup.jaccard_pairs(sh, max_df=5)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in plan
    # and the guard stays value-exact: guarded scores == unguarded
    guarded = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(sh).collect()
    }
    for pair, j in guarded.items():
        assert j == pytest.approx(exact[pair]), pair
