"""Unit pins for the round-4 session-4 operators: partition
invariance of the new global-ordering consumers, the audio-VAD
closed form, and mm14's pigeonhole-lossless Hamming banding."""

import itertools

import pytest

import __spark_entry__ as entrymod


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# partition invariance: outputs must not depend on input layout
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["t30_growth_streaks", "graph_random_walks", "stats_mannwhitney"],
)
def test_partition_invariance_via_shuffle_partitions(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    a = _rows(fn(spark, sf_dir))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


# ---------------------------------------------------------------------------
# audio VAD closed form
# ---------------------------------------------------------------------------


def test_audio_vad_silent_prefix_closed_form(spark):
    from hi_csa_db_spark.operators.multimodal import audio_vad

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    got = {r["media_id"]: r for r in audio_vad(docs).collect()}
    for i in range(8):
        s = 1 + i % 4
        r = got[i]
        assert r["n_frames"] == 8
        assert r["silent_frames"] == s, i
        assert r["active_frames"] == 8 - s
        assert r["first_active_frame"] == s
        assert r["speech_ratio_micro"] == (8 - s) * 1000000 // 8


# ---------------------------------------------------------------------------
# mm14: banding at hamming <= 3 is lossless (pigeonhole) vs brute force
# ---------------------------------------------------------------------------


def _phash(k: int) -> int:
    h = 0
    for y in range(8):
        for x in range(7):
            if ((k * 31 + (x + 1) * 7 + y * 13) % 256) > (
                (k * 31 + x * 7 + y * 13) % 256
            ):
                h |= 1 << (y * 7 + x)
    return h


def test_phash_banding_lossless_at_threshold_3():
    hashes = sorted({_phash(k) for k in range(50)})
    brute = set()
    for a, b in itertools.combinations(hashes, 2):
        if bin(a ^ b).count("1") <= 3:
            brute.add((a, b))
    banded = set()
    for a, b in itertools.combinations(hashes, 2):
        x = a ^ b
        if any(((x >> (14 * i)) & 16383) == 0 for i in range(4)) and bin(
            x
        ).count("1") <= 3:
            banded.add((a, b))
    assert banded == brute and brute  # lossless AND non-vacuous


def test_mm14_matches_brute_force(spark, sf_dir):
    got = {
        (r["phash_a"], r["phash_b"])
        for r in entrymod.queries()["mm14_phash_neardup"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = [r[0] for r in docs.select("doc_id").collect()]
    hashes = sorted({_phash(i % 50) for i in ids})
    want = {
        (a, b)
        for a, b in itertools.combinations(hashes, 2)
        if bin(a ^ b).count("1") <= 3
    }
    assert got == want


# ---------------------------------------------------------------------------
# Corpus API: weight_soft_dedup().plan_length_batches() == pipe_v6
# ---------------------------------------------------------------------------


def test_corpus_soft_weight_batch_plan_equals_pipe_v6(spark, sf_dir):
    from hi_csa_db_spark.corpus import Corpus

    api = _rows(
        Corpus.load(spark, sf_dir).weight_soft_dedup().plan_length_batches()
    )
    query = _rows(entrymod.queries()["pipe_training_prep_v6"](spark, sf_dir))
    assert api == query


# ---------------------------------------------------------------------------
# dq10: the fixture key space is dense (0 gaps is the RIGHT answer there —
# verified by the oracle); prove detection on synthetic gappy ids
# ---------------------------------------------------------------------------


def test_sequence_gap_islands_detect_synthetic_gaps(spark):
    from pyspark.sql import functions as F

    from hi_csa_db_spark.operators import ordered

    ids = [1, 2, 3, 7, 8, 20, 21, 22, 40]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    r = ordered.global_row_numbers(df, "id")
    isl = (
        r.select((F.col("id") - F.col("rank")).alias("grp"), "id")
        .groupBy("grp")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
    )
    ir = ordered.global_row_numbers(isl.select("lo", "hi"), "lo")
    succ = ir.select((F.col("rank") - 1).alias("rank"), F.col("lo").alias("next_lo"))
    gaps = sorted(
        (r["hi"], r["next_lo"], r["next_lo"] - r["hi"] - 1)
        for r in ir.join(succ, "rank").collect()
    )
    assert gaps == [(3, 7, 3), (8, 20, 11), (22, 40, 17)]


# ---------------------------------------------------------------------------
# x66: a pair-free corpus must still emit all four threshold rows
# ---------------------------------------------------------------------------


def test_threshold_sensitivity_pair_free_corpus(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta", "en", "s0", 30),
            (1, "one two three four five six seven", "en", "s1", 30),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = entrymod.queries()["x66_threshold_sensitivity"](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 4
    assert all(r["n_pairs"] == 0 and r["doc_slots"] == 0 for r in out)


# ---------------------------------------------------------------------------
# a14/w11 grouped-quantile machinery vs a brute-force python oracle
# ---------------------------------------------------------------------------


def test_grouped_median_offsets_match_bruteforce(spark):
    import random

    from pyspark.sql import functions as F

    from hi_csa_db_spark.operators import ordered

    rng = random.Random(11)
    rows = [
        (f"g{rng.randint(0, 3)}", rng.randint(1, 40) * 100)
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "pri string, cents long")
    byv = df.groupBy("pri", "cents").agg(F.count(F.lit(1)).alias("ct"))
    keyed = byv.select(
        F.struct(F.col("pri").alias("p"), F.col("cents").alias("c")).alias("__k"),
        "pri", "cents", "ct",
    )
    g = ordered.global_prefix_sums(keyed, "__k", ["ct"])
    tots = byv.groupBy("pri").agg(F.sum("ct").alias("tot"))
    offs = (
        tots.alias("a")
        .join(F.broadcast(tots.alias("b")), F.col("b.pri") < F.col("a.pri"), "left")
        .groupBy(F.col("a.pri").alias("pri"), F.col("a.tot").alias("tot"))
        .agg(F.coalesce(F.sum("b.tot"), F.lit(0)).alias("off"))
    )
    wg = g.join(F.broadcast(offs), "pri").select(
        "pri", "cents", "tot", (F.col("cum_ct") - F.col("off")).alias("cw")
    )
    got = {
        r["pri"]: r["m"]
        for r in wg.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy("pri")
        .agg(F.min("cents").alias("m"))
        .collect()
    }
    # brute force: lower median = element at index ceil(n/2)-1 of the
    # sorted values (the smallest v with 2*rank(v) >= n)
    import collections

    vals = collections.defaultdict(list)
    for p, c in rows:
        vals[p].append(c)
    want = {
        p: sorted(v)[(len(v) + 1) // 2 - 1] for p, v in vals.items()
    }
    assert got == want
