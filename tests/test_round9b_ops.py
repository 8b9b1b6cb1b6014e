"""Round-9 continuation-session operator properties.

Targeted invariants for the session's additions, beyond the oracle
value checks: bloom filters never false-negative, KMV estimates are
merge-consistent, the decision stump's one-pass argmin equals brute
force, decay folding is exact at the reference day, incremental
top-k equals the full recompute under adversarial deltas, and the
KN smoother stays normalized on a fresh corpus shape.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def _q(name):
    return entrymod.queries()[name]


def test_bloom_skipping_never_false_negative(spark, sf_dir):
    """files_maybe >= files_actual for every probe — a bloom filter
    may over-approximate membership but can never miss a resident
    key (the one-sided contract the whole skipping audit rests on)."""
    rows = _q("u31_bloom_skipping")(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["files_maybe"] >= r["files_actual"], r
        assert 0 <= r["skip_bps"] <= 10000
    absent = [r for r in rows if r["probe_key"] == 999983][0]
    assert absent["files_actual"] == 0


def test_kmv_merged_estimate_bounded_by_parts(spark, sf_dir):
    """The ALL_MERGED KMV estimate covers the union: it is at least
    the largest per-source estimate (a union can't be smaller than
    any part), and every sketch row keeps est >= sketch_n (the kth
    minimum can't imply fewer values than the sketch holds)."""
    rows = _q("a22_kmv_distinct")(spark, sf_dir).collect()
    per = {r["scope"]: r for r in rows}
    merged = per.pop("ALL_MERGED")
    assert merged["est_distinct"] >= max(
        r["est_distinct"] for r in per.values()
    ) * 0.8  # estimator noise guard: union >= part modulo k=64 error
    for r in rows:
        assert r["est_distinct"] >= r["exact_distinct"] * 0.5
        assert r["est_distinct"] <= r["exact_distinct"] * 2


def test_decision_stump_argmin_matches_bruteforce(spark, sf_dir):
    """The one-pass conditional-agg split search picks the same
    threshold a per-threshold brute force would: recompute the
    weighted micro-Gini for the flagged row from its own counts."""
    rows = _q("ml_decision_stump")(spark, sf_dir).collect()
    assert len(rows) == 15

    def gini(r):
        n_l, p_l, n_r, p_r = (
            r["n_left"], r["pos_left"], r["n_right"], r["pos_right"]
        )
        pl = p_l * 1000000 // max(n_l, 1)
        pr = p_r * 1000000 // max(n_r, 1)
        return (
            2 * pl * (1000000 - pl) // 1000000 * n_l
            + 2 * pr * (1000000 - pr) // 1000000 * n_r
        ) // (n_l + n_r)

    best = min(gini(r) for r in rows)
    for r in rows:
        assert r["gini_micro"] == gini(r)
        assert r["is_best"] == (1 if gini(r) == best else 0)


def test_decayed_counts_reference_day_weight_is_unity(spark):
    """A user whose events all land on the reference (max) day gets
    decayed_micro == total_events * 1e6 — decay weight 1 at d=0 —
    while a user one half-life back gets exactly half (500000/event,
    the table's d=7 entry)."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        df = spark.createDataFrame(
            [
                # user 1: 3 events on the last day (epoch day 19760)
                (1, 1, "2024-02-08 12:00:00", "view", 1.0, "{}"),
                (2, 1, "2024-02-08 13:00:00", "view", 1.0, "{}"),
                (3, 1, "2024-02-08 14:00:00", "view", 1.0, "{}"),
                # user 2: 2 events exactly 7 days earlier
                (4, 2, "2024-02-01 12:00:00", "view", 1.0, "{}"),
                (5, 2, "2024-02-01 13:00:00", "view", 1.0, "{}"),
            ],
            "event_id long, user_id long, ts_s string, event_type string,"
            " value double, props string",
        ).select(
            "event_id",
            F.to_timestamp("ts_s").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        df.write.parquet(os.path.join(td, "events.parquet"))
        rows = {
            r["user_id"]: r
            for r in _q("a23_decayed_counts")(spark, td).collect()
        }
        assert rows[1]["decayed_micro"] == 3 * 1000000
        assert rows[2]["decayed_micro"] == 2 * 500000


def test_incremental_topk_agrees_with_full_recompute(spark, sf_dir):
    """Every rank row carries agree=1: the candidate-set maintenance
    (old top-k union delta users) reproduces the full recompute
    exactly — the insert-only soundness argument, checked on data."""
    rows = _q("u32_incremental_topk")(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["agree"] == 1 for r in rows)
    assert [r["rnk"] for r in rows] == list(range(1, 11))


def test_kneser_ney_normalizes_on_fresh_corpus(spark):
    """sum over w2 of P_KN(w2|w1) stays within floor-rounding of 1
    on a corpus the query never saw — normalization is a property of
    the smoother, not of the fixture."""
    import tempfile, os

    docs = [
        (1, "a b a c a b", "en", "src0", 11),
        (2, "b c b a", "en", "src0", 7),
        (3, "c a c b c", "en", "src0", 9),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = _q("x96_kneser_ney_mass")(spark, td).collect()
        assert rows, "contexts expected"
        for r in rows:
            # vocab here is 3 words; each p_micro floor loses < 1 micro
            assert 1000000 - 3 <= r["sum_pkn_micro"] <= 1000000, r


def test_pca_power_eigenvector_on_planted_component(spark):
    """Vectors constructed as t * e0 + small noise-free spread along
    dim 0 make dim 0 the dominant eigen-direction: the returned
    v_micro must peak (in absolute value) at dim 0."""
    import tempfile, os

    vecs = []
    for i in range(40):
        v = [0.0] * 64
        v[0] = 0.5 if i % 2 == 0 else -0.5  # strong variance on dim 0
        v[1] = 0.01 if i % 4 == 0 else 0.0  # trace variance elsewhere
        vecs.append((i, v, 0))
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        rows = _q("ml_pca_power")(spark, td).collect()
        assert len(rows) == 64
        by_dim = {r["dim"]: abs(r["v_micro"]) for r in rows}
        assert by_dim[0] == max(by_dim.values())
        assert by_dim[0] == 1000000  # normalized peak


def test_cms_stream_estimate_never_underestimates(spark, sf_dir):
    """CMS point estimates are one-sided: cms_est >= exact_cnt for
    every probed heavy hitter (min over rows of sums of counts can
    lose nothing, only gain collisions)."""
    rows = _q("stream_cms_topk")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["over_bps"] >= 0
