"""MIPS norm-augmentation reduction (similarity.mips_augment /
mips_ivf_topk): the algebraic invariants the s15 oracle relies on."""

import math
import random

from pyspark.sql import functions as F

from hi_csa_db_spark.functions.vectors import dot
from hi_csa_db_spark.operators import similarity


def _vectors(spark, n=40, dim=8, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-2.0, 2.0) * (1 + i % 5) for _ in range(dim)])
        for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        rows,
    )


def test_augmented_vectors_share_one_norm(spark):
    """After augmentation every corpus vector's squared norm equals
    M^2 = max |x|^2 (to rounding) — the property that makes augmented
    cosine monotone in the inner product."""
    emb, rows = _vectors(spark)
    aug = similarity.mips_augment(emb)
    norms = {
        r.vec_id: r.n2
        for r in aug.select(
            "vec_id", F.round(dot(F.col("__aug"), F.col("__aug")), 3).alias("n2")
        ).collect()
    }
    m2 = round(max(sum(x * x for x in v) for _, v in rows), 3)
    for vid, n2 in norms.items():
        assert abs(n2 - m2) < 1e-2, (vid, n2, m2)


def test_bucketed_mips_matches_brute_force_on_probed_buckets(spark):
    """With n_probe = n_centroids (every bucket probed) the bucketed
    path must return EXACTLY the brute-force inner-product top-k."""
    emb, rows = _vectors(spark)
    got = similarity.mips_ivf_topk(
        emb, query_id=0, k=5, n_centroids=4, n_probe=4
    ).collect()
    q = rows[0][1]
    truth = sorted(
        (
            (round(sum(a * b for a, b in zip(v, q)), 6), -i)
            for i, v in rows
            if i != 0
        ),
        reverse=True,
    )[:5]
    assert [r.vec_id for r in got] == [-negid for _, negid in truth]
    assert [r.dot for r in got] == [d for d, _ in truth]


def test_bucketed_mips_is_subset_of_scored_corpus(spark):
    """With partial probing results are a subset of the corpus minus
    the query, ranked by descending dot — never an invented id."""
    emb, rows = _vectors(spark)
    got = similarity.mips_ivf_topk(
        emb, query_id=0, k=5, n_centroids=4, n_probe=1
    ).collect()
    ids = [r.vec_id for r in got]
    assert 0 not in ids
    assert set(ids) <= {i for i, _ in rows}
    dots = [r.dot for r in got]
    assert dots == sorted(dots, reverse=True)


def test_mips_and_cosine_rank_differently_under_norm_spread(spark):
    """The reason MIPS exists: with spread norms the inner-product
    ranking need not equal the cosine ranking (norm-insensitive)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),  # well-aligned, small norm
        (2, [8.0, 6.0, 0.0, 0.0]),  # less aligned, large norm
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mips = similarity.mips_ivf_topk(
        emb, query_id=0, k=1, n_centroids=2, n_probe=2
    ).collect()
    cos = similarity.cosine_topk(emb, query_id=0, k=1).collect()
    assert mips[0].vec_id == 2  # dot: 8.0 beats 0.9
    assert cos[0].vec_id == 1  # cosine: alignment beats magnitude


def test_ivf_assign_map_matches_ivf_assign(spark):
    """ivf_assign_map (r12 fused, no corpus shuffle) must reproduce
    ivf_assign's assignment EXACTLY — same argmax, same
    smallest-centroid-id tie-break — and pass the vector column
    through unchanged. Random non-unit-norm vectors, so the equality
    is structural, not a fixture accident."""
    emb, rows = _vectors(spark, n=60, dim=8, seed=13)
    cents = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    base = {
        r["vec_id"]: r["centroid_id"]
        for r in similarity.ivf_assign(emb, cents).collect()
    }
    fused = similarity.ivf_assign_map(emb, cents).collect()
    assert len(fused) == len(rows)
    by_id = dict(rows)
    for r in fused:
        assert r["centroid_id"] == base[r["vec_id"]]
        assert r["embedding"] == by_id[r["vec_id"]]


def test_ivf_assign_map_empty_centroids_yields_zero_rows(spark):
    """r13 (ADVICE r12): the empty-centroid degenerate case must match
    ivf_assign exactly — zero output rows, not NULL assignments."""
    emb, _ = _vectors(spark, n=10, dim=8, seed=7)
    cents = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    assert similarity.ivf_assign(emb, cents).count() == 0
    assert similarity.ivf_assign_map(emb, cents).count() == 0
