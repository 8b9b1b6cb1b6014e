"""Dedup + similarity operators on crafted near-duplicate corpora."""

from pyspark.sql import functions as F

from hi_csa_db_spark.operators import dedup, similarity


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    other = "completely different content about spark window aggregation plans here now"
    return spark.createDataFrame(
        [(0, base), (1, near), (2, other), (3, base)],
        "doc_id long, text string",
    )


def test_exact_dedup(spark):
    df = _corpus(spark)
    out = dedup.exact_dedup(df, keys=["text"], id_col="doc_id")
    rows = {r.doc_id: r.dup_count for r in out.collect()}
    assert rows[0] == 2  # docs 0 and 3 identical, min id kept
    assert out.count() == 3


def test_minhash_lsh_finds_near_dups(spark):
    pairs = dedup.minhash_lsh_dedup(_corpus(spark), threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 3) in got  # identical docs always collide
    assert (0, 1) in got or (1, 3) in got  # near-dup found
    assert all({a, b} != {0, 2} for a, b in got)  # unrelated not paired


def test_jaccard_identical_docs_is_one(spark):
    sh = dedup.shingles(_corpus(spark))
    pairs = dedup.jaccard_pairs(sh)
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert jac[(0, 3)] == 1.0


def test_simhash_near_dups_have_small_hamming(spark):
    out = {r.doc_id: r.simhash for r in dedup.simhash(_corpus(spark)).collect()}
    assert out[0] == out[3]
    ham_near = bin(out[0] ^ out[1]).count("1")
    ham_far = bin(out[0] ^ out[2]).count("1")
    assert ham_near < ham_far


def _embeddings(spark):
    import math

    rows = []
    for i in range(30):
        angle = (i % 10) / 10 * math.pi / 2
        rows.append((i, [math.cos(angle), math.sin(angle), 0.1 * (i % 3), 1.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_self_similarity(spark):
    emb = _embeddings(spark)
    out = similarity.cosine_topk(emb, query_id=0, k=5)
    rows = out.collect()
    assert len(rows) == 5
    # vectors with the same angle/offset pattern as vec 0 rank first
    assert rows[0].cos_sim > 0.99


def test_ivf_topk_returns_k_and_subset_of_bruteforce_buckets(spark):
    emb = _embeddings(spark)
    out = similarity.ivf_topk(emb, query_id=0, k=5, n_centroids=4, n_probe=2)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert all(r.vec_id != 0 for r in rows)


def test_kmeans_partitions_corpus(spark, sf_dir):
    from hi_csa_db_spark.catalog import load_table
    from hi_csa_db_spark.operators.similarity import kmeans_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    clusters = kmeans_clusters(emb, k=8, iterations=2).collect()
    assert len(clusters) <= 8
    assert sum(r.n_members for r in clusters) == n
    assert all(r.n_members > 0 for r in clusters)


def test_band_plan_table_matches_closed_form(spark):
    """band_plan_table's integer micro-probabilities must equal the
    closed form floor(1e6*(1-(1-j^r)^b)+0.5) computed in Python (same
    repeated-squaring order), for every geometry of a 16-hash budget."""
    from hi_csa_db_spark.operators.dedup import band_plan_table

    rows = band_plan_table(spark, num_hashes=16, grid=20).collect()
    assert len(rows) == 5 * 19  # 5 geometries x 19 grid points
    for r in rows:
        j = r["i"] / 20
        jr = j
        k = r["rows_per_band"]
        while k > 1:
            jr *= jr
            k //= 2
        y = 1.0 - jr
        b = r["bands"]
        while b > 1:
            y *= y
            b //= 2
        import math

        want = math.floor((1.0 - y) * 1000000 + 0.5)
        assert r["p_micro"] == want, (r["bands"], r["rows_per_band"], r["i"])


def test_band_plan_table_monotone_and_bounded(spark):
    """For a fixed geometry, P(candidate) is nondecreasing in jaccard
    and stays in [0, 1e6]; num_hashes must be a power of two."""
    import pytest as _pytest

    from hi_csa_db_spark.operators.dedup import band_plan_table

    rows = band_plan_table(spark, num_hashes=8, grid=10).collect()
    by_geo = {}
    for r in rows:
        by_geo.setdefault((r["bands"], r["rows_per_band"]), []).append(
            (r["i"], r["p_micro"])
        )
    assert set(by_geo) == {(8, 1), (4, 2), (2, 4), (1, 8)}
    for pts in by_geo.values():
        pts.sort()
        ps = [p for _, p in pts]
        assert all(0 <= p <= 1000000 for p in ps)
        assert ps == sorted(ps)
    with _pytest.raises(ValueError):
        band_plan_table(spark, num_hashes=12)
