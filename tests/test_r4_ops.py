"""Round-4 (second session) operator tests: PQ ANN + recall audit."""

import pytest
from pyspark.sql import functions as F

from hi_csa_db_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<float>"
    )


def test_pq_anchor_vector_has_zero_distance(spark):
    """A corpus vector identical to the query quantizes to the same
    codes, so its ADC distance is exactly 0 and it ranks first."""
    import random

    rng = random.Random(7)
    dim = 16
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(1, 30)]
    q = rows[4][1]  # vec 5's vector, duplicated as the query (id 0)
    emb = _emb(spark, [(0, q)] + rows)
    out = similarity.pq_topk(
        emb, query_id=0, k=5, candidates=10, n_sub=4, n_cent=8
    ).collect()
    assert out[0]["vec_id"] == 5
    assert out[0]["approx_dist_micro"] == 0
    assert out[0]["cos_sim"] == 1.0


def test_pq_codes_match_numpy_argmin(spark):
    """PQ candidate ordering equals a numpy replay of the anchor
    codebook -> argmin encode -> ADC lookup pipeline."""
    import numpy as np

    rng = np.random.default_rng(11)
    dim, n_sub, n_cent = 16, 4, 8
    vecs = rng.uniform(-1, 1, size=(40, dim)).astype(np.float32)
    emb = _emb(spark, [(i, list(map(float, v))) for i, v in enumerate(vecs)])

    cb = vecs[1 : n_cent + 1]  # anchors: ids 1..n_cent
    dp = dim // n_sub

    def dists_micro(v):
        out = []
        for m in range(n_sub):
            for j in range(n_cent):
                d = 0.0
                for i in range(dp):
                    t = float(v[m * dp + i]) - float(cb[j][m * dp + i])
                    d += t * t
                out.append(int(np.floor(d * 1_000_000)))
        return out

    codes = {}
    for vid, v in enumerate(vecs):
        dm = dists_micro(v)
        codes[vid] = [
            min(range(n_cent), key=lambda j: (dm[m * n_cent + j], j))
            for m in range(n_sub)
        ]
    qd = dists_micro(vecs[0])
    approx = {
        vid: sum(qd[m * n_cent + codes[vid][m]] for m in range(n_sub))
        for vid in codes
        if vid != 0
    }
    want = sorted(approx, key=lambda vid: (approx[vid], vid))[:12]

    got = (
        similarity.pq_topk(
            emb, query_id=0, k=12, candidates=12, n_sub=n_sub, n_cent=n_cent
        )
        .select("vec_id", "approx_dist_micro")
        .collect()
    )
    assert {r["vec_id"] for r in got} == set(want)
    for r in got:
        assert r["approx_dist_micro"] == approx[r["vec_id"]]


def test_pq_full_candidates_equals_bruteforce_topk(spark):
    """With candidates = corpus size, PQ's rerank IS the brute-force
    cosine top-k (the sketch prunes candidates, never the answer)."""
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    emb = _emb(spark, rows)
    exact = similarity.cosine_topk(emb, query_id=0, k=5).collect()
    pq = similarity.pq_topk(
        emb, query_id=0, k=5, candidates=39, n_sub=4, n_cent=8
    ).collect()
    assert [r["vec_id"] for r in pq] == [r["vec_id"] for r in exact]
    assert [r["cos_sim"] for r in pq] == [r["cos_sim"] for r in exact]


def test_ann_recall_report_counts(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["s9_ann_recall_report"](spark, sf_dir).collect()
    by_fam = {r["family"]: r for r in rows}
    assert set(by_fam) == {"ivf", "sq8", "pq"}
    for r in rows:
        assert 0 <= r["n_hits"] <= r["k_returned"] <= 10
        assert r["recall_pct"] == r["n_hits"] * 10


def test_sssp_hand_computed(spark):
    """Diamond graph with a tempting-but-heavier direct edge."""
    from hi_csa_db_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 2), (3, 2, 3), (2, 4, 1), (3, 4, 100), (5, 6, 1)],
        "src long, dst long, w long",
    )
    got = {r["id"]: r["dist"] for r in graph.sssp(edges, source=1, iterations=3).collect()}
    # 1->3 = 2; 1->3->2 = 5 (beats direct 10); 1->3->2->4 = 6 (beats 102)
    assert got == {1: 0, 2: 5, 3: 2, 4: 6}


def test_sssp_parallel_edges_collapse_to_min(spark):
    from hi_csa_db_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2, 7), (1, 2, 4), (2, 3, 1)], "src long, dst long, w long"
    )
    got = {r["id"]: r["dist"] for r in graph.sssp(edges, source=1, iterations=2).collect()}
    assert got == {1: 0, 2: 4, 3: 5}


def test_ivf_container_roundtrip_and_validation():
    from hi_csa_db_spark.functions import codecs

    frames = [(0, b"k" * 20), (40, b"p" * 7), (80, b"")]
    p = codecs.encode_ivf(frames, 320, 180, fourcc=b"VP90", timebase=(1, 30))
    d = codecs.parse_ivf(p)
    assert d["fourcc"] == b"VP90"
    assert (d["width"], d["height"]) == (320, 180)
    assert d["timebase"] == (1, 30)
    assert d["frames"] == frames
    assert len(p) == 32 + sum(12 + len(b) for _, b in frames)

    import pytest as _pytest

    with _pytest.raises(codecs.UnsupportedMedia):
        codecs.parse_ivf(b"RIFF" + p[4:])  # bad magic
    with _pytest.raises(codecs.UnsupportedMedia):
        codecs.parse_ivf(p[:-3])  # truncated payload


def test_video_frame_stats_sampling(spark, sf_dir):
    from hi_csa_db_spark.operators.multimodal import video_frame_stats
    from hi_csa_db_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    rows = video_frame_stats(docs).collect()
    assert all(r["parse_ok"] == 1 for r in rows)
    for r in rows:
        assert r["n_frames"] == 3 + r["media_id"] % 5
        assert r["sampled_frames"] == (r["n_frames"] + 1) // 2
        assert r["container_bytes"] == 32 + 12 * r["n_frames"] + r["payload_bytes"]


def test_column_profile_nulls_and_distinct(spark):
    from hi_csa_db_spark.operators.expectations import column_profile
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x int, s string"
    )
    out = {
        r["column"]: r
        for r in column_profile(
            df,
            [
                ("x", F.col("x"), lambda c: c.cast("string")),
                ("s", F.col("s"), lambda c: c.cast("string")),
            ],
        ).collect()
    }
    assert out["x"]["n_rows"] == 4 and out["x"]["n_null"] == 1
    assert out["x"]["n_distinct"] == 3
    assert out["x"]["min_val"] == "1" and out["x"]["max_val"] == "3"
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_val"] == "a" and out["s"]["max_val"] == "b"


def test_tokenizer_fertility_empty_text_guard(spark):
    from hi_csa_db_spark.operators.textstats import tokenizer_fertility

    df = spark.createDataFrame(
        [(1, "xx", ""), (2, "xx", ""), (3, "yy", "one two three")],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    # zero whitespace/regex tokens must yield NULL ratios, not a crash
    assert out["xx"]["ws_tokens"] == 0
    assert out["xx"]["fertility_micro"] is None
    assert out["xx"]["bytes_per_token_micro"] is None
    assert out["yy"]["fertility_micro"] == 1_000_000  # 3 pieces / 3 words


def test_ivfpq_probe_all_equals_pq(spark):
    """With every coarse list probed, IVFPQ's pruning is a no-op and
    the result must equal plain PQ (same codebook, same ADC)."""
    import random

    rng = random.Random(19)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    emb = _emb(spark, rows)
    pq = similarity.pq_topk(
        emb, query_id=0, k=8, candidates=20, n_sub=4, n_cent=8
    ).collect()
    ivfpq = similarity.ivfpq_topk(
        emb,
        query_id=0,
        k=8,
        candidates=20,
        n_centroids=4,
        n_probe=4,  # probe ALL lists
        n_sub=4,
        n_cent=8,
    ).collect()
    assert [tuple(r) for r in ivfpq] == [tuple(r) for r in pq]


def test_ivfpq_members_come_from_probed_buckets(spark):
    """Every IVFPQ result id must belong to one of the probed lists."""
    import random

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)]
    emb = _emb(spark, rows)
    from pyspark.sql import functions as F

    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in similarity.ivf_assign(emb, cents).collect()
    }
    out = similarity.ivfpq_topk(
        emb, query_id=0, k=8, candidates=20, n_centroids=4, n_probe=2,
        n_sub=4, n_cent=8,
    ).collect()
    probed = {assigned[r["vec_id"]] for r in out}
    assert len(probed) <= 2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


_vec = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=8,
    max_size=8,
).filter(lambda v: any(abs(x) > 1e-3 for x in v))  # cosine needs norm > 0
_corpus = st.lists(_vec, min_size=10, max_size=18)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(_corpus)
def test_pq_prunes_candidates_never_answers(spark, vecs):
    """Property: with candidates = corpus size, PQ returns exactly the
    brute-force cosine top-k — the sketch prunes candidate generation,
    never the final ranking (the a11/a13 exactness contract)."""
    emb = _emb(spark, list(enumerate(vecs)))
    k = 4
    exact = similarity.cosine_topk(emb, query_id=0, k=k).collect()
    pq = similarity.pq_topk(
        emb, query_id=0, k=k, candidates=len(vecs) - 1, n_sub=2, n_cent=4
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in pq] == [
        (r["vec_id"], r["cos_sim"]) for r in exact
    ]


_wedges = st.lists(
    st.tuples(
        st.integers(1, 6), st.integers(1, 6), st.integers(1, 20)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(_wedges)
def test_sssp_matches_bellman_ford_reference(spark, edges):
    """Property: graph.sssp equals a literal Bellman-Ford reference
    loop with the same bounded round count, on random small graphs."""
    from hi_csa_db_spark.operators import graph

    rounds = 3
    dist = {1: 0}
    emap = {}
    for s, d, w in edges:
        emap[(s, d)] = min(w, emap.get((s, d), w))
    for _ in range(rounds):
        nxt = dict(dist)
        for (s, d), w in emap.items():
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["id"]: r["dist"] for r in graph.sssp(df, source=1, iterations=rounds).collect()}
    assert got == dist


def test_bloom_float_vs_int_keys_no_false_negatives(spark):
    """Equal VALUES with different numeric types (int build, double
    probe) must agree through the canonical key form — a plain string
    cast renders 1 vs 1.0 and silently drops present keys."""
    from pyspark.sql import functions as F

    from hi_csa_db_spark.operators.bloomjoin import bloom_semi_join

    probe = spark.range(0, 500).select(F.col("id").cast("double").alias("k"))
    keys = spark.range(0, 500, 7).select(F.col("id").cast("int").alias("kk"))
    got = sorted(int(r.k) for r in bloom_semi_join(probe, keys, "k", "kk").collect())
    assert got == list(range(0, 500, 7))


def test_bloom_decimal_vs_bigint_keys_no_false_negatives(spark):
    from pyspark.sql import functions as F

    from hi_csa_db_spark.operators.bloomjoin import bloom_semi_join

    probe = spark.range(0, 300).select(F.col("id").cast("decimal(10,2)").alias("k"))
    keys = spark.range(0, 300, 11).select(F.col("id").alias("kk"))
    got = sorted(int(r.k) for r in bloom_semi_join(probe, keys, "k", "kk").collect())
    assert got == list(range(0, 300, 11))


def test_mst_boruvka_hand_computed(spark):
    """Two triangles bridged by one heavy edge: round 1 hooks each
    node's cheapest edge; round 2 adds the bridge between the merged
    components. Total selected = the true MST."""
    from hi_csa_db_spark.operators import graph

    edges = spark.createDataFrame(
        [
            (1, 2, 1), (2, 3, 2), (1, 3, 9),       # triangle A
            (4, 5, 1), (5, 6, 2), (4, 6, 9),       # triangle B
            (3, 4, 5),                              # the bridge
        ],
        "src long, dst long, w long",
    )
    rows = graph.mst_boruvka(edges, rounds=2, cc_iterations=3).collect()
    by_round = {}
    for r in rows:
        by_round.setdefault(r["round"], set()).add((r["a"], r["b"], r["w"]))
    assert by_round[1] == {(1, 2, 1), (2, 3, 2), (4, 5, 1), (5, 6, 2)}
    assert by_round[2] == {(3, 4, 5)}
    # MST weight of this graph is 1+2+1+2+5 = 11
    assert sum(w for sel in by_round.values() for (_, _, w) in sel) == 11


def test_mst_boruvka_tie_break_is_cycle_free(spark):
    """Equal weights everywhere: the (w, a, b) total order must still
    produce an acyclic selection covering the graph."""
    from hi_csa_db_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 3), (3, 4, 3), (4, 1, 3)],
        "src long, dst long, w long",
    )
    rows = graph.mst_boruvka(edges, rounds=2, cc_iterations=3).collect()
    sel = {(r["a"], r["b"]) for r in rows}
    assert len(sel) == 3  # spanning tree of 4 nodes, no 4th (cycle) edge
