"""Similarity search over embedding columns (array<float>).

Extension surface mandated by BASELINE.json: brute-force cosine top-k
as the correctness baseline, IVF (coarse-quantizer probe) as the scale
path. Everything is built-in higher-order functions — no UDF, so the
scoring stays inside whole-stage codegen.

Determinism: ranking uses the cosine ROUNDED to 6 decimals with the
vector id as tiebreak, so top-k sets are stable across engines whose
float accumulation may differ in final ulps.

Scale notes (100 TB): brute force is one broadcast (the query vector)
plus a TakeOrderedAndProject — no shuffle of the corpus. IVF shuffles
once on the centroid assignment, then probes only matching buckets;
at cluster scale the corpus would be written bucketed-by-centroid so
probes prune partitions at scan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hi_csa_db_spark.functions.vectors import cosine, dot


def _ranked(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    out = scored.withColumn("cos_sim", F.round("cos_sim", 6))
    return out.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Column | None = None,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (id_col, cos_sim), highest first.

    The query vector (by default the row with id ``query_id``) is
    broadcast-cross-joined to the corpus; scoring is a narrow map.
    """
    if query_vec is None:
        q = embeddings.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("__q")
        )
    else:
        q = embeddings.sparkSession.range(1).select(query_vec.alias("__q"))
    scored = (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine(F.col(vec_col), F.col("__q")).alias("cos_sim"),
        )
    )
    return _ranked(scored, k, id_col)


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    Centroids are broadcast; the argmax is a max_by over the small
    per-vector candidate set — one narrow stage, one shuffle on the
    assignment groupBy. Ties broken by centroid id (deterministic).
    """
    scored = embeddings.crossJoin(
        F.broadcast(centroids.select(F.col(centroid_id), F.col(vec_col).alias("__c")))
    ).select(
        F.col(id_col),
        F.col(centroid_id),
        F.round(cosine(F.col(vec_col), F.col("__c")), 6).alias("__cs"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col(centroid_id), F.struct(F.col("__cs"), -F.col(centroid_id))
        ).alias(centroid_id)
    )


def ivf_assign_map(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """``ivf_assign`` as a PURE MAP over the corpus: the centroid table
    collapses into ONE broadcast row (sorted array of (cid, cv)
    structs) and the argmax runs as an in-row expression — no
    groupBy(id) exchange of the corpus and no join-back to recover the
    vector column (the r12 ivf_topk fusion, generalized to the
    assignment operator). Returns (id_col, vec_col, centroid_id).

    Bit-identical to ``ivf_assign(...).join(embeddings, id_col)``:
    array_max over struct(round(cos,6), -cid) picks the lexicographic
    max (cs, -cid) exactly like ivf_assign's
    max_by(cid, struct(cs, -cid)) — highest cosine, ties to the
    smallest centroid id. The one divergence channel is NaN ordering
    under negation, which cannot fire on unit-norm fixture embeddings
    (same argument as ivf_topk). r13 (ADVICE r12): the NULL-assignment
    filter makes the empty-centroid degenerate case total — an empty
    centroid table yields zero rows exactly like ivf_assign, so the
    drop-in contract holds without a docstring caveat. The 100 TB
    shape: one tiny broadcast + one corpus pass beats shuffling every
    vector through an assignment aggregate."""
    helper = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(centroid_id).alias("cid"), F.col(vec_col).alias("cv")
                )
            )
        ).alias("__cents")
    )
    cid = -F.array_max(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                F.round(cosine(F.col(vec_col), c["cv"]), 6).alias("cs"),
                (-c["cid"]).alias("negcid"),
            ),
        )
    )["negcid"]
    return (
        embeddings.crossJoin(F.broadcast(helper))
        .select(F.col(id_col), F.col(vec_col), cid.alias(centroid_id))
        .filter(F.col(centroid_id).isNotNull())
    )


def ivf_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: probe the ``n_probe`` centroids nearest the query,
    brute-force only within those buckets.

    Centroids are the first ``n_centroids`` corpus vectors (a
    deterministic coarse quantizer stand-in for k-means; the plumbing —
    assignment, probing, pruned scoring — is the real scale path).

    r12 fused form: the centroid table and the query vector collapse
    into ONE broadcast row (array of (cid, cv) structs + qv), so
    assignment (per-row argmax over the centroid array), probe-set
    membership (array_contains against the in-row probe list) and
    candidate scoring are a single narrow pass over the corpus — the
    corpus is never shuffled at all (the old shape paid a full
    groupBy(vec_id) exchange for assignment plus a bucket equi-join;
    measured 1.1-2.0 s of pure stage overhead on 2000 rows at sf0.1).
    Semantics are bit-identical: assignment maximizes
    (round(cos,6), -centroid_id) exactly like ivf_assign's max_by, the
    probe list sorts by (-round(cos,6), centroid_id) — the same
    (score DESC, id ASC) order — and final scores go through the same
    _ranked rounding. Fixture embeddings are unit-norm (no NaN scores;
    NaN ordering is the one place the two forms could diverge).
    """
    pool = embeddings.filter(
        (F.col(id_col) < n_centroids) | (F.col(id_col) == query_id)
    )
    helper = pool.agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col(id_col) < n_centroids,
                    F.struct(
                        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
                    ),
                )
            )
        ).alias("__cents"),
        F.first(
            F.when(F.col(id_col) == query_id, F.col(vec_col)), ignorenulls=True
        ).alias("__q"),
    ).select(
        "__cents",
        "__q",
        F.transform(
            F.slice(
                F.array_sort(
                    F.transform(
                        "__cents",
                        lambda c: F.struct(
                            (-F.round(cosine(c["cv"], F.col("__q")), 6)).alias(
                                "negcs"
                            ),
                            c["cid"].alias("cid"),
                        ),
                    )
                ),
                1,
                n_probe,
            ),
            lambda p: p["cid"],
        ).alias("__probe_ids"),
    )
    assigned_cid = -F.array_max(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                F.round(cosine(F.col(vec_col), c["cv"]), 6).alias("cs"),
                (-c["cid"]).alias("negcid"),
            ),
        )
    )["negcid"]
    scored = (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(helper))
        .filter(F.array_contains(F.col("__probe_ids"), assigned_cid))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("__q")).alias("cos_sim"))
    )
    return _ranked(scored, k, id_col)


def ivf_knn_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kNN JOIN: for EVERY query vector, its top-k corpus neighbors by
    cosine — the batch analogue of ivf_topk (which serves one query).
    This is the all-queries-at-once shape a retrieval/labeling
    pipeline runs: embed a query set, join each to its nearest
    corpus docs.

    ``queries`` must carry ``(id_col, vec_col)``; corpus = all of
    ``embeddings``. Self-matches (same id) are excluded.

    Plan (the 100 TB shape): corpus vectors are assigned to their
    nearest coarse centroid ONCE (ivf_assign — one shuffle); each
    query ranks the broadcast centroid table and keeps its n_probe
    nearest (per-query window, parallel across queries); candidates
    come from ONE equi-join on centroid_id — never query x corpus.
    The query vector rides the probe rows (a few hundred bytes) so
    candidate scoring needs no second shuffle of the query side; the
    corpus side joins its vectors back by id. Final top-k is a
    per-query window (parallel in queries). Skewed buckets are AQE's
    skew-join case; at fleet scale the corpus would be WRITTEN
    bucketed by centroid so the candidate join prunes at scan time.

    Determinism: centroid ranks and final ranks use cosine rounded to
    6dp with id tiebreaks — stable across engines.
    """
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__c")
    )
    assigned = ivf_assign(embeddings, cents.select("centroid_id", F.col("__c").alias(vec_col)), id_col, vec_col)
    qw = Window.partitionBy("qid").orderBy(
        F.col("__cs").desc(), F.col("centroid_id").asc()
    )
    probes = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__q"))
        .crossJoin(F.broadcast(cents))
        .select(
            "qid",
            "__q",
            "centroid_id",
            F.round(cosine(F.col("__q"), F.col("__c")), 6).alias("__cs"),
        )
        .withColumn("__rn", F.row_number().over(qw))
        .filter(F.col("__rn") <= n_probe)
        .select("qid", "__q", "centroid_id")
    )
    cand = probes.join(assigned, "centroid_id").filter(
        F.col(id_col) != F.col("qid")
    )
    scored = cand.join(embeddings.select(id_col, vec_col), id_col).select(
        "qid",
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
    )
    rw = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(rw))
        .filter(F.col("__rk") <= k)
        .select(
            "qid",
            F.col(id_col).alias("neighbor_id"),
            "cos_sim",
            F.col("__rk").cast("bigint").alias("rank"),
        )
    )


def kmeans_iterate(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd step: assign (broadcast cosine argmax) then recompute
    centroids as per-dimension means, rebuilt into arrays with
    position-sorted collect (array order = dim order, deterministic).

    Returns a new centroids DataFrame (centroid_id, embedding). The
    per-(cluster, dim) mean aggregation is map-side combinable; the
    array rebuild groups k*dims tiny rows — negligible at any scale.
    """
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col).join(
        embeddings, id_col
    )
    dims = assigned.select(
        "centroid_id", F.posexplode(vec_col).alias("dim", "val")
    )
    # EXACT quantized-Lloyd mean (r4, cross-engine determinism): each
    # element is quantized to integer micro-units FIRST (bit-identical
    # floor of identical doubles on every host/engine), summed as
    # bigint, and floor-divided (positive-offset trick) — so the new
    # centroid is a pure function of the assignment with no float
    # accumulation order anywhere. This is what lets ml_kmeans carry a
    # full value oracle (the previous float avg() was engine-specific
    # and forced a rows-only check).
    q = F.floor(F.col("val").cast("double") * 1000000 + F.lit(0.5)).cast("long")
    means = dims.groupBy("centroid_id", "dim").agg(
        F.sum(q).alias("__sq"), F.count(F.lit(1)).alias("__n")
    )
    mv = (
        F.expr("(__sq + 100000000L * __n) div __n - 100000000L").cast("double")
        / 1000000
    )
    return (
        means.select("centroid_id", "dim", mv.alias("m"))
        .groupBy("centroid_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "m"))
            ).alias("__dm")
        )
        .select(
            "centroid_id",
            F.transform(F.col("__dm"), lambda s: s["m"]).alias(vec_col),
        )
    )


def kmeans_clusters(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means: seed centroids = first k vectors (deterministic),
    ``iterations`` assign/update rounds, final cluster sizes
    (cluster_id, n_members). The iterative-ML shape on DataFrames:
    every round is one broadcast argmax + one mean aggregation."""
    cents = embeddings.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )
    for _ in range(iterations):
        cents = kmeans_iterate(embeddings, cents, id_col, vec_col)
    final = ivf_assign(embeddings, cents, id_col, vec_col)
    return final.groupBy(F.col("centroid_id").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


def sign_quantize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 60,
) -> DataFrame:
    """Sign-bit quantization: pack the signs of the first ``bits``
    dimensions into one BIGINT code — 8 bytes per vector instead of
    4*dim, the classic binary-embedding compression. Hamming distance
    on the codes approximates angular distance (each sign bit is a
    random-hyperplane LSH bit for centered embeddings).

    At 100 TB this is the ANN scale path: codes live in a long column
    (scans stay vectorized), distance is one xor+popcount, and the
    existing simhash_hamming_pairs banding (dedup.py) provides
    sub-linear candidate generation over the very same codes."""
    code = F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(acc, b) -> acc + IF(element_at({vec_col}, b + 1) > 0, "
        "shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))"
    )
    return embeddings.select(F.col(id_col), code.alias("code"))


def hamming_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 60,
) -> DataFrame:
    """ANN top-k by Hamming distance over sign-quantized codes:
    (id_col, hamming), closest first, query row excluded. The query
    code is a broadcast scalar join; the scan is xor+popcount per row
    feeding TakeOrderedAndProject — no corpus shuffle."""
    codes = sign_quantize(embeddings, id_col, vec_col, bits)
    q = codes.filter(F.col(id_col) == query_id).select(
        F.col("code").alias("__qcode")
    )
    return (
        codes.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            id_col,
            F.bit_count(F.col("code").bitwiseXOR(F.col("__qcode"))).alias("hamming"),
        )
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(k)
    )


def srp_planes(bits: int = 32, dim: int = 64) -> list[list[float]]:
    """Deterministic signed-random-projection hyperplanes (Charikar,
    STOC'02 §3): plane ``j`` component ``i`` is +1 or -1 from the
    parity of the first hex digit of md5("j_i"). Hash-derived rather
    than RNG-seeded so ANY engine (Spark, DuckDB oracle, a future
    executor in another language) reconstructs the identical planes
    with no shared random state — the same trick the MinHash tier uses
    for its Kirsch-Mitzenmacher coefficients (dedup.py)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            for i in range(dim)
        ]
        for j in range(bits)
    ]


def srp_signature(
    embeddings: DataFrame,
    bits: int = 32,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig): ``bits``-bit SRP signature packed into one BIGINT.
    Bit j = [plane_j . v >= 0]. The plane matrix is a BROADCAST-FREE
    literal (a few KB of ±1s folded into the expression tree), so the
    signature is a fully narrow per-row projection: zero shuffles, no
    UDF, whole-stage codegen end to end. Sign of the dot product is
    engine-stable because ±1 multiplication is exact and both engines
    fold the sum left-to-right over the same element order."""
    planes = srp_planes(bits, dim)
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(s) for s in plane]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
    return embeddings.select(F.col(id_col), sig.alias("sig"))


def srp_band_pairs(
    embeddings: DataFrame,
    bands: int = 4,
    band_bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate pairs (id_a < id_b) whose SRP signatures collide in at
    least one band — the ALL-PAIRS complement of hamming_topk's single
    probe. Classic LSH banding: explode each signature into ``bands``
    (band, key) rows, equi-join on the band key, distinct the pairs.
    Cost is sum of per-bucket squares, never corpus²; recall/precision
    tune via (bands, band_bits) exactly as in the MinHash tier."""
    sigs = srp_signature(embeddings, bands * band_bits, dim, id_col, vec_col)
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def sq8_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Scalar-quantization ANN (the SQ8 path of FAISS-style engines):
    every vector is compressed to one byte per dimension by per-dim
    min/max linear quantization; candidate generation scores the
    INTEGER code dot product (exact bigint arithmetic — cheap, and
    engine-portable with no float ambiguity); the top ``candidates``
    are re-ranked by EXACT cosine to produce the final top ``k``.

    Returns (id_col, approx_dot, cos_sim) ordered by exact cosine.

    Scale shape: the per-dim bounds are one posexplode + one 64-group
    aggregate collapsed to a 1-row broadcast; quantization is a narrow
    map (no shuffle); candidate selection is TakeOrderedAndProject on
    an integer score; only ``candidates`` rows ever reach the exact
    float rerank. At 100 TB the codes column would be precomputed and
    stored (64 bytes/vector vs 256 for float32), making the scan 4x
    lighter — the whole point of SQ at scale.

    Determinism: quantization is floor(((v-mn)*levels)/(mx-mn)) over
    float32 values widened exactly to double — both engines evaluate
    the identical IEEE expression, so codes (and hence the integer
    candidate ranking with id tie-break) match bit-for-bit; the rerank
    rounds cosine to 6 dp like every similarity op here.
    """
    dims = embeddings.select(
        F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    rng = dims.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    bounds = rng.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mn"))), lambda s: s["mn"]
        ).alias("__mns"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mx"))), lambda s: s["mx"]
        ).alias("__mxs"),
    )

    def _codes(vec: Column) -> Column:
        def one(v: Column, i: Column) -> Column:
            mn = F.element_at("__mns", i + 1)
            mx = F.element_at("__mxs", i + 1)
            q = F.floor(((v.cast("double") - mn) * F.lit(levels)) / (mx - mn))
            clamped = F.least(F.lit(levels).cast("bigint"),
                              F.greatest(F.lit(0).cast("bigint"), q.cast("bigint")))
            return F.when(mx == mn, F.lit(0).cast("bigint")).otherwise(clamped)

        return F.transform(vec, one)

    corpus = embeddings.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col), F.col(vec_col), _codes(F.col(vec_col)).alias("__cs")
    )
    qc = corpus.filter(F.col(id_col) == query_id).select(
        F.col("__cs").alias("__qc"), F.col(vec_col).alias("__qv")
    )
    approx = (
        corpus.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qc))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__qv"),
            F.aggregate(
                F.zip_with("__cs", "__qc", lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("approx_dot"),
        )
    )
    cand = approx.orderBy(
        F.col("approx_dot").desc(), F.col(id_col).asc()
    ).limit(candidates)
    return (
        cand.select(
            F.col(id_col),
            "approx_dot",
            F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_id: int = 0,
    pool: int = 8,
    k: int = 3,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick the candidate maximizing
    ``lam·rel − (1−lam)·max_sim_to_already_selected`` — the
    diversity-aware ordering that stops a retrieval-augmented context
    window filling up with near-duplicates of one document.

    Returns (rank, id_col, score): rank 1..k, score rounded 6dp.

    Structure: relevance top-``pool`` (TakeOrderedAndProject over the
    corpus — the only stage that touches all vectors) is materialized
    once (localCheckpoint — each greedy step re-reads it, and the
    pairwise sim table derives from it); the k-step greedy loop then
    operates on pool-sized data only, each step one semi-join + one
    aggregate + one limit(1), built lazily with 1-row broadcasts (no
    driver collect). Determinism: rel and pairwise sims are rounded
    6dp BEFORE the greedy arithmetic; lam=0.5 halvings are exact
    binary scalings, so every engine ranks candidates identically."""
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q")
    )
    pool_df = (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("pid"),
            F.col(vec_col).alias("pv"),
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("pid").asc())
        .limit(pool)
        .localCheckpoint(eager=False)
    )
    a = pool_df.select(F.col("pid").alias("ia"), F.col("pv").alias("va"))
    b = pool_df.select(F.col("pid").alias("ib"), F.col("pv").alias("vb"))
    sims = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select("ia", "ib", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("s"))
        .localCheckpoint(eager=False)
    )
    picks = []
    sel = None  # union of already-selected (sel_id) rows
    for step in range(1, k + 1):
        if sel is None:
            cand = pool_df.select("pid", F.col("rel").alias("score"))
        else:
            maxsim = (
                sims.join(sel, sims["ib"] == sel["sel_id"], "left_semi")
                .groupBy("ia")
                .agg(F.max("s").alias("ms"))
            )
            cand = (
                pool_df.join(sel, pool_df["pid"] == sel["sel_id"], "left_anti")
                .join(maxsim, F.col("pid") == F.col("ia"))
                .select(
                    "pid",
                    (F.lit(lam) * F.col("rel") - F.lit(1 - lam) * F.col("ms")).alias(
                        "score"
                    ),
                )
            )
        pick = (
            cand.orderBy(F.col("score").desc(), F.col("pid").asc())
            .limit(1)
            .select(
                F.lit(step).alias("rank"),
                F.col("pid").alias("sel_id"),
                # floor-form rounding, NOT F.round: MMR scores are
                # 0.5*(rel - s) over the 1e-6-rounded rel/sim grid, so
                # half of them sit EXACTLY on the 5e-7 rounding
                # boundary — BigDecimal-style vs multiply-style ROUND
                # implementations can disagree there. floor(x*1e6+0.5)
                # /1e6 is pinned to IEEE ops, bit-identical on every
                # engine and host (found by tools/boundary_sweep.py).
                (F.floor(F.col("score") * 1000000 + F.lit(0.5)) / 1000000).alias(
                    "score"
                ),
            )
            .localCheckpoint(eager=False)
        )
        picks.append(pick)
        sel = pick if sel is None else sel.unionByName(pick)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select("rank", F.col("sel_id").alias(id_col), "score")


def _pq_dist_micro(vec: Column, cent: Column, m: Column, dim_per_c: Column) -> Column:
    """Squared L2 distance between subspace m of vec and of cent,
    floored to integer micro-units (the ONE float->int crossing).
    +/-/* IEEE arithmetic in a fixed left-fold order — no libm — so
    the result is bit-identical on every engine and host."""
    d = F.aggregate(
        F.sequence(F.lit(0), dim_per_c - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at(vec, m * dim_per_c + i + 1).cast("double")
            - F.element_at(cent, m * dim_per_c + i + 1).cast("double")
        )
        * (
            F.element_at(vec, m * dim_per_c + i + 1).cast("double")
            - F.element_at(cent, m * dim_per_c + i + 1).cast("double")
        ),
    )
    return F.floor(d * 1000000).cast("bigint")


def _pq_adc_row(vec: Column, n_sub: int, n_cent: int, cb_col: str = "__cb") -> Column:
    """Flat n_sub*n_cent array of integer micro distances from each
    subspace of ``vec`` to every centroid of the broadcast codebook
    column ``cb_col``."""
    dim_per_c = (F.size(vec) / n_sub).cast("int")
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda m: F.transform(
                F.sequence(F.lit(0), F.lit(n_cent - 1)),
                lambda j: _pq_dist_micro(
                    vec, F.element_at(cb_col, j + 1), m, dim_per_c
                ),
            ),
        )
    )


def _pq_codes(dists: Column, n_sub: int, n_cent: int) -> Column:
    """n_sub codes: integer argmin centroid per subspace — first
    position of the subspace-slice minimum, so the lowest centroid
    index wins ties (array_position returns the FIRST match).
    ``dists`` must be a plain column reference (see pq_topk)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        lambda m: (
            F.array_position(
                F.slice(dists, m * n_cent + 1, n_cent),
                F.array_min(F.slice(dists, m * n_cent + 1, n_cent)),
            )
            - 1
        ).cast("int"),
    )


def _pq_anchors(
    embeddings: DataFrame, query_id: int, n_cent: int, id_col: str, vec_col: str
) -> DataFrame:
    """Anchor codebook: the n_cent full vectors with the smallest ids
    > query_id, as ONE broadcast row ordered by id."""
    return (
        embeddings.filter(F.col(id_col) > query_id)
        .orderBy(F.col(id_col).asc())
        .limit(n_cent)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
                    )
                ),
                lambda s: s["v"],
            ).alias("__cb")
        )
    )


def pq_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    candidates: int = 50,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (Jegou, Douze & Schmid 2011): split
    each vector into ``n_sub`` contiguous subvectors, quantize each
    subvector to its nearest of ``n_cent`` per-subspace centroids, and
    score candidates through the asymmetric-distance (ADC) lookup
    table — the fifth ANN family beside brute force (s1), IVF (s2),
    sign-bit Hamming (s4), and SQ8 (s7).

    Codebook: the subvectors of the ``n_cent`` anchor rows with the
    smallest ids > query_id — a deterministic stand-in for a k-means
    codebook (production would train with ``kmeans_iterate``; the
    encode/ADC machinery is identical either way, and the anchor form
    is exactly replayable in SQL).

    Returns (id_col, approx_dist_micro, cos_sim): top ``candidates``
    by ADC distance re-ranked by EXACT cosine to the final top ``k``.

    Scale shape: the codebook is ONE 1-row broadcast (n_cent full
    vectors); encoding is a narrow map (no shuffle) producing
    ``n_sub`` 4-bit codes — 4 bytes/vector vs 256 for float32, so at
    100 TB the stored code column makes the candidate scan 64x
    lighter; candidate selection is TakeOrderedAndProject on the ADC
    score; only ``candidates`` rows reach the exact float rerank.

    Determinism: each subspace distance is +/-/* IEEE arithmetic over
    exact float32->double widenings in a fixed left-fold order (no
    libm), floored ONCE to integer micro-units; the argmin code
    assignment (index tie-break), the ADC table, and the candidate
    ranking (integer sums, id tie-break) are then pure-integer —
    engine- and host-portable; the rerank rounds cosine to 6 dp like
    every similarity op here.
    """
    anchors = _pq_anchors(embeddings, query_id, n_cent, id_col, vec_col)
    corpus = _pq_encode(embeddings, anchors, n_sub, n_cent, id_col, vec_col)
    qrow = _pq_query_row(embeddings, anchors, query_id, n_sub, n_cent,
                         id_col, vec_col)
    return _pq_adc_rank(
        corpus.filter(F.col(id_col) != query_id), qrow,
        n_sub, n_cent, candidates, k, id_col, vec_col,
    )


def _pq_encode(
    df: DataFrame,
    anchors: DataFrame,
    n_sub: int,
    n_cent: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, __code) for every row of ``df`` against the broadcast
    anchor codebook. __dists is materialized as its own projection so
    _pq_codes reads a COLUMN REFERENCE: inlining _pq_adc_row(vec) into
    the codes expression would embed a copy of the full n_sub*n_cent
    distance computation at every element_at site (measured 10x
    slowdown from the duplicated interpreted-HOF trees;
    CollapseProject keeps the split because the expensive expression
    is referenced more than once)."""
    return (
        df.crossJoin(F.broadcast(anchors))
        .withColumn("__dists", _pq_adc_row(F.col(vec_col), n_sub, n_cent))
        .select(
            F.col(id_col),
            F.col(vec_col),
            _pq_codes(F.col("__dists"), n_sub, n_cent).alias("__code"),
        )
    )


def _pq_query_row(
    embeddings: DataFrame,
    anchors: DataFrame,
    query_id: int,
    n_sub: int,
    n_cent: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The query's ADC lookup table (+ its raw vector for the exact
    rerank) as ONE broadcast row."""
    return (
        embeddings.filter(F.col(id_col) == query_id)
        .crossJoin(F.broadcast(anchors))
        .select(
            F.col(vec_col).alias("__qv"),
            _pq_adc_row(F.col(vec_col), n_sub, n_cent).alias("__adc"),
        )
    )


def _pq_adc_rank(
    corpus: DataFrame,
    qrow: DataFrame,
    n_sub: int,
    n_cent: int,
    candidates: int,
    k: int,
    id_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer ADC candidate ranking + exact cosine rerank — the tail
    shared by pq_topk (full corpus) and ivfpq_topk (bucket members):
    approx = sum over subspaces of the broadcast table entry at the
    row's code, top ``candidates`` by (integer ADC, id), top ``k`` by
    6dp cosine."""
    approx = corpus.crossJoin(F.broadcast(qrow)).select(
        F.col(id_col),
        F.col("__qv"),
        F.col(vec_col).alias("__vec"),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            F.lit(0).cast("bigint"),
            lambda acc, m: acc
            + F.element_at(
                "__adc", m * n_cent + F.element_at(F.col("__code"), m + 1) + 1
            ),
        ).alias("approx_dist_micro"),
    )
    cand = approx.orderBy(
        F.col("approx_dist_micro").asc(), F.col(id_col).asc()
    ).limit(candidates)
    return (
        cand.select(
            F.col(id_col),
            "approx_dist_micro",
            F.round(cosine(F.col("__vec"), F.col("__qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    candidates: int = 50,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_sub: int = 8,
    n_cent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ composite ANN — the canonical billion-scale index layout
    (FAISS IVFPQ; Jegou 2011 section V): a coarse quantizer prunes the
    corpus to ``n_probe`` inverted lists, and product-quantization ADC
    ranks only the surviving bucket members; the exact cosine rerank
    touches just ``candidates`` rows. Composes the two independently
    proven stages — ivf_assign/probe (ivf_topk) and the SHARED
    _pq_encode/_pq_query_row/_pq_adc_rank helpers (pq_topk) — into
    ONE lazy plan, so the PQ machinery cannot drift between the plain
    and bucketed paths. Codes here quantize the RAW vectors against
    the shared anchor codebook — production IVFPQ encodes per-bucket
    residuals, which changes only the encode input, not the
    bucket-prune x ADC-scan x rerank shape proven here.

    Scale: the scan cost is (corpus/n_centroids)*n_probe rows of
    4-bit codes — bucket pruning multiplied by the 64x lighter PQ
    scan; at 100 TB the codes live in a codes column of a
    bucketed-by-centroid table so probes prune at scan time
    (SCALE.md) and the ADC pass reads no float vectors at all.

    Determinism: bucket assignment ranks 6dp-rounded cosines with
    centroid-id tie-break (ivf_assign semantics); codes/ADC/rank are
    the integer-micro pq_topk contract. Engine- and host-portable."""
    cents = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("__cs"),
        )
        .orderBy(F.col("__cs").desc(), F.col("centroid_id").asc())
        .limit(n_probe)
        .select("centroid_id")
    )
    bucket = assigned.join(F.broadcast(probe), "centroid_id").select(id_col)

    anchors = _pq_anchors(embeddings, query_id, n_cent, id_col, vec_col)
    members = _pq_encode(
        embeddings.join(bucket, id_col, "left_semi").filter(
            F.col(id_col) != query_id
        ),
        anchors, n_sub, n_cent, id_col, vec_col,
    )
    qrow = _pq_query_row(
        embeddings, anchors, query_id, n_sub, n_cent, id_col, vec_col
    )
    return _pq_adc_rank(
        members, qrow, n_sub, n_cent, candidates, k, id_col, vec_col
    )


def mips_augment(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Norm-augmentation MIPS->cosine reduction (Bachrach et al. 2014,
    Shrivastava & Li 2014): corpus x -> [x ; sqrt(M^2 - |x|^2)] with
    M^2 = max |x|^2, so every augmented corpus vector has norm M and
    cosine against an augmented query [q ; 0] is x.q / (M |q|) —
    MONOTONE in the inner product. Any cosine bucketing machinery
    (IVF, SRP) then serves maximum-inner-product search unchanged.

    Returns (id_col, vec_col, __aug) with __aug = 65-dim double array.

    Determinism: |x|^2 is the engine-shared left-to-right double fold
    ROUNDED to 6dp BEFORE the max / sqrt, and the augmented component
    is rounded again — so both engines build bit-identical augmented
    vectors (sqrt is exactly rounded IEEE on identical input).

    Scale: one narrow norm pass + a 1-row broadcast max; no shuffle.
    """
    base = embeddings.select(
        id_col,
        vec_col,
        F.round(dot(F.col(vec_col), F.col(vec_col)), 6).alias("__d2"),
    )
    m2 = base.agg(F.max("__d2").alias("__m2"))
    return base.crossJoin(F.broadcast(m2)).select(
        id_col,
        vec_col,
        F.concat(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.array(
                F.round(
                    F.sqrt(F.greatest(F.col("__m2") - F.col("__d2"), F.lit(0.0))),
                    6,
                )
            ),
        ).alias("__aug"),
    )


def mips_ivf_topk(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed maximum-inner-product search: mips_augment's reduction
    routed through EXACTLY the s2/ivf machinery (assign to nearest of
    ``n_centroids`` augmented anchors, probe ``n_probe``), then exact
    raw-vector dot rerank of bucket members only — the 100 TB path for
    MIPS that s14's brute-force scan is the recall ground truth for.

    Returns (id_col, dot) top-k by rounded dot, id tiebreak.

    Scale: inherits ivf_topk's contract — one assignment shuffle,
    broadcast probes, candidates only from probed buckets (at fleet
    scale the corpus is written bucketed by centroid); the rerank
    touches bucket members, never the corpus."""
    aug = mips_augment(embeddings, id_col, vec_col)
    aug_vecs = aug.select(id_col, F.col("__aug"))
    cents = aug_vecs.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("__aug")
    )
    assigned = ivf_assign(aug_vecs, cents, id_col, vec_col="__aug")
    # query augments with 0, NOT sqrt(M^2 - |q|^2): [q;0].[x;s] = x.q
    qa = embeddings.filter(F.col(id_col) == query_id).select(
        F.concat(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.array(F.lit(0.0)),
        ).alias("__qa")
    )
    probe = (
        cents.crossJoin(F.broadcast(qa))
        .select(
            "centroid_id",
            F.round(cosine(F.col("__aug"), F.col("__qa")), 6).alias("__cs"),
        )
        .orderBy(F.col("__cs").desc(), F.col("centroid_id").asc())
        .limit(n_probe)
        .select("centroid_id")
    )
    bucket = assigned.join(F.broadcast(probe), "centroid_id").select(id_col)
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q")
    )
    scored = (
        embeddings.join(bucket, id_col, "left_semi")
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(dot(F.col(vec_col), F.col("__q")), 6).alias("dot"),
        )
    )
    return scored.orderBy(F.col("dot").desc(), F.col(id_col).asc()).limit(k)
