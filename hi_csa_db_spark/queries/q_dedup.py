"""Deduplication + entity-resolution queries (exact, MinHash LSH, SimHash, n-gram Jaccard, SemDeDup, blocking).

Split from the original single-file registry (round 8,
VERDICT r7 item 8). Query/oracle text is moved VERBATIM so
query_text_hash values (tools/banked_hashes.json) are unchanged;
registry order is pinned by tools/registry_order.json. Names a
query body references from another module resolve through the
package-level namespace cross-pollination in queries/__init__.py
(def-time names are imported explicitly below)."""

from __future__ import annotations
import functools
import glob
import hashlib
import inspect
import json
import os
import re
from typing import Callable
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from hi_csa_db_spark.catalog import load_table, load_tables
from hi_csa_db_spark.functions.hashing import (
    KNUTH_HASH32_SQL,
    MULT_HASH32_SQL,
    knuth_hash32,
)
from hi_csa_db_spark.functions.text import absolutize_url, slugify, strip_punct, tokenize
from hi_csa_db_spark.operators import classify, dedup, graph, ordered, similarity, textstats
from hi_csa_db_spark.operators.merge import db_merge, union_streams

from hi_csa_db_spark.queries import _ORACLES, _QUERIES, _register
from hi_csa_db_spark.queries._shared import (
    _D6_LABELS_SQL,
    _ER1_CLUSTER_SQL,
    _SHINGLE_SQL,
    _X20_SCORED_SQL,
    _cos_sql,
)



# ---------------------------------------------------------------------------
# Extension surface: dedup (BASELINE.json mandate)
# ---------------------------------------------------------------------------


@_register(
    "d1_exact_dedup",
    """
    SELECT lang, source, MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY lang, source
    """,
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by key, keeping the smallest id per group."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, keys=["lang", "source"], id_col="doc_id").select(
        "lang", "source", "doc_id", "dup_count"
    )


@_register(
    "d2_minhash_lsh_pairs",
    f"""
    WITH {_SHINGLE_SQL},
    seeds AS (SELECT unnest(range(0, 16)) AS seed),
    hh AS (
      -- Kirsch-Mitzenmacher double hashing: one md5 per shingle,
      -- hash_i = (h1 + i*h2) mod 2^60 (mirrors minhash_signatures)
      SELECT doc_id,
             CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h1,
             CAST('0x' || substring(md5(shingle), 16, 12) AS BIGINT) * 2 + 1 AS h2
      FROM sh
    ),
    mh AS (
      SELECT doc_id, seed,
             MIN((h1 + seed * h2) % 1152921504606846976) AS mh
      FROM hh CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, band,
             md5(band::VARCHAR || '|' || string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS bkey
      FROM (SELECT doc_id, seed, mh, seed // 2 AS band FROM mh)
      GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                               AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ic
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.id_a, c.id_b, ROUND(i.ic / (sa.sz + sb.sz - i.ic), 6) AS jaccard
    FROM cand c JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
                JOIN sizes sa ON sa.doc_id = c.id_a
                JOIN sizes sb ON sb.doc_id = c.id_b
    WHERE i.ic / (sa.sz + sb.sz - i.ic) >= 0.05
    """,
)
def d2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle -> md5 minhash (16) -> band (8x2)
    -> bucket equi-join -> exact-Jaccard verify. The LSH equi-join
    replaces the O(n^2) cross join at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(
        docs, n=3, num_hashes=16, bands=8, threshold=0.05
    )


@_register(
    "d14_minhash_calibration",
    f"""
    WITH {_SHINGLE_SQL},
    seeds AS (SELECT unnest(range(0, 16)) AS seed),
    hh AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h1,
             CAST('0x' || substring(md5(shingle), 16, 12) AS BIGINT) * 2 + 1 AS h2
      FROM sh
    ),
    mh AS (
      SELECT doc_id, seed,
             MIN((h1 + seed * h2) % 1152921504606846976) AS mh
      FROM hh CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, band,
             md5(band::VARCHAR || '|' || string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS bkey
      FROM (SELECT doc_id, seed, mh, seed // 2 AS band FROM mh)
      GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                               AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS m
      FROM cand c JOIN mh a ON a.doc_id = c.id_a
                  JOIN mh b ON b.doc_id = c.id_b AND b.seed = a.seed
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ic
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    terms AS (
      SELECT ROUND(ABS(e.m / 16e0
                       - i.ic / (sa.sz + sb.sz - i.ic)), 8) AS err
      FROM est e JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
                 JOIN sizes sa ON sa.doc_id = e.id_a
                 JOIN sizes sb ON sb.doc_id = e.id_b
    )
    SELECT COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(CAST(err AS DECIMAL(12,8))) AS DOUBLE)
                 / COUNT(*), 6) AS mae,
           ROUND(MAX(err), 6) AS max_err
    FROM terms
    """,
)
def d14_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ACCURACY AUDIT: over the LSH candidate pairs, compare
    the 16-hash signature estimate (matching components / 16 — the
    unbiased Jaccard estimator) against the exact shingle-set Jaccard,
    reporting MAE and worst-case error. This is the calibration a
    dedup pipeline runs when choosing num_hashes/banding — it verifies
    the estimator the banding trusts, on exactly the pairs the banding
    surfaces. Per-pair errors are 8dp-rounded and DECIMAL-summed so
    the reduction is order-independent cross-engine.

    Scale: reuses the d2 machinery (signature = one groupBy, candidates
    = band equi-join); the extra estimate join is pair x 16 seeds —
    linear in candidates, never all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingles(docs, n=3)
    sigs = dedup.minhash_signatures(sh)
    cand = dedup.lsh_candidate_pairs(sigs)
    sets = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("ss"), F.count(F.lit(1)).alias("sz")
    )
    sa = sets.select(
        F.col("doc_id").alias("id_a"), F.col("ss").alias("ss_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("id_b"), F.col("ss").alias("ss_b"),
        F.col("sz").alias("sz_b"),
    )
    ga = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    gb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    j = cand.join(sa, "id_a").join(sb, "id_b").join(ga, "id_a").join(gb, "id_b")
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b
        )
    )
    ic = F.size(F.array_intersect("ss_a", "ss_b"))
    err = F.round(
        F.abs(
            matches / F.lit(16.0)
            - ic / (F.col("sz_a") + F.col("sz_b") - ic)
        ),
        8,
    )
    return j.select(err.alias("err")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.col("err").cast("decimal(12,8)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mae"),
        F.round(F.max("err"), 6).alias("max_err"),
    )


@_register(
    "d6_dedup_survivors",
    f"""
    WITH {_D6_LABELS_SQL}
    SELECT lbl AS survivor_id, COUNT(*) AS n_members
    FROM l3 GROUP BY lbl
    """,
)
def d6_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ENDGAME: near-dup pairs (d2) -> connected components
    (transitive closure via integer label propagation) -> one canonical
    survivor per duplicate cluster (the component's min id) with the
    cluster size. Pair detection alone isn't dedup — a~b~c must
    collapse to ONE survivor even when (a,c) was never directly
    compared."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(
        docs, n=3, num_hashes=16, bands=8, threshold=0.05
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = graph.connected_components(edges, iterations=3)
    return labels.groupBy(F.col("lbl").alias("survivor_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@_register(
    "d19_soft_dedup_weights",
    f"""
    WITH {_D6_LABELS_SQL},
    sz AS (SELECT lbl, COUNT(*) AS csz FROM l3 GROUP BY lbl),
    docw AS (
      SELECT d.doc_id,
             COALESCE(sz.csz, 1) AS cluster_size,
             CAST(1000000 // COALESCE(sz.csz, 1) AS BIGINT) AS weight_micro
      FROM documents d
      LEFT JOIN l3 ON l3.id = d.doc_id
      LEFT JOIN sz ON sz.lbl = l3.lbl
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           weight_micro,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(weight_micro) AS BIGINT) AS total_weight_micro
    FROM docw GROUP BY cluster_size, weight_micro
    """,
)
def d19_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication: instead of dropping near-duplicates, each
    document is down-weighted by 1/cluster_size (exact integer
    micro-weight, 1e6 div size) so every duplicate CLUSTER contributes
    one document's worth of training signal — the loss-weighting
    alternative to d6's hard survivor selection, preferred when
    near-dups carry complementary fragments. Composes the proven d2
    pair detection + connected components; docs in no cluster weight
    1.0. Output is the (cluster_size, weight) histogram with total
    retained weight — the audit that shows how much effective data
    survives the down-weighting.

    Scale shape: everything up to the labels is the d6 plan; the
    weight is a narrow map over a left join on doc_id; the audit is a
    tiny aggregate. At 100 TB the per-doc weight column would be
    persisted next to the corpus for the training loader to consume."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(
        docs, n=3, num_hashes=16, bands=8, threshold=0.05
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = graph.connected_components(edges, iterations=3)
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("csz"))
    docw = (
        docs.select("doc_id")
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .join(sizes, "lbl", "left")
        .select(
            F.coalesce("csz", F.lit(1)).alias("cluster_size"),
            F.expr("CAST(1000000 div COALESCE(csz, 1) AS BIGINT)").alias(
                "weight_micro"
            ),
        )
    )
    return docw.groupBy("cluster_size", "weight_micro").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("weight_micro").cast("bigint").alias("total_weight_micro"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        "weight_micro",
        "n_docs",
        "total_weight_micro",
    )


@_register(
    "d3_ngram_jaccard_topk",
    f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    rare AS (
      SELECT doc_id, shingle FROM sh
      QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 100
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS ic
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, ROUND(ic / (sa.sz + sb.sz - ic), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    ORDER BY jaccard DESC, id_a ASC, id_b ASC LIMIT 20
    """,
)
def d3_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard with a hot-shingle guard: candidate pairs
    come from shingles with document frequency <= 100 (a stopword-like
    shingle in m docs would emit m^2 rows), but Jaccard is computed
    over the FULL shingle sets, so scores stay exact. 20 most-similar
    pairs, rank on rounded score with id tie-breaks."""
    docs = load_table(spark, sf_dir, "documents")
    # One tokenize pass feeds BOTH the inverted index and the verify
    # arrays: the doc-level shingle arrays are checkpointed once
    # (VERDICT r6 item 6; r12 NOTE: cache() tried and reverted — see
    # operators/dedup.py::jaccard_pairs). r13: candidate generation
    # runs over a 64-bit-HASHED inverted index (every exchange carries
    # (long, long) rows instead of (long, string)), and the scores are
    # verified exactly against the checkpointed string arrays — see
    # jaccard_pairs_hashed for the equivalence argument.
    arrs = dedup.shingle_arrays(docs, n=3).localCheckpoint(eager=False)
    pairs = dedup.jaccard_pairs_hashed(arrs, max_df=100)
    return (
        pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(20)
    )


@_register(
    "d4_simhash",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(list_filter(
          string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
          x -> x <> '')) AS tok
        FROM documents
      )
    ),
    h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
    bits AS (
      SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           lpad(hex(CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)),
                16, '0') AS simhash_hex
    FROM bits GROUP BY doc_id
    """,
)
def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints from md5-derived token hashes.

    Emitted as a fixed-width hex STRING: the raw fingerprint is a
    ~2^60 bigint, which DuckDB widens to HUGEINT under SUM — a lossy
    float in some client versions and a canonicalization mismatch in
    round 1. Hex strings are engine-neutral (NOTES.md rule: no >2^53
    integers and no raw doubles in output schemas)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs).select(
        "doc_id", F.lpad(F.hex("simhash"), 16, "0").alias("simhash_hex")
    )


@_register(
    "d8_edit_distance",
    """
    WITH s AS (SELECT DISTINCT source FROM documents)
    SELECT a.source AS src_a, b.source AS src_b,
           levenshtein(a.source, b.source) AS dist
    FROM s a JOIN s b ON a.source < b.source
    WHERE levenshtein(a.source, b.source) <= 4
    """,
)
def d8_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching between source names (levenshtein
    <= 4) — the record-linkage primitive. Length-band blocked equi-join
    (dedup.edit_distance_pairs): no O(n^2) nested loop even when the
    distinct-source cardinality grows with the corpus; blocking is
    sound (levenshtein >= length difference) so the result set — and
    the oracle — are identical to the unblocked pair join."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.edit_distance_pairs(docs, "source", max_dist=4)


@_register(
    "d7_simhash_pairs",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(list_filter(
          string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
          x -> x <> '')) AS tok
        FROM documents
      )
    ),
    h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
    bits AS (
      SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b)
      GROUP BY doc_id, b
    ),
    fp AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, simhash, band, (simhash // (CAST(1 AS BIGINT) << (band * 15))) % 32768 AS bval
      FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 12
    """,
)
def d7_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: pigeonhole band blocking (4 x 15-bit
    slices -> equi-join) + Hamming verify via bit_count(xor) — the
    all-pairs XOR scan never happens. Completes the SimHash path (d4
    emits fingerprints; this pairs them)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = dedup.simhash(docs)
    return dedup.simhash_hamming_pairs(fp, bands=4, max_hamming=12)


@_register(
    "d5_embedding_neardup",
    f"""
    WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND({_cos_sql('e.embedding', 'c.cv')}, 6) DESC, c.centroid_id ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.3
    """,
)
def d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, bucketed by IVF centroid so the
    pairwise comparison is intra-bucket only (the blocked/partitioned
    scale path — never an unblocked O(n^2) cross join)."""
    from hi_csa_db_spark.functions.vectors import cosine
    from hi_csa_db_spark.operators.similarity import ivf_assign_map

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    # r12: assignment as a pure map (ivf_assign_map) — the old
    # ivf_assign(...).join(emb) shape paid a full groupBy(vec_id)
    # exchange of the corpus plus a join-back, duplicated under BOTH
    # sides of the self-join below. Bit-equality argued at the
    # operator; pinned value-exactly in tests/test_similarity_mips.py.
    assigned = ivf_assign_map(emb, cents)
    a = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__ea"),
    )
    b = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__eb"),
    )
    pairs = a.join(b, ["centroid_id"]).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("__ea"), F.col("__eb")), 6).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= 0.3)


@_register(
    "d12_containment_pairs",
    f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    rare AS (
      SELECT doc_id, shingle FROM sh
      QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 100
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS ic
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(ic AS DOUBLE) / sa.sz, 6) AS contain_a,
           ROUND(CAST(ic AS DOUBLE) / sb.sz, 6) AS contain_b
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE ic * 10 >= sa.sz * 3 OR ic * 10 >= sb.sz * 3
    ORDER BY greatest(ic * 1.0 / sa.sz, ic * 1.0 / sb.sz) DESC, id_a ASC, id_b ASC
    LIMIT 20
    """,
)
def d12_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT near-dup detection (Broder's second measure):
    |A∩B| / |A| — a short doc quoted inside a long one scores near 1
    on containment while its Jaccard stays tiny, so resemblance-only
    dedup (d2/d3) misses subset duplication entirely. Same bounded
    candidate generation as d3 (rare-shingle inverted index, df cap),
    full-set intersection verify, then the PURE-INTEGER gate
    ic*10 >= sz*3 (containment >= 0.3 either direction) so the filter
    never compares floats cross-engine; scores rounded for output."""
    docs = load_table(spark, sf_dir, "documents")
    # One tokenize pass for the index AND every size consumer (sa and
    # sb below are separate join branches, so an un-checkpointed sizes
    # frame re-tokenizes the corpus per branch — 4 passes total here
    # before this fold; same d3 pattern, VERDICT r6 item 6). r13: the
    # hashed inverted index + exact array verify, same as d3 (see
    # jaccard_pairs_hashed).
    arrs = dedup.shingle_arrays(docs, n=3).localCheckpoint(eager=False)
    pairs = dedup.jaccard_pairs_hashed(arrs, max_df=100)
    j = pairs.select(
        "id_a",
        "id_b",
        "inter_cnt",
        F.col("sz_a").alias("sza"),
        F.col("sz_b").alias("szb"),
    )
    gate = (F.col("inter_cnt") * 10 >= F.col("sza") * 3) | (
        F.col("inter_cnt") * 10 >= F.col("szb") * 3
    )
    return (
        j.filter(gate)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter_cnt").cast("double") / F.col("sza"), 6).alias(
                "contain_a"
            ),
            F.round(F.col("inter_cnt").cast("double") / F.col("szb"), 6).alias(
                "contain_b"
            ),
            F.greatest(
                F.col("inter_cnt") * F.lit(1.0) / F.col("sza"),
                F.col("inter_cnt") * F.lit(1.0) / F.col("szb"),
            ).alias("__m"),
        )
        .orderBy(F.col("__m").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(20)
        .drop("__m")
    )


@_register(
    "d13_dup_spans",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(
        string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
        x -> x <> '') AS t
      FROM documents
    ),
    gp AS (
      SELECT doc_id, len(t) AS n_tokens, CAST(i AS INT) AS pos,
             array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + 4), ' ') AS gram
      FROM toks, UNNEST(range(1, len(t) - 3)) AS r(i)
      WHERE len(t) >= 5
    ),
    dup AS (
      SELECT gram FROM gp GROUP BY gram HAVING COUNT(*) >= 2
    ),
    marked AS (
      SELECT gp.doc_id, gp.n_tokens, gp.pos FROM gp JOIN dup USING (gram)
    ),
    brk AS (
      SELECT doc_id, n_tokens, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                  THEN 1 ELSE 0 END AS b
      FROM marked
    ),
    isl AS (
      SELECT doc_id, n_tokens, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS island
      FROM brk
    ),
    spans AS (
      SELECT doc_id, n_tokens, island,
             MAX(pos) + 4 - MIN(pos) + 1 AS span_len
      FROM isl GROUP BY doc_id, n_tokens, island
    )
    SELECT doc_id, COUNT(*) AS n_spans,
           MAX(span_len) AS max_span_tokens,
           CAST(SUM(span_len) AS BIGINT) AS covered_tokens,
           n_tokens
    FROM spans GROUP BY doc_id, n_tokens
    """,
)
def d13_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate-SPAN detection (Lee et al. 2021,
    arXiv:2107.06499, at token-5-gram granularity): any 5-gram
    occurring >=2 times in the corpus marks its positions; per doc,
    overlapping/adjacent marks merge into maximal spans (the unit a
    span-level dedup would cut). Linear end to end — gram counting is
    one hash aggregation, re-marking is an equi-join on the gram, the
    island merge is one per-document window; no pair explosion on hot
    boilerplate grams."""
    return dedup.duplicated_spans(load_table(spark, sf_dir, "documents"), k=5)


@_register(
    "d11_normalized_dedup",
    """
    WITH norm AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(list_filter(
               string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
               x -> x <> ''))), ' ')) AS nh
      FROM documents
    )
    SELECT nh, MIN(doc_id) AS survivor_id, COUNT(*) AS n_variants
    FROM norm GROUP BY nh HAVING COUNT(*) > 1
    """,
)
def d11_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-insensitive exact dedup: case, punctuation,
    digits, whitespace, token ORDER and token REPETITION variants of
    the same text fold to one md5 of the sorted distinct vocabulary
    (bag-of-words identity) — the cheap pre-pass real
    pipelines run BEFORE MinHash (it catches the bulk of trivial
    near-dups for one hash per doc, no banding, one shuffle). Emits
    only the multi-variant groups; d1 (byte-exact) and d2 (MinHash)
    bracket it from either side."""
    docs = load_table(spark, sf_dir, "documents")
    norm_tokens = F.filter(
        F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " "), " "),
        lambda x: x != "",
    )
    nh = F.md5(F.array_join(F.array_sort(F.array_distinct(norm_tokens)), " "))
    return (
        docs.select("doc_id", nh.alias("nh"))
        .groupBy("nh")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .filter(F.col("n_variants") > 1)
    )


@_register(
    "d9_incremental_lsh",
    f"""
    WITH {_SHINGLE_SQL},
    seeds AS (SELECT unnest(range(0, 16)) AS seed),
    hh AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h1,
             CAST('0x' || substring(md5(shingle), 16, 12) AS BIGINT) * 2 + 1 AS h2
      FROM sh
    ),
    mh AS (
      SELECT doc_id, seed,
             MIN((h1 + seed * h2) % 1152921504606846976) AS mh
      FROM hh CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, band,
             md5(band::VARCHAR || '|' || string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS bkey
      FROM (SELECT doc_id, seed, mh, seed // 2 AS band FROM mh)
      GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
      WHERE a.doc_id % 7 = 0 AND b.doc_id % 7 <> 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_new, c.id_old, COUNT(*) AS ic
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_new
      JOIN sh b ON b.doc_id = c.id_old AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT c.id_new, c.id_old,
           ROUND(i.ic / (sa.sz + sb.sz - i.ic), 6) AS jaccard
    FROM cand c JOIN inter i ON c.id_new = i.id_new AND c.id_old = i.id_old
                JOIN sizes sa ON sa.doc_id = c.id_new
                JOIN sizes sb ON sb.doc_id = c.id_old
    WHERE i.ic / (sa.sz + sb.sz - i.ic) >= 0.05
    """,
)
def d9_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection: an ingest batch (doc_id % 7 = 0
    here) probed against the existing corpus' LSH band index — the
    per-batch dedup a continuously-built corpus runs, instead of
    re-pairing the whole corpus against itself. Candidates are
    delta x bucket-mates; exact Jaccard verifies over full shingle
    sets. At fleet scale the corpus' signatures/band keys are a
    maintained table (txlog format) bucketed by (band, bkey), so the
    probe is a co-located join touching only the delta's buckets."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingles(docs, n=3)
    # Materialize the signature table once (localCheckpoint) before the
    # new/old split: this is the maintained-corpus-signatures table of
    # the real incremental scenario — without it both filter branches
    # would recompute shingles+minhash from scratch (measured: 28
    # exchanges -> the checkpointed plan halves the signature work).
    sigs = dedup.minhash_signatures(sh, num_hashes=16).localCheckpoint(eager=False)
    is_new = F.col("doc_id") % 7 == 0
    cand = dedup.lsh_candidate_pairs_incremental(
        sigs.filter(is_new), sigs.filter(~is_new), bands=8, rows=2
    )
    verified = dedup.jaccard_pairs(
        sh,
        candidates=cand.select(
            F.col("id_new").alias("id_a"), F.col("id_old").alias("id_b")
        ),
    )
    return (
        verified.filter(F.col("jaccard") >= 0.05)
        .select(
            F.col("id_a").alias("id_new"),
            F.col("id_b").alias("id_old"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


@_register(
    "sem1_semdedup_survivors",
    f"""
    WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND({_cos_sql('e.embedding', 'c.cv')}, 6) DESC, c.centroid_id ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      ) WHERE cos_sim >= 0.3
    ),
    ud AS (SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM ud),
    l0 AS (SELECT id, id AS lbl FROM nodes),
    l1 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN l0 s ON s.id = n.id
           LEFT JOIN ud e ON e.src = n.id LEFT JOIN l0 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    l2 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN l1 s ON s.id = n.id
           LEFT JOIN ud e ON e.src = n.id LEFT JOIN l1 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    l3 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN l2 s ON s.id = n.id
           LEFT JOIN ud e ON e.src = n.id LEFT JOIN l2 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl)
    SELECT lbl AS survivor_id, COUNT(*) AS n_members
    FROM l3 GROUP BY lbl
    """,
)
def sem1_semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup ENDGAME over embeddings: IVF
    cluster assignment blocks the pairwise cosine (intra-bucket only,
    never corpus^2), pairs above threshold become edges, transitive
    closure collapses each semantic-duplicate group to ONE canonical
    survivor (min vec_id) with its group size. The embedding analogue
    of d6 (which does the same over MinHash/LSH text pairs): pair
    detection alone isn't dedup — a~b~c must fold to one survivor even
    when (a,c) was never directly compared.

    Scale: same contract as d5 (bucketed pair generation) plus the
    bounded-iteration integer min-label propagation of
    operators/graph.py::connected_components."""
    from hi_csa_db_spark.functions.vectors import cosine
    from hi_csa_db_spark.operators.similarity import ivf_assign_map

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    # r12: same fused-assignment rewrite as d5 (see there) — removes
    # the corpus groupBy exchange + join-back under both self-join
    # sides feeding the component edges.
    assigned = ivf_assign_map(emb, cents)
    a = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__ea"),
    )
    b = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__eb"),
    )
    pairs = (
        a.join(b, ["centroid_id"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__ea"), F.col("__eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = graph.connected_components(edges, iterations=3)
    return labels.groupBy(F.col("lbl").alias("survivor_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@_register(
    "d10_quality_survivors",
    f"""
    WITH {_D6_LABELS_SQL},
    {_X20_SCORED_SQL},
    mem AS (
      SELECT l3.id, l3.lbl, s.logit_micro
      FROM l3 JOIN scored s ON s.doc_id = l3.id
    ),
    m AS (
      SELECT lbl, MAX(logit_micro) AS mx, COUNT(*) AS n_members
      FROM mem GROUP BY lbl
    )
    SELECT m.lbl AS cluster_id, MIN(mem.id) AS survivor_id,
           m.n_members, m.mx AS survivor_logit_micro
    FROM m JOIN mem ON mem.lbl = m.lbl AND mem.logit_micro = m.mx
    GROUP BY m.lbl, m.n_members, m.mx
    """,
)
def d10_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection: d6 collapses each
    near-dup cluster to its MIN-id member; real corpora keep the
    HIGHEST-QUALITY member instead (the standard CCNet/RefinedWeb
    practice — duplicates differ by boilerplate, truncation, OCR
    noise). Survivor = the member maximizing x20's quality logit, ties
    broken by min id; implemented as a per-cluster max + equi-join
    back (both engine-deterministic on the 6dp-rounded logit), never
    a sort-within-cluster.

    Scale shape: inherits d2/d6's banded LSH + bounded label
    propagation; the quality join adds one doc-level equi-join and two
    small aggregations by cluster label."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(
        docs, n=3, num_hashes=16, bands=8, threshold=0.05
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = graph.connected_components(edges, iterations=3)
    scored = x20_quality_classifier(spark, sf_dir).select("doc_id", "logit_micro")
    # mem feeds two consumers (the per-cluster max and the join-back);
    # checkpoint it once so the LSH + components + scoring lineage is
    # not re-derived per consumer (x78/er3 pattern, VERDICT r6 item 4).
    mem = (
        labels.join(scored, labels["id"] == scored["doc_id"])
        .select("id", "lbl", "logit_micro")
        .localCheckpoint(eager=False)
    )
    m = mem.groupBy("lbl").agg(
        F.max("logit_micro").alias("mx"), F.count(F.lit(1)).alias("n_members")
    )
    return (
        m.join(
            mem.select(F.col("lbl").alias("mlbl"), "id", "logit_micro"),
            (F.col("mlbl") == F.col("lbl")) & (F.col("logit_micro") == F.col("mx")),
        )
        .groupBy("lbl", "n_members", "mx")
        .agg(F.min("id").alias("survivor_id"))
        .select(
            F.col("lbl").alias("cluster_id"),
            "survivor_id",
            "n_members",
            F.col("mx").alias("survivor_logit_micro"),
        )
    )


@_register(
    "d15_sorted_neighborhood",
    """
    WITH k AS (
      SELECT doc_id,
             substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), 1, 24) AS key
      FROM documents
    ),
    r AS (
      SELECT doc_id, key, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rnk
      FROM k
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(b.rnk - a.rnk AS BIGINT) AS rank_gap,
           levenshtein(a.key, b.key) AS dist
    FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
    WHERE levenshtein(a.key, b.key) <= 6
    """,
)
def d15_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record-linkage blocking (dedup.py): order
    documents by a normalized 24-char blocking key, compare each only
    to its 3 successors, keep pairs within edit distance 6. Candidate
    volume is n·window (linear) instead of the n² theta join the
    oracle's rank-range join expresses — the sort IS the blocking.
    The offsets explode to an EQUI-join on rank+offset, so Spark
    never evaluates a non-equi condition over the cross space."""
    from hi_csa_db_spark.operators.dedup import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.lower(strip_punct(F.col("text"))), 1, 24)
    pairs = sorted_neighborhood_pairs(docs, key, id_col="doc_id", window=3)
    return (
        pairs.withColumn("dist", F.levenshtein("a_key", "b_key"))
        .filter(F.col("dist") <= 6)
        .select("a_id", "b_id", F.col("rank_gap").cast("bigint").alias("rank_gap"), "dist")
    )


@_register(
    "er1_entity_resolution",
    f"""
    WITH {_ER1_CLUSTER_SQL},
    m AS (SELECT l3.id, l3.lbl, k.n_chars FROM l3 JOIN k ON k.doc_id = l3.id),
    ranked AS (
      SELECT lbl, id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lbl
                                ORDER BY n_chars DESC, id ASC) AS sr,
             COUNT(*) OVER (PARTITION BY lbl) AS n
      FROM m
    )
    SELECT lbl AS cluster, id AS survivor_id, CAST(n AS BIGINT) AS n_members
    FROM ranked WHERE sr = 1
    """,
)
def er1_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution composite — the classic MDM pipeline from
    FOUR independently proven stages, composed as ONE lazy plan:
    sorted-neighborhood BLOCKING (d15's operator) -> edit-distance
    MATCH scoring on the blocking key -> connected-component
    CLUSTERING (graph.connected_components, integer min-label, 3
    bounded rounds — identical bound on both engines) ->
    SURVIVORSHIP (keep the longest document per cluster, id
    tie-break). Singleton documents keep their own label via the
    left join, so the output partitions the whole corpus. Every
    stage is linear or blocking-bounded; nothing is quadratic in the
    corpus."""
    from hi_csa_db_spark.operators.dedup import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.lower(strip_punct(F.col("text"))), 1, 24)
    pairs = (
        sorted_neighborhood_pairs(docs, key, id_col="doc_id", window=3)
        .filter(F.levenshtein("a_key", "b_key") <= 6)
        .select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    labels = graph.connected_components(pairs, iterations=3)
    m = docs.select("doc_id", "n_chars").join(
        labels, docs["doc_id"] == labels["id"], "left"
    ).select(
        "doc_id", "n_chars", F.coalesce("lbl", F.col("doc_id")).alias("lbl")
    )
    w = Window.partitionBy("lbl").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    wn = Window.partitionBy("lbl")
    ranked = m.select(
        "lbl",
        "doc_id",
        F.row_number().over(w).alias("sr"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.filter(F.col("sr") == 1).select(
        F.col("lbl").alias("cluster"),
        F.col("doc_id").alias("survivor_id"),
        F.col("n").cast("bigint").alias("n_members"),
    )


@_register(
    "d18_dedup_cluster_stats",
    None,  # oracle attached below (composes d6's label SQL verbatim)
)
def d18_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup audit report: the CLUSTER-SIZE HISTOGRAM of the near-dup
    components (d6's labels) plus each size's document share — the
    sanity check every dedup run ships with (a sudden giant cluster
    means a degenerate blocking key; a flat histogram of singletons
    means the threshold is too strict). Composes d6's pair->component
    machinery; one extra size rollup + a 1-row total broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(
        docs, n=3, num_hashes=16, bands=8, threshold=0.05
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = graph.connected_components(edges, iterations=3)
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    tot = sizes.agg(F.sum("cluster_size").alias("n_docs_total"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            F.round(
                F.col("cluster_size")
                * F.col("n_clusters")
                / F.col("n_docs_total").cast("double"),
                6,
            ).alias("doc_share"),
        )
        .orderBy("cluster_size")
    )


_ORACLES["d18_dedup_cluster_stats"] = f"""
    WITH {_D6_LABELS_SQL},
    csizes AS (SELECT lbl, COUNT(*) AS cluster_size FROM l3 GROUP BY lbl),
    ctot AS (SELECT SUM(cluster_size) AS n_docs_total FROM csizes)
    SELECT cluster_size, COUNT(*) AS n_clusters,
           ROUND(cluster_size * COUNT(*) / CAST(n_docs_total AS DOUBLE), 6)
             AS doc_share
    FROM csizes CROSS JOIN ctot
    GROUP BY cluster_size, n_docs_total
    """


@_register(
    "d17_line_dedup",
    """
    WITH lines AS (
      SELECT doc_id, md5(l) AS lh FROM (
        SELECT doc_id, unnest(string_split(text, '. ')) AS l FROM documents
      ) WHERE l <> ''
    ),
    df_ AS (SELECT lh, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY lh)
    SELECT l.doc_id,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate,
           ROUND(SUM(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS boilerplate_frac
    FROM lines l JOIN df_ d ON d.lh = l.lh
    GROUP BY l.doc_id
    """,
)
def d17_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LINE-level boilerplate detection — the granularity
    between whole-doc dedup (d1) and token-span dedup (d13): a line
    (sentence) appearing in >= 3 distinct documents is boilerplate
    (nav bars, disclaimers, cookie banners); per doc, the line count
    and boilerplate fraction that CCNet uses to strip or downrank.
    One line-hash aggregate over the Zipf-small distinct-line
    keyspace + one doc rollup; integer ratio rounded once."""
    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\. ")).alias("l")
    ).filter(F.col("l") != "").select("doc_id", F.md5("l").alias("lh"))
    dfr = lines.groupBy("lh").agg(F.countDistinct("doc_id").alias("df"))
    bp = F.when(F.col("df") >= 3, 1).otherwise(0)
    return (
        lines.join(dfr, "lh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(bp).cast("bigint").alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_boilerplate",
            F.round(
                F.col("n_boilerplate") / F.col("n_lines").cast("double"), 6
            ).alias("boilerplate_frac"),
        )
    )


@_register(
    "er2_blocking_recall",
    """
    WITH k AS (
      SELECT doc_id,
             substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), 1, 24) AS key
      FROM documents
    ),
    truth AS (
      SELECT COUNT(*) AS n_keys,
             SUM(ct * (ct - 1) // 2) AS true_pairs,
             MAX(ct) AS max_group
      FROM (SELECT key, COUNT(*) AS ct FROM k GROUP BY key)
    ),
    r AS (
      SELECT doc_id, key, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rnk
      FROM k
    ),
    found AS (
      SELECT COUNT(*) AS found_pairs
      FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
      WHERE a.key = b.key
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(max_group AS INT) AS max_group,
           CAST(true_pairs AS BIGINT) AS true_pairs,
           CAST(found_pairs AS BIGINT) AS found_pairs,
           CAST(CASE WHEN true_pairs = 0 THEN 1000000
                     ELSE found_pairs * 1000000 // true_pairs END AS BIGINT)
             AS recall_micro
    FROM truth CROSS JOIN found
    """,
)
def er2_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality audit (pairs completeness): how many of the
    TRUE duplicate pairs (same normalized 24-char blocking key —
    countable per key group as C(ct,2), no pair explosion) does d15's
    sorted-neighborhood window-3 blocking actually surface? Equal
    keys sort adjacent, so missed pairs are exactly those > 3 apart
    inside one key group — the audit that tells you the window is too
    small BEFORE a production linkage run silently drops matches.
    Recall is an integer micro ratio; everything else is counts.

    Scale shape: ground truth is ONE groupBy(key) aggregate (never
    materializing pairs); the found side reuses the d15 rank+offset
    equi-join (n·window candidates); both reduce to 1-row frames
    joined by broadcast."""
    from hi_csa_db_spark.operators.dedup import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.lower(strip_punct(F.col("text"))), 1, 24)
    k = docs.select("doc_id", key.alias("key"))
    truth = (
        k.groupBy("key")
        .agg(F.count(F.lit(1)).alias("ct"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(
                F.expr("ct * (ct - 1) div 2")
            ).alias("true_pairs"),
            F.max("ct").alias("max_group"),
        )
    )
    found = (
        sorted_neighborhood_pairs(docs, key, id_col="doc_id", window=3)
        .filter(F.col("a_key") == F.col("b_key"))
        .agg(F.count(F.lit(1)).alias("found_pairs"))
    )
    return truth.crossJoin(F.broadcast(found)).select(
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("max_group").cast("int").alias("max_group"),
        F.col("true_pairs").cast("bigint").alias("true_pairs"),
        F.col("found_pairs").cast("bigint").alias("found_pairs"),
        F.expr(
            "CAST(CASE WHEN true_pairs = 0 THEN 1000000"
            " ELSE found_pairs * 1000000 div true_pairs END AS BIGINT)"
        ).alias("recall_micro"),
    )


@_register(
    "d20_lsh_s_curve",
    """
    WITH g AS (SELECT unnest(range(1, 20)) AS i),
    j AS (SELECT i, CAST(i AS DOUBLE) / 20 AS jac FROM g),
    y1 AS (SELECT i, jac, 1 - jac * jac AS y FROM j),
    y2 AS (SELECT i, jac, y * y AS y2 FROM y1),
    y4 AS (SELECT i, jac, y2 * y2 AS y4 FROM y2),
    p AS (SELECT i, jac, 1 - y4 * y4 AS p_cand FROM y4)
    SELECT CAST(i * 50000 AS BIGINT) AS jaccard_micro,
           ROUND(p_cand, 6) AS p_candidate,
           CASE WHEN p_cand >= 0.5 THEN 1 ELSE 0 END AS above_half
    FROM p
    """,
)
def d20_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH design S-curve for the repo's 16-hash / 8-band / 2-row
    geometry: P(candidate | jaccard j) = 1 - (1 - j^2)^8 on a
    0.05-step grid — the table d2/d9/x62/x66 are tuned from, and the
    closed form d14's empirical calibration is checked against. The
    curve's 0.5 crossing (~0.35) is the geometry's effective
    threshold.

    Determinism: inputs are the exact rationals i/20 and the 8th
    power is EXPLICIT repeated squaring (y->y2->y4->y8) — pure
    correctly-rounded IEEE multiplies on both engines, never the
    libm pow() path whose last ulp is host-dependent — so the doubles
    are bit-identical before the 6dp ROUND (boundary_sweep-stable).

    Scale: 19 rows of arithmetic — the planning table is free; its
    value is pinning the geometry's semantics next to the operators
    that rely on it."""
    g = spark.range(1, 20).select(F.col("id").cast("int").alias("i"))
    jac = (F.col("i").cast("double") / 20).alias("jac")
    p = (
        g.select("i", jac)
        .select("i", "jac", (F.lit(1.0) - F.col("jac") * F.col("jac")).alias("y"))
        .select("i", "jac", (F.col("y") * F.col("y")).alias("y2"))
        .select("i", "jac", (F.col("y2") * F.col("y2")).alias("y4"))
        .select("i", "jac", (F.lit(1.0) - F.col("y4") * F.col("y4")).alias("p_cand"))
    )
    return p.select(
        (F.col("i").cast("bigint") * 50000).alias("jaccard_micro"),
        F.round("p_cand", 6).alias("p_candidate"),
        (F.col("p_cand") >= 0.5).cast("int").alias("above_half"),
    )


@_register(
    "d21_band_planner",
    """
    WITH g AS (SELECT unnest(range(1, 20)) AS i),
    geo AS (SELECT * FROM (VALUES (16, 1), (8, 2), (4, 4), (2, 8), (1, 16))
            AS v(bands, rows_per_band)),
    jg AS (SELECT i, CAST(i AS DOUBLE) / 20 AS jp0 FROM g),
    j1 AS (SELECT i, jp0, jp0 * jp0 AS jp1 FROM jg),
    j2 AS (SELECT i, jp0, jp1, jp1 * jp1 AS jp2 FROM j1),
    j3 AS (SELECT i, jp0, jp1, jp2, jp2 * jp2 AS jp3 FROM j2),
    j4 AS (SELECT i, jp0, jp1, jp2, jp3, jp3 * jp3 AS jp4 FROM j3),
    e AS (
      SELECT geo.bands, geo.rows_per_band, j4.i,
             1 - CASE geo.rows_per_band
                   WHEN 1 THEN jp0 WHEN 2 THEN jp1 WHEN 4 THEN jp2
                   WHEN 8 THEN jp3 ELSE jp4 END AS yp0
      FROM geo CROSS JOIN j4
    ),
    y1 AS (SELECT bands, rows_per_band, i, yp0, yp0 * yp0 AS yp1 FROM e),
    y2 AS (SELECT bands, rows_per_band, i, yp0, yp1, yp1 * yp1 AS yp2 FROM y1),
    y3 AS (SELECT bands, rows_per_band, i, yp0, yp1, yp2, yp2 * yp2 AS yp3
           FROM y2),
    y4 AS (SELECT bands, rows_per_band, i, yp0, yp1, yp2, yp3, yp3 * yp3 AS yp4
           FROM y3),
    p AS (
      SELECT bands, rows_per_band, i,
             CAST(FLOOR((1 - CASE bands
                    WHEN 1 THEN yp0 WHEN 2 THEN yp1 WHEN 4 THEN yp2
                    WHEN 8 THEN yp3 ELSE yp4 END) * 1000000 + 0.5)
               AS BIGINT) AS p_micro
      FROM y4
    ),
    t AS (SELECT unnest([4, 7, 10, 14]) AS ti),
    err AS (
      SELECT t.ti, p.bands, p.rows_per_band,
             CAST(SUM(CASE WHEN p.i < t.ti THEN p.p_micro
                           ELSE 1000000 - p.p_micro END) AS BIGINT)
               AS err_micro
      FROM t CROSS JOIN p GROUP BY t.ti, p.bands, p.rows_per_band
    ),
    best AS (
      SELECT ti, bands, rows_per_band, err_micro,
             ROW_NUMBER() OVER (PARTITION BY ti
                                ORDER BY err_micro ASC, bands ASC) AS rk
      FROM err
    )
    SELECT CAST(ti AS BIGINT) * 50000 AS target_micro,
           CAST(bands AS INT) AS bands,
           CAST(rows_per_band AS INT) AS rows_per_band,
           err_micro
    FROM best WHERE rk = 1
    """,
)
def d21_band_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-driven MinHash band planning (VERDICT r5 item 6): for
    each target Jaccard threshold (0.20 / 0.35 / 0.50 / 0.70), pick
    the (bands, rows_per_band) factorization of the repo's 16-hash
    budget whose LSH S-curve has the LEAST error mass against the
    ideal step filter — error mass = sum over the d20 Jaccard grid of
    P(candidate) below the threshold (false candidates, wasted
    verification) plus 1-P(candidate) at/above it (missed near-dups).
    This is the engine-checked planner behind dedup.plan_lsh_bands'
    closed-form shortcut: d2/d9's 8x2 geometry should win (only) the
    0.35 target — its S-curve crosses 1/2 near (1/8)^(1/2) ≈ 0.35 —
    while tighter thresholds plan more rows per band and looser ones
    more bands, and the chosen geometry's err_micro quantifies the
    trade the operator is making.

    Determinism: dedup.band_plan_table's contract — exact rational
    grid points, explicit repeated-squaring (never libm pow), floor
    integer-micro probabilities — then pure bigint error sums and a
    (err, bands) ordered rank, so both engines agree bit-for-bit.

    Scale: the whole planning table is |geometries| x 19 literal rows
    — free at any corpus size; it never touches data."""
    pts = dedup.band_plan_table(spark, num_hashes=16, grid=20)
    targets = spark.createDataFrame([(4,), (7,), (10,), (14,)], "ti int")
    err = (
        targets.crossJoin(F.broadcast(pts))
        .select(
            "ti",
            "bands",
            "rows_per_band",
            F.when(F.col("i") < F.col("ti"), F.col("p_micro"))
            .otherwise(F.lit(1000000) - F.col("p_micro"))
            .alias("e"),
        )
        .groupBy("ti", "bands", "rows_per_band")
        .agg(F.sum("e").cast("bigint").alias("err_micro"))
    )
    w = Window.partitionBy("ti").orderBy(
        F.col("err_micro").asc(), F.col("bands").asc()
    )
    return (
        err.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            (F.col("ti").cast("bigint") * 50000).alias("target_micro"),
            F.col("bands").cast("int").alias("bands"),
            F.col("rows_per_band").cast("int").alias("rows_per_band"),
            "err_micro",
        )
    )


@_register(
    "er3_golden_record",
    f"""
    WITH {_ER1_CLUSTER_SQL},
    mem AS (
      SELECT COALESCE(l3.lbl, d.doc_id) AS lbl, d.doc_id, d.lang, d.source,
             d.n_chars
      FROM documents d LEFT JOIN l3 ON l3.id = d.doc_id
    ),
    best AS (
      SELECT lbl, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lbl
                                ORDER BY n_chars DESC, doc_id ASC) AS sr
      FROM mem
    ),
    lmode AS (
      SELECT lbl, lang,
             ROW_NUMBER() OVER (PARTITION BY lbl
                                ORDER BY COUNT(*) DESC, lang ASC) AS lr
      FROM mem GROUP BY lbl, lang
    ),
    smode AS (
      SELECT lbl, source,
             ROW_NUMBER() OVER (PARTITION BY lbl
                                ORDER BY COUNT(*) DESC, source ASC) AS sr2
      FROM mem GROUP BY lbl, source
    ),
    agg AS (
      SELECT lbl, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM mem GROUP BY lbl
    )
    SELECT a.lbl AS cluster, a.n_members,
           b.doc_id AS survivor_id,
           lm.lang AS lang_canon,
           sm.source AS source_canon,
           a.total_chars, a.n_sources
    FROM agg a
    JOIN best b ON b.lbl = a.lbl AND b.sr = 1
    JOIN lmode lm ON lm.lbl = a.lbl AND lm.lr = 1
    JOIN smode sm ON sm.lbl = a.lbl AND sm.sr2 = 1
    WHERE a.n_members > 1
    """,
)
def er3_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution SURVIVORSHIP: one golden record per
    multi-member cluster, each ATTRIBUTE merged by its own
    deterministic rule — the MDM step after er1's match/cluster:
    survivor_id = longest text (id ties), lang/source = per-cluster
    MODE (count desc, value asc — exact integer rule, no sampling),
    total_chars = exact sum, n_sources = provenance width. er1 keeps
    one ROW; this merges the FIELDS, which is what a master-data
    pipeline actually publishes. Clusters are er1's (sorted-
    neighborhood blocking -> edit-distance match -> 3-round integer
    min-label), singletons excluded (nothing to merge).

    Scale: inherits er1's blocking-bounded match; survivorship adds
    per-cluster windows and map-combined aggregates, all keyed on the
    cluster label — nothing quadratic, no driver round-trip."""
    from hi_csa_db_spark.operators.dedup import sorted_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.lower(strip_punct(F.col("text"))), 1, 24)
    pairs = (
        sorted_neighborhood_pairs(docs, key, id_col="doc_id", window=3)
        .filter(F.levenshtein("a_key", "b_key") <= 6)
        .select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    labels = graph.connected_components(pairs, iterations=3)
    mem = (
        docs.select("doc_id", "lang", "source", "n_chars")
        .join(labels, docs["doc_id"] == labels["id"], "left")
        .select(
            F.coalesce("lbl", F.col("doc_id")).alias("lbl"),
            "doc_id",
            "lang",
            "source",
            "n_chars",
        )
        # four survivorship branches (best/lang-mode/source-mode/agg)
        # consume this frame; without truncation each branch re-runs
        # the whole blocking+clustering lineage (observed: 12 scans /
        # 45 shuffles in the plan report). One lazy checkpoint makes
        # the expensive derivation run once.
        .localCheckpoint(eager=False)
    )
    wb = Window.partitionBy("lbl").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    best = (
        mem.withColumn("sr", F.row_number().over(wb))
        .filter(F.col("sr") == 1)
        .select("lbl", F.col("doc_id").alias("survivor_id"))
    )
    lmode = (
        mem.groupBy("lbl", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "lr",
            F.row_number().over(
                Window.partitionBy("lbl").orderBy(
                    F.col("c").desc(), F.col("lang").asc()
                )
            ),
        )
        .filter(F.col("lr") == 1)
        .select("lbl", F.col("lang").alias("lang_canon"))
    )
    smode = (
        mem.groupBy("lbl", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "sr2",
            F.row_number().over(
                Window.partitionBy("lbl").orderBy(
                    F.col("c").desc(), F.col("source").asc()
                )
            ),
        )
        .filter(F.col("sr2") == 1)
        .select("lbl", F.col("source").alias("source_canon"))
    )
    agg = mem.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    return (
        agg.filter(F.col("n_members") > 1)
        .join(best, "lbl")
        .join(lmode, "lbl")
        .join(smode, "lbl")
        .select(
            F.col("lbl").alias("cluster"),
            "n_members",
            "survivor_id",
            "lang_canon",
            "source_canon",
            "total_chars",
            "n_sources",
        )
    )


@_register(
    "er4_blocking_eval",
    f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ic
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.id_a, i.id_b
      FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                   JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.ic / (sa.sz + sb.sz - i.ic) >= 0.05
    ),
    seeds AS (SELECT unnest(range(0, 16)) AS seed),
    hh AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h1,
             CAST('0x' || substring(md5(shingle), 16, 12) AS BIGINT) * 2 + 1 AS h2
      FROM sh
    ),
    mh AS (
      SELECT doc_id, seed,
             MIN((h1 + seed * h2) % 1152921504606846976) AS mh
      FROM hh CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, band,
             md5(band::VARCHAR || '|' ||
                 string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS bkey
      FROM (SELECT doc_id, seed, mh, seed // 2 AS band FROM mh)
      GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                               AND a.doc_id < b.doc_id
    ),
    k AS (
      SELECT doc_id,
             substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                    1, 24) AS key
      FROM documents
    ),
    r AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rnk FROM k
    ),
    w1 AS (
      SELECT doc_id,
             (list_filter(
               string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                            ' '),
               x -> x <> ''))[1] AS w
      FROM documents
    ),
    sd0 AS (
      SELECT doc_id, w,
             translate(substr(w, 2),
                       'bfpvcgjkqsxzdtlmnraeiouyhw0123456789',
                       '111122222222334556000000000000000000') AS d
      FROM w1 WHERE w IS NOT NULL AND w <> ''
    ),
    sd1 AS (
      SELECT doc_id, w,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(d,
          '1{{2,}}', '1', 'g'), '2{{2,}}', '2', 'g'), '3{{2,}}', '3', 'g'),
          '4{{2,}}', '4', 'g'), '5{{2,}}', '5', 'g'), '6{{2,}}', '6', 'g') AS d
      FROM sd0
    ),
    code AS (
      SELECT doc_id,
             upper(substr(w, 1, 1))
               || substr(replace(d, '0', '') || '000', 1, 3) AS sdx
      FROM sd1
    ),
    wide AS (
      SELECT
        (SELECT COUNT(*) FROM documents) AS n_docs,
        (SELECT COUNT(*) FROM truth) AS truth_cnt,
        (SELECT COUNT(*) FROM cand) AS lsh_cnt,
        (SELECT COUNT(*) FROM truth t JOIN cand c
           ON c.id_a = t.id_a AND c.id_b = t.id_b) AS lsh_hits,
        (SELECT SUM(LEAST(3, (SELECT COUNT(*) FROM r) - rnk)) FROM r)
          AS sn_cnt,
        (SELECT COUNT(*) FROM truth t
           JOIN r ra ON ra.doc_id = t.id_a
           JOIN r rb ON rb.doc_id = t.id_b
         WHERE ABS(ra.rnk - rb.rnk) <= 3) AS sn_hits,
        (SELECT SUM(c * (c - 1) // 2) FROM
           (SELECT COUNT(*) AS c FROM code GROUP BY sdx)) AS sdx_cnt,
        (SELECT COUNT(*) FROM truth t
           JOIN code ca ON ca.doc_id = t.id_a
           JOIN code cb ON cb.doc_id = t.id_b AND cb.sdx = ca.sdx) AS sdx_hits
    )
    SELECT family, n_candidates, hits, truth_pairs,
           CASE WHEN truth_pairs > 0
                THEN CAST(hits * 10000 // truth_pairs AS BIGINT) END
             AS recall_bps,
           CAST(n_candidates * 1000000 // (n_docs * (n_docs - 1) // 2)
             AS BIGINT) AS cand_ppm
    FROM (
      SELECT 'lsh_bands' AS family, CAST(lsh_cnt AS BIGINT) AS n_candidates,
             CAST(lsh_hits AS BIGINT) AS hits,
             CAST(truth_cnt AS BIGINT) AS truth_pairs, n_docs FROM wide
      UNION ALL
      SELECT 'sorted_neighborhood', CAST(sn_cnt AS BIGINT),
             CAST(sn_hits AS BIGINT), CAST(truth_cnt AS BIGINT), n_docs
      FROM wide
      UNION ALL
      SELECT 'soundex_block', CAST(sdx_cnt AS BIGINT),
             CAST(sdx_hits AS BIGINT), CAST(truth_cnt AS BIGINT), n_docs
      FROM wide
    )
    """,
)
def er4_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-strategy evaluation — the pairs-completeness /
    reduction-ratio report every entity-resolution pipeline runs
    before committing to a blocking key (Christen's PC/RR metrics):
    each of the three blocking families this engine ships (d2's
    MinHash LSH bands, d15's sorted-neighborhood rank window, f18's
    lead-token soundex blocks) is scored against exact ground truth
    (full inverted-index Jaccard >= 0.05, the d2 verify rule) on
    recall of true pairs (recall_bps) and candidate volume as parts
    per million of all n*(n-1)/2 pairs (cand_ppm). Soundex candidate
    volume is counted from block sizes (sum of c*(c-1)/2) without
    materializing a single pair, and hits are computed by joining the
    bounded truth set against per-doc block keys — the same trick a
    100 TB run would use.

    Scale: shared shingle frame checkpointed once (truth + LSH
    signatures both consume it); ground truth is the expensive audit
    (at scale: run on a stratified sample); each family's candidate
    generation keeps its own already-audited bounded shape."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingles(docs, n=3).localCheckpoint(eager=False)
    truth = (
        dedup.jaccard_pairs(sh)
        .filter(F.col("jaccard") >= 0.05)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sigs = dedup.minhash_signatures(sh, num_hashes=16)
    cand = dedup.lsh_candidate_pairs(sigs, bands=8, rows=2)
    key = F.substring(F.lower(strip_punct(F.col("text"))), 1, 24)
    # corpus-sized rank -> range-partitioned global_row_numbers over a
    # (key, doc_id) struct, same as d15's operator (VERDICT r7 item 6:
    # this was the one corpus-sized Window.orderBy left in queries.py)
    r = (
        ordered.global_row_numbers(
            docs.select(
                "doc_id",
                F.struct(key.alias("k"), F.col("doc_id")).alias("__key"),
            ),
            "__key",
        )
        .select("doc_id", F.col("rank").alias("rnk"))
        .localCheckpoint(eager=False)
    )
    w0 = F.filter(tokenize(F.lower(strip_punct(F.col("text")))), lambda x: x != "")[0]
    w1 = docs.select("doc_id", w0.alias("w")).filter(
        F.col("w").isNotNull() & (F.col("w") != "")
    )
    d = F.translate(
        F.expr("substr(w, 2)"),
        "bfpvcgjkqsxzdtlmnraeiouyhw0123456789",
        "111122222222334556000000000000000000",
    )
    for digit in "123456":
        d = F.regexp_replace(d, digit + "{2,}", digit)
    sdx = F.concat(
        F.upper(F.substring("w", 1, 1)),
        F.substring(
            F.concat(F.replace(d, F.lit("0"), F.lit("")), F.lit("000")), 1, 3
        ),
    )
    code = w1.select("doc_id", sdx.alias("sdx")).localCheckpoint(eager=False)

    n1 = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    truth_cnt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("truth_cnt"))
    lsh_cnt = cand.agg(F.count(F.lit(1)).cast("bigint").alias("lsh_cnt"))
    lsh_hits = (
        truth.join(cand, ["id_a", "id_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("lsh_hits"))
    )
    rmax = r.agg(F.max("rnk").alias("mx"))
    sn_cnt = (
        r.crossJoin(F.broadcast(rmax))
        .agg(
            F.sum(F.least(F.lit(3), F.col("mx") - F.col("rnk")))
            .cast("bigint")
            .alias("sn_cnt")
        )
    )
    ra = r.select(F.col("doc_id").alias("id_a"), F.col("rnk").alias("ra"))
    rb = r.select(F.col("doc_id").alias("id_b"), F.col("rnk").alias("rb"))
    sn_hits = (
        truth.join(ra, "id_a")
        .join(rb, "id_b")
        .filter(F.abs(F.col("ra") - F.col("rb")) <= 3)
        .agg(F.count(F.lit(1)).cast("bigint").alias("sn_hits"))
    )
    sdx_cnt = (
        code.groupBy("sdx")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias("sdx_cnt")
        )
    )
    ca = code.select(F.col("doc_id").alias("id_a"), F.col("sdx").alias("sa"))
    cb = code.select(F.col("doc_id").alias("id_b"), F.col("sdx").alias("sb"))
    sdx_hits = (
        truth.join(ca, "id_a")
        .join(cb, "id_b")
        .filter(F.col("sa") == F.col("sb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("sdx_hits"))
    )
    wide = (
        n1.crossJoin(F.broadcast(truth_cnt))
        .crossJoin(F.broadcast(lsh_cnt))
        .crossJoin(F.broadcast(lsh_hits))
        .crossJoin(F.broadcast(sn_cnt))
        .crossJoin(F.broadcast(sn_hits))
        .crossJoin(F.broadcast(sdx_cnt))
        .crossJoin(F.broadcast(sdx_hits))
        .localCheckpoint(eager=False)
    )
    rows = []
    for fam, cnt, hits in (
        ("lsh_bands", "lsh_cnt", "lsh_hits"),
        ("sorted_neighborhood", "sn_cnt", "sn_hits"),
        ("soundex_block", "sdx_cnt", "sdx_hits"),
    ):
        rows.append(
            wide.select(
                F.lit(fam).alias("family"),
                F.col(cnt).alias("n_candidates"),
                F.col(hits).alias("hits"),
                F.col("truth_cnt").alias("truth_pairs"),
                F.when(
                    F.col("truth_cnt") > 0,
                    F.expr(f"CAST({hits} * 10000 div truth_cnt AS BIGINT)"),
                ).alias("recall_bps"),
                F.expr(
                    f"CAST({cnt} * 1000000 div (n_docs * (n_docs - 1) div 2)"
                    " AS BIGINT)"
                ).alias("cand_ppm"),
            )
        )
    out = rows[0]
    for fam_df in rows[1:]:
        out = out.unionByName(fam_df)
    return out


@_register(
    "er6_bcubed_quality",
    f"""
    WITH {_ER1_CLUSTER_SQL},
    ttoks AS (
      SELECT doc_id, list_filter(
        string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
        x -> x <> '') AS toks
      FROM documents
    ),
    tsh AS MATERIALIZED (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                                     i -> array_to_string(toks[i:i+2], ' ')))
                 AS shingle
        FROM ttoks
      ) WHERE shingle <> ''
    ),
    -- AS MATERIALIZED on the truth-graph chain (r12, VERDICT r11
    -- item 3): t1/t2/t3 each reference their predecessor THREE times
    -- and DuckDB inlines plain CTEs per reference, so the un-fenced
    -- chain re-evaluated the tinter/tpairs truth subtree ~27x —
    -- ~250 s of every full sweep. Fences are evaluation-order only
    -- (same values); oracle now runs in seconds. Same fix class as
    -- _D6_LABELS_SQL (r10).
    tsizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM tsh GROUP BY doc_id),
    tinter AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ic
      FROM tsh a JOIN tsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    tpairs AS MATERIALIZED (
      SELECT i.id_a AS src, i.id_b AS dst
      FROM tinter i JOIN tsizes sa ON sa.doc_id = i.id_a
                    JOIN tsizes sb ON sb.doc_id = i.id_b
      WHERE i.ic / (sa.sz + sb.sz - i.ic) >= 0.05
    ),
    tud AS MATERIALIZED (SELECT src, dst FROM tpairs
            UNION ALL SELECT dst AS src, src AS dst FROM tpairs),
    t0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM documents),
    t1 AS MATERIALIZED (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM t0 n JOIN t0 s ON s.id = n.id
           LEFT JOIN tud e ON e.src = n.id LEFT JOIN t0 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    t2 AS MATERIALIZED (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM t1 n JOIN t1 s ON s.id = n.id
           LEFT JOIN tud e ON e.src = n.id LEFT JOIN t1 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    t3 AS MATERIALIZED (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM t2 n JOIN t2 s ON s.id = n.id
           LEFT JOIN tud e ON e.src = n.id LEFT JOIN t2 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    el AS (
      SELECT s.id, s.lbl AS c, t.lbl AS t
      FROM l3 s JOIN t3 t ON t.id = s.id
    ),
    cells AS (SELECT c, t, CAST(COUNT(*) AS BIGINT) AS n_ct
              FROM el GROUP BY c, t),
    nc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_c FROM el GROUP BY c),
    nt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t FROM el GROUP BY t),
    agg AS (
      SELECT CAST(SUM(n_ct) AS BIGINT) AS n_docs,
             CAST(SUM(cells.n_ct * (cells.n_ct * 1000000 // nc.n_c))
                  AS BIGINT) AS psum,
             CAST(SUM(cells.n_ct * (cells.n_ct * 1000000 // nt.n_t))
                  AS BIGINT) AS rsum
      FROM cells JOIN nc USING (c) JOIN nt USING (t)
    ),
    kc AS (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS n_sys,
                  CAST(COUNT(DISTINCT t) AS BIGINT) AS n_truth FROM el)
    SELECT a.n_docs, kc.n_sys AS n_sys_clusters,
           kc.n_truth AS n_truth_clusters,
           CAST(a.psum // a.n_docs AS BIGINT) AS b3_precision_micro,
           CAST(a.rsum // a.n_docs AS BIGINT) AS b3_recall_micro,
           CAST(2 * (a.psum // a.n_docs) * (a.rsum // a.n_docs)
                // ((a.psum // a.n_docs) + (a.rsum // a.n_docs))
                AS BIGINT) AS b3_f1_micro
    FROM agg a CROSS JOIN kc
    """,
)
def er6_bcubed_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed cluster-quality evaluation (Bagga & Baldwin 1998) of
    er1's SYSTEM clusters against exact-Jaccard TRUTH clusters
    (components of the >=0.05 3-gram-Jaccard pair graph, the d2/er4
    truth rule): per-element precision |C(e) n T(e)|/|C(e)| and
    recall .../|T(e)| collapse to one (system, truth) CELL table —
    every element in a cell shares both values, so B3P =
    sum(n_ct * floor-micro(n_ct/n_c)) / N with NO per-element pass.
    er2 scores the blocking stage (pair recall); this scores the
    CLUSTERING output itself, the metric that catches over-merging
    (precision) and over-splitting (recall) separately. Exact
    integer micros (floor per cell — documented metric definition),
    matched rounds (k=3) on both label propagations.

    Scale shape: both label tables are doc-sized; the eval runs on
    the (c, t) CELL table — bounded by min(clusters, truth) and in
    practice near the cluster count — plus two dimension-sized
    marginals. The exact-Jaccard truth graph is the expensive audit
    input (er4's contract: at scale, run on a stratified sample)."""
    from hi_csa_db_spark.operators.dedup import (
        jaccard_pairs,
        shingles,
        sorted_neighborhood_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.lower(strip_punct(F.col("text"))), 1, 24)
    spairs = (
        sorted_neighborhood_pairs(docs, key, id_col="doc_id", window=3)
        .filter(F.levenshtein("a_key", "b_key") <= 6)
        .select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )
    slab = graph.connected_components(spairs, iterations=3)
    sh = shingles(docs, n=3)
    tpairs = (
        jaccard_pairs(sh)
        .filter(F.col("jaccard") >= 0.05)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    tlab = graph.connected_components(tpairs, iterations=3)
    el = (
        docs.select("doc_id")
        .join(slab, docs["doc_id"] == slab["id"], "left")
        .select("doc_id", F.coalesce("lbl", F.col("doc_id")).alias("c"))
        .join(
            tlab.select(F.col("id").alias("tid"), F.col("lbl").alias("tl")),
            F.col("doc_id") == F.col("tid"),
            "left",
        )
        .select("doc_id", "c", F.coalesce("tl", F.col("doc_id")).alias("t"))
        .localCheckpoint(eager=False)  # cells + marginals + counts share it
    )
    cells = el.groupBy("c", "t").agg(F.count(F.lit(1)).cast("bigint").alias("n_ct"))
    nc = el.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
    nt = el.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    agg = (
        cells.join(nc, "c")
        .join(nt, "t")
        .agg(
            F.sum("n_ct").cast("bigint").alias("n_docs"),
            F.sum(F.expr("n_ct * (n_ct * 1000000 div n_c)"))
            .cast("bigint")
            .alias("psum"),
            F.sum(F.expr("n_ct * (n_ct * 1000000 div n_t)"))
            .cast("bigint")
            .alias("rsum"),
        )
    )
    kc = el.agg(
        F.countDistinct("c").cast("bigint").alias("n_sys_clusters"),
        F.countDistinct("t").cast("bigint").alias("n_truth_clusters"),
    )
    return agg.crossJoin(F.broadcast(kc)).select(
        "n_docs",
        "n_sys_clusters",
        "n_truth_clusters",
        F.expr("CAST(psum div n_docs AS BIGINT)").alias("b3_precision_micro"),
        F.expr("CAST(rsum div n_docs AS BIGINT)").alias("b3_recall_micro"),
        F.expr(
            "CAST(2 * (psum div n_docs) * (rsum div n_docs)"
            " div ((psum div n_docs) + (rsum div n_docs)) AS BIGINT)"
        ).alias("b3_f1_micro"),
    )


@_register(
    "er7_fellegi_sunter",
    """
    WITH o AS (
      SELECT o_orderkey AS k, o_custkey AS c,
             o_orderpriority AS pr, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS pb,
             month(o_orderdate) AS mo,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    ),
    mp AS (
      SELECT CASE WHEN a.pr = b.pr THEN 1 ELSE 0 END AS apr,
             CASE WHEN a.st = b.st THEN 1 ELSE 0 END AS ast,
             CASE WHEN a.pb = b.pb THEN 1 ELSE 0 END AS apb,
             CASE WHEN a.mo = b.mo THEN 1 ELSE 0 END AS amo
      FROM o a JOIN o b ON a.c = b.c AND a.k < b.k
    ),
    mm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(apr) AS BIGINT) AS pr, CAST(SUM(ast) AS BIGINT) AS st,
             CAST(SUM(apb) AS BIGINT) AS pb, CAST(SUM(amo) AS BIGINT) AS mo
      FROM mp
    ),
    os AS (SELECT * FROM o WHERE k % 4 = 0),
    up AS (
      SELECT CASE WHEN a.pr = b.pr THEN 1 ELSE 0 END AS apr,
             CASE WHEN a.st = b.st THEN 1 ELSE 0 END AS ast,
             CASE WHEN a.pb = b.pb THEN 1 ELSE 0 END AS apb,
             CASE WHEN a.mo = b.mo THEN 1 ELSE 0 END AS amo
      FROM os a JOIN os b ON a.d = b.d AND a.c <> b.c AND a.k < b.k
    ),
    um AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(apr) AS BIGINT) AS pr, CAST(SUM(ast) AS BIGINT) AS st,
             CAST(SUM(apb) AS BIGINT) AS pb, CAST(SUM(amo) AS BIGINT) AS mo
      FROM up
    ),
    f AS (
      SELECT 'month' AS field, mm.mo * 1000000 // mm.n AS m_micro,
             um.mo * 1000000 // um.n AS u_micro FROM mm, um
      UNION ALL
      SELECT 'price_bucket', mm.pb * 1000000 // mm.n,
             um.pb * 1000000 // um.n FROM mm, um
      UNION ALL
      SELECT 'priority', mm.pr * 1000000 // mm.n,
             um.pr * 1000000 // um.n FROM mm, um
      UNION ALL
      SELECT 'status', mm.st * 1000000 // mm.n,
             um.st * 1000000 // um.n FROM mm, um
    )
    SELECT field, CAST(m_micro AS BIGINT) AS m_micro,
           CAST(u_micro AS BIGINT) AS u_micro,
           CAST(m_micro * 1000000 // GREATEST(u_micro, 1) AS BIGINT)
             AS w_agree_micro,
           CAST((1000000 - m_micro) * 1000000
                // GREATEST(1000000 - u_micro, 1) AS BIGINT)
             AS w_disagree_micro
    FROM f
    """,
)
def er7_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage weights (JASA 1969,
    the decision-theoretic core of Splink/RecordLinkage-style ER): for
    each comparison field, estimate m = P(agree | match) from pairs of
    orders KNOWN to co-refer (same customer — the deterministic
    surrogate-truth rule) and u = P(agree | non-match) from same-day
    different-customer pairs, then emit the agreement/disagreement
    weights m/u and (1-m)/(1-u) that a linkage scorer would sum in
    log space. All exact integer micro-units (floor division, both
    dialects) — the m/u RATIO is emitted instead of its log because
    log is monotone: the weight ORDERING is identical and no libm
    result crosses the engine boundary (the x57 term-lift rule).

    er1-er6 build and evaluate clusters; this estimates the FIELD
    WEIGHTS those pipelines would score with — the missing first
    stage of the classic linkage stack.

    Scale shape: the m-estimation self-join is blocked by customer
    (sum of per-customer orders², bounded by the per-customer order
    cap); the u-estimation is blocked by order DATE over a
    deterministic 1-in-4 key sample (k % 4 = 0, the documented
    sampling contract — u needs only a rate estimate, so the sample
    bounds the day-bucket² volume at any scale; sub-day buckets are
    the 100x escape hatch). Both collapse map-side to one 1-row
    aggregate each; the 4-row output is a broadcast cross of scalars.
    No global sort, no skew exposure beyond the named buckets."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"),
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("pb"),
        F.month("o_orderdate").alias("mo"),
        F.to_date("o_orderdate").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")

    def _agrees(df):
        return df.select(
            F.when(F.col("a.pr") == F.col("b.pr"), 1).otherwise(0).alias("apr"),
            F.when(F.col("a.st") == F.col("b.st"), 1).otherwise(0).alias("ast"),
            F.when(F.col("a.pb") == F.col("b.pb"), 1).otherwise(0).alias("apb"),
            F.when(F.col("a.mo") == F.col("b.mo"), 1).otherwise(0).alias("amo"),
        )

    def _rates(df):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("apr").cast("bigint").alias("pr"),
            F.sum("ast").cast("bigint").alias("st"),
            F.sum("apb").cast("bigint").alias("pb"),
            F.sum("amo").cast("bigint").alias("mo"),
        )

    mm = _rates(
        _agrees(
            a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.k") < F.col("b.k")))
        )
    )
    osamp = o.filter(F.col("k") % 4 == 0)
    sa, sb = osamp.alias("a"), osamp.alias("b")
    um = _rates(
        _agrees(
            sa.join(
                sb,
                (F.col("a.d") == F.col("b.d"))
                & (F.col("a.c") != F.col("b.c"))
                & (F.col("a.k") < F.col("b.k")),
            )
        )
    )
    both = mm.select(
        [F.col(c).alias(f"m_{c}") for c in ("n", "pr", "st", "pb", "mo")]
    ).crossJoin(
        F.broadcast(
            um.select(
                [F.col(c).alias(f"u_{c}") for c in ("n", "pr", "st", "pb", "mo")]
            )
        )
    ).localCheckpoint(eager=False)  # 4 consumers (one per field row)
    rows = []
    for field, col in (
        ("month", "mo"),
        ("price_bucket", "pb"),
        ("priority", "pr"),
        ("status", "st"),
    ):
        rows.append(
            both.select(
                F.lit(field).alias("field"),
                F.expr(f"CAST(m_{col} * 1000000 div m_n AS BIGINT)").alias(
                    "m_micro"
                ),
                F.expr(f"CAST(u_{col} * 1000000 div u_n AS BIGINT)").alias(
                    "u_micro"
                ),
            )
        )
    f = rows[0]
    for r in rows[1:]:
        f = f.unionByName(r)
    return f.select(
        "field",
        "m_micro",
        "u_micro",
        F.expr(
            "CAST(m_micro * 1000000 div GREATEST(u_micro, 1) AS BIGINT)"
        ).alias("w_agree_micro"),
        F.expr(
            "CAST((1000000 - m_micro) * 1000000"
            " div GREATEST(1000000 - u_micro, 1) AS BIGINT)"
        ).alias("w_disagree_micro"),
    )

@_register(
    "er8_fs_decisions",
    f"""
    WITH o0 AS (
      SELECT o_orderkey AS k, o_custkey AS c, o_orderpriority AS pr,
             o_orderstatus AS st,
             CAST(floor(o_totalprice / 50000) AS BIGINT) AS pb,
             month(o_orderdate) AS mo
      FROM orders
    ),
    nb AS (
      SELECT CAST(greatest(1024, COUNT(*) // 8) AS BIGINT) AS nbuckets
      FROM o0
    ),
    o AS (
      SELECT o0.*,
             CAST(({MULT_HASH32_SQL.format(key='o0.k', a='2654435761')})
                  % nb.nbuckets AS BIGINT) AS hb
      FROM o0 CROSS JOIN nb
    ),
    mpairs AS (
      SELECT CASE WHEN a.pr = b.pr THEN 1 ELSE 0 END AS apr,
             CASE WHEN a.st = b.st THEN 1 ELSE 0 END AS ast,
             CASE WHEN a.pb = b.pb THEN 1 ELSE 0 END AS apb,
             CASE WHEN a.mo = b.mo THEN 1 ELSE 0 END AS amo
      FROM o a JOIN o b ON a.c = b.c AND a.k < b.k
    ),
    upairs AS (
      SELECT CASE WHEN a.pr = b.pr THEN 1 ELSE 0 END AS apr,
             CASE WHEN a.st = b.st THEN 1 ELSE 0 END AS ast,
             CASE WHEN a.pb = b.pb THEN 1 ELSE 0 END AS apb,
             CASE WHEN a.mo = b.mo THEN 1 ELSE 0 END AS amo
      FROM o a JOIN o b ON a.hb = b.hb AND a.c <> b.c AND a.k < b.k
    ),
    m AS (
      SELECT CAST(SUM(apr) * 1000000 // COUNT(*) AS BIGINT) AS m_pr,
             CAST(SUM(ast) * 1000000 // COUNT(*) AS BIGINT) AS m_st,
             CAST(SUM(apb) * 1000000 // COUNT(*) AS BIGINT) AS m_pb,
             CAST(SUM(amo) * 1000000 // COUNT(*) AS BIGINT) AS m_mo
      FROM mpairs
    ),
    u AS (
      SELECT CAST(SUM(apr) * 1000000 // COUNT(*) AS BIGINT) AS u_pr,
             CAST(SUM(ast) * 1000000 // COUNT(*) AS BIGINT) AS u_st,
             CAST(SUM(apb) * 1000000 // COUNT(*) AS BIGINT) AS u_pb,
             CAST(SUM(amo) * 1000000 // COUNT(*) AS BIGINT) AS u_mo
      FROM upairs
    ),
    w AS (
      SELECT m_pr * 1000000 // greatest(u_pr, 1) AS ra_pr,
             (1000000 - m_pr) * 1000000
               // greatest(1000000 - u_pr, 1) AS rd_pr,
             m_st * 1000000 // greatest(u_st, 1) AS ra_st,
             (1000000 - m_st) * 1000000
               // greatest(1000000 - u_st, 1) AS rd_st,
             m_pb * 1000000 // greatest(u_pb, 1) AS ra_pb,
             (1000000 - m_pb) * 1000000
               // greatest(1000000 - u_pb, 1) AS rd_pb,
             m_mo * 1000000 // greatest(u_mo, 1) AS ra_mo,
             (1000000 - m_mo) * 1000000
               // greatest(1000000 - u_mo, 1) AS rd_mo
      FROM m CROSS JOIN u
    ),
    cand AS (
      SELECT 'same_customer' AS block_type, apr, ast, apb, amo FROM mpairs
      UNION ALL
      SELECT 'random_bucket_sample', apr, ast, apb, amo FROM upairs
    ),
    scored AS (
      SELECT c.block_type,
             ((CAST(CASE WHEN c.apr = 1 THEN w.ra_pr ELSE w.rd_pr END
                    AS DOUBLE) / 1000000.0
               * CAST(CASE WHEN c.ast = 1 THEN w.ra_st ELSE w.rd_st END
                      AS DOUBLE) / 1000000.0)
              * CAST(CASE WHEN c.apb = 1 THEN w.ra_pb ELSE w.rd_pb END
                     AS DOUBLE) / 1000000.0)
             * CAST(CASE WHEN c.amo = 1 THEN w.ra_mo ELSE w.rd_mo END
                    AS DOUBLE) / 1000000.0 AS lr
      FROM cand c CROSS JOIN w
    )
    SELECT block_type,
           CASE WHEN lr >= 10.0 THEN 'e_strong_match'
                WHEN lr >= 2.0 THEN 'd_lean_match'
                WHEN lr > 0.5 THEN 'c_inconclusive'
                WHEN lr > 0.1 THEN 'b_lean_non_match'
                ELSE 'a_strong_non_match' END AS decision,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) * 10000 // SUM(COUNT(*)) OVER
                (PARTITION BY block_type) AS BIGINT) AS share_bps
    FROM scored
    GROUP BY 1, 2
    ORDER BY block_type, decision
    """,
)
def er8_fs_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Fellegi-Sunter DECISION stage er7 stops short of: per-field
    m rates from customer-blocked pairs, u rates from HASH-BUCKETED
    pseudo-random pairs (bucket count data-adaptive at ~8 rows per
    bucket, so pair volume stays LINEAR in table size -- and unlike
    er7's date-blocked u-sample, the bucket key is hash noise, so no
    comparison field is correlated with its own estimation block;
    date-blocking would make u(month)=1 and turn month DISAGREEMENT
    into unbounded match evidence, the classic linkage-bias pitfall
    this query exists to avoid). Each candidate pair's composite
    likelihood ratio is the fixed-order product of four field ratios
    (exact integer micros in; IEEE-double product consumed ONLY by
    band comparisons, so no float reaches the output), classified
    into five bands around the textbook 10/0.1 thresholds.

    On this fixture the bands concentrate in 'inconclusive' for BOTH
    blocks -- the synthetic order fields carry no within-customer
    correlation, m ~ u, and the weights correctly refuse to separate
    what is not separable (the stats_cuped honest-zero posture). The
    machinery -- estimation blocks, bias-free u, weight algebra,
    banded decisions -- is what the oracle certifies; on data with
    real field correlation the same plan separates.

    Scale shape: per-customer orders^2 for m; ~8^2/2 per hash bucket
    for u (linear overall); scoring is a 1-row weight broadcast over
    the pair stream; the summary is a <=10-row aggregate with a
    2-partition share window."""
    o0 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("c"),
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"),
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("pb"),
        F.month("o_orderdate").alias("mo"),
    )
    nb = o0.agg(
        F.expr("CAST(greatest(1024, COUNT(1) div 8) AS BIGINT)").alias(
            "nbuckets"
        )
    )
    o = (
        o0.crossJoin(F.broadcast(nb))
        .select(
            "*",
            (knuth_hash32(F.col("k")) % F.col("nbuckets"))
            .cast("bigint")
            .alias("hb"),
        )
        .localCheckpoint(eager=False)  # both pair generators share it
    )
    a, b = o.alias("a"), o.alias("b")

    def _agrees(df):
        return df.select(
            F.when(F.col("a.pr") == F.col("b.pr"), 1).otherwise(0).alias("apr"),
            F.when(F.col("a.st") == F.col("b.st"), 1).otherwise(0).alias("ast"),
            F.when(F.col("a.pb") == F.col("b.pb"), 1).otherwise(0).alias("apb"),
            F.when(F.col("a.mo") == F.col("b.mo"), 1).otherwise(0).alias("amo"),
        )

    mpairs = _agrees(
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.k") < F.col("b.k")))
    ).localCheckpoint(eager=False)  # m rates + candidate stream share it
    upairs = _agrees(
        a.join(
            b,
            (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.c") != F.col("b.c"))
            & (F.col("a.k") < F.col("b.k")),
        )
    ).localCheckpoint(eager=False)  # u rates + candidate stream share it

    def _rates(df, p):
        return df.agg(
            *[
                F.expr(f"CAST(SUM(a{f}) * 1000000 div COUNT(1) AS BIGINT)").alias(
                    f"{p}_{f}"
                )
                for f in ("pr", "st", "pb", "mo")
            ]
        )

    w = _rates(mpairs, "m").crossJoin(_rates(upairs, "u"))
    for f in ("pr", "st", "pb", "mo"):
        w = w.withColumn(
            f"ra_{f}", F.expr(f"m_{f} * 1000000 div greatest(u_{f}, 1)")
        ).withColumn(
            f"rd_{f}",
            F.expr(
                f"(1000000 - m_{f}) * 1000000"
                f" div greatest(1000000 - u_{f}, 1)"
            ),
        )
    cand = mpairs.select(
        F.lit("same_customer").alias("block_type"), "apr", "ast", "apb", "amo"
    ).unionByName(
        upairs.select(
            F.lit("random_bucket_sample").alias("block_type"),
            "apr",
            "ast",
            "apb",
            "amo",
        )
    )
    lr = F.expr(
        "((CAST(CASE WHEN apr = 1 THEN ra_pr ELSE rd_pr END AS DOUBLE)"
        " / 1000000.0"
        " * CAST(CASE WHEN ast = 1 THEN ra_st ELSE rd_st END AS DOUBLE)"
        " / 1000000.0)"
        " * CAST(CASE WHEN apb = 1 THEN ra_pb ELSE rd_pb END AS DOUBLE)"
        " / 1000000.0)"
        " * CAST(CASE WHEN amo = 1 THEN ra_mo ELSE rd_mo END AS DOUBLE)"
        " / 1000000.0"
    )
    scored = cand.crossJoin(F.broadcast(w)).select("block_type", lr.alias("lr"))
    counts = (
        scored.select(
            "block_type",
            F.when(F.col("lr") >= 10.0, "e_strong_match")
            .when(F.col("lr") >= 2.0, "d_lean_match")
            .when(F.col("lr") > 0.5, "c_inconclusive")
            .when(F.col("lr") > 0.1, "b_lean_non_match")
            .otherwise("a_strong_non_match")
            .alias("decision"),
        )
        .groupBy("block_type", "decision")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    wb = Window.partitionBy("block_type")
    return (
        counts.withColumn("__tot", F.sum("n_pairs").over(wb))
        .select(
            "block_type",
            "decision",
            "n_pairs",
            F.expr("CAST(n_pairs * 10000 div __tot AS BIGINT)").alias(
                "share_bps"
            ),
        )
        .orderBy("block_type", "decision")
    )
