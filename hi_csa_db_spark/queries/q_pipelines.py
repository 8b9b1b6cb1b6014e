"""End-to-end pipelines, graph analytics, crawl/html sources (pipe_*/graph_*/html_*/crawl*/bfs*).

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
from hi_csa_db_spark.functions.hashing import KNUTH_HASH32_SQL, knuth_hash32
from hi_csa_db_spark.functions.text import absolutize_url, slugify, strip_punct, tokenize
from hi_csa_db_spark.operators import classify, dedup, graph, ordered, similarity, textstats
from hi_csa_db_spark.operators.merge import db_merge, union_streams

from hi_csa_db_spark.queries import _ORACLES, _QUERIES, _register
from hi_csa_db_spark.queries._shared import (
    _BUCKET_LADDER_SQL,
    _D6_LABELS_SQL,
    _DSIR_W_SQL,
    _PACK_BUDGET,
    _X20_SCORED_SQL,
    _ktruss_oracle,
)



@_register(
    "graph_kcore",
    """
    WITH ce AS (
      SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst FROM lineitem
    ),
    ud0 AS (SELECT src, dst FROM ce UNION SELECT dst, src FROM ce),
    d1 AS (SELECT src, COUNT(*) AS deg FROM ud0 GROUP BY src),
    k1 AS (SELECT src FROM d1 WHERE deg >= 3),
    ud1 AS (SELECT u.src, u.dst FROM ud0 u
            JOIN k1 a ON a.src = u.src JOIN k1 b ON b.src = u.dst),
    d2 AS (SELECT src, COUNT(*) AS deg FROM ud1 GROUP BY src),
    k2 AS (SELECT src FROM d2 WHERE deg >= 3),
    ud2 AS (SELECT u.src, u.dst FROM ud1 u
            JOIN k2 a ON a.src = u.src JOIN k2 b ON b.src = u.dst),
    d3 AS (SELECT src, COUNT(*) AS deg FROM ud2 GROUP BY src),
    k3 AS (SELECT src FROM d3 WHERE deg >= 3),
    ud3 AS (SELECT u.src, u.dst FROM ud2 u
            JOIN k3 a ON a.src = u.src JOIN k3 b ON b.src = u.dst)
    SELECT src AS id, COUNT(*) AS degree FROM ud3 GROUP BY src
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 3-core peeling over the part<->supplier graph — the
    PEELING iterative pattern (edge set shrinks per round; a removal
    can push neighbors below threshold) next to pagerank's value
    propagation and components' label propagation. Oracle: the same
    three rounds unrolled as chained CTEs."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    return graph.k_core(edges, k=3, iterations=3)


# ---------------------------------------------------------------------------
# Graph operators (SURVEY.md sections 1.4, 2.1 S1)
# ---------------------------------------------------------------------------


@_register(
    "graph_bfs_reachability",
    """
    WITH RECURSIVE edges AS (
      SELECT 'c' || o_custkey AS src, 'o' || o_orderkey AS dst FROM orders
      UNION ALL
      SELECT DISTINCT 'o' || l_orderkey, 'p' || l_partkey FROM lineitem
    ),
    reach(node, depth) AS (
      SELECT * FROM (VALUES ('c0', 0), ('c1', 0), ('c2', 0)) t(node, depth)
      UNION ALL
      SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.depth < 2
    )
    SELECT node, MIN(depth) AS depth FROM reach GROUP BY node
    """,
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: BFS frontier loop (the reference's Rcrawler crawl,
    hi-csa-db.Rmd:111-119) over a customer->order->part graph; min
    depth per node, depth<=2, distributed frontier w/ anti-join."""
    t = load_tables(spark, sf_dir)
    # BFS runs over LONG node ids (node type packed into the top
    # digits); the 'c0'/'o123' display strings only materialize on the
    # final result. Every frontier join / distinct / anti-join then
    # shuffles 8-byte longs instead of variable-length strings.
    B = 10_000_000_000  # > any key in the fixtures
    edges = (
        t["orders"]
        .select(
            (F.lit(1 * B) + F.col("o_custkey")).alias("src"),
            (F.lit(2 * B) + F.col("o_orderkey")).alias("dst"),
        )
        .unionAll(
            # r12: no .distinct() on the lineitem pairs — BFS min-depth
            # is insensitive to duplicate edges (each level's frontier
            # is .distinct()ed and the visited anti-join dedups across
            # levels), so the full-width dedup shuffle of the lineitem
            # edge list bought nothing. Values verified identical at
            # sf0.1; warm A/B 2.34 -> 1.80 s, cold 3.50 -> 3.05 s. The
            # oracle keeps its DISTINCT: a recursive SQL CTE without it
            # re-expands every duplicate edge, which is the oracle's
            # cost model, not the engine's.
            t["lineitem"]
            .select(
                (F.lit(2 * B) + F.col("l_orderkey")).alias("src"),
                (F.lit(3 * B) + F.col("l_partkey")).alias("dst"),
            )
        )
    )
    seeds = spark.createDataFrame([(1 * B,), (1 * B + 1,), (1 * B + 2,)], ["node"])
    reached = graph.bfs(edges, seeds, max_depth=2)
    tag = F.element_at(
        F.array(F.lit("c"), F.lit("o"), F.lit("p")),
        (F.col("node") / B).cast("int"),
    )
    return reached.select(
        F.concat(tag, (F.col("node") % B).cast("string")).alias("node"), "depth"
    )


@_register(
    "graph_degrees",
    """
    WITH edges AS (SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM lineitem),
    o AS (SELECT src AS id, COUNT(*) AS out_deg FROM edges GROUP BY src),
    i AS (SELECT dst AS id, COUNT(*) AS in_deg FROM edges GROUP BY dst)
    SELECT COALESCE(o.id, i.id) AS id,
           COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
    FROM o FULL JOIN i ON o.id = i.id
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph degree aggregation (the reference stores NetwEdges
    but never analyzes them, hi-csa-db.Rmd:123-128 — the engine does).

    r12: this graph is BIPARTITE with disjoint node namespaces
    ('p<k>' sources vs 's<k>' sinks), so the generic explode+groupBy
    of graph.degrees (2x row blowup shuffled as strings) specializes
    to two integer-keyed aggregations over the distinct pair table,
    unioned, with node strings built on the aggregated rows only
    (20k + 500 concats instead of 1.1M) — the oracle's FULL JOIN
    degenerates to this union exactly because no id is on both
    sides. Measured 1.34 -> 1.19 and 0.96 -> 0.79 s at sf0.1
    (interleaved A/B), values identical. graph.degrees stays the
    generic-operator path."""
    li = load_table(spark, sf_dir, "lineitem")
    # distinct on the INT key pair, concat to node strings after — the
    # dedup shuffle moves 16-byte rows, not 2x ~10-char strings.
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    out = (
        pairs.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .select(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("id"),
            F.col("out_deg").cast("long").alias("out_deg"),
            F.lit(0).cast("long").alias("in_deg"),
        )
    )
    inn = (
        pairs.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("in_deg"))
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("id"),
            F.lit(0).cast("long").alias("out_deg"),
            F.col("in_deg").cast("long").alias("in_deg"),
        )
    )
    return out.unionByName(inn)


@_register(
    "graph_triangles",
    """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 120) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 120) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT COUNT(*) AS n_triangles FROM pairs e1
    JOIN pairs e2 ON e2.p1 = e1.p2
    JOIN pairs e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-purchase graph (parts sharing an
    order): the canonical multi-way self-join graph analytic. Ordered
    edges (p1<p2) make each triangle count exactly once; both joins
    are equi-joins on node ids (at scale: edges bucketed by p1)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "o").filter(F.col("p1") < F.col("p2")).select("p1", "p2").distinct()
    )
    e1 = pairs
    e2 = pairs.select(F.col("p1").alias("p2"), F.col("p2").alias("p3"))
    e3 = pairs.select(F.col("p1").alias("p1x"), F.col("p2").alias("p3x"))
    tri = (
        e1.join(e2, "p2")
        .join(e3, (F.col("p1") == F.col("p1x")) & (F.col("p3") == F.col("p3x")))
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


@_register(
    "graph_components",
    """
    WITH e0 AS (SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
                FROM lineitem WHERE l_partkey < 200),
    ud AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
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
    SELECT id, lbl FROM l3
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component label propagation (3 iterations, pure
    integer min — deterministic on any engine) over a subgraph of the
    part-supplier graph. The iterative-algorithm twin of pagerank
    with no float anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_partkey") < 200).select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    return graph.connected_components(edges, iterations=3)


@_register(
    "graph_convergence_audit",
    """
    WITH RECURSIVE e0 AS (SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
                FROM lineitem WHERE l_partkey < 200),
    ud AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT src AS id FROM ud),
    reach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT e.src AS id, reach.r AS r FROM ud e JOIN reach ON reach.id = e.dst
    ),
    exact AS (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id),
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
    SELECT CAST(1 AS BIGINT) AS round,
           CAST(SUM(CASE WHEN l.lbl = x.lbl THEN 1 ELSE 0 END) AS BIGINT) AS resolved_nodes,
           CAST(COUNT(*) AS BIGINT) AS total_nodes,
           CAST(SUM(CASE WHEN l.lbl = x.lbl THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS resolved_share_micro
    FROM l1 l JOIN exact x ON x.id = l.id
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           CAST(SUM(CASE WHEN l.lbl = x.lbl THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l.lbl = x.lbl THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
    FROM l2 l JOIN exact x ON x.id = l.id
    UNION ALL
    SELECT CAST(3 AS BIGINT),
           CAST(SUM(CASE WHEN l.lbl = x.lbl THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l.lbl = x.lbl THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
    FROM l3 l JOIN exact x ON x.id = l.id
    """,
)
def graph_convergence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-coverage audit for the bounded-round graph family
    (VERDICT r8 item 5): measures, per propagation round k = 1..3, the
    share of nodes whose k-round connected_components label already
    equals the exact component minimum (fixpoint via pointer jumping;
    the DuckDB oracle computes the same exact labels with a recursive
    reachability CTE). Same part-supplier subgraph as
    graph_components, so the audit prices that query's k=3 contract:
    resolved_share_micro at round 3 IS the measured coverage of the
    bounded-round claim. Integer micro-share, no float."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_partkey") < 200).select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    return graph.convergence_audit(edges, rounds=3, exact_rounds=10)


@_register(
    "graph_labelprop",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
      FROM lineitem WHERE l_partkey < 200
    ),
    ud AS (
      SELECT src, dst FROM edges
      UNION SELECT dst AS src, src AS dst FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS id FROM ud),
    l0 AS (SELECT id, id AS lbl FROM nodes),
    c1 AS (
      SELECT e.src, l.lbl, COUNT(*) AS n
      FROM ud e JOIN l0 l ON l.id = e.dst GROUP BY e.src, l.lbl
    ),
    w1 AS (
      SELECT src, lbl FROM (
        SELECT src, lbl,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY n DESC, lbl ASC) AS rn
        FROM c1) t WHERE rn = 1
    ),
    l1 AS (
      SELECT n.id, COALESCE(w.lbl, l.lbl) AS lbl
      FROM nodes n JOIN l0 l ON l.id = n.id
      LEFT JOIN w1 w ON w.src = n.id
    ),
    c2 AS (
      SELECT e.src, l.lbl, COUNT(*) AS n
      FROM ud e JOIN l1 l ON l.id = e.dst GROUP BY e.src, l.lbl
    ),
    w2 AS (
      SELECT src, lbl FROM (
        SELECT src, lbl,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY n DESC, lbl ASC) AS rn
        FROM c2) t WHERE rn = 1
    ),
    l2 AS (
      SELECT n.id, COALESCE(w.lbl, l.lbl) AS lbl
      FROM nodes n JOIN l1 l ON l.id = n.id
      LEFT JOIN w2 w ON w.src = n.id
    )
    SELECT id, lbl FROM l2
    """,
)
def graph_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by MAJORITY label propagation (Raghavan et
    al. 2007, determinized: synchronous rounds, ties to the smallest
    label) over the part-supplier subgraph — the fourth iterative-
    graph pattern (argmax aggregate per round) beside pagerank's
    value propagation, components' min propagation, and k-core's
    peeling. Two rounds, unrolled as CTEs in the oracle so every
    intermediate labelling is value-checked."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_partkey") < 200).select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    return graph.label_propagation(edges, iterations=2)


@_register("pipe_reference_replay")
def pipe_reference_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FULL analytical pipeline (SURVEY.md section 3
    E3: scrape -> sectionize -> classify -> merge -> publish) replayed
    on reference-shaped deterministic fixtures (FIXTURES.md Group B) —
    one lazy Catalyst plan producing the csa_db table shape
    (Type, Mitigation, Practice, Description, Resource). Rows-only:
    the fixtures are independent of sf_dir; golden invariants are
    asserted in tests/test_pipeline.py.

    The two sheets arrive as their RAW CSV exports (display-cased
    headers, drifted extra columns, empty cells) and are ingested
    through sources/sheets.read_sheet_export — the credential-free
    Spark-first replacement for the reference's live googlesheets4
    reads (hi-csa-db.Rmd:470-471, 554)."""
    from hi_csa_db_spark.plans import fixtures, pipeline
    from hi_csa_db_spark.sources import sheets

    elements = fixtures.page_elements(spark)
    policy = sheets.read_sheet_export(
        spark,
        fixtures.policy_sheet_export_lines(),
        target_schema="csa_goals string, guiding_policy string, "
        "description string, verbiage_location string, url string",
    )
    support = sheets.read_sheet_export(
        spark,
        fixtures.support_sheet_export_lines(),
        target_schema="mitigation string, practice string, "
        "description string, resources_links string",
    )
    keywords = fixtures.practice_keywords(spark)
    return pipeline.run_pipeline(elements, policy, support, keywords)


@_register(
    "pipe_training_prep",
    """
    WITH toks AS (
      SELECT doc_id, source, lang, text,
             len(list_filter(
               string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
               x -> x <> '')) AS n_tokens
      FROM documents
    ),
    gated AS (
      SELECT * FROM toks WHERE lang IN ('en', 'haw') AND n_tokens >= 10
    ),
    deduped AS (
      SELECT md5(text) AS h, MIN(doc_id) AS doc_id,
             MIN(source) AS source, MIN(n_tokens) AS n_tokens
      FROM gated GROUP BY md5(text)
    ),
    split AS (
      SELECT CASE
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
               ELSE 'test'
             END AS split,
             source, n_tokens
      FROM deduped
    )
    SELECT split, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
    FROM split GROUP BY split, source
    """,
)
def pipe_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep composite: language gate ->
    quality gate (min token count) -> exact content dedup (md5,
    keep-min-id) -> deterministic split assignment -> per-split corpus
    stats. One lazy Catalyst plan; the gates pushed down to the scan,
    two shuffles total (dedup groupBy, final stats groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokenize(F.lower(strip_punct(F.col("text")))))
    gated = (
        docs.select("doc_id", "source", "lang", "text", n_tokens.alias("n_tokens"))
        .filter(F.col("lang").isin("en", "haw") & (F.col("n_tokens") >= 10))
    )
    deduped = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib < "c", F.lit("train"))
        .when(nib < "e", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        deduped.select(split.alias("split"), "source", "n_tokens")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_tokens"),
        )
    )


@_register(
    "graph_pagerank",
    """
    WITH edges AS (SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst FROM lineitem),
    nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
    params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    ce AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / d.od AS w FROM edges e JOIN deg d ON d.src = e.src),
    r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM params) AS rank FROM nodes),
    r1 AS (SELECT nd.id, CAST(0.15 AS DOUBLE)/(SELECT n FROM params)
                  + CAST(0.85 AS DOUBLE)*COALESCE(SUM(r.rank * ce.w), 0) AS rank
           FROM nodes nd LEFT JOIN ce ON ce.dst = nd.id LEFT JOIN r0 r ON r.id = ce.src
           GROUP BY nd.id),
    r2 AS (SELECT nd.id, CAST(0.15 AS DOUBLE)/(SELECT n FROM params)
                  + CAST(0.85 AS DOUBLE)*COALESCE(SUM(r.rank * ce.w), 0) AS rank
           FROM nodes nd LEFT JOIN ce ON ce.dst = nd.id LEFT JOIN r1 r ON r.id = ce.src
           GROUP BY nd.id),
    r3 AS (SELECT nd.id, CAST(0.15 AS DOUBLE)/(SELECT n FROM params)
                  + CAST(0.85 AS DOUBLE)*COALESCE(SUM(r.rank * ce.w), 0) AS rank
           FROM nodes nd LEFT JOIN ce ON ce.dst = nd.id LEFT JOIN r2 r ON r.id = ce.src
           GROUP BY nd.id)
    SELECT id, ROUND(rank, 6) AS rank FROM r3
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank (3 fixed iterations, d=0.85) over the
    part->supplier link graph — the iterative-join class of algorithms
    (each iteration: one join + one aggregation). Oracle: the same
    three iterations unrolled as chained CTEs."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    ranks = graph.pagerank(edges, iterations=3, damping=0.85)
    return ranks.select("id", F.round("rank", 6).alias("rank"))


@_register(
    "html_parse_sectionize",
    """
    WITH t AS (
      SELECT doc_id, source, lang,
             array_to_string((list_filter(
               string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
               x -> x <> ''))[1:5], ' ') AS body
      FROM documents
    )
    SELECT 'https://x.org/doc/' || doc_id AS url,
           'Sec ' || source AS mitigation,
           'Sub ' || lang AS practice,
           'Para link' || CASE WHEN body = '' THEN '' ELSE ' ' || body END AS description,
           'https://x.org/r/' || doc_id AS resource
    FROM t
    """,
)
def html_parse_sectionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/F11/F12 + W1/J4 + X1/F5 end-to-end, oracle-checked: build an
    HTML page per document, parse it with the REAL mapInPandas HTML
    parser (sources.html), forward-fill section context, explode links,
    absolutize. The oracle re-derives the expected output from the raw
    documents — so the parser itself is value-checked, not just row-
    counted (the reference's scrape tier, hi-csa-db.Rmd:151-212)."""
    from hi_csa_db_spark.operators import sectionize as sec
    from hi_csa_db_spark.sources.html import elements_from_pages

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.lower(strip_punct(F.col("text"))))
    body = F.concat_ws(" ", F.slice(toks, 1, 5))
    pages = docs.select(
        F.concat(F.lit("https://x.org/doc/"), F.col("doc_id")).alias("url"),
        F.concat(
            F.lit("<h3>Sec "),
            F.col("source"),
            F.lit("</h3><h4>Sub "),
            F.col("lang"),
            F.lit('</h4><p>Para <a href="/r/'),
            F.col("doc_id"),
            F.lit('">link</a> '),
            body,
            F.lit("</p>"),
        ).alias("html"),
    )
    elements = elements_from_pages(pages, kept=("h3", "h4", "p"))
    sections = sec.sectionize(elements)
    return sec.explode_links(sections, "https://x.org").select(
        "url", "mitigation", "practice", "description", "resource"
    )


@_register(
    "html_css_select",
    """
    WITH t AS (
      SELECT doc_id, source,
             array_to_string((list_filter(
               string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
               x -> x <> ''))[1:5], ' ') AS body
      FROM documents
    )
    SELECT 'https://x.org/doc/' || doc_id AS url, 0 AS doc_order,
           'h3' AS tag, 'Sec ' || source AS content, '' AS href
    FROM t
    UNION ALL
    SELECT 'https://x.org/doc/' || doc_id, 1, 'p',
           'Body ' || CASE WHEN body = '' THEN 'go' ELSE body || ' go' END,
           '/r/' || doc_id
    FROM t
    """,
)
def html_css_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL CSS selection over a DOM tree (sources/cssdom.py): each
    page carries a ``#main`` container plus a decoy sidebar with the
    SAME tags/classes; the selector ``#main h3.title, #main p`` must
    pick exactly the container's nodes and skip the decoys — the
    reference's scrape pattern (hi-csa-db.Rmd:153-171 selects inside
    ``#block-mainpagecontent``). The oracle re-derives the expected
    elements from the raw documents, so tree building, selector
    matching, text interleaving (text -> anchor -> text), and href
    capture are all value-checked."""
    from hi_csa_db_spark.sources.cssdom import css_select_elements

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.lower(strip_punct(F.col("text"))))
    body = F.concat_ws(" ", F.slice(toks, 1, 5))
    pages = docs.select(
        F.concat(F.lit("https://x.org/doc/"), F.col("doc_id")).alias("url"),
        F.concat(
            F.lit('<div id="main"><h3 class="title">Sec '),
            F.col("source"),
            F.lit("</h3><p>Body "),
            body,
            F.lit(' <a href="/r/'),
            F.col("doc_id"),
            F.lit('">go</a></p></div>'),
            F.lit('<div class="side"><h3 class="title">Noise</h3><p>skip</p></div>'),
        ).alias("html"),
    )
    els = css_select_elements(pages, "#main h3.title, #main p")
    return els.select(
        "url",
        "doc_order",
        "tag",
        F.col("text").alias("content"),
        F.coalesce(F.try_element_at("hrefs", F.lit(1)), F.lit("")).alias("href"),
    )


@_register(
    "pipe_training_prep_v2",
    f"""
    WITH toks AS (
      SELECT doc_id, source, text, unnest(list_filter(
        string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
        x -> x <> '')) AS w
      FROM documents
    ),
    stats AS (
      SELECT doc_id, MIN(source) AS source, MIN(text) AS text,
             COUNT(*) AS n_tokens,
             AVG(length(w)) AS mwl,
             AVG(CASE WHEN regexp_matches(w, '[a-z]') THEN 1.0 ELSE 0.0 END) AS alpha
      FROM toks GROUP BY doc_id
    ),
    gated AS (
      SELECT doc_id, source, text, n_tokens,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+', 0))
             + len(regexp_extract_all(text, '[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]', 0))
               AS n_pii
      FROM stats
      WHERE n_tokens >= 10 AND n_tokens <= 100000
        AND mwl >= 3 AND mwl <= 10 AND alpha >= 0.8
    ),
    deduped AS (
      SELECT MIN(doc_id) AS doc_id, MIN(source) AS source,
             MIN(n_tokens) AS n_tokens, MIN(n_pii) AS n_pii
      FROM gated GROUP BY md5(text)
    ),
    totals AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
      FROM deduped GROUP BY source
    ),
    floor_t AS (SELECT MIN(src_tokens) AS min_tokens FROM totals),
    kept AS (
      SELECT d.* FROM deduped d JOIN totals s ON d.source = s.source
      CROSS JOIN floor_t m
      WHERE ((d.doc_id * 2654435761) % 4294967296) * s.src_tokens
            < m.min_tokens * 4294967296
    ),
    packed AS (
      SELECT source, doc_id, n_tokens, n_pii,
             CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_PACK_BUDGET}.0) AS BIGINT) AS bin_id
      FROM kept
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT bin_id) AS n_bins,
           CAST(SUM(n_pii) AS BIGINT) AS n_pii
    FROM packed GROUP BY source
    """,
)
def pipe_training_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep pipeline as ONE lazy Catalyst plan:
    Gopher-style quality gates -> PII counting -> exact dedup ->
    domain-mixture balancing (integer-hash downsample to the smallest
    slice) -> context packing (prefix-sum token bins) -> per-source
    summary. Composes the same operator implementations the individual
    queries prove (x12, x11, d1, x17, x16), so every stage's semantics
    are already oracle-pinned; this entry pins their COMPOSITION.

    Scale: the whole chain is two aggregations (per-doc stats, hash
    dedup), one broadcast-joined filter, one window, one final groupBy
    — shuffles only on doc_id / md5 / source; no stage materializes
    anything driver-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        "text",
        F.explode(tokenize(F.lower(strip_punct(F.col("text"))))).alias("w"),
    ).filter(F.col("w") != "")
    stats = toks.groupBy("doc_id").agg(
        F.min("source").alias("source"),
        F.min("text").alias("text"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(F.length("w")).alias("mwl"),
        F.avg(F.when(F.col("w").rlike("[a-z]"), 1.0).otherwise(0.0)).alias(
            "alpha"
        ),
    )
    from hi_csa_db_spark.operators.textstats import EMAIL_RE, PHONE_RE

    n_pii = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(PHONE_RE), F.lit(0)))
    )
    gated = stats.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 100000)
        & (F.col("mwl") >= 3)
        & (F.col("mwl") <= 10)
        & (F.col("alpha") >= 0.8)
    ).select("doc_id", "source", "text", "n_tokens", n_pii.alias("n_pii"))
    deduped = gated.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
        F.min("n_pii").alias("n_pii"),
    )
    totals = deduped.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    floor_t = totals.agg(F.min("src_tokens").alias("min_tokens"))
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    kept = (
        deduped.join(F.broadcast(totals), "source")
        .join(F.broadcast(floor_t))
        .filter(u * F.col("src_tokens") < F.col("min_tokens") * F.lit(4294967296))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = kept.withColumn(
        "bin_id", F.floor(before / F.lit(float(_PACK_BUDGET))).cast("long")
    )
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.sum("n_pii").alias("n_pii"),
    )


@_register(
    "pipe_training_prep_v3",
    f"""
    WITH {_D6_LABELS_SQL},
    {_X20_SCORED_SQL},
    {_DSIR_W_SQL},
    m AS (
      SELECT lbl, MAX(logit_micro) AS mx
      FROM l3 JOIN scored s ON s.doc_id = l3.id
      GROUP BY lbl
    ),
    surv AS (
      SELECT m.lbl, MIN(l3.id) AS survivor_id
      FROM m JOIN l3 ON l3.lbl = m.lbl
             JOIN scored s ON s.doc_id = l3.id AND s.logit_micro = m.mx
      GROUP BY m.lbl
    ),
    drops AS (
      SELECT l3.id FROM l3 JOIN surv ON surv.lbl = l3.lbl
      WHERE l3.id <> surv.survivor_id
    ),
    dk AS (
      SELECT doc_id FROM w
      WHERE (doc_id * 2654435761) % 4294967296 * 1000000
            < greatest(0, least(1000000, 500000 + 10 * dsir_microweight))
              * 4294967296
    ),
    kept AS (
      SELECT d.doc_id, d.lang, s.n_words
      FROM documents d
      JOIN scored s ON s.doc_id = d.doc_id AND s.keep = 1
      JOIN dk ON dk.doc_id = d.doc_id
      LEFT JOIN drops dr ON dr.id = d.doc_id
      WHERE dr.id IS NULL
    )
    SELECT lang, COUNT(*) AS n_kept,
           CAST(SUM(n_words) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY lang
    """,
)
def pipe_training_prep_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-3 corpus pipeline as ONE lazy oracle-checked plan:
    model-based quality filter (x20 keep) -> near-dup collapse keeping
    the BEST-quality member per cluster (d10 survivors) -> DSIR
    importance resampling toward the target domain (x24's pure-integer
    keep rule) -> per-lang audit of what survives. Every stage is
    independently oracle-proven (x20/d10/x24); this pins their
    COMPOSITION — the actual shape of a production data-prep job —
    value-exactly against a single composed SQL derivation.

    Scale: inherits each stage's contract (banded LSH, bounded label
    propagation, broadcast normalizers, integer keep rules); the
    composition adds only doc-level equi-joins and one 5-group audit
    aggregate. Shared stage outputs (scored/labels/mem) are
    lazily checkpointed once instead of re-derived per consumer —
    the x78/er3 pattern (VERDICT r6 item 4; was 45 Exchanges /
    9 scans before)."""
    docs = load_table(spark, sf_dir, "documents")
    scored, drops = _quality_survivor_drops(spark, sf_dir, docs)
    wdf = _dsir_weight_frame(spark, sf_dir)
    wi = F.col("dsir_microweight")
    p = F.greatest(F.lit(0), F.least(F.lit(1000000), F.lit(500000) + 10 * wi))
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    dk = wdf.filter(u * 1000000 < p * F.lit(4294967296)).select("doc_id")
    kept = (
        docs.select("doc_id", "lang")
        .join(scored.filter(F.col("keep") == 1), "doc_id")
        .join(dk, "doc_id")
        .join(drops, docs["doc_id"] == drops["id"], "left_anti")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_words").alias("kept_tokens"),
    )


@_register(
    "pipe_training_prep_v4",
    f"""
    WITH {_D6_LABELS_SQL},
    {_X20_SCORED_SQL},
    {_DSIR_W_SQL},
    m AS (
      SELECT lbl, MAX(logit_micro) AS mx
      FROM l3 JOIN scored s ON s.doc_id = l3.id
      GROUP BY lbl
    ),
    surv AS (
      SELECT m.lbl, MIN(l3.id) AS survivor_id
      FROM m JOIN l3 ON l3.lbl = m.lbl
             JOIN scored s ON s.doc_id = l3.id AND s.logit_micro = m.mx
      GROUP BY m.lbl
    ),
    drops AS (
      SELECT l3.id FROM l3 JOIN surv ON surv.lbl = l3.lbl
      WHERE l3.id <> surv.survivor_id
    ),
    dk AS (
      SELECT doc_id FROM w
      WHERE (doc_id * 2654435761) % 4294967296 * 1000000
            < greatest(0, least(1000000, 500000 + 10 * dsir_microweight))
              * 4294967296
    ),
    sp_gp AS (
      SELECT doc_id, len(toks) AS n_tokens, CAST(i AS INT) AS pos,
             array_to_string(list_slice(toks, CAST(i AS INT),
                                        CAST(i AS INT) + 4), ' ') AS gram
      FROM toks, UNNEST(range(1, len(toks) - 3)) AS r(i)
      WHERE len(toks) >= 5
    ),
    sp_dup AS (SELECT gram FROM sp_gp GROUP BY gram HAVING COUNT(*) >= 2),
    sp_brk AS (
      SELECT g.doc_id, g.n_tokens, g.pos,
             CASE WHEN g.pos - lag(g.pos) OVER (PARTITION BY g.doc_id
                                                ORDER BY g.pos) > 5
                  THEN 1 ELSE 0 END AS b
      FROM sp_gp g JOIN sp_dup USING (gram)
    ),
    sp_isl AS (
      SELECT doc_id, n_tokens, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS island
      FROM sp_brk
    ),
    sp_spans AS (
      SELECT doc_id, n_tokens, island,
             MAX(pos) + 4 - MIN(pos) + 1 AS span_len
      FROM sp_isl GROUP BY doc_id, n_tokens, island
    ),
    heavy AS (
      SELECT doc_id FROM (
        SELECT doc_id, SUM(span_len) AS covered, n_tokens
        FROM sp_spans GROUP BY doc_id, n_tokens
      ) t WHERE 10 * covered >= 3 * n_tokens
    ),
    kept AS (
      SELECT d.doc_id, d.text, s.n_words
      FROM documents d
      JOIN scored s ON s.doc_id = d.doc_id AND s.keep = 1
      JOIN dk ON dk.doc_id = d.doc_id
      LEFT JOIN drops dr ON dr.id = d.doc_id
      LEFT JOIN heavy h ON h.doc_id = d.doc_id
      WHERE dr.id IS NULL AND h.doc_id IS NULL
    )
    SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)
                    % 2147483647) AS BIGINT) AS content_checksum
    FROM kept GROUP BY 1
    """,
)
def pipe_training_prep_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone corpus pipeline, v4: v3's quality filter ->
    best-quality near-dup survivor -> DSIR resample, PLUS a
    duplicated-SPAN coverage gate (drop docs whose Lee-et-al dup-span
    coverage reaches 30% of tokens — the doc-level action d13's
    detection feeds, pure-integer test 10*covered >= 3*n_tokens), and
    the output is the x35-style SHARD MANIFEST of the surviving
    corpus (id-hash shard, doc/token budgets, order-insensitive
    content checksum) — i.e. exactly what the export step of a
    training-data build publishes. Five independently-proven stages
    (x20/d10/x24/d13/x35), composition value-checked as ONE composed
    SQL derivation.

    Scale: inherits every stage's contract; the new gate adds d13's
    linear span pass + one doc-level anti-join; the manifest is a
    16-group map-combined aggregate. Shared stage outputs are
    checkpointed once via _quality_survivor_drops (VERDICT r6
    item 4)."""
    docs = load_table(spark, sf_dir, "documents")
    scored, drops = _quality_survivor_drops(spark, sf_dir, docs)
    wdf = _dsir_weight_frame(spark, sf_dir)
    wi = F.col("dsir_microweight")
    p = F.greatest(F.lit(0), F.least(F.lit(1000000), F.lit(500000) + 10 * wi))
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    dk = wdf.filter(u * 1000000 < p * F.lit(4294967296)).select("doc_id")
    heavy = (
        dedup.duplicated_spans(docs, k=5)
        .filter(10 * F.col("covered_tokens") >= 3 * F.col("n_tokens"))
        .select("doc_id")
    )
    kept = (
        docs.select("doc_id", "text")
        .join(scored.filter(F.col("keep") == 1), "doc_id")
        .join(dk, "doc_id")
        .join(drops, F.col("doc_id") == drops["id"], "left_anti")
        .join(heavy, "doc_id", "left_anti")
    )
    shard = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("long")
    fp = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
        % 2147483647
    )
    return (
        kept.select(
            shard.alias("shard"),
            F.col("n_words"),
            fp.alias("fp"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
            F.sum("fp").alias("content_checksum"),
        )
    )


@_register(
    "graph_jaccard_neighbors",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    deg AS (SELECT s, COUNT(*) AS d FROM edges GROUP BY s),
    common AS (
      SELECT a.s AS s_a, b.s AS s_b, COUNT(*) AS c
      FROM edges a JOIN edges b ON a.p = b.p AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT s_a, s_b,
           ROUND(CAST(c AS DOUBLE) / (da.d + db.d - c), 6) AS jaccard
    FROM common
    JOIN deg da ON da.s = s_a
    JOIN deg db ON db.s = s_b
    ORDER BY jaccard DESC, s_a ASC, s_b ASC
    LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-neighborhood similarity: Jaccard over the part-sets of
    supplier pairs in the part-supplier bipartite graph — the
    link-prediction / entity-similarity primitive (common-neighbor
    join), distinct from the path-based graph ops (BFS/PageRank) and
    the content-based dedup tiers.

    Scale shape: pair generation is the self-join on the shared
    neighbor (part), so cost is sum of per-part degree² — bounded by
    the max part fan-out, never |suppliers|²; at 100 TB the hot-part
    guard is the same document-frequency cap the d3 shingle index
    uses (split rare/hot parts, cap candidate generation). Degrees
    broadcast (one row per supplier)."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = edges.select("p", F.col("s").alias("s_a"))
    b = edges.select("p", F.col("s").alias("s_b"))
    common = (
        a.join(b, "p")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(F.col("s").alias("s_a"), F.col("d").alias("da"))
    db_ = deg.select(F.col("s").alias("s_b"), F.col("d").alias("db"))
    return (
        common.join(F.broadcast(da), "s_a")
        .join(F.broadcast(db_), "s_b")
        .select(
            "s_a",
            "s_b",
            F.round(
                F.col("c").cast("double")
                / (F.col("da") + F.col("db") - F.col("c")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), F.col("s_a").asc(), F.col("s_b").asc())
        .limit(20)
    )


@_register(
    "graph_hits",
    """
    WITH e AS (SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
               FROM lineitem),
    n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
    a1 AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS auth FROM e GROUP BY 1),
    h1 AS (SELECT e.src AS id, CAST(SUM(a1.auth) AS BIGINT) AS hub
           FROM e JOIN a1 ON a1.id = e.dst GROUP BY 1),
    a2 AS (SELECT e.dst AS id, CAST(SUM(h1.hub) AS BIGINT) AS auth
           FROM e JOIN h1 ON h1.id = e.src GROUP BY 1),
    h2 AS (SELECT e.src AS id, CAST(SUM(a2.auth) AS BIGINT) AS hub
           FROM e JOIN a2 ON a2.id = e.dst GROUP BY 1)
    SELECT n.id, CAST(COALESCE(h2.hub, 0) AS BIGINT) AS hub,
           CAST(COALESCE(a2.auth, 0) AS BIGINT) AS auth
    FROM n LEFT JOIN h2 ON h2.id = n.id LEFT JOIN a2 ON a2.id = n.id
    """,
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (graph.hits), 2 synchronous iterations
    over the part->supplier link graph in exact integer arithmetic
    (hub_0 = 1; no normalization) — every score is a bigint sum, so
    the result is engine-portable with no float ambiguity. Oracle:
    the two rounds unrolled as chained CTEs."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    return graph.hits(edges, iterations=2)


@_register(
    "graph_sssp",
    """
    WITH e0 AS (
      SELECT l_partkey AS src, 1000000 + l_suppkey AS dst,
             MIN(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                      AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    e AS (SELECT src, dst, MIN(w) AS w FROM (
            SELECT src, dst, w FROM e0
            UNION ALL SELECT dst, src, w FROM e0) GROUP BY src, dst),
    d0 AS (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist),
    d1 AS (SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM d0
            UNION ALL SELECT e.dst, d0.dist + e.w FROM d0 JOIN e ON e.src = d0.id)
           GROUP BY id),
    d2 AS (SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM d1
            UNION ALL SELECT e.dst, d1.dist + e.w FROM d1 JOIN e ON e.src = d1.id)
           GROUP BY id),
    d3 AS (SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM d2
            UNION ALL SELECT e.dst, d2.dist + e.w FROM d2 JOIN e ON e.src = d2.id)
           GROUP BY id)
    SELECT id, CAST(dist AS BIGINT) AS dist FROM d3
    """,
)
def graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (graph.sssp): 3 rounds of
    synchronous Bellman-Ford relaxation from part 1 over the
    UNDIRECTED part<->supplier graph, edge weight = min line
    extended-price in exact integer cents. Distances are bigint sums
    of mins — engine-portable, no float path accumulation. Oracle:
    the three relaxation rounds unrolled as chained CTEs (the
    graph_hits/graph_kcore idiom). Sixth iterative-graph pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (
        F.col("l_extendedprice").cast("decimal(15,2)") * 100
    ).cast("bigint")
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        cents.alias("w"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return graph.sssp(edges, source=1, iterations=3)


@_register(
    "graph_mst",
    """
    WITH e0 AS MATERIALIZED (
      SELECT l_partkey AS a, 1000000 + l_suppkey AS b,
             MIN(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100
                      AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    ud AS MATERIALIZED (
      SELECT a, b, w, a AS u, b AS o FROM e0
      UNION ALL SELECT a, b, w, b, a FROM e0
    ),
    sel1 AS MATERIALIZED (
      SELECT DISTINCT a, b, w FROM (
        SELECT a, b, w,
               ROW_NUMBER() OVER (PARTITION BY u ORDER BY w, a, b) AS rn
        FROM ud) WHERE rn = 1
    ),
    f1 AS MATERIALIZED (SELECT a AS src, b AS dst FROM sel1
                        UNION ALL SELECT b, a FROM sel1),
    n1 AS MATERIALIZED (SELECT DISTINCT src AS id FROM f1),
    c0 AS MATERIALIZED (SELECT id, id AS lbl FROM n1),
    c1 AS MATERIALIZED (
      SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
      FROM n1 n JOIN c0 s ON s.id = n.id
      LEFT JOIN f1 e ON e.src = n.id LEFT JOIN c0 nb ON nb.id = e.dst
      GROUP BY n.id, s.lbl),
    c2 AS MATERIALIZED (
      SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
      FROM n1 n JOIN c1 s ON s.id = n.id
      LEFT JOIN f1 e ON e.src = n.id LEFT JOIN c1 nb ON nb.id = e.dst
      GROUP BY n.id, s.lbl),
    c3 AS MATERIALIZED (
      SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
      FROM n1 n JOIN c2 s ON s.id = n.id
      LEFT JOIN f1 e ON e.src = n.id LEFT JOIN c2 nb ON nb.id = e.dst
      GROUP BY n.id, s.lbl),
    lab AS MATERIALIZED (
      SELECT nn.u AS id, COALESCE(c3.lbl, nn.u) AS lbl
      FROM (SELECT DISTINCT u FROM ud) nn LEFT JOIN c3 ON c3.id = nn.u
    ),
    sel2 AS MATERIALIZED (
      SELECT DISTINCT a, b, w FROM (
        SELECT ud.a, ud.b, ud.w,
               ROW_NUMBER() OVER (PARTITION BY la.lbl
                                  ORDER BY ud.w, ud.a, ud.b) AS rn
        FROM ud JOIN lab la ON la.id = ud.u JOIN lab lb ON lb.id = ud.o
        WHERE la.lbl <> lb.lbl) WHERE rn = 1
    )
    SELECT CAST(1 AS INT) AS round, a, b, w FROM sel1
    UNION ALL
    SELECT CAST(2 AS INT), a, b, w FROM sel2
    """,
)
def graph_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boruvka minimum-spanning-forest rounds (graph.mst_boruvka)
    over the part<->supplier graph with exact integer-cents weights:
    per round every component hooks its minimum outgoing edge under
    the total (w, a, b) order (cycle-free without distinct-weight
    assumptions), selections merge components via the bounded
    min-label propagation. Seventh iterative-graph pattern; the
    oracle unrolls both rounds + the 3-round component chain as CTEs
    (the graph_hits/graph_kcore idiom)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (
        F.col("l_extendedprice").cast("decimal(15,2)") * 100
    ).cast("bigint")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        cents.alias("w"),
    )
    return graph.mst_boruvka(edges, rounds=2, cc_iterations=3)


@_register(
    "graph_assortativity",
    """
    WITH e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
    od AS (SELECT src, COUNT(*) AS dx FROM e GROUP BY src),
    idg AS (SELECT dst, COUNT(*) AS dy FROM e GROUP BY dst),
    xy AS (
      SELECT CAST(od.dx AS BIGINT) AS x, CAST(idg.dy AS BIGINT) AS y
      FROM e JOIN od ON od.src = e.src JOIN idg ON idg.dst = e.dst
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           ROUND((n * sxy - sx * sy)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part->supplier graph: the Pearson
    correlation between source out-degree and target in-degree over
    the edge list — positive means hubs link to hubs (the
    graph-science summary statistic of mixing structure). All five
    moment sums are exact BIGINTs (the stats_linreg idiom); doubles
    appear only in the final sqrt/division, and both engines convert
    the identical BIGINTs, so the rounded result is engine-stable.
    One edge-degree join per side + one global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    ).distinct()
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("dx"))
    idg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("dy"))
    xy = (
        e.join(od, "src")
        .join(idg, "dst")
        .select(F.col("dx").cast("bigint").alias("x"), F.col("dy").cast("bigint").alias("y"))
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
            6,
        ).alias("assortativity"),
    )


@_register(
    "pipe_training_prep_v5",
    f"""
    WITH {_D6_LABELS_SQL},
    {_X20_SCORED_SQL},
    {_DSIR_W_SQL},
    qgate AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT s.doc_id,
               ROW_NUMBER() OVER (PARTITION BY d.lang
                                  ORDER BY s.logit_micro DESC, s.doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY d.lang) AS n
        FROM scored s JOIN documents d USING (doc_id)
      ) WHERE rn * 10 <= n * 4
    ),
    m AS (
      SELECT lbl, MAX(logit_micro) AS mx
      FROM l3 JOIN scored s ON s.doc_id = l3.id
      GROUP BY lbl
    ),
    surv AS (
      SELECT m.lbl, MIN(l3.id) AS survivor_id
      FROM m JOIN l3 ON l3.lbl = m.lbl
             JOIN scored s ON s.doc_id = l3.id AND s.logit_micro = m.mx
      GROUP BY m.lbl
    ),
    drops AS (
      SELECT l3.id FROM l3 JOIN surv ON surv.lbl = l3.lbl
      WHERE l3.id <> surv.survivor_id
    ),
    dk AS (
      SELECT doc_id FROM w
      WHERE (doc_id * 2654435761) % 4294967296 * 1000000
            < greatest(0, least(1000000, 500000 + 10 * dsir_microweight))
              * 4294967296
    ),
    kept AS (
      SELECT d.doc_id, d.text, s.n_words
      FROM documents d
      JOIN scored s ON s.doc_id = d.doc_id
      JOIN qgate qg ON qg.doc_id = d.doc_id
      JOIN dk ON dk.doc_id = d.doc_id
      LEFT JOIN drops dr ON dr.id = d.doc_id
      WHERE dr.id IS NULL
    )
    SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)
                    % 2147483647) AS BIGINT) AS content_checksum
    FROM kept GROUP BY 1
    """,
)
def pipe_training_prep_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus pipeline v5: v3's stage chain with the ABSOLUTE quality
    gate swapped for x26's per-language QUANTILE gate (keep the top
    40% of each language slice by classifier logit). An absolute logit
    threshold drifts as the corpus mix shifts between crawls; the
    per-slice quantile self-calibrates — this is the v3 composition a
    production pipeline would actually run on a moving corpus. Stages:
    per-lang quantile filter (x26's integer rank*10 <= n*4 rule) ->
    best-quality near-dup survivor (d10) -> DSIR resample (x24) ->
    x35-style shard manifest.

    Scale: the gate is one window pass partitioned by lang (parallel
    across slices) feeding a semi-join; everything else inherits
    v3/v4's proven stage contracts; manifest is a 16-group
    map-combined aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    scored = x20_quality_classifier(spark, sf_dir).select(
        "doc_id", "n_words", "logit_micro"
    )
    lab = scored.join(docs.select("doc_id", "lang"), "doc_id")
    qw = Window.partitionBy("lang").orderBy(
        F.col("logit_micro").desc(), F.col("doc_id").asc()
    )
    qgate = (
        lab.select(
            "doc_id",
            F.row_number().over(qw).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
        )
        .filter(F.col("rn") * 10 <= F.col("n") * 4)
        .select("doc_id")
    )
    pairs = dedup.minhash_lsh_dedup(
        docs, n=3, num_hashes=16, bands=8, threshold=0.05
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = graph.connected_components(edges, iterations=3)
    mem = labels.join(
        scored.select(F.col("doc_id").alias("id"), "logit_micro"), "id"
    ).select("id", "lbl", "logit_micro")
    m = mem.groupBy("lbl").agg(F.max("logit_micro").alias("mx"))
    surv = (
        mem.join(m, "lbl")
        .filter(F.col("logit_micro") == F.col("mx"))
        .groupBy("lbl")
        .agg(F.min("id").alias("survivor_id"))
    )
    drops = (
        labels.join(surv, "lbl")
        .filter(F.col("id") != F.col("survivor_id"))
        .select("id")
    )
    wdf = _dsir_weight_frame(spark, sf_dir)
    wi = F.col("dsir_microweight")
    p = F.greatest(F.lit(0), F.least(F.lit(1000000), F.lit(500000) + 10 * wi))
    u = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    dk = wdf.filter(u * 1000000 < p * F.lit(4294967296)).select("doc_id")
    kept = (
        docs.select("doc_id", "text")
        .join(scored.select("doc_id", "n_words"), "doc_id")
        .join(qgate, "doc_id")
        .join(dk, "doc_id")
        .join(drops, F.col("doc_id") == drops["id"], "left_anti")
    )
    shard = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("long")
    fp = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
        % 2147483647
    )
    return (
        kept.select(
            shard.alias("shard"),
            F.col("n_words"),
            fp.alias("fp"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_tokens"),
            F.sum("fp").alias("content_checksum"),
        )
    )


@_register(
    "graph_closeness",
    """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
      FROM lineitem
    ),
    e AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
    ),
    d0 AS (
      SELECT CAST(lm AS BIGINT) AS lm, CAST(lm AS BIGINT) AS id,
             CAST(0 AS BIGINT) AS dist
      FROM (VALUES (1), (2), (3), (4)) t(lm)
    ),
    d1 AS (SELECT lm, id, MIN(dist) AS dist FROM (
             SELECT lm, id, dist FROM d0
             UNION ALL SELECT d0.lm, e.dst, d0.dist + 1
             FROM d0 JOIN e ON e.src = d0.id)
           GROUP BY lm, id),
    d2 AS (SELECT lm, id, MIN(dist) AS dist FROM (
             SELECT lm, id, dist FROM d1
             UNION ALL SELECT d1.lm, e.dst, d1.dist + 1
             FROM d1 JOIN e ON e.src = d1.id)
           GROUP BY lm, id),
    d3 AS (SELECT lm, id, MIN(dist) AS dist FROM (
             SELECT lm, id, dist FROM d2
             UNION ALL SELECT d2.lm, e.dst, d2.dist + 1
             FROM d2 JOIN e ON e.src = d2.id)
           GROUP BY lm, id)
    SELECT lm AS landmark,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(dist) AS BIGINT) AS total_dist,
           CAST(CASE WHEN SUM(dist) > 0
                THEN (COUNT(*) - 1) * 1000000 // SUM(dist)
                ELSE 0 END AS BIGINT) AS closeness_micro
    FROM d3 GROUP BY lm
    """,
)
def graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark closeness centrality (graph.landmark_closeness): 4
    landmark parts traverse the undirected part<->supplier graph by
    ONE multi-source BFS (state keyed (landmark, node) — k landmarks
    ride one traversal, the scalable stand-in for quadratic all-pairs
    closeness). Bounded to 3 rounds so the oracle unrolls them as
    chained CTEs (the graph_sssp idiom); closeness_micro =
    floor(1e6*(reached-1)/total_hops) is pure integer. Eighth
    iterative-graph pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return graph.landmark_closeness(edges, landmarks=[1, 2, 3, 4], iterations=3)


@_register(
    "pipe_training_prep_v6",
    f"""
    WITH {_D6_LABELS_SQL},
    csz AS (SELECT lbl, COUNT(*) AS csz FROM l3 GROUP BY lbl),
    w AS (
      SELECT d.doc_id,
             CAST(1000000 // COALESCE(c.csz, 1) AS BIGINT) AS weight_micro
      FROM documents d
      LEFT JOIN l3 ON l3.id = d.doc_id
      LEFT JOIN csz c ON c.lbl = l3.lbl
    ),
    tk AS (
      SELECT doc_id,
             len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
               AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT w.weight_micro, tk.n_tokens, {_BUCKET_LADDER_SQL} AS bucket
      FROM w JOIN tk USING (doc_id)
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(weight_micro) AS BIGINT) AS weight_sum_micro,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(weight_micro * n_tokens) AS BIGINT)
             AS weighted_tokens_micro,
           CAST((COUNT(*) + 31) // 32 AS BIGINT) AS n_batches_b32
    FROM b GROUP BY bucket
    """,
)
def pipe_training_prep_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-prep composite v6: SOFT dedup meets batch planning —
    d19's 1/cluster-size loss weights (LSH pairs -> connected
    components, never a hard drop) are carried into x59's power-of-two
    length buckets, producing the per-bucket table a weighted training
    loader schedules from: document count, retained effective weight,
    raw vs weight-scaled token totals, batch count. The composite
    answers "after down-weighting duplicates, how much effective data
    does each batch shape hold?" — the planning question v2-v5's hard
    survivor pipelines cannot, because they discard rather than
    re-weight.

    All-integer outputs (micro weights are exact 1e6 div size; token
    sums are bigint). One lazy plan: the d2/d6 LSH machinery feeds a
    left join (absent docs weight 1.0), the bucket ladder is a narrow
    map, and the final aggregate has <= 8 groups.

    Scale: identical contract to d19 (banded candidate generation,
    bounded component rounds) plus x59's map-combined bucket
    aggregate; nothing new shuffles."""
    from hi_csa_db_spark.corpus import Corpus

    # the fluent API IS the implementation (review finding: the chain
    # was duplicated inline; tests/test_session4_ops.py pins equality,
    # the oracle pins values)
    return Corpus.load(spark, sf_dir).weight_soft_dedup().plan_length_batches()


@_register(
    "graph_random_walks",
    """
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
      FROM lineitem WHERE l_partkey < 200
    ),
    ud AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    starts AS (SELECT DISTINCT src AS walk_id FROM e0 WHERE src < 50),
    s1 AS (
      SELECT walk_id, n1 FROM (
        SELECT s.walk_id, e.dst AS n1,
               ROW_NUMBER() OVER (
                 PARTITION BY s.walk_id
                 ORDER BY md5(CAST(s.walk_id AS VARCHAR) || '|1|' || CAST(e.dst AS VARCHAR)), e.dst
               ) AS rn
        FROM starts s JOIN ud e ON e.src = s.walk_id
      ) WHERE rn = 1
    ),
    s2 AS (
      SELECT walk_id, n1, n2 FROM (
        SELECT w.walk_id, w.n1, e.dst AS n2,
               ROW_NUMBER() OVER (
                 PARTITION BY w.walk_id
                 ORDER BY md5(CAST(w.walk_id AS VARCHAR) || '|2|' || CAST(e.dst AS VARCHAR)), e.dst
               ) AS rn
        FROM s1 w JOIN ud e ON e.src = w.n1
      ) WHERE rn = 1
    )
    SELECT CAST(walk_id AS BIGINT) AS walk_id,
           CAST(walk_id AS BIGINT) AS n0,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
    FROM s2
    """,
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-walk corpus (node2vec/DeepWalk training
    prep, 9th iterative-graph pattern): from each start node, two
    walk steps over the undirected part-supplier graph, each step
    choosing the neighbor with the smallest md5(walk|step|neighbor) —
    a hash-seeded uniform choice that is a pure function of
    (walk, step, candidate), so the walk corpus is reproducible
    across engines, runs, and partitionings (the x29 deterministic-
    uniform idiom applied to graph sampling).

    Scale shape: each step is one equi-join frontier ⋈ edges plus a
    per-walk argmin (min over a struct key — the a7 pattern, computed
    here inside a per-walk aggregate, no global window); k steps = k
    such rounds, the BFS/sssp iteration layout. The oracle replays
    both steps as windowed CTE rounds."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") < 200)
        .select(
            F.col("l_partkey").alias("src"),
            (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    ud = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    starts = (
        e0.filter(F.col("src") < 50).select(F.col("src").alias("walk_id")).distinct()
    )

    def step(frontier: DataFrame, cur: str, step_no: int, out: str) -> DataFrame:
        key = F.md5(
            F.concat_ws(
                "|",
                F.col("walk_id").cast("string"),
                F.lit(str(step_no)),
                F.col("dst").cast("string"),
            )
        )
        cand = frontier.join(ud, frontier[cur] == ud["src"]).select(
            frontier["*"],
            F.struct(key.alias("k"), F.col("dst").alias("d")).alias("__c"),
        )
        gcols = [c for c in frontier.columns]
        return (
            cand.groupBy(*gcols)
            .agg(F.min("__c").alias("__m"))
            .select(*gcols, F.col("__m.d").alias(out))
        )

    w1 = step(starts.select("walk_id", F.col("walk_id").alias("n0")), "n0", 1, "n1")
    w2 = step(w1, "n1", 2, "n2")
    return w2.select(
        F.col("walk_id").cast("bigint").alias("walk_id"),
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
    )


@_register(
    "graph_clustering_coeff",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 120
    ),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT COUNT(*) AS t FROM pairs e1
      JOIN pairs e2 ON e2.p1 = e1.p2
      JOIN pairs e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    ),
    deg AS (
      SELECT id, COUNT(*) AS d FROM (
        SELECT p1 AS id FROM pairs UNION ALL SELECT p2 FROM pairs
      ) GROUP BY id
    ),
    wed AS (SELECT SUM(d * (d - 1) // 2) AS w FROM deg)
    SELECT CAST(t AS BIGINT) AS n_triangles,
           CAST(w AS BIGINT) AS n_wedges,
           CAST(3 * t * 1000000 // w AS BIGINT) AS clustering_micro
    FROM tri CROSS JOIN wed
    """,
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity): 3·triangles /
    wedges over the co-purchase graph — graph_triangles' count put in
    context (how triangle-dense is the graph relative to its degree
    structure). Wedges come from ONE degree aggregate (Σ d(d-1)/2,
    never materializing the wedge pairs); the ratio is an integer
    micro floor-div.

    Scale shape: the triangle join is graph_triangles' ordered-edge
    multi-way equi-join (edges bucketed by p1 at fleet scale); the
    wedge side adds only a degree groupBy."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "o").filter(F.col("p1") < F.col("p2")).select("p1", "p2").distinct()
    )
    e2 = pairs.select(F.col("p1").alias("p2"), F.col("p2").alias("p3"))
    e3 = pairs.select(F.col("p1").alias("p1x"), F.col("p2").alias("p3x"))
    tri = (
        pairs.join(e2, "p2")
        .join(e3, (F.col("p1") == F.col("p1x")) & (F.col("p3") == F.col("p3x")))
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = (
        pairs.select(F.col("p1").alias("id"))
        .unionAll(pairs.select(F.col("p2").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("w")
    )
    return tri.crossJoin(F.broadcast(wed)).select(
        F.col("t").cast("bigint").alias("n_triangles"),
        F.col("w").cast("bigint").alias("n_wedges"),
        F.expr("CAST(3 * t * 1000000 div w AS BIGINT)").alias(
            "clustering_micro"
        ),
    )


@_register(
    "graph_ppr",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
      FROM lineitem WHERE l_partkey < 200
    ),
    ud AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    nodes AS (SELECT DISTINCT src AS id FROM ud),
    deg AS (SELECT src, COUNT(*) AS od FROM ud GROUP BY src),
    r0 AS (
      SELECT id, CASE WHEN id = 1 THEN CAST(1000000000000 AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS r
      FROM nodes
    ),
    r1 AS (
      SELECT n.id,
             (CASE WHEN n.id = 1 THEN 15 * 1000000000000 ELSE 0 END
              + 85 * COALESCE(SUM(r0.r // d.od), 0)) // 100 AS r
      FROM nodes n
      LEFT JOIN ud e ON e.dst = n.id
      LEFT JOIN r0 ON r0.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    ),
    r2 AS (
      SELECT n.id,
             (CASE WHEN n.id = 1 THEN 15 * 1000000000000 ELSE 0 END
              + 85 * COALESCE(SUM(r1.r // d.od), 0)) // 100 AS r
      FROM nodes n
      LEFT JOIN ud e ON e.dst = n.id
      LEFT JOIN r1 ON r1.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    )
    SELECT id, CAST(r AS BIGINT) AS ppr_pico
    FROM r2 WHERE r > 0
    """,
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from node 1 (2 synchronous rounds,
    alpha = 0.15 teleport BACK TO THE SOURCE — the similarity-to-a-
    node measure behind graph-based recommendation and seed-expanded
    crawling), 10th iterative-graph pattern. ALL-INTEGER arithmetic:
    ranks in pico units, per-edge mass split by integer floor-div
    (non-negative, so Spark `div` and DuckDB `//` agree), damping as
    (15·T·[v=src] + 85·inflow) div 100 — no float accumulation order
    anywhere (unlike global pagerank's double ranks, which survive
    only via 6dp rounding). Dangling-node leak is part of the
    definition on both engines.

    Scale shape: per round one edges ⋈ ranks join + one groupBy(dst)
    — the pagerank layout; 2 rounds unrolled (a loop would ride
    graph._iter_layout). The symmetrized edge frame has 4 consumers
    (nodes, degrees, one inflow join per round), so it is
    localCheckpoint'd once — the r10-item-7 scan-count pager flagged
    the un-checkpointed form re-deriving the lineitem scan 14 times."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_partkey") < 200)
        .select(
            F.col("l_partkey").alias("src"),
            (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    ud = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)  # 4 consumers: nodes, deg, 2 rounds
    nodes = ud.select(F.col("src").alias("id")).distinct()
    deg = ud.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    T = 1_000_000_000_000
    r = nodes.select(
        "id",
        F.when(F.col("id") == 1, F.lit(T)).otherwise(0).cast("bigint").alias("r"),
    )
    for _ in range(2):
        inflow = (
            ud.join(r, ud["src"] == r["id"])
            .join(deg, "src")
            .select("dst", F.expr("r div od").alias("__m"))
            .groupBy("dst")
            .agg(F.sum("__m").alias("__in"))
        )
        r = nodes.join(
            inflow, nodes["id"] == inflow["dst"], "left"
        ).select(
            "id",
            F.expr(
                f"(CASE WHEN id = 1 THEN 15 * {T} ELSE 0 END"
                " + 85 * COALESCE(__in, 0)) div 100"
            ).alias("r"),
        )
    return r.filter(F.col("r") > 0).select(
        "id", F.col("r").cast("bigint").alias("ppr_pico")
    )


@_register(
    "graph_matching",
    """
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 120) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 120) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    h0 AS (
      SELECT p1, p2,
             md5(CAST(p1 AS VARCHAR) || '|' || CAST(p2 AS VARCHAR)) AS h
      FROM e0
    ),
    nm1 AS (
      SELECT id, MIN(h) AS mh FROM (
        SELECT p1 AS id, h FROM h0 UNION ALL SELECT p2, h FROM h0
      ) GROUP BY id
    ),
    m1 AS (
      SELECT e.p1, e.p2 FROM h0 e
      JOIN nm1 a ON a.id = e.p1 AND a.mh = e.h
      JOIN nm1 b ON b.id = e.p2 AND b.mh = e.h
    ),
    matched1 AS (SELECT p1 AS id FROM m1 UNION SELECT p2 FROM m1),
    h1 AS (
      SELECT e.p1, e.p2, e.h FROM h0 e
      WHERE e.p1 NOT IN (SELECT id FROM matched1)
        AND e.p2 NOT IN (SELECT id FROM matched1)
    ),
    nm2 AS (
      SELECT id, MIN(h) AS mh FROM (
        SELECT p1 AS id, h FROM h1 UNION ALL SELECT p2, h FROM h1
      ) GROUP BY id
    ),
    m2 AS (
      SELECT e.p1, e.p2 FROM h1 e
      JOIN nm2 a ON a.id = e.p1 AND a.mh = e.h
      JOIN nm2 b ON b.id = e.p2 AND b.mh = e.h
    )
    SELECT p1, p2, 1 AS round FROM m1
    UNION ALL SELECT p1, p2, 2 FROM m2
    """,
)
def graph_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed greedy maximal matching (Israeli-Itai style,
    determinized), 11th iterative-graph pattern and the canonical
    HASH SYMMETRY-BREAKING round: an edge joins the matching when its
    md5 priority is the minimum at BOTH endpoints — all such edges
    are independent by construction, so each round is one
    per-node-min aggregate + one two-sided equality join, fully
    parallel with no sequential tie-breaking. Two rounds unrolled;
    matched nodes leave the frontier between rounds (the k-core
    peeling layout). Matching feeds pair-assignment workloads
    (contrastive pair mining, record-linkage arbitration) where each
    item may be used once.

    Determinism: md5 edge priorities are distinct with overwhelming
    margin on the fixture (and the per-node MIN is total-ordered by
    the hex string), so both engines pick identical edges.

    Plan shape (VERDICT r10 item 2): every round references the
    frontier 3x (two endpoint unions + the match join) and the match
    3x (output, matched set, next frontier), so an unchecked lazy
    chain multiplies the round-1 subtree into round 2 — the shipped
    r10 plan re-scanned lineitem 220 times / 487 shuffles for a
    21-row result. localCheckpoint(eager=False) on the frontier and
    per-round match cuts each round to one LogicalRDD scan, the
    mst_boruvka shape (operators/graph.py) and the round-10 NOTES
    lesson ("a lazy chain doubles the PLAN tree to 2^rounds")."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    edges = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
        .select(
            "p1",
            "p2",
            F.md5(
                F.concat_ws(
                    "|", F.col("p1").cast("string"), F.col("p2").cast("string")
                )
            ).alias("h"),
        )
    )
    out = None
    cur = edges.localCheckpoint(eager=False)  # 3 consumers per round
    for rnd in (1, 2):
        ends = cur.select(F.col("p1").alias("id"), "h").unionAll(
            cur.select(F.col("p2").alias("id"), "h")
        )
        nmin = ends.groupBy("id").agg(F.min("h").alias("mh"))
        na = nmin.select(F.col("id").alias("p1"), F.col("mh").alias("ma"))
        nb = nmin.select(F.col("id").alias("p2"), F.col("mh").alias("mb"))
        m = (
            cur.join(na, "p1")
            .join(nb, "p2")
            .filter((F.col("h") == F.col("ma")) & (F.col("h") == F.col("mb")))
            .select("p1", "p2")
            .localCheckpoint(eager=False)  # output + matched + frontier
        )
        mm = m.select("p1", "p2", F.lit(rnd).alias("round"))
        out = mm if out is None else out.unionAll(mm)
        matched = m.select(F.col("p1").alias("id")).unionAll(
            m.select(F.col("p2").alias("id"))
        ).distinct()
        cur = cur.join(matched, cur["p1"] == matched["id"], "left_anti").join(
            matched, cur["p2"] == matched["id"], "left_anti"
        )
        # the frontier feeds 3 consumers NEXT round; the final round's
        # tail has no consumer after the loop, so checkpointing it
        # would only add a dead node to the returned plan (ADVICE r11)
        if rnd == 1:
            cur = cur.localCheckpoint(eager=False)
    return out


@_register(
    "pipe_training_prep_v7",
    f"""
    WITH {_X20_SCORED_SQL},
    lab AS (
      SELECT s.doc_id, s.logit_micro, s.n_words, d.lang, d.text
      FROM scored s JOIN documents d USING (doc_id)
    ),
    rk AS (
      SELECT doc_id, lang, text, n_words,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY logit_micro DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM lab
    ),
    gated AS (
      SELECT doc_id, lang, text, n_words FROM rk WHERE rn * 10 <= n * 4
    ),
    uniq AS (
      SELECT lang, md5(text) AS ch,
             CAST(COUNT(*) AS BIGINT) AS grp,
             MIN(n_words) AS n_words
      FROM gated GROUP BY lang, md5(text)
    )
    SELECT lang,
           CAST(SUM(grp) AS BIGINT) AS n_gated,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(grp) - COUNT(*) AS BIGINT) AS n_dups,
           CAST(SUM(n_words) AS BIGINT) AS kept_tokens,
           CAST((SUM(n_words) + 4095) // 4096 AS BIGINT) AS n_batches_4k
    FROM uniq GROUP BY lang
    """,
)
def pipe_training_prep_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-prep composite v7 (VERDICT r5 item 6): the per-language
    QUANTILE gate meets exact content dedup and batch planning — x26's
    self-calibrating keep rule (top 40% of each language slice by
    classifier logit, pure integer rank test) selects the training
    pool, the pool is exact-deduped on content hash (md5(text), d1
    semantics: one survivor per identical text within a language), and
    the per-language audit reports what a loader schedules from: gated
    count, unique count, duplicates absorbed, surviving token mass,
    and 4096-token batch count. v3-v6 compose the CLASSIFIER-cutoff /
    soft-dedup variants; v7 pins the quantile-gated + hard-exact-dedup
    pipeline shape — the common "top-q% then dedup" recipe — as one
    lazy oracle-proven plan.

    All-integer outputs (counts, token sums, ceil-div batches); the
    gate is x26's rank*10 <= n*4 integer test, so no float percentile
    boundary exists on either engine.

    Scale: x20's one explode + map-combined groupBy, one window pass
    partitioned by lang (parallel in slices, never global), one
    groupBy(lang, content-hash) whose combine collapses duplicates
    map-side, and a <=5-group audit. Catalyst prunes text out of every
    stage except the hash input."""
    docs = load_table(spark, sf_dir, "documents")
    scored = x20_quality_classifier(spark, sf_dir).select(
        "doc_id", "logit_micro", "n_words"
    )
    lab = scored.join(docs.select("doc_id", "lang", "text"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("logit_micro").desc(), F.col("doc_id").asc()
    )
    rk = lab.select(
        "lang",
        "text",
        "n_words",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    gated = rk.filter(F.col("rn") * 10 <= F.col("n") * 4)
    uniq = gated.groupBy("lang", F.md5("text").alias("ch")).agg(
        F.count(F.lit(1)).cast("bigint").alias("grp"),
        F.min("n_words").alias("n_words"),
    )
    return (
        uniq.groupBy("lang")
        .agg(
            F.sum("grp").cast("bigint").alias("n_gated"),
            F.count(F.lit(1)).cast("bigint").alias("n_unique"),
            F.sum("n_words").cast("bigint").alias("kept_tokens"),
        )
        .select(
            "lang",
            "n_gated",
            "n_unique",
            (F.col("n_gated") - F.col("n_unique"))
            .cast("bigint")
            .alias("n_dups"),
            "kept_tokens",
            F.expr("CAST((kept_tokens + 4095) div 4096 AS BIGINT)").alias(
                "n_batches_4k"
            ),
        )
    )


@_register(
    "graph_ppr_seed_expansion",
    """
    WITH edges AS (SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
                   FROM lineitem),
    nodes AS (SELECT DISTINCT id FROM
              (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
    deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    r0 AS (SELECT id, CASE WHEN id % 100 = 0 THEN 1000000 ELSE 0 END AS r
           FROM nodes),
    r1 AS (SELECT nd.id,
             CASE WHEN nd.id % 100 = 0 THEN 150000 ELSE 0 END
             + CAST(850000 * COALESCE(SUM(r.r // d.od), 0) // 1000000
                 AS BIGINT) AS r
           FROM nodes nd
           LEFT JOIN edges e ON e.dst = nd.id
           LEFT JOIN deg d ON d.src = e.src
           LEFT JOIN r0 r ON r.id = e.src
           GROUP BY nd.id),
    r2 AS (SELECT nd.id,
             CASE WHEN nd.id % 100 = 0 THEN 150000 ELSE 0 END
             + CAST(850000 * COALESCE(SUM(r.r // d.od), 0) // 1000000
                 AS BIGINT) AS r
           FROM nodes nd
           LEFT JOIN edges e ON e.dst = nd.id
           LEFT JOIN deg d ON d.src = e.src
           LEFT JOIN r1 r ON r.id = e.src
           GROUP BY nd.id),
    r3 AS (SELECT nd.id,
             CASE WHEN nd.id % 100 = 0 THEN 150000 ELSE 0 END
             + CAST(850000 * COALESCE(SUM(r.r // d.od), 0) // 1000000
                 AS BIGINT) AS r
           FROM nodes nd
           LEFT JOIN edges e ON e.dst = nd.id
           LEFT JOIN deg d ON d.src = e.src
           LEFT JOIN r2 r ON r.id = e.src
           GROUP BY nd.id)
    SELECT id, r AS rank_micro,
           CASE WHEN id % 100 = 0 THEN 1 ELSE 0 END AS is_seed
    FROM r3 WHERE r > 0
    """,
)
def graph_ppr_seed_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed SET (3 fixed iterations,
    d=0.85) over the FULL directed part->supplier graph — the
    seed-based corpus-expansion primitive (WebText-style "pages
    reachable from quality seeds", domain expansion from a curated
    allowlist): rank mass teleports only to SEEDS (id % 100 == 0), so
    score measures proximity to the seed set, not global centrality.
    Complements graph_ppr (single-node teleport, undirected 200-part
    subgraph, 2 unrolled rounds): this is the multi-seed, whole-graph
    variant routed through the reusable cached-layout operator, and
    the seed set is a predicate, not one id. Non-seed nodes with no
    seed-reachable in-edges stay at exactly 0 and are excluded — the
    expansion frontier IS the result set.

    Unlike graph_pagerank's ROUND(double) ranks, PPR here is PURE
    INTEGER micro-rank arithmetic (per-edge floor division by
    out-degree, 85% damping as *850000 // 1000000), so both engines
    agree bit-for-bit with no float whitelist entry.

    Scale: per iteration one equi-join (ranks x out-edges) + one
    map-combined aggregate — the iterative-join class; seeds and the
    damping are constants, nothing collects to the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    ranks = graph.personalized_pagerank_micro(
        edges, seed_pred=lambda c: c % 100 == 0, iterations=3
    )
    return ranks.filter(F.col("rank_micro") > 0).select(
        "id",
        "rank_micro",
        F.when(F.col("id") % 100 == 0, 1).otherwise(0).alias("is_seed"),
    )


@_register(
    "graph_components_star",
    """
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT l_partkey AS src, 1000000 + l_suppkey AS dst
      FROM lineitem WHERE l_partkey < 200),
    ud AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT src AS id FROM ud),
    r AS (
      SELECT id, id AS lbl FROM nodes
      UNION
      SELECT ud.src AS id, r.lbl FROM ud JOIN r ON r.id = ud.dst
    )
    SELECT id, CAST(MIN(lbl) AS BIGINT) AS lbl FROM r GROUP BY id
    """,
)
def graph_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT connected components (min-reachable-id labels) via
    pointer-jumping label propagation — the O(log diameter) fixpoint
    algorithm (hash-to-min / alternating-star family), against an
    oracle that computes the TRUE components by recursive-CTE
    transitive closure, so this pins exactness, not a bounded
    propagation radius (graph_components deliberately pins the cheap
    3-iteration approximation; this is its convergence-guaranteed
    sibling for graphs whose diameter is unknown — the safe default
    when near-dup chains can be long).

    Scale: rounds grow as log2(diameter) (10 covers diameter 1024);
    each round is one edge join + a map-combined min + a nodes-sized
    label self-join on the cached _iter_layout — the label table
    never exceeds |nodes| rows, and the recursive closure exists only
    on the oracle side."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.filter(F.col("l_partkey") < 200).select(
        F.col("l_partkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    )
    return graph.connected_components_fixpoint(edges, rounds=10).select(
        "id", F.col("lbl").cast("bigint").alias("lbl")
    )


@_register(
    "graph_link_prediction",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 120
    ),
    edges AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    adj AS (
      SELECT p1 AS ctr, p2 AS nbr FROM edges
      UNION ALL
      SELECT p2 AS ctr, p1 AS nbr FROM edges
    ),
    deg AS (SELECT ctr, COUNT(*) AS d FROM adj GROUP BY ctr),
    adjc AS (
      SELECT a.ctr, a.nbr, g.d FROM adj a JOIN deg g
        ON g.ctr = a.ctr AND g.d <= 64
    ),
    cand AS (
      SELECT a.nbr AS u, b.nbr AS v, a.d AS d
      FROM adjc a JOIN adjc b ON a.ctr = b.ctr AND a.nbr < b.nbr
    ),
    scored AS (
      SELECT c.u, c.v,
             CAST(COUNT(*) AS BIGINT) AS common_cnt,
             CAST(SUM(1000000 // c.d) AS BIGINT) AS ra_micro
      FROM cand c
      GROUP BY c.u, c.v
    ),
    nonedge AS (
      SELECT s.u, s.v, s.common_cnt, s.ra_micro
      FROM scored s LEFT JOIN edges e ON e.p1 = s.u AND e.p2 = s.v
      WHERE e.p1 IS NULL
    )
    SELECT CAST(u AS BIGINT) AS src, CAST(v AS BIGINT) AS dst,
           common_cnt, ra_micro, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT u, v, common_cnt, ra_micro,
             ROW_NUMBER() OVER (ORDER BY ra_micro DESC, u ASC, v ASC) AS rnk
      FROM nonedge
    ) WHERE rnk <= 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by the resource-allocation index: for every
    non-adjacent pair (u, v) in the co-purchase graph (parts sharing
    an order, same subgraph as graph_triangles), score
    RA(u, v) = sum over common neighbors w of 1/deg(w) — the
    Zhou/Lu/Zhang predictor that outperforms plain common-neighbor
    counts by discounting promiscuous hubs. Scores in exact integer
    micro-units (1000000 div deg, per-neighbor floor), so both engines
    rank identically; top-20 candidate edges with (score desc, u, v)
    total-order tie-break.

    CONTRACT — hub-degree cap 64 (VERDICT r8 item 4): wedge centers
    with degree > 64 are excluded from enumeration IN BOTH DIALECTS,
    so common_cnt counts common neighbors reachable through non-hub
    centers only. RA already discounts a hub center to <= 1/65 ≈
    0.0000154 per wedge, so the capped index preserves the predictor's
    ranking intent while making candidate volume sum(min(deg, 64)^2)
    — skew-proof: a single super-hub of degree D contributes 0 pairs
    instead of D², the d3 document-frequency-cap pattern applied to
    wedge centers. The degree join also carries 1/d onto each capped
    adjacency row, removing the separate cand-deg join of the
    uncapped formulation.

    Scale: pair generation is wedge enumeration bounded by
    sum(min(deg, 64)^2) <= 64·|adj| (linear in edges at any skew);
    everything else is equi-joins on node ids plus one map-combined
    aggregate; the final top-k is TakeOrderedAndProject, never a
    global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    # Shared-lineage frame (3 consumers: adj twice via self-join, the
    # anti-join) -- lazy-checkpoint once, per the r6/r7 composite rule.
    edges = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = edges.select(
        F.col("p1").alias("ctr"), F.col("p2").alias("nbr")
    ).unionByName(edges.select(F.col("p2").alias("ctr"), F.col("p1").alias("nbr")))
    deg = adj.groupBy("ctr").agg(F.count(F.lit(1)).alias("d"))
    # Hub cap (contract, see docstring): only centers with deg <= 64
    # enumerate wedges; the join carries d so scoring needs no second
    # deg join. One row per node -> broadcast side.
    adjc = adj.join(
        F.broadcast(deg.filter(F.col("d") <= 64)), "ctr"
    ).localCheckpoint(eager=False)
    cand = (
        adjc.alias("a")
        .join(
            adjc.select("ctr", "nbr").alias("b"),
            (F.col("a.ctr") == F.col("b.ctr")) & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .select(
            F.col("a.nbr").alias("u"),
            F.col("b.nbr").alias("v"),
            F.col("a.d").alias("d"),
        )
    )
    scored = cand.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_cnt"),
        F.sum(F.expr("1000000 div d")).cast("bigint").alias("ra_micro"),
    )
    nonedge = scored.join(
        edges,
        (scored["u"] == edges["p1"]) & (scored["v"] == edges["p2"]),
        "left_anti",
    )
    top = nonedge.orderBy(
        F.col("ra_micro").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(20)
    w20 = Window.orderBy(F.col("ra_micro").desc(), F.col("u").asc(), F.col("v").asc())
    return top.select(
        F.col("u").cast("bigint").alias("src"),
        F.col("v").cast("bigint").alias("dst"),
        "common_cnt",
        "ra_micro",
        F.row_number().over(w20).cast("bigint").alias("rnk"),
    )


@_register("graph_ktruss_peel", _ktruss_oracle())
def graph_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss peeling over the co-purchase graph: each round keeps
    only edges that sit in >= 2 triangles of the CURRENT edge set
    (support recomputed per round from the shrinking adjacency), the
    edge-strength decomposition one tier above graph_kcore's
    node-degree peel — a truss survives spurious co-occurrence edges
    that k-core keeps. Three bounded rounds (the early connected-
    components contract: fixed rounds, convergence visible in the
    output — equal consecutive counts mean the peel has stabilized);
    reports the surviving edge count per round.

    Scale: each round is one wedge equi-join (adjacency vs adjacency
    on the shared endpoint, bounded by sum deg^2 under the d3-style
    hub cap) + a map-combined per-edge count; the shrinking edge
    frame is lazily checkpointed per round so no round re-derives its
    predecessors."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    edges = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
        .localCheckpoint(eager=False)
    )
    counts = [(0, edges)]
    cur = edges
    for i in range(3):
        adj = cur.select(
            F.col("p1").alias("ctr"), F.col("p2").alias("nbr")
        ).unionByName(cur.select(F.col("p2").alias("ctr"), F.col("p1").alias("nbr")))
        x = adj.select(F.col("ctr").alias("__xc"), F.col("nbr").alias("__xn"))
        y = adj.select(F.col("ctr").alias("__yc"), F.col("nbr").alias("__yn"))
        cur = (
            cur.join(x, cur["p1"] == x["__xc"])
            .join(y, (cur["p2"] == y["__yc"]) & (x["__xn"] == y["__yn"]))
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("__supp"))
            .filter(F.col("__supp") >= 2)
            .select("p1", "p2")
            .localCheckpoint(eager=False)
        )
        counts.append((i + 1, cur))
    out = None
    for rnd, frame in counts:
        row = frame.agg(
            F.lit(rnd).cast("bigint").alias("round"),
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@_register(
    "graph_scc",
    """
    WITH e AS (
      SELECT DISTINCT l_partkey AS src,
             (l_partkey // 50) * 50 + (l_partkey * 3 + l_linenumber * 7) % 50
               AS dst
      FROM lineitem WHERE l_partkey < 200
    ),
    nodes AS (
      SELECT DISTINCT id FROM
        (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
    ),
    f0 AS (SELECT id, id AS lbl FROM nodes),
    f1 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN f0 s ON s.id = n.id
           LEFT JOIN e ON e.src = n.id LEFT JOIN f0 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    f2 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN f1 s ON s.id = n.id
           LEFT JOIN e ON e.src = n.id LEFT JOIN f1 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    f3 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN f2 s ON s.id = n.id
           LEFT JOIN e ON e.src = n.id LEFT JOIN f2 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    b0 AS (SELECT id, id AS lbl FROM nodes),
    b1 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN b0 s ON s.id = n.id
           LEFT JOIN e ON e.dst = n.id LEFT JOIN b0 nb ON nb.id = e.src
           GROUP BY n.id, s.lbl),
    b2 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN b1 s ON s.id = n.id
           LEFT JOIN e ON e.dst = n.id LEFT JOIN b1 nb ON nb.id = e.src
           GROUP BY n.id, s.lbl),
    b3 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN b2 s ON s.id = n.id
           LEFT JOIN e ON e.dst = n.id LEFT JOIN b2 nb ON nb.id = e.src
           GROUP BY n.id, s.lbl)
    SELECT CAST(f.lbl AS BIGINT) AS scc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(f.id) AS BIGINT) AS min_node,
           CAST(MAX(f.id) AS BIGINT) AS max_node
    FROM f3 f JOIN b3 b ON b.id = f.id AND b.lbl = f.lbl
    GROUP BY f.lbl
    ORDER BY n_members DESC, scc_id ASC LIMIT 25
    """,
)
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components via the FW-BW identification
    rule (Fleischer/Hendrickson/Pinar 2000), bounded label
    propagation: after k min-label rounds FORWARD (along edges) and
    k rounds BACKWARD (against them), a node whose forward-min and
    backward-min AGREE at value m is provably in SCC(m) — m is
    reachable from it and it from m. Emits the identified SCCs with
    sizes (members whose labels resolved within k=3 hops; larger-
    diameter components resolve in later rounds at fleet scale —
    the bounded-round contract every graph op here shares, bfs/
    components/ktruss). Directed edges derive deterministically
    from lineitem ((partkey*7 + linenumber) mod 200 — a graph with
    real multi-node cycles, block-partitioned into four 50-node
    strongly-connectable regions so several SCCs resolve within the
    bound); all label math is integer min.

    Scale shape: per round one equi-join edge pass + a map-combined
    min — the components/pagerank shuffle shape on a bucketed-by-src
    edge table; forward and backward passes share the cached edge
    frame."""
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        li.filter(F.col("l_partkey") < 200)
        .select(
            F.col("l_partkey").alias("src"),
            F.expr(
                "(l_partkey div 50) * 50"
                " + (l_partkey * 3 + l_linenumber * 7) % 50"
            ).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # fwd + bwd rounds share it
    )
    fwd = graph.connected_components(e, iterations=3, directed=True)
    bwd = graph.connected_components(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        iterations=3,
        directed=True,
    )
    ident = fwd.join(
        bwd.select(F.col("id").alias("bid"), F.col("lbl").alias("blbl")),
        (F.col("id") == F.col("bid")) & (F.col("lbl") == F.col("blbl")),
    )
    return (
        ident.groupBy(F.col("lbl").cast("bigint").alias("scc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("id").cast("bigint").alias("min_node"),
            F.max("id").cast("bigint").alias("max_node"),
        )
        .orderBy(F.col("n_members").desc(), F.col("scc_id").asc())
        .limit(25)
    )


@_register(
    "graph_scc_convergence",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT l_partkey AS src,
             (l_partkey // 50) * 50 + (l_partkey * 3 + l_linenumber * 7) % 50
               AS dst
      FROM lineitem WHERE l_partkey < 200
    ),
    nodes AS (
      SELECT DISTINCT id FROM
        (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
    ),
    freach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT e.src AS id, freach.r AS r FROM e JOIN freach ON freach.id = e.dst
    ),
    fx AS (SELECT id, MIN(r) AS lbl FROM freach GROUP BY id),
    breach AS (
      SELECT id, id AS r FROM nodes
      UNION
      SELECT e.dst AS id, breach.r AS r FROM e JOIN breach ON breach.id = e.src
    ),
    bx AS (SELECT id, MIN(r) AS lbl FROM breach GROUP BY id),
    f0 AS (SELECT id, id AS lbl FROM nodes),
    f1 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN f0 s ON s.id = n.id
           LEFT JOIN e ON e.src = n.id LEFT JOIN f0 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    f2 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN f1 s ON s.id = n.id
           LEFT JOIN e ON e.src = n.id LEFT JOIN f1 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    f3 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN f2 s ON s.id = n.id
           LEFT JOIN e ON e.src = n.id LEFT JOIN f2 nb ON nb.id = e.dst
           GROUP BY n.id, s.lbl),
    b0 AS (SELECT id, id AS lbl FROM nodes),
    b1 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN b0 s ON s.id = n.id
           LEFT JOIN e ON e.dst = n.id LEFT JOIN b0 nb ON nb.id = e.src
           GROUP BY n.id, s.lbl),
    b2 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN b1 s ON s.id = n.id
           LEFT JOIN e ON e.dst = n.id LEFT JOIN b1 nb ON nb.id = e.src
           GROUP BY n.id, s.lbl),
    b3 AS (SELECT n.id, least(s.lbl, COALESCE(MIN(nb.lbl), s.lbl)) AS lbl
           FROM nodes n JOIN b2 s ON s.id = n.id
           LEFT JOIN e ON e.dst = n.id LEFT JOIN b2 nb ON nb.id = e.src
           GROUP BY n.id, s.lbl)
    SELECT CAST(1 AS BIGINT) AS round,
           CAST(SUM(CASE WHEN f.lbl = fx.lbl AND b.lbl = bx.lbl
                    THEN 1 ELSE 0 END) AS BIGINT) AS resolved_nodes,
           CAST(COUNT(*) AS BIGINT) AS total_nodes,
           CAST(SUM(CASE WHEN f.lbl = fx.lbl AND b.lbl = bx.lbl
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
             AS resolved_share_micro
    FROM f1 f JOIN b1 b ON b.id = f.id
    JOIN fx ON fx.id = f.id JOIN bx ON bx.id = f.id
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           CAST(SUM(CASE WHEN f.lbl = fx.lbl AND b.lbl = bx.lbl
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN f.lbl = fx.lbl AND b.lbl = bx.lbl
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
    FROM f2 f JOIN b2 b ON b.id = f.id
    JOIN fx ON fx.id = f.id JOIN bx ON bx.id = f.id
    UNION ALL
    SELECT CAST(3 AS BIGINT),
           CAST(SUM(CASE WHEN f.lbl = fx.lbl AND b.lbl = bx.lbl
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN f.lbl = fx.lbl AND b.lbl = bx.lbl
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
    FROM f3 f JOIN b3 b ON b.id = f.id
    JOIN fx ON fx.id = f.id JOIN bx ON bx.id = f.id
    """,
)
def graph_scc_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-coverage audit for graph_scc's DIRECTED k=3x2-pass
    FW-BW contract (VERDICT r9 item 4): per round k = 1..3, the share
    of nodes whose k-round forward min-label AND backward min-label
    both already equal their directed-reachability fixpoint values,
    on graph_scc's exact deterministic directed graph. The directed
    twin of graph_convergence_audit — the 'larger SCCs resolve in
    later rounds' claim priced as a measured resolved_share_micro
    row per round (recorded in SCALE.md). Oracle computes the same
    fixpoints with two recursive reachability CTEs and unrolls the
    bounded rounds exactly like graph_scc's.

    exact_rounds=24: directed min-reach converges ONE hop per round
    guaranteed (the pointer jump accelerates but cannot be counted
    on — see scc_convergence_audit's docstring), so this must cover
    the graph's directed diameter. The 4-block construction gives
    each of the 200 nodes up to 7 dense out-edges (measured
    diameter ~3; the audit's own round-3 = 100 % row proves labels
    stable by round 3), so 24 is an 8x margin — and an undersized
    value cannot pass silently: the DuckDB oracle's recursive CTEs
    are a TRUE fixpoint, so an unconverged Spark exact tier
    hash-mismatches."""
    li = load_table(spark, sf_dir, "lineitem")
    e = li.filter(F.col("l_partkey") < 200).select(
        F.col("l_partkey").alias("src"),
        F.expr(
            "(l_partkey div 50) * 50"
            " + (l_partkey * 3 + l_linenumber * 7) % 50"
        ).alias("dst"),
    )
    return graph.scc_convergence_audit(e, rounds=3, exact_rounds=24)


@_register(
    "graph_reciprocity",
    """
    WITH e AS (
      SELECT DISTINCT l_partkey AS src,
             (l_partkey // 50) * 50 + (l_partkey * 3 + l_linenumber * 7) % 50
               AS dst
      FROM lineitem WHERE l_partkey < 200
    ),
    ne AS (SELECT src, dst FROM e WHERE src <> dst),
    r AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
      FROM ne a JOIN ne b ON b.src = a.dst AND b.dst = a.src
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM ne)
    SELECT t.n_edges, r.n_recip,
           CAST(r.n_recip * 10000 // t.n_edges AS BIGINT)
             AS reciprocity_bps
    FROM t CROSS JOIN r
    """,
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph RECIPROCITY (the share of non-loop edges whose
    reverse edge also exists — Newman's r, the mutual-link metric
    beside graph_assortativity's degree correlation) over graph_scc's
    deterministic directed graph. One self equi-join on the reversed
    key pair counts mutual edges; integer bps.

    Scale shape: an edge-table equi-join on (dst, src) — the same
    bucketed-by-src layout every graph op here assumes makes it
    co-located; two 1-row aggregates broadcast into the report."""
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        li.filter(F.col("l_partkey") < 200)
        .select(
            F.col("l_partkey").alias("src"),
            F.expr(
                "(l_partkey div 50) * 50"
                " + (l_partkey * 3 + l_linenumber * 7) % 50"
            ).alias("dst"),
        )
        .distinct()
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=False)  # both join sides + count share it
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    r = e.join(rev, ["src", "dst"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_recip")
    )
    t = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return t.crossJoin(F.broadcast(r)).select(
        "n_edges",
        "n_recip",
        F.expr("CAST(n_recip * 10000 div n_edges AS BIGINT)").alias(
            "reciprocity_bps"
        ),
    )


@_register(
    "graph_local_clustering",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 120
    ),
    edges AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    adj AS (
      SELECT p1 AS ctr, p2 AS nbr FROM edges
      UNION ALL
      SELECT p2 AS ctr, p1 AS nbr FROM edges
    ),
    deg AS (SELECT ctr, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY ctr),
    wed AS (
      SELECT a.ctr, a.nbr AS u, b.nbr AS w
      FROM adj a JOIN adj b ON a.ctr = b.ctr AND a.nbr < b.nbr
    ),
    tri AS (
      SELECT wed.ctr, CAST(COUNT(*) AS BIGINT) AS t
      FROM wed JOIN edges e ON e.p1 = wed.u AND e.p2 = wed.w
      GROUP BY wed.ctr
    )
    SELECT CAST(g.ctr AS BIGINT) AS id, g.d AS degree,
           CAST(COALESCE(t.t, 0) AS BIGINT) AS tri_cnt,
           CAST(COALESCE(t.t, 0) * 2 * 1000000 // (g.d * (g.d - 1))
                AS BIGINT) AS cc_micro
    FROM deg g LEFT JOIN tri t ON t.ctr = g.ctr
    WHERE g.d >= 2
    """,
)
def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL clustering coefficient (Watts-Strogatz): for
    each node v with degree >= 2, cc(v) = 2·tri(v) / (d·(d-1)) where
    tri(v) counts edges between v's neighbors — the node-level twin of
    the global transitivity query (graph_transitivity). Closed wedges
    are found by joining the wedge list (capped-order neighbor pairs
    per center) against the edge set on the (u, w) EQUI key — never a
    per-node subgraph materialization. Exact integer micros.

    Scale shape: wedge volume is sum(deg²) over a DIMENSION-BOUNDED
    subgraph (the l_partkey < 120 audit scope keeps |V| <= 119 at any
    sf, so degree <= 118 and the wedge table is < 1 M rows at 100 TB).
    On an open-scope graph the graph_link_prediction hub-cap contract
    (top-d truncation, cap named in the docstring) is the documented
    escape hatch — the capped estimator's bias concentrates on hubs
    whose cc is near-zero anyway. The wedge-close join is an equi-join
    bucketed by (u, w); output is node-dimensioned."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    edges = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
        .localCheckpoint(eager=False)  # 3 consumers: adj x2, wedge-close
    )
    adj = edges.select(
        F.col("p1").alias("ctr"), F.col("p2").alias("nbr")
    ).unionByName(
        edges.select(F.col("p2").alias("ctr"), F.col("p1").alias("nbr"))
    ).localCheckpoint(eager=False)  # deg + both wedge sides
    deg = adj.groupBy("ctr").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    wed = (
        adj.alias("a")
        .join(
            adj.select("ctr", "nbr").alias("b"),
            (F.col("a.ctr") == F.col("b.ctr")) & (F.col("a.nbr") < F.col("b.nbr")),
        )
        .select(
            F.col("a.ctr").alias("ctr"),
            F.col("a.nbr").alias("u"),
            F.col("b.nbr").alias("w"),
        )
    )
    tri = (
        wed.join(
            edges,
            (wed["u"] == edges["p1"]) & (wed["w"] == edges["p2"]),
        )
        .groupBy("ctr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    return (
        deg.join(tri, "ctr", "left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("ctr").cast("bigint").alias("id"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("tri_cnt"),
            F.expr(
                "CAST(coalesce(t, 0) * 2 * 1000000 div (d * (d - 1)) AS BIGINT)"
            ).alias("cc_micro"),
        )
    )


@_register(
    "graph_modularity",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 120
    ),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    ud AS (
      SELECT src, dst FROM edges
      UNION SELECT dst AS src, src AS dst FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS id FROM ud),
    l0 AS (SELECT id, id AS lbl FROM nodes),
    c1 AS (
      SELECT e.src, l.lbl, COUNT(*) AS n
      FROM ud e JOIN l0 l ON l.id = e.dst GROUP BY e.src, l.lbl
    ),
    w1 AS (
      SELECT src, lbl FROM (
        SELECT src, lbl,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY n DESC, lbl ASC) AS rn
        FROM c1) t WHERE rn = 1
    ),
    l1 AS (
      SELECT n.id, COALESCE(w.lbl, l.lbl) AS lbl
      FROM nodes n JOIN l0 l ON l.id = n.id
      LEFT JOIN w1 w ON w.src = n.id
    ),
    c2 AS (
      SELECT e.src, l.lbl, COUNT(*) AS n
      FROM ud e JOIN l1 l ON l.id = e.dst GROUP BY e.src, l.lbl
    ),
    w2 AS (
      SELECT src, lbl FROM (
        SELECT src, lbl,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY n DESC, lbl ASC) AS rn
        FROM c2) t WHERE rn = 1
    ),
    l2 AS (
      SELECT n.id, COALESCE(w.lbl, l.lbl) AS lbl
      FROM nodes n JOIN l1 l ON l.id = n.id
      LEFT JOIN w2 w ON w.src = n.id
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
    deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM ud GROUP BY 1),
    intra AS (
      SELECT la.lbl, CAST(COUNT(*) AS BIGINT) AS ec
      FROM edges e
      JOIN l2 la ON la.id = e.src
      JOIN l2 lb ON lb.id = e.dst
      WHERE la.lbl = lb.lbl
      GROUP BY la.lbl
    ),
    comm AS (
      SELECT l2.lbl, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(deg.d) AS BIGINT) AS dc
      FROM l2 JOIN deg ON deg.id = l2.id
      GROUP BY l2.lbl
    ),
    q AS (
      SELECT c.lbl, c.n_nodes, COALESCE(i.ec, 0) AS ec, c.dc,
             CAST(COALESCE(i.ec, 0) * 1000000 // m.m
                  - c.dc * c.dc * 1000000 // (4 * m.m * m.m)
                  AS BIGINT) AS q_contrib_micro
      FROM comm c LEFT JOIN intra i ON i.lbl = c.lbl CROSS JOIN m
    ),
    tot AS (
      SELECT CAST(-1 AS BIGINT) AS lbl,
             CAST(SUM(n_nodes) AS BIGINT) AS n_nodes,
             CAST(SUM(ec) AS BIGINT) AS ec,
             CAST(SUM(dc) AS BIGINT) AS dc,
             CAST(SUM(q_contrib_micro) AS BIGINT) AS q_contrib_micro
      FROM q
    ),
    top10 AS (
      SELECT * FROM q ORDER BY ec DESC, lbl ASC LIMIT 10
    )
    SELECT * FROM top10
    UNION ALL
    SELECT * FROM tot
    ORDER BY ec DESC, lbl ASC
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the labelprop partition -- the quality
    score community detection is judged by (Newman & Girvan 2004):
    Q = sum_c (e_c/m - (d_c/2m)^2) over 2-round labelprop
    communities on the co-purchase projection (parts sharing an
    order, the graph_local_clustering subgraph -- NOT labelprop's
    part-supplier bipartite graph, where synchronous label rounds
    oscillate between the two sides and every edge crosses
    communities by parity, a documented labelprop failure mode that
    would pin e_c at 0), in exact
    integer micros with a fixed operation order (intra-edge share
    minus squared degree share, both floor-divided against the
    broadcast edge total). Emits the 10 largest communities by
    intra-edge count plus the TOTAL row (lbl = -1) whose
    q_contrib_micro IS the partition's modularity -- closing the
    loop the graph family left open: labelprop BUILDS communities,
    er6/B-cubed scores CLUSTERINGS against truth, this scores the
    partition against the graph itself (no truth needed).

    Scale shape: the label rounds are labelprop's bounded-round
    equi-join contract; modularity adds one degree aggregate, one
    label-join pass over the edge list, and a |communities|-sized
    grid against a 1-row m broadcast. Top-10 is TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.filter(F.col("l_partkey") < 120)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    oa, ob = op.alias("a"), op.alias("b")
    edges = (
        oa.join(
            ob,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # labels, m, degrees, intra share it
    )
    labels = graph.label_propagation(edges, iterations=2).select(
        "id", "lbl"
    ).localCheckpoint(eager=False)  # intra + community aggregates share it
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    ud = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = ud.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    la = labels.select(F.col("id").alias("src"), F.col("lbl").alias("la"))
    lb = labels.select(F.col("id").alias("dst"), F.col("lbl").alias("lb"))
    intra = (
        edges.join(F.broadcast(la), "src")
        .join(F.broadcast(lb), "dst")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ec"))
    )
    comm = (
        labels.join(F.broadcast(deg), "id")
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("d").cast("bigint").alias("dc"),
        )
    )
    q = (
        comm.join(F.broadcast(intra), "lbl", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "lbl",
            "n_nodes",
            F.expr("CAST(COALESCE(ec, 0) AS BIGINT)").alias("ec"),
            "dc",
            F.expr(
                "CAST(COALESCE(ec, 0) * 1000000 div m"
                " - dc * dc * 1000000 div (4 * m * m) AS BIGINT)"
            ).alias("q_contrib_micro"),
        )
        .localCheckpoint(eager=False)  # top-10 + total share it
    )
    tot = q.agg(
        F.lit(-1).cast("bigint").alias("lbl"),
        F.sum("n_nodes").cast("bigint").alias("n_nodes"),
        F.sum("ec").cast("bigint").alias("ec"),
        F.sum("dc").cast("bigint").alias("dc"),
        F.sum("q_contrib_micro").cast("bigint").alias("q_contrib_micro"),
    )
    top10 = q.orderBy(F.col("ec").desc(), F.col("lbl").asc()).limit(10)
    return top10.unionByName(tot).orderBy(
        F.col("ec").desc(), F.col("lbl").asc()
    )


@_register(
    "graph_simrank",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 120
    ),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    adj AS (
      SELECT src AS a, dst AS b FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
    wadj AS (
      SELECT x.a, x.b FROM adj x JOIN deg c ON c.a = x.b AND c.d <= 64
    ),
    s1off AS (
      SELECT x.a AS i, y.a AS j,
             CAST(COUNT(*) AS BIGINT) AS common,
             CAST(800000 * COUNT(*) // (di.d * dj.d) AS BIGINT) AS s_micro
      FROM wadj x JOIN wadj y ON x.b = y.b AND x.a < y.a
      JOIN deg di ON di.a = x.a
      JOIN deg dj ON dj.a = y.a
      GROUP BY x.a, y.a, di.d, dj.d
    ),
    s1full AS (
      SELECT i, j, s_micro FROM s1off
      UNION ALL SELECT j, i, s_micro FROM s1off
      UNION ALL SELECT a AS i, a AS j, CAST(1000000 AS BIGINT) FROM deg
    ),
    t AS (
      SELECT s.i, y.a AS b, CAST(SUM(s.s_micro) AS BIGINT) AS tsum
      FROM s1full s JOIN adj y ON y.b = s.j
      GROUP BY 1, 2
    ),
    s2 AS (
      SELECT x.a AS i, t.b AS j, CAST(SUM(t.tsum) AS BIGINT) AS ssum
      FROM t JOIN adj x ON x.b = t.i
      WHERE x.a < t.b
      GROUP BY 1, 2
    )
    SELECT s2.i AS part_a, s2.j AS part_b,
           CAST(COALESCE(o.common, 0) AS BIGINT) AS common_neighbors,
           CAST(COALESCE(o.s_micro, 0) AS BIGINT) AS s1_micro,
           CAST(800000 * s2.ssum
                // (di.d * dj.d * 1000000) AS BIGINT) AS s2_micro
    FROM s2
    JOIN deg di ON di.a = s2.i
    JOIN deg dj ON dj.a = s2.j
    LEFT JOIN s1off o ON o.i = s2.i AND o.j = s2.j
    ORDER BY s2_micro DESC, part_a ASC, part_b ASC LIMIT 20
    """,
)
def graph_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimRank similarity, two bounded iterations (Jeh & Widom, KDD
    2002; C=0.8): 'two nodes are similar when their neighbors are
    similar' -- the RECURSIVE structural similarity the rest of the
    graph family approximates from one hop (jaccard_neighbors,
    link_prediction count common neighbors; SimRank also credits
    neighbors that are merely similar to each other). With the
    identity base case, iteration 1 is the normalized common-
    neighbor count C*|N(a) n N(b)|/(d_a d_b); iteration 2 runs as
    the MATRIX-MULTIPLY shape: T(i,b) = sum_j S1(i,j)[j in N(b)]
    then S2(a,b) = C/(d_a d_b) * sum_i [i in N(a)] T(i,b) -- two
    equi-join+aggregate rounds, never a 4-way join. Exact integer
    micros with one fixed-order floor per iteration; the diagonal
    rides as literal 1e6 rows (S(x,x)=1 by definition). Top-20
    pairs with the S1 column alongside, so the read shows where
    recursion reorders one-hop similarity.

    CONTRACT — hub-degree cap 64 on S1 wedge centers (VERDICT r9
    item 3, the graph_link_prediction pattern): the S1 wedge
    enumeration joins two copies of a CAPPED adjacency (wadj: rows
    whose shared endpoint b has degree <= 64) IN BOTH DIALECTS, so
    S1 pair volume is sum over centers of min(deg, 64)^2
    <= 64 * |adj| — linear in edges at any skew — instead of
    sum(deg^2), which before this round was bounded only by the
    <120-part candidate filter (fixture choice, not plan contract).
    A super-hub common neighbor of degree D now contributes 0
    wedges instead of D^2; SimRank-wise such a hub contributes at
    most C/D^2 per wedge to s1 (<= 0.0002 at D=65), so the capped
    score preserves the ranking intent, same argument as the
    link-prediction RA cap and d3's document-frequency cap.

    Scale shape: all state is dimension-bounded by the <120-part
    co-purchase cap (pair state <= |V|^2); S1 wedge volume is
    plan-bounded by the deg<=64 center contract above; at open
    scale SimRank runs on a pruned candidate graph exactly like
    this subgraph -- the iteration shape (two hash joins per round,
    adjacency explicitly broadcast — it is cap-bounded by
    construction, and the checkpoint would otherwise hide its size
    from AQE and fall back to sort-merge) is what survives 100x,
    and rounds are k repeated plan fragments like components/scc."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.filter(F.col("l_partkey") < 120)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    oa, ob = op.alias("a"), op.alias("b")
    edges = (
        oa.join(
            ob,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    adj = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).localCheckpoint(eager=False)  # degrees + wedges + both iterations share it
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    # Hub cap (contract, see docstring): wedge centers with deg <= 64
    # only. Node-sized degree frame -> broadcast side.
    wadj = adj.join(
        F.broadcast(
            deg.filter(F.col("d") <= 64).select(F.col("a").alias("b"))
        ),
        "b",
    )
    ax, ay = wadj.alias("x"), wadj.alias("y")
    s1off = (
        ax.join(ay, (F.col("x.b") == F.col("y.b")) & (F.col("x.a") < F.col("y.a")))
        .join(F.broadcast(deg.select(F.col("a").alias("ia"), F.col("d").alias("di"))), F.col("x.a") == F.col("ia"))
        .join(F.broadcast(deg.select(F.col("a").alias("ja"), F.col("d").alias("dj"))), F.col("y.a") == F.col("ja"))
        .groupBy(
            F.col("x.a").alias("i"),
            F.col("y.a").alias("j"),
            F.col("di"),
            F.col("dj"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
        .select(
            "i",
            "j",
            "common",
            F.expr("CAST(800000 * common div (di * dj) AS BIGINT)").alias(
                "s_micro"
            ),
        )
        .localCheckpoint(eager=False)  # s1full + final join share it
    )
    s1full = (
        s1off.select("i", "j", "s_micro")
        .unionByName(
            s1off.select(
                F.col("j").alias("i"), F.col("i").alias("j"), "s_micro"
            )
        )
        .unionByName(
            deg.select(
                F.col("a").alias("i"),
                F.col("a").alias("j"),
                F.lit(1000000).cast("bigint").alias("s_micro"),
            )
        )
    )
    t = (
        s1full.join(
            F.broadcast(
                adj.select(F.col("a").alias("tb"), F.col("b").alias("j"))
            ),
            "j",
        )
        .groupBy("i", "tb")
        .agg(F.sum("s_micro").cast("bigint").alias("tsum"))
    )
    s2 = (
        t.join(
            F.broadcast(
                adj.select(F.col("a").alias("sa"), F.col("b").alias("i"))
            ),
            "i",
        )
        .where(F.col("sa") < F.col("tb"))
        .groupBy(F.col("sa").alias("i"), F.col("tb").alias("j"))
        .agg(F.sum("tsum").cast("bigint").alias("ssum"))
    )
    return (
        s2.join(F.broadcast(deg.select(F.col("a").alias("i"), F.col("d").alias("di"))), "i")
        .join(F.broadcast(deg.select(F.col("a").alias("j"), F.col("d").alias("dj"))), "j")
        .join(
            F.broadcast(s1off.select("i", "j", "common", "s_micro")),
            ["i", "j"],
            "left",
        )
        .select(
            F.col("i").alias("part_a"),
            F.col("j").alias("part_b"),
            F.expr("CAST(COALESCE(common, 0) AS BIGINT)").alias(
                "common_neighbors"
            ),
            F.expr("CAST(COALESCE(s_micro, 0) AS BIGINT)").alias("s1_micro"),
            F.expr(
                "CAST(800000 * ssum div (di * dj * 1000000) AS BIGINT)"
            ).alias("s2_micro"),
        )
        .orderBy(
            F.col("s2_micro").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(20)
    )


@_register(
    "graph_robustness",
    f"""
    WITH RECURSIVE op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 120
    ),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    ud0 AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (SELECT src AS id, COUNT(*) AS d FROM ud0 GROUP BY 1),
    hubs AS (
      SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT 5
    ),
    rnd AS (
      SELECT id FROM (
        SELECT id, ({KNUTH_HASH32_SQL.format(key='id')}) AS h
        FROM deg) t
      ORDER BY h ASC, id ASC LIMIT 5
    ),
    e_hub AS (
      SELECT e.src, e.dst FROM edges e
      WHERE NOT EXISTS (SELECT 1 FROM hubs h WHERE h.id = e.src)
        AND NOT EXISTS (SELECT 1 FROM hubs h WHERE h.id = e.dst)
    ),
    e_rnd AS (
      SELECT e.src, e.dst FROM edges e
      WHERE NOT EXISTS (SELECT 1 FROM rnd r WHERE r.id = e.src)
        AND NOT EXISTS (SELECT 1 FROM rnd r WHERE r.id = e.dst)
    ),
    ud_b AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    nb AS (SELECT DISTINCT src AS id FROM ud_b),
    rb AS (
      SELECT id, id AS r FROM nb
      UNION
      SELECT e.src AS id, rb.r FROM ud_b e JOIN rb ON rb.id = e.dst
    ),
    lb AS (SELECT id, MIN(r) AS lbl FROM rb GROUP BY id),
    ud_h AS (SELECT src, dst FROM e_hub UNION ALL SELECT dst, src FROM e_hub),
    nh AS (SELECT DISTINCT src AS id FROM ud_h),
    rh AS (
      SELECT id, id AS r FROM nh
      UNION
      SELECT e.src AS id, rh.r FROM ud_h e JOIN rh ON rh.id = e.dst
    ),
    lh AS (SELECT id, MIN(r) AS lbl FROM rh GROUP BY id),
    ud_r AS (SELECT src, dst FROM e_rnd UNION ALL SELECT dst, src FROM e_rnd),
    nr AS (SELECT DISTINCT src AS id FROM ud_r),
    rr AS (
      SELECT id, id AS r FROM nr
      UNION
      SELECT e.src AS id, rr.r FROM ud_r e JOIN rr ON rr.id = e.dst
    ),
    lr AS (SELECT id, MIN(r) AS lbl FROM rr GROUP BY id),
    stats AS (
      SELECT 'a_baseline' AS scenario,
             CAST((SELECT COUNT(*) FROM nb) AS BIGINT) AS n_nodes,
             CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
             CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_components,
             CAST(MAX(csz) AS BIGINT) AS giant_size
      FROM (SELECT lbl, COUNT(*) AS csz FROM lb GROUP BY lbl) t
      UNION ALL
      SELECT 'b_hub_attack',
             CAST((SELECT COUNT(*) FROM nh) AS BIGINT),
             CAST((SELECT COUNT(*) FROM e_hub) AS BIGINT),
             CAST(COUNT(DISTINCT lbl) AS BIGINT),
             CAST(MAX(csz) AS BIGINT)
      FROM (SELECT lbl, COUNT(*) AS csz FROM lh GROUP BY lbl) t
      UNION ALL
      SELECT 'c_random_removal',
             CAST((SELECT COUNT(*) FROM nr) AS BIGINT),
             CAST((SELECT COUNT(*) FROM e_rnd) AS BIGINT),
             CAST(COUNT(DISTINCT lbl) AS BIGINT),
             CAST(MAX(csz) AS BIGINT)
      FROM (SELECT lbl, COUNT(*) AS csz FROM lr GROUP BY lbl) t
    )
    SELECT scenario, n_nodes, n_edges, n_components, giant_size,
           CAST(giant_size * 10000 // greatest(n_nodes, 1) AS BIGINT)
             AS giant_share_bps
    FROM stats
    ORDER BY scenario
    """,
)
def graph_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Network attack-tolerance audit (Albert, Jeong & Barabasi
    2000): the co-purchase graph's EXACT connected components
    (pointer-jumping fixpoint, not the k-round approximation) are
    measured three ways -- intact, after removing the 5
    highest-degree hubs (targeted attack; ties break to the smaller
    id), and after removing 5 hash-chosen nodes (random failure,
    same portable multiplicative hash as every sampling rule here).
    The giant-component share collapsing under hub attack but not
    under random removal is THE scale-free-network signature; on
    this near-random co-purchase graph the two removals read close
    -- either way the number is measured, and the three-scenario
    table is the robustness read an infrastructure-graph owner runs
    before hardening anything.

    Scale shape: removal sets are TakeOrdered(5); each scenario's
    edge filter is two NOT-EXISTS semi-joins against a 5-row
    broadcast; components run the fixpoint operator's per-round
    (edge join + min combine + label self-join) contract with
    node-sized state -- three bounded fixpoint runs over the
    cap-bounded subgraph, k repeated plan fragments at open scale."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.filter(F.col("l_partkey") < 120)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    oa, ob = op.alias("a"), op.alias("b")
    edges = (
        oa.join(
            ob,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # degrees + all three scenarios share it
    )
    ud = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = ud.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    ).localCheckpoint(eager=False)  # hub + random removal sets share it
    hubs = (
        deg.orderBy(F.col("d").desc(), F.col("id").asc()).limit(5).select("id")
    )
    rnd = (
        deg.select("id", knuth_hash32(F.col("id")).alias("h"))
        .orderBy(F.col("h").asc(), F.col("id").asc())
        .limit(5)
        .select("id")
    )

    def _drop(e: DataFrame, rm: DataFrame) -> DataFrame:
        rm_s = F.broadcast(rm.select(F.col("id").alias("src")))
        rm_d = F.broadcast(rm.select(F.col("id").alias("dst")))
        return e.join(rm_s, "src", "left_anti").join(rm_d, "dst", "left_anti")

    def _stats(name: str, e: DataFrame) -> DataFrame:
        labels = graph.connected_components_fixpoint(e, rounds=10)
        comp = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("csz"))
        cstats = comp.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_components"),
            F.max("csz").cast("bigint").alias("giant_size"),
        )
        sizes = e.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges")
        ).crossJoin(
            F.broadcast(
                labels.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
            )
        )
        return (
            sizes.crossJoin(F.broadcast(cstats))
            .select(
                F.lit(name).alias("scenario"),
                "n_nodes",
                "n_edges",
                "n_components",
                "giant_size",
                F.expr(
                    "CAST(giant_size * 10000"
                    " div greatest(n_nodes, 1) AS BIGINT)"
                ).alias("giant_share_bps"),
            )
        )

    base = _stats("a_baseline", edges)
    hub = _stats("b_hub_attack", _drop(edges, hubs).localCheckpoint(eager=False))
    ran = _stats(
        "c_random_removal", _drop(edges, rnd).localCheckpoint(eager=False)
    )
    return base.unionByName(hub).unionByName(ran).orderBy("scenario")


@_register(
    "graph_spectral_bisection",
    f"""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 120
    ),
    edges AS MATERIALIZED (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    ud AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM ud GROUP BY 1),
    c AS MATERIALIZED (SELECT MAX(d) + 1 AS c, CAST(COUNT(*) AS BIGINT) AS nn FROM deg),
    v0r AS MATERIALIZED (
      SELECT id,
             CAST(({KNUTH_HASH32_SQL.format(key='id')}) % 2001 - 1000
                  AS BIGINT) * 1000 AS v
      FROM deg
    ),
    m0 AS MATERIALIZED (
      SELECT (SUM(v) + 4000000000 * COUNT(*)) // COUNT(*)
             - 4000000000 AS m
      FROM v0r
    ),
    v0 AS MATERIALIZED (SELECT v0r.id, v0r.v - m0.m AS v FROM v0r CROSS JOIN m0),
    w1 AS MATERIALIZED (
      SELECT d.id,
             (c.c - d.d) * v.v + COALESCE(nb.s, 0) AS w
      FROM deg d
      JOIN v0 v ON v.id = d.id
      CROSS JOIN c
      LEFT JOIN (SELECT e.src AS id, SUM(v.v) AS s
                 FROM ud e JOIN v0 v ON v.id = e.dst GROUP BY 1) nb
        ON nb.id = d.id
    ),
    m1 AS MATERIALIZED (
      SELECT (SUM(w) + 400000000000 * COUNT(*)) // COUNT(*)
             - 400000000000 AS m
      FROM w1
    ),
    w1c AS MATERIALIZED (SELECT id, w - m1.m AS w FROM w1 CROSS JOIN m1),
    n1 AS MATERIALIZED (SELECT greatest(MAX(abs(w)) // 1000000, 1) AS nrm FROM w1c),
    v1 AS MATERIALIZED (
      SELECT id, (w + 4000000 * n1.nrm) // n1.nrm - 4000000 AS v
      FROM w1c CROSS JOIN n1
    ),
    w2 AS MATERIALIZED (
      SELECT d.id,
             (c.c - d.d) * v.v + COALESCE(nb.s, 0) AS w
      FROM deg d
      JOIN v1 v ON v.id = d.id
      CROSS JOIN c
      LEFT JOIN (SELECT e.src AS id, SUM(v.v) AS s
                 FROM ud e JOIN v1 v ON v.id = e.dst GROUP BY 1) nb
        ON nb.id = d.id
    ),
    m2 AS MATERIALIZED (
      SELECT (SUM(w) + 400000000000 * COUNT(*)) // COUNT(*)
             - 400000000000 AS m
      FROM w2
    ),
    w2c AS MATERIALIZED (SELECT id, w - m2.m AS w FROM w2 CROSS JOIN m2),
    side AS MATERIALIZED (
      SELECT id, CASE WHEN w >= 0 THEN 'A' ELSE 'B' END AS side FROM w2c
    ),
    cut AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN sa.side <> sb.side THEN 1 ELSE 0 END)
                  AS BIGINT) AS cut_edges,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM edges e
      JOIN side sa ON sa.id = e.src
      JOIN side sb ON sb.id = e.dst
    ),
    bal AS MATERIALIZED (
      SELECT CAST(MIN(cnt) * 10000 // MAX(cnt) AS BIGINT) AS balance_bps
      FROM (SELECT COUNT(*) AS cnt FROM side GROUP BY side) t
    )
    SELECT s.side,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(cut.cut_edges) AS BIGINT) AS cut_edges,
           CAST(MAX(cut.cut_edges) * 10000 // MAX(cut.m) AS BIGINT)
             AS cut_share_bps,
           CAST(MAX(bal.balance_bps) AS BIGINT) AS balance_bps
    FROM side s CROSS JOIN cut CROSS JOIN bal
    GROUP BY s.side
    ORDER BY s.side
    """,
)
def graph_spectral_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral graph bisection (Fiedler 1973) by DEFLATED power
    iteration, quantized exact: two iterations of w = (cI - L)v on
    the co-purchase Laplacian (c = maxdeg + 1 makes the operator
    PSD; the matvec is the pure-integer (c - d_i)v_i + sum of
    neighbor values -- one edge join + combine per round, the
    pagerank shape), each followed by MEAN SUBTRACTION, which is
    exact deflation against the all-ones eigenvector (the Laplacian
    kernel) -- the component ml_pca_power did not need and spectral
    methods cannot skip. The iterate converges toward the Fiedler
    direction; sign(v) is the bisection. Emitted per side: node
    count, the cut size (with its share of all edges) and the
    partition balance -- the numbers a graph-partitioning pass
    (METIS-style) reports before anyone shards on it. On this
    near-random co-purchase graph the cut share reads ~50 % at
    decent balance -- random graphs HAVE no small balanced cut
    (expander-like), and the honest number says so; on modular
    topology the same plan finds the valley. Start vector
    is portable-hash noise (mean-centered), every signed division
    uses the positive-offset floor, all state is exact int64.

    Scale shape: per iteration one neighbor-sum equi-join + two
    1-row broadcasts (mean, norm) over node-sized state -- the
    bounded-round contract of pagerank/components; the cut audit is
    one label join over the edge list."""
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.filter(F.col("l_partkey") < 120)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    oa, ob = op.alias("a"), op.alias("b")
    edges = (
        oa.join(
            ob,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        .localCheckpoint()  # degrees, both matvecs, cut share it (eager: 120-row frame, many consumers)
    )
    ud = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = ud.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).localCheckpoint()
    c = deg.agg(
        (F.max("d") + 1).alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("nn"),
    )
    v = deg.select(
        "id",
        ((knuth_hash32(F.col("id")) % 2001 - 1000) * 1000).alias("v"),
    )

    def _center(df: DataFrame, col: str, k: int) -> DataFrame:
        m = df.agg(
            F.expr(
                f"CAST((SUM({col}) + {k} * COUNT(1)) div COUNT(1) - {k}"
                " AS BIGINT)"
            ).alias("__m")
        )
        return df.crossJoin(F.broadcast(m)).select(
            "id", (F.col(col) - F.col("__m")).alias(col)
        )

    v = _center(v, "v", 4000000000)
    for _ in range(2):
        nb = (
            ud.join(
                F.broadcast(v.select(F.col("id").alias("dst"), F.col("v").alias("nv"))),
                "dst",
            )
            .groupBy("src")
            .agg(F.sum("nv").alias("s"))
        )
        w = (
            deg.join(v, "id")
            .join(F.broadcast(c), F.lit(True))
            .join(nb.select(F.col("src").alias("id"), "s"), "id", "left")
            .select(
                "id",
                F.expr("(c - d) * v + COALESCE(s, 0)").alias("w"),
            )
        )
        w = _center(w, "w", 400000000000)
        n1 = w.agg(
            F.expr("CAST(greatest(MAX(abs(w)) div 1000000, 1) AS BIGINT)").alias(
                "nrm"
            )
        )
        v = (
            w.crossJoin(F.broadcast(n1))
            .select(
                "id",
                F.expr("(w + 4000000 * nrm) div nrm - 4000000").alias("v"),
            )
            .localCheckpoint()
        )
    side = v.select(
        "id", F.when(F.col("v") >= 0, "A").otherwise("B").alias("side")
    ).localCheckpoint()  # cut + balance + per-side counts share it
    cut = (
        edges.join(
            F.broadcast(side.select(F.col("id").alias("src"), F.col("side").alias("sa"))),
            "src",
        )
        .join(
            F.broadcast(side.select(F.col("id").alias("dst"), F.col("side").alias("sb"))),
            "dst",
        )
        .agg(
            F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0))
            .cast("bigint")
            .alias("cut_edges"),
            F.count(F.lit(1)).cast("bigint").alias("m"),
        )
    )
    bal = (
        side.groupBy("side")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.expr("CAST(MIN(cnt) * 10000 div MAX(cnt) AS BIGINT)").alias(
                "balance_bps"
            )
        )
    )
    return (
        side.groupBy("side")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(bal))
        .select(
            "side",
            "n_nodes",
            "cut_edges",
            F.expr("CAST(cut_edges * 10000 div m AS BIGINT)").alias(
                "cut_share_bps"
            ),
            "balance_bps",
        )
        .orderBy("side")
    )
