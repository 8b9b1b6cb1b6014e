"""Keyword-dictionary multi-label classifier (reference J2/X3).

``detect.csa`` (hi-csa-db.Rmd:75-88) tokenizes text and emits one label
per case-insensitively matched keyword, NA if none — a one-to-many
contains-join doubling as a multi-label classifier, applied to the
policy sheet at hi-csa-db.Rmd:513 with the 21-row dictionary at
hi-csa-db.Rmd:497-509.

Two physical strategies:

- ``keyword_classify_nlj``: broadcast nested-loop rlike join — fine
  when the dictionary is tiny (the reference's 21 rows).
- ``keyword_classify`` (default): token-explode + broadcast hash
  equi-join on the token — the 100 TB path. Tokenization is a narrow
  map; the join is broadcast, so the only shuffle is the final
  per-(doc,label) distinct, which AQE coalesces. This is the rewrite
  SURVEY.md section 4 calls out for dictionary scale.

Both keep unmatched rows with a NULL label (reference keep-NA branch,
hi-csa-db.Rmd:515-536 explode_outer semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hi_csa_db_spark.functions.text import strip_punct, tokenize


def keyword_classify(
    docs: DataFrame,
    keywords: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keyword_col: str = "keyword",
    label_col: str = "label",
) -> DataFrame:
    """Token equi-join strategy. Returns (id_col, label_col) with one
    row per matched label, plus a NULL-label row for unmatched docs."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize(F.lower(strip_punct(F.col(text_col))))).alias("__tok"),
    )
    dict_df = keywords.select(
        F.lower(F.col(keyword_col)).alias("__tok"), F.col(label_col)
    )
    matched = (
        toks.join(F.broadcast(dict_df), "__tok")
        .select(id_col, label_col)
        .distinct()
    )
    return (
        docs.select(id_col)
        .join(matched, id_col, "left")
        .select(id_col, label_col)
    )


def keyword_classify_nlj(
    docs: DataFrame,
    keywords: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keyword_col: str = "keyword",
    label_col: str = "label",
) -> DataFrame:
    """Broadcast nested-loop rlike strategy (small dictionaries only)."""
    cleaned = docs.select(
        F.col(id_col), F.lower(strip_punct(F.col(text_col))).alias("__txt")
    )
    dict_df = keywords.select(
        F.lower(F.col(keyword_col)).alias("__kw"), F.col(label_col)
    )
    matched = (
        cleaned.join(
            F.broadcast(dict_df),
            F.col("__txt").rlike(F.concat(F.lit(r"\b"), F.col("__kw"), F.lit(r"\b"))),
        )
        .select(id_col, label_col)
        .distinct()
    )
    return (
        docs.select(id_col)
        .join(matched, id_col, "left")
        .select(id_col, label_col)
    )
