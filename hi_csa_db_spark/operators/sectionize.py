"""Document sectionizer (reference J4/W1/X1/X2).

The reference walks h3/h4/p elements in document order with an
imperative loop carrying ``current_h3``/``current_h4`` state
(hi-csa-db.Rmd:178-212), then flattens the nested result to rows
(``list_to_dataframe``, hi-csa-db.Rmd:216-270). Re-expressed as two
window forward-fills over an ordered element table — the nested dict
never materializes, and per-paragraph links explode directly.

Input element table contract (FIXTURES.md B5):
    url string, doc_order int, tag string in {h3,h4,p},
    text string, hrefs array<string>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hi_csa_db_spark.operators.ordered import forward_fill
from hi_csa_db_spark.functions.text import absolutize_url


def sectionize(elements: DataFrame) -> DataFrame:
    """Attach section context to each paragraph.

    Returns (url, doc_order, mitigation, practice, description, hrefs):
    one row per ``p`` element with the most recent h3 as mitigation and
    the most recent h4 *since that h3* as practice (h4 context resets
    at each h3 — hi-csa-db.Rmd:193-210; a p before any h4 in its h3
    group gets a NULL practice, the reference's NA-Practice path).
    """
    h3_fill = forward_fill(
        elements,
        F.when(F.col("tag") == "h3", F.col("text")),
        order_by=["doc_order"],
        partition_by=["url"],
    )
    h4_fill = forward_fill(
        elements,
        F.when(F.col("tag") == "h4", F.col("text")),
        order_by=["doc_order"],
        partition_by=["url"],
        reset_on=F.col("tag") == "h3",
    )
    ctx = elements.select(
        "url",
        "doc_order",
        "tag",
        "text",
        "hrefs",
        h3_fill.alias("mitigation"),
        h4_fill.alias("practice"),
    )
    return ctx.filter(F.col("tag") == "p").select(
        "url",
        "doc_order",
        "mitigation",
        "practice",
        F.col("text").alias("description"),
        "hrefs",
    )


def explode_links(sections: DataFrame, base_url: str) -> DataFrame:
    """X1: one row per link per paragraph, URL-absolutized (F5).

    ``explode_outer`` keeps link-less paragraphs with a NULL resource,
    matching the reference's NA handling (hi-csa-db.Rmd:206-210).
    """
    return sections.select(
        "url",
        "doc_order",
        "mitigation",
        "practice",
        "description",
        F.explode_outer("hrefs").alias("href"),
    ).select(
        "url",
        "doc_order",
        "mitigation",
        "practice",
        "description",
        F.when(
            F.col("href").isNotNull(), absolutize_url(F.col("href"), base_url)
        ).alias("resource"),
    )
