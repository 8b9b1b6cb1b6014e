"""HTML ingestion: pages(url, html) -> ordered element table.

The reference fetches a DOM with read_html and CSS-selects h3/h4/p
nodes in document order (hi-csa-db.Rmd:151-171, F11/F12). Here the
parse is the ONE place the engine uses Python: a stdlib-html.parser
UDF applied via mapInPandas (Arrow-batched, one parser per batch row,
linear in page size). Everything downstream of the element table is
pure Catalyst (operators/sectionize.py).

Output schema (the B5 fixture contract — FIXTURES.md):
    url string, doc_order int, tag string, text string,
    hrefs array<string>
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ELEMENT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("doc_order", IntegerType()),
        StructField("tag", StringType()),
        StructField("text", StringType()),
        StructField("hrefs", ArrayType(StringType())),
    ]
)

_KEPT_TAGS = ("h1", "h2", "h3", "h4", "h5", "h6", "p", "li")


class _ElementCollector(HTMLParser):
    """Collects kept elements in document order with inner text and
    anchor hrefs (nested anchors attach to the enclosing element)."""

    def __init__(self, kept: tuple[str, ...]):
        super().__init__(convert_charrefs=True)
        self.kept = set(kept)
        self.elements: list[dict] = []
        self._stack: list[dict] = []

    def handle_starttag(self, tag, attrs):
        if tag in self.kept:
            self._stack.append({"tag": tag, "text": [], "hrefs": []})
        elif tag == "a" and self._stack:
            href = dict(attrs).get("href")
            if href:
                self._stack[-1]["hrefs"].append(href)

    def handle_endtag(self, tag):
        if tag in self.kept and self._stack and self._stack[-1]["tag"] == tag:
            el = self._stack.pop()
            el["text"] = " ".join("".join(el["text"]).split())
            self.elements.append(el)

    def handle_data(self, data):
        if self._stack:
            self._stack[-1]["text"].append(data)


def parse_html(url: str, html: str, kept: tuple[str, ...] = _KEPT_TAGS) -> list[dict]:
    parser = _ElementCollector(kept)
    parser.feed(html or "")
    return [
        {
            "url": url,
            "doc_order": i,
            "tag": el["tag"],
            "text": el["text"],
            "hrefs": el["hrefs"],
        }
        for i, el in enumerate(parser.elements)
    ]


def elements_from_pages(
    pages: DataFrame, kept: tuple[str, ...] = _KEPT_TAGS
) -> DataFrame:
    """pages(url, html) -> element table, via Arrow-batched mapInPandas.

    Each input partition streams through pandas batches; output size is
    proportional to element count, so skewed giant pages only affect
    their own partition (salt the fetch layer by url hash at scale).
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                rows.extend(parse_html(url, html, kept))
            yield pd.DataFrame(
                rows, columns=["url", "doc_order", "tag", "text", "hrefs"]
            )

    return pages.mapInPandas(gen, ELEMENT_SCHEMA)
