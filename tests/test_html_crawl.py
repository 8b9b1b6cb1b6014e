"""HTML element-table source + BFS crawl with an injected fetcher."""

from hi_csa_db_spark.sources import crawl, html
from hi_csa_db_spark.operators.sectionize import sectionize

PAGE = """
<html><body>
<p>orphan intro</p>
<h3>Soil Health</h3>
<p>about soil <a href="/doc1.pdf">doc</a> and <a href="https://x.org/2">ext</a></p>
<h4>Cover Crop</h4>
<p>cover crop details <a href="/doc3.pdf">pdf</a></p>
<h3>Energy</h3>
<p>energy para</p>
</body></html>
"""


def test_elements_from_pages_order_and_hrefs(spark):
    pages = spark.createDataFrame([("u1", PAGE)], "url string, html string")
    els = html.elements_from_pages(pages, kept=("h3", "h4", "p")).collect()
    els.sort(key=lambda r: r.doc_order)
    assert [e.tag for e in els] == ["p", "h3", "p", "h4", "p", "h3", "p"]
    assert els[2].hrefs == ["/doc1.pdf", "https://x.org/2"]
    assert els[0].text == "orphan intro"


def test_sectionize_on_parsed_html(spark):
    pages = spark.createDataFrame([("u1", PAGE)], "url string, html string")
    els = html.elements_from_pages(pages, kept=("h3", "h4", "p"))
    secs = {r.doc_order: r for r in sectionize(els).collect()}
    assert secs[0].mitigation is None  # orphan p before any h3
    assert secs[2].mitigation == "Soil Health" and secs[2].practice is None
    assert secs[4].practice == "Cover Crop"
    assert secs[6].mitigation == "Energy" and secs[6].practice is None  # h4 reset


SITE = {
    "https://s.org/": '<a href="/a">a</a> <a href="/b">b</a>',
    "https://s.org/a": '<a href="/b">b</a> <a href="/c">c</a>',
    "https://s.org/b": "",
    "https://s.org/c": '<a href="/d">d</a>',
}


def test_crawl_bfs_levels(spark):
    index, edges = crawl.crawl(
        spark, ["https://s.org/"], lambda u: SITE.get(u, ""), max_depth=2
    )
    levels = {r.url: r.level for r in index.collect()}
    assert levels["https://s.org/"] == 0
    assert levels["https://s.org/a"] == 1
    assert levels["https://s.org/b"] == 1
    assert levels["https://s.org/c"] == 2
    assert "https://s.org/d" not in levels  # beyond max_depth
    # depth 1 fetches the seed (2 edges); depth 2 fetches {a,b} (2 edges)
    assert edges.count() == 4


def test_crawl_or_cache_is_idempotent(spark, tmp_path):
    calls = []

    def fetcher(u):
        calls.append(u)
        return SITE.get(u, "")

    d = str(tmp_path / "crawlcache")
    i1, e1 = crawl.crawl_or_cache(spark, d, ["https://s.org/"], fetcher, 1)
    n_after_first = len(calls)
    i2, e2 = crawl.crawl_or_cache(spark, d, ["https://s.org/"], fetcher, 1)
    assert len(calls) == n_after_first  # cache hit: no refetch
    assert i1.count() == i2.count() and e1.count() == e2.count()
