"""CSS selector engine (sources/cssdom.py): DOM building, selector
parsing, matching semantics, and the Spark mapInPandas operator.

The reference CSS-selects arbitrary nodes out of fetched pages
(hi-csa-db.Rmd:153-171); these pin the selector subset that covers
those pipelines, plus the tree-building edge cases (void elements,
misnesting recovery, text interleaving)."""

import pytest

from hi_csa_db_spark.sources.cssdom import parse_selector, select

PAGE = """
<div id="main" class="content wide">
  <h3 class="title">First <em>em</em> tail</h3>
  <p>Para <a href="/r/1">link</a> body</p>
  <p data-kind="x">Second</p>
  <ul><li>one</li><li>two</li><li>three</li></ul>
</div>
<div class="sidebar">
  <h3 class="title">Noise</h3>
  <p>skip</p>
</div>
<img src="x.png"><br>
<p class="footer">foot</p>
"""


def texts(sel, html=PAGE):
    return [n.text() for n in select(html, sel)]


def tags(sel, html=PAGE):
    return [n.tag for n in select(html, sel)]


def test_id_descendant_and_class():
    assert texts("#main h3.title") == ["First em tail"]


def test_decoy_with_same_class_excluded():
    # the sidebar h3 has the SAME class; only the #main subtree matches
    assert texts("#main .title") == ["First em tail"]
    assert len(texts(".title")) == 2


def test_child_combinator_direct_only():
    assert texts("div.sidebar > p") == ["skip"]
    assert texts("ul > li") == ["one", "two", "three"]
    # li is not a direct child of div
    assert texts("div > li") == []


def test_descendant_combinator_any_depth():
    assert texts("div li") == ["one", "two", "three"]


def test_grouping_dedup_document_order():
    got = [(n.tag, n.text()) for n in select(PAGE, "#main h3.title, #main p, #main .title")]
    assert got == [
        ("h3", "First em tail"),
        ("p", "Para link body"),
        ("p", "Second"),
    ]


def test_sibling_combinators():
    assert texts("h3 + p") == ["Para link body", "skip"]
    assert texts("h3 ~ p") == ["Para link body", "Second", "skip"]
    assert texts("p + p") == ["Second"]


def test_positional_pseudo_classes():
    assert texts("li:first-child") == ["one"]
    assert texts("li:last-child") == ["three"]
    assert texts("li:nth-child(2)") == ["two"]


def test_attribute_selectors():
    assert texts("[data-kind]") == ["Second"]
    assert texts("[data-kind=x]") == ["Second"]
    assert texts("p[data-kind*=x]") == ["Second"]
    assert texts('[class~=wide] p') == ["Para link body", "Second"]
    assert tags('[src$=png]') == ["img"]
    assert tags('[src^=x]') == ["img"]


def test_universal_and_compound():
    assert texts("*.footer") == ["foot"]
    assert texts("div.content.wide p > a") == ["link"]


def test_text_interleaving_and_hrefs():
    n = select(PAGE, "#main p")[0]
    assert n.text() == "Para link body"  # text -> anchor -> text order kept
    assert n.hrefs() == ["/r/1"]


def test_void_elements_do_not_swallow_siblings():
    # img/br are void: the footer p must NOT become their child
    assert texts("p.footer") == ["foot"]
    assert texts("img p") == []


def test_misnesting_recovery():
    # browser-style recovery: unclosed <b> inside <p>, stray </i>
    html = "<div><p>one <b>bold</p><p>two</p></i></div>"
    assert texts("div > p", html) == ["one bold", "two"]


def test_unsupported_selector_raises():
    with pytest.raises(ValueError):
        parse_selector("p:hover")  # pseudo parse ok but match rejects
        select("<p>x</p>", "p:hover")
    with pytest.raises(ValueError):
        select("<p>x</p>", "p:hover")


def test_spark_operator_schema_and_parallel_pages(spark):
    from hi_csa_db_spark.sources.cssdom import css_select_elements

    pages = spark.createDataFrame(
        [(f"u{i}", PAGE) for i in range(20)], ["url", "html"]
    ).repartition(8)
    out = css_select_elements(pages, "#main h3.title, #main p")
    rows = out.orderBy("url", "doc_order").collect()
    assert len(rows) == 60
    first = [r for r in rows if r.url == "u0"]
    assert [(r.doc_order, r.tag, r.text) for r in first] == [
        (0, "h3", "First em tail"),
        (1, "p", "Para link body"),
        (2, "p", "Second"),
    ]
    assert first[1].hrefs == ["/r/1"]


def test_spark_operator_rejects_bad_selector_on_driver(spark):
    from hi_csa_db_spark.sources.cssdom import css_select_elements

    pages = spark.createDataFrame([("u", PAGE)], ["url", "html"])
    with pytest.raises(ValueError):
        css_select_elements(pages, "p::beforeX !!")


# ---------------------------------------------------------------------------
# property tests: selector algebra over random DOMs
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_TAGS = ["div", "p", "span", "li", "h3"]


@st.composite
def _dom(draw, max_nodes=24):
    """Random nested HTML: returns the markup string."""
    n = draw(st.integers(2, max_nodes))
    parts = []
    open_tags = []
    for i in range(n):
        action = draw(st.integers(0, 2))
        if action == 0 or not open_tags:  # open
            tag = draw(st.sampled_from(_TAGS))
            cls = draw(st.sampled_from(["", ' class="a"', ' class="b"', ' class="a b"']))
            parts.append(f"<{tag}{cls}>")
            open_tags.append(tag)
        elif action == 1:  # text
            parts.append(draw(st.sampled_from(["x", "y z", ""])))
        else:  # close
            parts.append(f"</{open_tags.pop()}>")
    while open_tags:
        parts.append(f"</{open_tags.pop()}>")
    return "".join(parts)


@settings(max_examples=60, deadline=None)
@given(_dom(), st.sampled_from(_TAGS))
def test_child_subset_of_descendant(html, tag):
    from hi_csa_db_spark.sources.cssdom import select

    child = {n.doc_order for n in select(html, f"div > {tag}")}
    desc = {n.doc_order for n in select(html, f"div {tag}")}
    assert child <= desc


@settings(max_examples=60, deadline=None)
@given(_dom(), st.sampled_from(_TAGS))
def test_adjacent_subset_of_general_sibling(html, tag):
    from hi_csa_db_spark.sources.cssdom import select

    adj = {n.doc_order for n in select(html, f"p + {tag}")}
    gen = {n.doc_order for n in select(html, f"p ~ {tag}")}
    assert adj <= gen


@settings(max_examples=60, deadline=None)
@given(_dom())
def test_tag_select_equals_dom_scan(html):
    # selecting by bare tag must equal a brute-force scan of the tree
    from hi_csa_db_spark.sources.cssdom import parse_dom, select

    for tag in _TAGS:
        want = [n.doc_order for n in parse_dom(html) if n.tag == tag]
        got = [n.doc_order for n in select(html, tag)]
        assert got == want


@settings(max_examples=60, deadline=None)
@given(_dom())
def test_grouping_is_union_in_document_order(html):
    from hi_csa_db_spark.sources.cssdom import select

    a = {n.doc_order for n in select(html, "p.a")}
    b = {n.doc_order for n in select(html, "span")}
    both = [n.doc_order for n in select(html, "p.a, span")]
    assert set(both) == a | b
    assert both == sorted(both)  # document order, deduped


def test_script_and_style_excluded_from_text():
    html = (
        '<div id="m"><style>.x{color:red}</style><p>hello</p>'
        "<script>var x = 1;</script><p>world</p></div>"
    )
    from hi_csa_db_spark.sources.cssdom import select

    d = select(html, "#m")[0]
    assert d.text() == "hello world"
    # the nodes themselves still exist and are selectable
    assert len(select(html, "script")) == 1


def test_comments_dropped():
    html = "<div><!-- hidden --><p>shown</p></div>"
    from hi_csa_db_spark.sources.cssdom import select

    assert select(html, "div")[0].text() == "shown"
