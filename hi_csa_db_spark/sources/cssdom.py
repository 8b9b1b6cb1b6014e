"""Real CSS selection over parsed HTML: DOM tree + selector engine.

The reference's scrape tier CSS-selects arbitrary nodes out of fetched
pages (hi-csa-db.Rmd:153-171 — e.g. ``#block-mainpagecontent h3``,
``div.field--item p``), which a flat kept-tags allowlist (sources/html.py)
cannot express. This module parses pages into a real DOM tree
(stdlib html.parser; no external deps) and implements the CSS
selector subset the reference's pipelines use:

    tag   *   #id   .class   [attr]  [attr=v]  [attr^=v] [attr$=v]
    [attr*=v] [attr~=v]   compound (div#id.cls)   grouping (a, b)
    descendant (a b)   child (a > b)   adjacent (a + b)  sibling (a ~ b)
    :first-child  :last-child  :nth-child(n)

Matching is right-to-left (match the rightmost simple selector, then
walk parents/siblings), the standard engine strategy. Selection is
per page and linear-ish in page size; the Spark operator applies it
via Arrow-batched mapInPandas, so pages parallelize across executors
and payloads never hit the driver — the same scale contract as
sources/html.py.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from hi_csa_db_spark.sources.html import ELEMENT_SCHEMA

# elements that never take content (HTML void elements): start tag only
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = (
        "tag", "attrs", "classes", "parent", "children",
        "doc_order", "_content",
    )

    def __init__(self, tag: str, attrs: dict, parent: "Node | None", order: int):
        self.tag = tag
        self.attrs = attrs
        self.classes = set((attrs.get("class") or "").split())
        self.parent = parent
        self.children: list[Node] = []
        self.doc_order = order
        # document-ordered mix of text chunks (str) and child Nodes —
        # preserves text/element interleaving for inner-text extraction
        self._content: list = []

    # normalized inner text (whitespace-collapsed, includes descendants;
    # script/style content is code, not text — excluded like a
    # browser's innerText)
    def text(self) -> str:
        out: list[str] = []

        def walk(n: "Node") -> None:
            if n.tag in ("script", "style"):
                return
            for item in n._content:
                if isinstance(item, str):
                    out.append(item)
                else:
                    walk(item)

        walk(self)
        return " ".join(" ".join(out).split())

    def hrefs(self) -> list[str]:
        out: list[str] = []

        def walk(n: "Node") -> None:
            if n.tag == "a" and n.attrs.get("href"):
                out.append(n.attrs["href"])
            for c in n.children:
                walk(c)

        walk(self)
        return out


def _attach(parent: Node, node: Node) -> None:
    parent.children.append(node)
    parent._content.append(node)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None, -1)
        self._cur = self.root
        self._order = 0
        self.all_nodes: list[Node] = []

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self._cur, self._order)
        self._order += 1
        _attach(self._cur, node)
        self.all_nodes.append(node)
        if tag not in _VOID:
            self._cur = node

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), self._cur, self._order)
        self._order += 1
        _attach(self._cur, node)
        self.all_nodes.append(node)

    def handle_endtag(self, tag):
        # browser-style recovery: pop to the nearest open matching tag
        n = self._cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self._cur = n.parent

    def handle_data(self, data):
        if data:
            self._cur._content.append(data)


def parse_dom(html: str) -> list[Node]:
    """Parse to a node list in document order (the tree hangs off each
    node's parent/children)."""
    tb = _TreeBuilder()
    tb.feed(html or "")
    return tb.all_nodes


# --------------------------------------------------------------------------
# selector parsing
# --------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)?
    (?P<rest>(?:
        \#[\w-]+ |
        \.[\w-]+ |
        \[[^\]]+\] |
        :[\w-]+(?:\([^)]*\))?
    )*)
    """,
    re.VERBOSE,
)
_PART_RE = re.compile(
    r"\#([\w-]+)|\.([\w-]+)|\[([^\]]+)\]|:([\w-]+)(?:\(([^)]*)\))?"
)
_ATTR_RE = re.compile(r"^\s*([\w-]+)\s*(?:([~^$*|]?=)\s*(.*?)\s*)?$")


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs", "pseudos")

    def __init__(self) -> None:
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None, str | None]] = []
        self.pseudos: list[tuple[str, str | None]] = []


def _parse_simple(token: str) -> _Simple:
    m = _SIMPLE_RE.match(token)
    if not m or m.end() != len(token):
        raise ValueError(f"unsupported selector token: {token!r}")
    s = _Simple()
    tag = m.group("tag")
    if tag and tag != "*":
        s.tag = tag.lower()
    for pm in _PART_RE.finditer(m.group("rest") or ""):
        hid, cls, attr, pseudo, parg = pm.groups()
        if hid:
            s.id = hid
        elif cls:
            s.classes.append(cls)
        elif attr:
            am = _ATTR_RE.match(attr)
            if not am:
                raise ValueError(f"bad attribute selector: [{attr}]")
            name, op, val = am.groups()
            if val is not None:
                val = val.strip("'\"")
            s.attrs.append((name.lower(), op, val))
        elif pseudo:
            s.pseudos.append((pseudo.lower(), parg))
    return s


def _tokenize_complex(alt: str) -> list[str]:
    """Split one complex selector into simple-selector tokens and
    combinator tokens, treating ``>+~`` and whitespace as combinators
    ONLY outside ``[...]`` attribute blocks (``~=`` etc. must survive)."""
    tokens: list[str] = []
    buf = ""
    depth = 0
    for ch in alt:
        if ch == "[":
            depth += 1
            buf += ch
        elif ch == "]":
            depth -= 1
            buf += ch
        elif depth == 0 and ch in ">+~":
            if buf.strip():
                tokens.append(buf.strip())
            buf = ""
            tokens.append(ch)
        elif depth == 0 and ch.isspace():
            if buf.strip():
                tokens.append(buf.strip())
            buf = ""
        else:
            buf += ch
    if buf.strip():
        tokens.append(buf.strip())
    return tokens


def parse_selector(selector: str) -> list[list[tuple[str, _Simple]]]:
    """'a > b c, d' -> [[(' ', a), ('>', b), (' ', c)], [(' ', d)]].
    The first combinator in each complex selector is a placeholder."""
    groups = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        tokens = _tokenize_complex(alt)
        chain: list[tuple[str, _Simple]] = []
        comb = " "
        for tok in tokens:
            if tok in (">", "+", "~"):
                comb = tok
                continue
            chain.append((comb, _parse_simple(tok)))
            comb = " "
        if not chain:
            raise ValueError(f"empty selector in group: {selector!r}")
        groups.append(chain)
    if not groups:
        raise ValueError(f"empty selector: {selector!r}")
    return groups


# --------------------------------------------------------------------------
# matching (right-to-left)
# --------------------------------------------------------------------------


def _matches_simple(node: Node, s: _Simple) -> bool:
    if node.tag.startswith("#"):
        return False
    if s.tag and node.tag != s.tag:
        return False
    if s.id and node.attrs.get("id") != s.id:
        return False
    for c in s.classes:
        if c not in node.classes:
            return False
    for name, op, val in s.attrs:
        actual = node.attrs.get(name)
        if actual is None:
            return False
        if op is None:
            continue
        if op == "=" and actual != val:
            return False
        if op == "~=" and val not in actual.split():
            return False
        if op == "^=" and not actual.startswith(val or ""):
            return False
        if op == "$=" and not actual.endswith(val or ""):
            return False
        if op == "*=" and (val or "") not in actual:
            return False
        if op == "|=" and not (actual == val or actual.startswith(f"{val}-")):
            return False
    for name, arg in s.pseudos:
        sibs = node.parent.children if node.parent else [node]
        idx = sibs.index(node)
        if name == "first-child" and idx != 0:
            return False
        if name == "last-child" and idx != len(sibs) - 1:
            return False
        if name == "nth-child":
            try:
                want = int(arg or "0")
            except ValueError:
                raise ValueError(f":nth-child({arg}) — only integer args supported")
            if idx + 1 != want:
                return False
        if name not in ("first-child", "last-child", "nth-child"):
            raise ValueError(f"unsupported pseudo-class :{name}")
    return True


def _matches_chain(node: Node, chain: list[tuple[str, _Simple]], i: int) -> bool:
    comb, simple = chain[i]
    if not _matches_simple(node, simple):
        return False
    if i == 0:
        return True
    prev_comb = comb  # combinator BETWEEN chain[i-1] and chain[i]
    if prev_comb == " ":
        anc = node.parent
        while anc is not None and not anc.tag.startswith("#"):
            if _matches_chain(anc, chain, i - 1):
                return True
            anc = anc.parent
        return False
    if prev_comb == ">":
        p = node.parent
        return p is not None and not p.tag.startswith("#") and _matches_chain(p, chain, i - 1)
    if prev_comb == "+":
        sibs = node.parent.children if node.parent else []
        idx = sibs.index(node)
        return idx > 0 and _matches_chain(sibs[idx - 1], chain, i - 1)
    if prev_comb == "~":
        sibs = node.parent.children if node.parent else []
        idx = sibs.index(node)
        return any(_matches_chain(sibs[j], chain, i - 1) for j in range(idx))
    raise ValueError(f"unknown combinator {prev_comb!r}")


def select(html: str, selector: str) -> list[Node]:
    """All nodes matching the selector, in document order, dedup'd
    across selector groups."""
    groups = parse_selector(selector)
    nodes = parse_dom(html)
    out: list[Node] = []
    seen: set[int] = set()
    for node in nodes:  # already document-ordered
        if id(node) in seen:
            continue
        for chain in groups:
            if _matches_chain(node, chain, len(chain) - 1):
                out.append(node)
                seen.add(id(node))
                break
    return out


# --------------------------------------------------------------------------
# Spark operator
# --------------------------------------------------------------------------


def css_select_elements(pages: DataFrame, selector: str) -> DataFrame:
    """pages(url, html) -> element table of CSS-selected nodes, same
    output contract as sources.html.elements_from_pages (url, doc_order,
    tag, text, hrefs) but with full selector semantics. Arrow-batched
    mapInPandas; selection state is per page, so pages parallelize
    freely and skew is bounded by the largest single page."""
    parse_selector(selector)  # fail fast on the driver, not in tasks

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for i, node in enumerate(select(html, selector)):
                    rows.append(
                        {
                            "url": url,
                            "doc_order": i,
                            "tag": node.tag,
                            "text": node.text(),
                            "hrefs": node.hrefs(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "doc_order", "tag", "text", "hrefs"]
            )

    return pages.mapInPandas(gen, ELEMENT_SCHEMA)
