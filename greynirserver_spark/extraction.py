"""HTML -> text extraction with ``[[...]]`` paragraph-marker semantics.

Re-implements, from scratch on the Python stdlib, the extraction behavior of
the reference engine (GreynirServer ``fetcher.py:103-222``): a flat sequence
of balanced, non-nested ``[[...]]`` paragraph markers, with

* block tags (p/div/h1../table/li/...) opening and closing paragraphs,
* ``<br>``/``<hr>`` cutting paragraphs,
* ``<span>`` contributing surrounding whitespace, ``<img>`` whitespace,
* ``script/audio/video/style`` subtrees dropped entirely,
* soft-hyphen / zero-width-space removal and whitespace collapsing,
* literal ``[[``/``]]`` runs in content collapsed to single brackets, and
* ``[``/``]`` at paragraph edges padded with a space
  (reference ``fetcher.py:156-181``),

so that the extracted text per url is byte-identical to the reference
(the per-row invariant from BASELINE.json).

The reference parses HTML with BeautifulSoup over ``html.parser``; this
module builds a minimal DOM directly on the stdlib ``html.parser``. The
reference's walker recurses into void tags (``fetcher.py:198-208``) because
older tree builders sometimes nested content inside ``<br>``/``<img>``; the
recursion makes both tree shapes yield identical extraction output, so this
builder can safely auto-close void elements.

The Spark entry point is :func:`extract_text_udf`, an Arrow-batched pandas
UDF (no per-row Python at the DataFrame API level; HTML parsing is
inherently per-document work executed inside the Arrow batch).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Union

import pandas as pd

__all__ = [
    "Node",
    "parse_html",
    "extract_fragment",
    "extract_document",
    "extract_series",
    "extract_text_udf",
    "WELL_FORMED_RE",
]

# Tag sets — semantics per reference fetcher.py:57-94
EXCLUDE_TAGS = frozenset(["script", "audio", "video", "style"])
BLOCK_TAGS = frozenset(
    [
        "p", "h1", "h2", "h3", "h4", "div", "main", "article", "header",
        "section", "table", "thead", "tbody", "tr", "td", "ul", "li",
        "form", "option", "input", "label", "figure", "figcaption", "footer",
    ]
)
INLINE_BLOCK_TAGS = frozenset(["span"])   # inserted with whitespace
WHITESPACE_TAGS = frozenset(["img"])      # inserted as whitespace
BREAK_TAGS = frozenset(["br", "hr"])      # cut paragraphs

# HTML void elements: auto-closed by the DOM builder
_VOID_TAGS = frozenset(
    [
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "keygen", "link", "meta", "param", "source", "track", "wbr",
    ]
)

# Well-formedness invariant for extraction output
# (reference tests/test_fetcher.py:48)
WELL_FORMED_RE = re.compile(r"(?:\[\[(?:(?!\[\[|\]\])[^\n])*\]\])*\Z")

_SOFT_WS_RE = re.compile("­|​")
_WS_RUN_RE = re.compile(r"\s+")
_LBRACKET_RUN_RE = re.compile(r"\[\[+")
_RBRACKET_RUN_RE = re.compile(r"\]\]+")

# Guard against pathological inputs (analog of the reference's 90-token
# sentence guard, article.py:70-73): documents larger than this are skipped.
MAX_HTML_BYTES = 4 * 1024 * 1024


# Paragraph-cut sentinel in the extraction event stream. Text fragments
# are plain strings; a cut splits the stream into paragraph segments.
_CUT = None


def _clean_segment(fragments: List[str]) -> str:
    """Normalize one paragraph segment's raw fragments into display text.

    Segment-level normalization (discretionary characters out first, then
    whitespace runs, then bracket runs) is what lets the event-stream fold
    stay stateless: stray spaces contributed by inline elements or
    whitespace-only text nodes all collapse here, so the fold needs no
    in-paragraph / seen-whitespace bookkeeping at all.
    """
    s = _SOFT_WS_RE.sub("", "".join(fragments))
    s = _WS_RUN_RE.sub(" ", s).strip()
    # Bracket runs inside content would be indistinguishable from the
    # paragraph markers themselves; squeeze them to single brackets
    s = _LBRACKET_RUN_RE.sub("[", s)
    return _RBRACKET_RUN_RE.sub("]", s)


def _mark_paragraph(p: str) -> str:
    """Wrap one cleaned paragraph in ``[[...]]``, spacing out any edge
    bracket that would otherwise fuse with the marker."""
    left = "[[ " if p[:1] == "[" else "[["
    right = " ]]" if p[-1:] == "]" else "]]"
    return left + p + right


def _fold_events(events) -> str:
    """Fold an extraction event stream (strings + ``_CUT`` sentinels)
    into the final marker string: split on cuts, clean each segment,
    drop the empties, mark the rest."""
    paragraphs: List[str] = []
    segment: List[str] = []
    for ev in events:
        if ev is _CUT:
            if segment:
                p = _clean_segment(segment)
                if p:
                    paragraphs.append(p)
                segment = []
        else:
            segment.append(ev)
    if segment:
        p = _clean_segment(segment)
        if p:
            paragraphs.append(p)
    return "".join(_mark_paragraph(p) for p in paragraphs)


class Node:
    """Minimal DOM node: either an element (``name`` set) or text."""

    __slots__ = ("name", "text", "children")

    def __init__(self, name: Optional[str], text: Optional[str] = None) -> None:
        self.name = name
        self.text = text
        self.children: List["Node"] = []

    def find(self, name: str) -> Optional["Node"]:
        """Depth-first recursive find of the first element named *name*."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.name == name:
                return n
            stack.extend(reversed(n.children))
        return None


class _DomBuilder(HTMLParser):
    """Builds a Node tree the way BeautifulSoup's html.parser builder does:
    no implicit end tags except void elements; an end tag pops the stack to
    the nearest matching open tag (unmatched end tags are ignored);
    comments / declarations / PIs are dropped."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(None)
        self._stack: List[Node] = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(tag)
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._stack[-1].children.append(Node(tag))

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return
        # Pop to the nearest matching open tag, if any
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(Node(None, text=data))


def parse_html(html: str) -> Node:
    """Parse *html* into a Node tree (root is an anonymous container)."""
    builder = _DomBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# Tag-effect table for the event stream: (event on entering the element,
# event pushed after its subtree). Semantics per reference
# fetcher.py:57-94/183-222: blocks open and close paragraphs, br/hr cut,
# img contributes whitespace, span is padded with whitespace on both
# sides; excluded subtrees are skipped wholesale; any other element is
# transparent. ``...`` = no event.
_TAG_EVENTS = {
    **{t: (_CUT, _CUT) for t in BLOCK_TAGS},
    **{t: (_CUT, ...) for t in BREAK_TAGS},
    **{t: (" ", ...) for t in WHITESPACE_TAGS},
    **{t: (" ", " ") for t in INLINE_BLOCK_TAGS},
}


class _After:
    """Work-stack marker: emit ``event`` once a subtree has been walked."""

    __slots__ = ("event",)

    def __init__(self, event) -> None:
        self.event = event


def _event_stream(root: Node):
    """Yield the flat extraction event stream of a DOM subtree: text
    fragments and ``_CUT`` sentinels, in document order. Iterative
    (explicit work stack), so pathological nesting depth cannot blow the
    recursion limit on a Spark worker."""
    stack: list = list(reversed(root.children))
    while stack:
        item = stack.pop()
        if isinstance(item, _After):
            yield item.event
            continue
        if item.name is None:
            yield item.text or ""
            continue
        if item.name in EXCLUDE_TAGS:
            continue
        enter, leave = _TAG_EVENTS.get(item.name, (..., ...))
        if enter is not ...:
            yield enter
        if leave is not ...:
            stack.append(_After(leave))
        stack.extend(reversed(item.children))


def extract_fragment(html: str) -> str:
    """Extract text from an HTML fragment (walks the root directly —
    mirrors the reference's unit-test harness, tests/test_fetcher.py:51-55)."""
    return _fold_events(_event_stream(parse_html(html)))


def extract_document(html: Union[str, bytes, None]) -> str:
    """Extract text from a full HTML document.

    Mirrors the reference's production path (``fetcher.py:311-314``):
    content is ``soup.html.body``; a document with no ``<html>`` element or
    no ``<body>`` yields no content (empty string here; the reference skips
    the page).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        if len(html) > MAX_HTML_BYTES:
            return ""
        html = html.decode("utf-8", errors="replace")
    elif len(html) > MAX_HTML_BYTES:
        return ""
    root = parse_html(html)
    html_el = root.find("html") if root.name is None else root
    if html_el is None:
        return ""
    body = html_el.find("body")
    if body is None:
        return ""
    return _fold_events(_event_stream(body))


def extract_series(html_series: pd.Series) -> pd.Series:
    """Vectorized (batch) extraction over a pandas Series of html bytes."""
    return html_series.map(extract_document).astype("string")


def extract_text_udf():
    """Return the Arrow-batched pandas UDF ``html binary -> text string``.

    Built lazily so importing this module never requires an active Spark
    session (keeps pure-Python unit tests JVM-free).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return extract_series(html)

    return _extract
