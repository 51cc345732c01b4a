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
    "TextAccumulator",
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


class TextAccumulator:
    """Accumulates text into a flat list of ``[[...]]`` paragraphs.

    Same contract as the reference's ``Fetcher.TextList``
    (``fetcher.py:103-181``): markers are balanced, non-nested, and
    content can never masquerade as a marker.
    """

    __slots__ = ("_paragraphs", "_current", "_in_para", "_white")

    def __init__(self) -> None:
        self._paragraphs: List[str] = []
        self._current: List[str] = []
        self._in_para = False
        self._white = False

    def append(self, w: str) -> None:
        if not self._in_para:
            if w.isspace():
                # Whitespace alone doesn't open a new paragraph
                return
            self._in_para = True
        self._current.append(w)
        self._white = False

    def append_whitespace(self) -> None:
        if self._in_para and not self._white:
            self._current.append(" ")
            self._white = True

    def begin(self) -> None:
        """Enter a block element: any open paragraph ends here, so inline
        text preceding the block gets its own paragraph."""
        self._close()

    def end(self) -> None:
        """Exit a block element: close the open paragraph, if any."""
        self._close()

    def insert_break(self) -> None:
        """Cut the paragraph at ``<br>`` / ``<hr>``."""
        self._close()

    def _close(self) -> None:
        if self._in_para:
            text = "".join(self._current)
            text = _SOFT_WS_RE.sub("", text)
            text = _WS_RUN_RE.sub(" ", text).strip()
            # Collapse literal bracket runs so content cannot be confused
            # with paragraph markers
            text = _LBRACKET_RUN_RE.sub("[", text)
            text = _RBRACKET_RUN_RE.sub("]", text)
            if text:
                self._paragraphs.append(text)
            self._current = []
            self._in_para = False
        self._white = False

    def result(self) -> str:
        self._close()
        parts: List[str] = []
        for p in self._paragraphs:
            # Pad edge brackets away from the markers
            head = " " if p.startswith("[") else ""
            tail = " " if p.endswith("]") else ""
            parts.append("[[" + head + p + tail + "]]")
        return "".join(parts)


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


def _walk(node: Node, acc: TextAccumulator) -> None:
    """Walker with the reference's dispatch semantics
    (``fetcher.py:183-222``)."""
    for t in node.children:
        if t.name is None:
            acc.append(t.text or "")
        elif t.name in BREAK_TAGS:
            acc.insert_break()
            _walk(t, acc)
        elif t.name in WHITESPACE_TAGS:
            acc.append_whitespace()
            _walk(t, acc)
        elif t.name in BLOCK_TAGS:
            acc.begin()
            _walk(t, acc)
            acc.end()
        elif t.name in INLINE_BLOCK_TAGS:
            acc.append_whitespace()
            _walk(t, acc)
            acc.append_whitespace()
        elif t.name not in EXCLUDE_TAGS:
            _walk(t, acc)


def extract_fragment(html: str) -> str:
    """Extract text from an HTML fragment (walks the root directly —
    mirrors the reference's unit-test harness, tests/test_fetcher.py:51-55)."""
    acc = TextAccumulator()
    _walk(parse_html(html), acc)
    return acc.result()


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
    acc = TextAccumulator()
    _walk(body, acc)
    return acc.result()


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
