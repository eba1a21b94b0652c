"""Main-content extraction from HTML: boilerplate stripping via block scoring.

A trafilatura/readability-style heuristic built on the stdlib
``html.parser`` (no lxml in this environment): the document is segmented
into text blocks at block-level tag boundaries; each block is scored by
text length and link density; navigation/chrome subtrees are dropped
wholesale. Kept blocks are joined with ``"\\n\\n"`` and the result is
``.strip()``-ed — the same join contract the reference applies to OCR page
parts (``ocr_common.py:341-344``).

Determinism contract (the fixture generator in ``sources/corpus.py``
constructs pages around exactly these rules, so golden text is derivable
independently of this extractor):

* subtrees under ``script style noscript template svg iframe head button
  select option nav header footer aside form`` are dropped entirely;
* a block is flushed at every block-tag or container boundary;
* block text is whitespace-collapsed with ``" ".join(raw.split())``;
* headings (h1–h6) are kept iff ``0 < len <= 120`` and link density
  ``<= 0.2``;
* all other blocks are kept iff ``len >= 25`` and link density
  ``<= 0.35``;
* link density = collapsed length of anchor text / collapsed block length.
"""

from __future__ import annotations

from html.parser import HTMLParser

DROP_SUBTREE_TAGS = frozenset(
    "script style noscript template svg iframe head button select option "
    "nav header footer aside form".split()
)
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li pre blockquote td th dt dd figcaption caption".split()
)
CONTAINER_TAGS = frozenset(
    "div section article main body html table thead tbody tfoot tr ul ol dl".split()
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

MIN_BLOCK_CHARS = 25
MAX_HEADING_CHARS = 120
MAX_LINK_DENSITY = 0.35
MAX_HEADING_LINK_DENSITY = 0.2

KIND_HEADING = "heading"
KIND_PARAGRAPH = "paragraph"


def _collapse(s: str) -> str:
    return " ".join(s.split())


class _BlockParser(HTMLParser):
    """Accumulate (tag, text, link_density) blocks from an HTML stream."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._a_depth = 0
        self._fragments: list[str] = []
        self._link_fragments: list[str] = []
        self._block_tag = ""
        self.blocks: list[tuple[str, str, float]] = []
        # every <a href> in document order, INCLUDING anchors inside
        # dropped chrome subtrees (nav/footer/...): boilerplate links are
        # stripped from the TEXT, but a crawler's link graph follows them
        self.links: list[str] = []

    # -- block lifecycle ---------------------------------------------------
    def _flush(self) -> None:
        text = _collapse("".join(self._fragments))
        link_text = _collapse("".join(self._link_fragments))
        tag = self._block_tag
        self._fragments = []
        self._link_fragments = []
        self._block_tag = ""
        if not text:
            return
        density = len(link_text) / len(text)
        self.blocks.append((tag, text, density))

    # -- parser callbacks ----------------------------------------------------
    def _collect_href(self, attrs) -> None:
        href = next((v for k, v in attrs if k == "href"), None)
        if href:
            self.links.append(href)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._collect_href(attrs)  # before drop check: nav links count
        if tag in DROP_SUBTREE_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth += 1
            return
        if tag == "br":
            self._fragments.append(" ")
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._block_tag = tag
        elif tag in CONTAINER_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._collect_href(attrs)
        if tag == "br" and not self._drop_depth:
            self._fragments.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_SUBTREE_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
            return
        if tag in BLOCK_TAGS or tag in CONTAINER_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._fragments.append(data)
        if self._a_depth:
            self._link_fragments.append(data)


def _keep(tag: str, text: str, density: float) -> bool:
    if tag in HEADING_TAGS:
        return 0 < len(text) <= MAX_HEADING_CHARS and density <= MAX_HEADING_LINK_DENSITY
    return len(text) >= MIN_BLOCK_CHARS and density <= MAX_LINK_DENSITY


def extract_html_blocks_reference(
    payload: bytes, links: list[str] | None = None
) -> list[tuple[str, str]]:
    """Stdlib-parser implementation — the parity reference for the fast
    scanner (tests/test_html_fast_parity.py compares them on the corpus).
    If ``links`` is a list, every ``<a href>`` value is appended to it in
    document order (same single parse pass)."""
    html = payload.decode("utf-8", errors="replace")
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    parser._flush()
    if links is not None:
        links.extend(parser.links)
    out: list[tuple[str, str]] = []
    for tag, text, density in parser.blocks:
        if _keep(tag, text, density):
            kind = KIND_HEADING if tag in HEADING_TAGS else KIND_PARAGRAPH
            out.append((kind, text))
    return out


def extract_html_blocks(
    payload: bytes, links: list[str] | None = None
) -> list[tuple[str, str]]:
    """Return the kept main-content blocks as ``(kind, text)`` pairs
    (fast regex scanner; see html_fast.py)."""
    from .html_fast import extract_html_blocks_fast

    return extract_html_blocks_fast(payload, links)


def extract_html(
    payload: bytes,
) -> tuple[str, list[tuple[int, int, str]], list[str]]:
    """Extract main content from HTML bytes.

    Returns ``(text, spans, links)`` where ``spans`` are ``(start, end,
    kind)`` character offsets of each kept block inside ``text`` and
    ``links`` are the raw ``<a href>`` values in document order (the
    crawl-frontier / host-graph input; collected in the same parse
    pass, never a second scan).  Blocks are joined with ``"\\n\\n"``
    then stripped (``ocr_common.py:341-344`` contract; the strip is a
    no-op here because blocks are pre-collapsed).
    """
    links: list[str] = []
    blocks = extract_html_blocks(payload, links)
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for kind, text in blocks:
        if parts:
            pos += 2  # the "\n\n" separator
        spans.append((pos, pos + len(text), kind))
        pos += len(text)
        parts.append(text)
    return "\n\n".join(parts).strip(), spans, links
