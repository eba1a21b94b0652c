"""Fast HTML block scanner — regex tag stream instead of ``html.parser``.

Produces byte-identical output to :mod:`html_extract`'s stdlib-parser
implementation for the block model this engine defines (same drop sets,
same flush points, same whitespace collapse, same scoring inputs); the
stdlib path is kept as the parity reference and both are compared on the
full synthetic corpus in ``tests/test_html_fast_parity.py``. ~3x faster
on 10 KB pages, which matters because the HTML kernel is the hot path of
the flagship job.

Parity scope: WELL-FORMED markup — tags whose attribute values contain
no raw ``<``/``>``, terminated constructs, valid charrefs. Guarded by
the corpus parity test plus an 8k-case hypothesis fuzz over that
grammar. On garbage markup (stray ``<a&;x!``-style tags) the two parsers
recover differently — html.parser's tolerant-recovery machinery is
idiosyncratic and neither behavior is "correct"; a boilerplate stripper
only needs a deterministic choice, which both make. Entity decoding uses
``html.unescape`` (HTML5 longest-match) on text nodes.
"""

from __future__ import annotations

import re
from html import unescape

from .html_extract import (
    BLOCK_TAGS,
    CONTAINER_TAGS,
    DROP_SUBTREE_TAGS,
    HEADING_TAGS,
    KIND_HEADING,
    KIND_PARAGRAPH,
    _keep,
)

# alternatives, in order: comment, declaration/bogus (<!...>), processing
# instruction (<?...>), named start/end tag, bogus end tag (</ + non-letter
# consumes through the next '>' per the HTML5 bogus-comment rule)
_MARKUP_RE = re.compile(
    r"<!--.*?-->|<![^>]*>|<\?[^>]*>|</?([a-zA-Z][a-zA-Z0-9-]*)[^>]*>|</[^>]*>", re.S
)  # every alternative requires the closing '>': an unterminated tag at
#    EOF is data, matching html.parser's close() behavior. The named-tag
#    alternative captures the tag name directly (group 1) — same language
#    as the former `</?[a-zA-Z][^>]*>` since name chars are a subset of
#    [^>], but it saves a second regex match per tag.
# script/style are CDATA-like in html.parser: content runs literally to
# the close tag (template is NOT — it parses normally, so it stays on the
# drop_depth path for parity)
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</{t}\b[^>]*>", re.I) for t in ("script", "style")
}

# href attribute inside an already-matched <a ...> tag source.  Mirrors
# html.parser's attribute grammar for the declared parity scope
# (well-formed markup): quoted values take everything to the matching
# quote, unquoted values run to whitespace/'>'; values are
# charref-unescaped like html.parser does.
_HREF_RE = re.compile(
    r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*))""", re.I
)


def _collapse(s: str) -> str:
    return " ".join(s.split())


def _href_of(tag_src: str) -> str | None:
    m = _HREF_RE.search(tag_src)
    if m is None:
        return None
    v = m.group(1) if m.group(1) is not None else (
        m.group(2) if m.group(2) is not None else m.group(3)
    )
    if v and "&" in v:
        v = unescape(v)
    return v or None


def extract_html_blocks_fast(
    payload: bytes, links: list[str] | None = None
) -> list[tuple[str, str]]:
    html = payload.decode("utf-8", errors="replace")
    blocks: list[tuple[str, str]] = []
    fragments: list[str] = []
    link_fragments: list[str] = []
    block_tag = ""
    drop_depth = 0
    a_depth = 0

    def flush() -> None:
        nonlocal fragments, link_fragments, block_tag
        if not fragments:  # nothing buffered (the common boundary case):
            block_tag = ""  # link_fragments ⊆ fragments, so both empty
            return
        text = _collapse("".join(fragments))
        link_text = _collapse("".join(link_fragments))
        tag = block_tag
        fragments = []
        link_fragments = []
        block_tag = ""
        if not text:
            return
        density = len(link_text) / len(text)
        if _keep(tag, text, density):
            kind = KIND_HEADING if tag in HEADING_TAGS else KIND_PARAGRAPH
            blocks.append((kind, text))

    def data(chunk: str) -> None:
        if drop_depth or not chunk:
            return
        if "&" in chunk:
            chunk = unescape(chunk)
        fragments.append(chunk)
        if a_depth:
            link_fragments.append(chunk)

    pos = 0
    n = len(html)
    search = _MARKUP_RE.search
    while pos < n:
        m = search(html, pos)
        if m is None:
            data(html[pos:])
            break
        start = m.start()
        if start > pos:
            data(html[pos:start])
        end = m.end()
        pos = end
        name = m.group(1)
        if name is None:  # comment / doctype / PI / bogus end tag
            continue
        # index probes instead of materializing m.group(0) per tag — the
        # matched source is only needed for <a href> extraction
        name = name.lower()
        closing = html[start + 1] == "/"
        self_closing = not closing and html[end - 2] == "/"
        if links is not None and not closing and name == "a":
            # collected regardless of drop_depth: boilerplate anchors are
            # stripped from TEXT but feed the crawl/link graph
            href = _href_of(html[start:end])
            if href:
                links.append(href)

        if self_closing:
            if name == "br" and not drop_depth:
                fragments.append(" ")
            continue
        if closing:
            if name in DROP_SUBTREE_TAGS:
                drop_depth = max(0, drop_depth - 1)
            elif drop_depth:
                pass
            elif name == "a":
                a_depth = max(0, a_depth - 1)
            elif name in BLOCK_TAGS or name in CONTAINER_TAGS:
                # empty-buffer flush only resets block_tag — skip the call
                if fragments:
                    flush()
                else:
                    block_tag = ""
            continue
        # start tag
        if name in DROP_SUBTREE_TAGS:
            if name in _RAWTEXT_CLOSE:
                # raw-text element: skip content to its close tag directly
                mm = _RAWTEXT_CLOSE[name].search(html, pos)
                pos = mm.end() if mm else n
            else:
                drop_depth += 1
            continue
        if drop_depth:
            continue
        if name == "a":
            a_depth += 1
        elif name == "br":
            fragments.append(" ")
        elif name in BLOCK_TAGS:
            if fragments:
                flush()
            block_tag = name
        elif name in CONTAINER_TAGS:
            if fragments:
                flush()
            else:
                block_tag = ""
    flush()
    return blocks
