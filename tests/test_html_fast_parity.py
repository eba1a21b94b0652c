"""Fast HTML scanner vs stdlib-parser reference: block-for-block parity
on the full corpus plus adversarial markup."""

from __future__ import annotations

import pytest

from ocr_endpoint_project_spark.extraction_core.html_extract import (
    extract_html_blocks_reference,
)
from ocr_endpoint_project_spark.extraction_core.html_fast import (
    extract_html_blocks_fast,
)
from ocr_endpoint_project_spark.sources.corpus import generate_corpus


def both(payload: bytes):
    fl: list[str] = []
    rl: list[str] = []
    fast = extract_html_blocks_fast(payload, fl)
    ref = extract_html_blocks_reference(payload, rl)
    return (fast, fl), (ref, rl)


def test_parity_on_corpus():
    rows = generate_corpus(n=250, seed=42, richness=4)
    mismatches = []
    for r in rows:
        if r.extension != "html":
            continue
        fast, ref = both(r.html)
        if fast != ref:
            mismatches.append(r.url)
    assert not mismatches, mismatches[:3]


def test_parity_fuzz_wellformed():
    """Hypothesis fuzz over the well-formed grammar the fast scanner
    guarantees parity on (see html_fast.py docstring for the scope)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.one_of(
        st.sampled_from(
            [
                "plain text fragment with several words in it",
                "short", "&amp;", "&#65;", "&lt;tag&gt;", "  spaced   out  ",
                "<p>", "</p>", "<div>", "</div>", "<nav>", "</nav>",
                "<a href='/'>", "</a>", "<br>", "<br/>", "<h1>", "</h1>",
                "<li>", "</li>", "<script>var x='<p>';</script>",
                "<style>p{}</style>", "<!-- comment -->", "<!DOCTYPE html>",
                "<template>", "</template>", "<P>", "</P>", "<aside>",
                "</aside>", "<footer>", "</footer>", "</;bogus>", "<?pi?>",
            ]
        ),
        st.text(alphabet="abc x;/!", min_size=0, max_size=12),
    )

    @settings(max_examples=800, deadline=None)
    @given(st.lists(frag, min_size=0, max_size=25))
    def fuzz(parts):
        payload = "".join(parts).encode("utf-8")
        fl: list[str] = []
        rl: list[str] = []
        assert extract_html_blocks_fast(payload, fl) == extract_html_blocks_reference(payload, rl)
        assert fl == rl

    fuzz()


@pytest.mark.parametrize(
    "payload",
    [
        b"<p>Entities &amp; charrefs &#65;&#x42; stay identical in both paths.</p>",
        b"<!-- comment --><p>Comments are invisible to both parser paths.</p>",
        b"<script>var x = '<p>not a block</p>';</script><p>Raw-text script content skipped.</p>",
        b"<style>p:before{content:'<fake>'}</style><p>Style content is raw text too.</p>",
        b"<P>UPPERCASE TAGS are normalized the same way by both parsers.</P>",
        b"<p>unclosed paragraph blocks still flush at document end properly",
        b"<div><p>nested <a href='/'>links</a> accumulate anchor text equally.</p></div>",
        b"<p>breaks<br>become<br/>spaces in both implementations of the parser.</p>",
        b"<nav><p>dropped subtree content never reaches the block stream.</p></nav><p>After nav content is visible again to both.</p>",
        b"<template><nav></template><p>template parses normally (not raw text) in both.</p>",
        b"<p>stray < bracket stays literal text in both implementations.</p>",
        b"<td>table cells are blocks with the same scoring rules applied.</td>",
        "<p>Unicode café نص عربي text flows through identically.</p>".encode(),
    ],
)
def test_parity_on_adversarial_markup(payload):
    fast, ref = both(payload)
    assert fast == ref


def test_link_collection_parity_and_semantics():
    """<a href> collection (round 7): both parsers report the same hrefs
    in document order, including anchors inside dropped chrome (a crawler
    follows nav links even though the TEXT strips them), attribute quote
    styles, charref values, and self-closing anchors."""
    cases = [
        (b"<p><a href='/x'>y</a> and <a href=\"/z\">w</a></p>", ["/x", "/z"]),
        (b'<p><a href="/q?a=1&amp;b=2">y</a></p>', ["/q?a=1&b=2"]),
        (b"<p><a href=bare>y</a></p>", ["bare"]),
        (b"<p><a class='c' HREF='/up' id='i'>y</a></p>", ["/up"]),
        (b"<nav><a href='/nav'>n</a></nav><footer><a href='/f'>f</a></footer>", ["/nav", "/f"]),
        (b"<p><a>no href</a><a href=''>empty</a></p>", []),
        (b"<p><a href='/s'/></p>", ["/s"]),
        (b"<script>var s = \"<a href='/not-a-link'>\";</script>", []),
        (b"<p><a href='https://other.example/d/1?utm_source=x'>t</a></p>",
         ["https://other.example/d/1?utm_source=x"]),
    ]
    for payload, want in cases:
        (fast, fl), (ref, rl) = both(payload)
        assert fl == rl == want, (payload, fl, rl, want)


def test_link_collection_parity_on_corpus():
    rows = generate_corpus(n=200, seed=7, richness=2)
    for r in rows:
        if r.extension != "html":
            continue
        (_, fl), (_, rl) = both(r.html)
        assert fl == rl
        assert fl, r.url  # every corpus HTML page carries nav/share links
