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
    return extract_html_blocks_fast(payload), extract_html_blocks_reference(payload)


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
        assert extract_html_blocks_fast(payload) == extract_html_blocks_reference(payload)

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
