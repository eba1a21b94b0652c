"""Edge cases for the PDF content-stream tokenizer and span assembly —
hand-crafted streams exercising paths the corpus writer never emits
(literal strings with escapes, TJ kerning arrays, Td/TD/T* positioning)."""

from __future__ import annotations

from ocr_endpoint_project_spark.extraction_core.pdf_extract import (
    _spans_from_stream,
    _tokenize,
)


def toks(b: bytes):
    return list(_tokenize(b))


def test_literal_string_escapes():
    assert toks(rb"(simple) Tj") == [("str", "simple"), ("op", "Tj")]
    assert toks(rb"(a\(b\)c) Tj")[0] == ("str", "a(b)c")
    assert toks(rb"(line\nbreak) Tj")[0] == ("str", "line\nbreak")
    assert toks(rb"(octal \101\102) Tj")[0] == ("str", "octal AB")
    assert toks(rb"(nested (parens) ok) Tj")[0] == ("str", "nested (parens) ok")
    assert toks(rb"(back\\slash) Tj")[0] == ("str", "back\\slash")


def test_hex_strings_and_numbers():
    assert toks(b"<48656c6c6f> Tj")[0] == ("str", "Hello")
    assert toks(b"<4 86 56c 6c6f> Tj")[0] == ("str", "Hello")  # ws inside hex
    assert toks(b"<48656> Tj")[0][1].startswith("He")  # odd length padded
    assert toks(b"12 -3.5 .25 4. Td") == [
        ("num", 12.0), ("num", -3.5), ("num", 0.25), ("num", 4.0), ("op", "Td"),
    ]
    assert toks(b"<< /Length 5 >> [ ] BT ET") == [
        ("op", "<<"), ("name", "/Length"), ("num", 5.0), ("op", ">>"),
        ("op", "["), ("op", "]"), ("op", "BT"), ("op", "ET"),
    ]


def test_spans_td_relative_and_tstar():
    stream = b"""BT /F1 10 Tf
14 TL
50 700 Td (first) Tj
0 -14 Td (second) Tj
T* (third) Tj
ET"""
    spans = _spans_from_stream(stream)
    assert [(x, y, t) for x, y, _, t in spans] == [
        (50.0, 700.0, "first"),
        (50.0, 686.0, "second"),
        (50.0, 672.0, "third"),
    ]


def test_spans_tj_array_concatenates_ignoring_kerning():
    stream = b"BT /F1 11 Tf 1 0 0 1 72 700 Tm [(Hel) -20 (lo) 5 ( world)] TJ ET"
    spans = _spans_from_stream(stream)
    assert spans == [(72.0, 700.0, 11.0, "Hello world")]


def test_spans_quote_operator_advances_line():
    stream = b"BT /F1 11 Tf 12 TL 10 100 Td (a) Tj (b) ' ET"
    spans = _spans_from_stream(stream)
    assert [(y, t) for _, y, _, t in spans] == [(100.0, "a"), (88.0, "b")]


def test_unknown_bytes_are_skipped():
    spans = _spans_from_stream(b"BT \x00\x01 1 0 0 1 5 5 Tm (x) Tj ET")
    assert spans == [(5.0, 5.0, 12.0, "x")]


def test_literal_string_fast_path_matches_stateful():
    """Property: the scanner's escape-free fast path and the stateful
    parser produce identical text for every literal-string shape —
    plain, escaped, nested, octal, and mixed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_endpoint_project_spark.extraction_core.pdf_extract import _tokenize

    def encode_literal(s: str) -> bytes:
        out = []
        for ch in s:
            if ch in "()\\":
                out.append("\\" + ch)
            elif ch == "\n":
                out.append("\\n")
            else:
                out.append(ch)
        return ("(" + "".join(out) + ")").encode("latin-1")

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=255),
                max_size=40,
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=200, deadline=None)
    def check(strings):
        stream = b" ".join(encode_literal(s) + b" Tj" for s in strings)
        got = [v for k, v in _tokenize(stream) if k == "str"]
        assert got == strings

    check()


def test_scanned_pdf_ocr_roundtrip():
    """Round 5 (E4): image-only PDF pages — /DeviceGray XObject rasters,
    zero text operators — extract byte-identically via template-match
    OCR over the decoded bitmaps, including Arabic/Latin-1 pages."""
    from ocr_endpoint_project_spark.extraction_core.pdf_extract import extract_pdf
    from ocr_endpoint_project_spark.extraction_core.pdf_write import make_scanned_pdf

    pages = [
        "first page line one\nsecond line of page one",
        "بيانات نظام محتوى\ndonnée qualité",
        "third page alone",
    ]
    payload = make_scanned_pdf(pages)
    assert payload.startswith(b"%PDF-1.4")
    assert b"BT" not in payload.split(b"stream")[0]  # no text ops in heads
    text, spans, n_pages = extract_pdf(payload)
    assert n_pages == 3
    assert text == "\n\n".join(pages).strip()
    assert [k for _, _, k in spans] == ["page_1", "page_2", "page_3"]


def test_corpus_scanned_pdfs_byte_identical():
    """The corpus' scanned-PDF share extracts byte-identically through
    the full dispatch (sniff -> pdf -> raster OCR)."""
    from ocr_endpoint_project_spark.extraction_core.document import extract_document
    from ocr_endpoint_project_spark.sources.corpus import generate_corpus

    rows = [
        r for r in generate_corpus(400, seed=11)
        if r.extension == "pdf" and r.layout_type == "scan"
    ]
    assert len(rows) > 5, "corpus must include scanned PDFs"
    assert {r.lang for r in rows} & {"ar", "fr"}, "non-ASCII scans included"
    for r in rows:
        res = extract_document(r.html)
        assert res.status == "succeeded" and res.extracted_text == r.text, r.url


def test_fast_span_scanner_parity_and_fallback():
    """Round 5: the coarse-grammar fast scanner must return EXACTLY the
    general executor's spans on every stream the writer emits, and None
    (forcing fallback) on anything outside its grammar."""
    from ocr_endpoint_project_spark.extraction_core.pdf_extract import (
        _page_content_streams,
        _spans_fast,
        _spans_from_stream,
    )
    from ocr_endpoint_project_spark.sources.corpus import generate_corpus

    n_pages = 0
    for r in generate_corpus(300, seed=7, richness=2):
        if r.extension != "pdf" or r.layout_type == "scan" or not r.html:
            continue
        for stream in _page_content_streams(r.html):
            fast = _spans_fast(stream)
            assert fast is not None, "writer output must stay in the fast grammar"
            assert fast == _spans_from_stream(stream)
            n_pages += 1
    assert n_pages > 50

    # outside the grammar -> None, never a wrong answer
    for s in (
        b"BT\n(literal) Tj\nET",          # literal string
        b"BT\n10 20 Td\n<41> Tj\nET",     # Td positioning
        b"BT\n[<41> 5 <42>] TJ\nET",      # TJ array
        b"BT\n2 0 0 2 5 5 Tm\n<41> Tj\nET",  # scaling matrix
    ):
        assert _spans_fast(s) is None
        assert _spans_from_stream(s)  # the general path handles them all
