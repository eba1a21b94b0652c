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
