"""Deterministic minimal-PDF writer for the synthetic pages corpus.

The sandbox has no PyMuPDF, so the corpus generator emits real (if
minimal) PDF 1.4 files itself: one content stream per page, Helvetica,
text positioned with ``Tm``, strings encoded as UTF-8 hex strings. The
extractor in :mod:`pdf_extract` consumes arbitrary such streams (``Td`` /
``TD`` / ``Tm`` / ``T*`` / ``Tj`` / ``TJ``, literal and hex strings,
optional FlateDecode), so writer and reader share only the PDF spec, not
private conventions.

Geometry contract used by the layout synthesizer (and relied on by the
column/paragraph heuristics documented in :mod:`pdf_extract`):
page 612x792, font size 11, line leading 14, paragraph gap 28,
column x-origins 50 and 320.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

from .pdf_extract import is_rtl_text

PAGE_W = 612.0
PAGE_H = 792.0
FONT_SIZE = 11.0
LEADING = 14.0
PARA_GAP = 28.0
COL_X = (50.0, 320.0)
TOP_Y = 740.0


@dataclass(frozen=True)
class TextSpan:
    x: float
    y: float
    text: str
    size: float = FONT_SIZE


def _hex_string(s: str) -> str:
    return "<" + s.encode("utf-8").hex() + ">"


def _num(v: float) -> str:
    return ("%0.2f" % v).rstrip("0").rstrip(".")


def page_content(spans: list[TextSpan]) -> bytes:
    ops = ["BT"]
    size = None
    for sp in spans:
        if sp.size != size:
            ops.append(f"/F1 {_num(sp.size)} Tf")
            size = sp.size
        ops.append(f"1 0 0 1 {_num(sp.x)} {_num(sp.y)} Tm")
        ops.append(f"{_hex_string(sp.text)} Tj")
    ops.append("ET")
    return "\n".join(ops).encode("ascii")


def _assemble(objs: dict[int, bytes]) -> bytes:
    """Objects -> complete PDF file (header, xref table, trailer)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    max_num = max(objs)
    out += f"xref\n0 {max_num + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_pdf(pages: list[list[TextSpan]], compress: bool = True) -> bytes:
    """Assemble a complete PDF from per-page span lists."""
    # object numbering: 1 catalog, 2 pages, 3 font, then (page, content)*
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, spans in enumerate(pages):
        page_num = 4 + 2 * i
        content_num = page_num + 1
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_num(PAGE_W)} {_num(PAGE_H)}] "
            f"/Resources << /Font << /F1 3 0 R >> >> /Contents {content_num} 0 R >>"
        ).encode()
        raw = page_content(spans)
        if compress:
            data = zlib.compress(raw, 9)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = raw
            head = f"<< /Length {len(data)} >>".encode()
        objs[content_num] = head + b"\nstream\n" + data + b"\nendstream"
    return _assemble(objs)


def make_scanned_pdf(page_texts: list[str]) -> bytes:
    """A SCANNED document: real PDF pages whose only content is a
    grayscale image XObject (/DeviceGray, 8-bit, FlateDecode) carrying a
    glyph raster of the page text — the raster-PDF shape the reference
    OCRs (``ocr_common.py:431-468``: pdf -> page images -> OCR). The
    extractor must recognize the pixels (``pdf_extract`` routes imaged
    pages through the template-match OCR); no text operators exist
    anywhere in the file. Each page renders at its own longest-line
    width, so no line wraps and recognition is byte-exact."""
    import numpy as np

    from .png_glyphs import render_text

    objs: dict[int, bytes] = {}
    n_pages = len(page_texts)
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    for i, text in enumerate(page_texts):
        page_num = 3 + 3 * i
        content_num = page_num + 1
        image_num = page_num + 2
        cols = max([1] + [len(line) for line in text.split("\n")])
        px = render_text(text, cols=cols)
        h, w = px.shape
        # 1 bit/pixel, rows padded to byte boundaries (PDF image spec) —
        # the honest bilevel-scan shape, 8x smaller than 8-bit gray
        data = zlib.compress(np.packbits(px > 127, axis=1).tobytes(), 9)
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_num(PAGE_W)} {_num(PAGE_H)}] "
            f"/Resources << /XObject << /Im0 {image_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>"
        ).encode()
        draw = f"q {w} 0 0 {h} 50 {int(PAGE_H) - 60 - h} cm /Im0 Do Q".encode("ascii")
        objs[content_num] = (
            f"<< /Length {len(draw)} >>".encode() + b"\nstream\n" + draw + b"\nendstream"
        )
        objs[image_num] = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /FlateDecode "
            f"/Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    return _assemble(objs)


def layout_paragraphs(
    paragraphs: list[list[str]],
    columns: int = 1,
    rtl: bool = False,
    size: float = FONT_SIZE,
) -> list[list[TextSpan]]:
    """Lay paragraphs (lists of line strings) onto pages.

    Lines are split into 1-3 spans at word boundaries so the extractor's
    within-line x-ordering is genuinely exercised. For ``rtl`` pages spans
    are positioned right-to-left (first logical span at the largest x).
    Returns a list of pages, each a list of :class:`TextSpan`.
    """
    pages: list[list[TextSpan]] = []
    col_xs = list(COL_X[:columns])
    bottom = 60.0

    cur: list[TextSpan] = []
    col = 0
    y = TOP_Y
    fresh = True  # nothing placed yet in this column

    for par in paragraphs:
        height = (len(par) - 1) * LEADING
        start_y = y if fresh else y - PARA_GAP
        # paragraphs never straddle a column/page boundary, so golden text
        # is derivable from paragraphs alone, independent of pagination
        if start_y - height < bottom:
            col += 1
            if col >= columns:
                pages.append(cur)
                cur = []
                col = 0
            y = TOP_Y
            start_y = TOP_Y
        y = start_y
        first_line = True
        for line in par:
            if not first_line:
                y -= LEADING
            words = line.split(" ")
            # deterministic 1-3 way split by word count
            n_spans = 1 if len(words) < 4 else (2 if len(words) < 8 else 3)
            chunk = max(1, len(words) // n_spans)
            pieces = [
                " ".join(words[i * chunk : (i + 1) * chunk if i < n_spans - 1 else len(words)])
                for i in range(n_spans)
            ]
            pieces = [p for p in pieces if p]
            x0 = col_xs[col]
            line_rtl = rtl and is_rtl_text(line)
            mixed = line_rtl and any(
                not is_rtl_text(w) for w in words if any(c.isalpha() for c in w)
            )
            if mixed:
                # mixed-direction RTL line (round 6): spans are DIRECTION
                # RUNS placed right-to-left in logical order, and an
                # embedded LTR run of >= 2 words splits into two spans
                # laid x-ASCENDING inside the run's slot block — the
                # physical layout a bidi renderer produces, which the
                # extractor's two-level rule must read back logically
                runs: list[tuple[bool, list[str]]] = []
                for w in words:
                    d = is_rtl_text(w) if any(c.isalpha() for c in w) else True
                    if runs and runs[-1][0] == d:
                        runs[-1][1].append(w)
                    else:
                        runs.append((d, [w]))
                span_txt: list[tuple[bool, str]] = []
                for d, ws in runs:
                    if not d and len(ws) >= 2:
                        half = len(ws) // 2
                        span_txt.append((False, " ".join(ws[:half])))
                        span_txt.append((False, " ".join(ws[half:])))
                    else:
                        span_txt.append((d, " ".join(ws)))
                n = len(span_txt)
                step = 180.0 / n
                c = i = 0
                while i < n:
                    if span_txt[i][0]:
                        x = x0 + 180.0 - (c + 1) * step
                        cur.append(TextSpan(x=x, y=y, text=span_txt[i][1], size=size))
                        c += 1
                        i += 1
                    else:
                        k = 1
                        while i + k < n and not span_txt[i + k][0]:
                            k += 1
                        for j in range(k):
                            x = x0 + 180.0 - (c + k - j) * step
                            cur.append(
                                TextSpan(x=x, y=y, text=span_txt[i + j][1], size=size)
                            )
                        c += k
                        i += k
                first_line = False
                continue
            # span steps stay < COL_SPLIT_GAP (120) so within-line gaps are
            # never mistaken for column gaps by the extractor
            step = 180.0 / max(1, len(pieces))
            for i, piece in enumerate(pieces):
                if line_rtl:
                    x = x0 + 180.0 - (i + 1) * step
                else:
                    x = x0 + i * step
                cur.append(TextSpan(x=x, y=y, text=piece, size=size))
            first_line = False
        fresh = False
    if cur:
        pages.append(cur)
    return pages
