"""Deterministic stand-in for the raster-OCR path (no image libs here).

The reference OCRs scanned pages via a remote API, one image per page
(``ocr_common.py:431-468``). This sandbox has neither Pillow nor an OCR
model, so the raster path is STUBBED deterministically: synthetic "scan"
PNGs embed their page text in a PNG ``iTXt`` chunk with keyword
``ocr_text`` (written by :func:`make_png_scan`), and extraction reads it
back. The PNG container parsing (signature, chunk walk, CRC layout) is
real; only the pixel->text step is faked. A real deployment swaps
:func:`extract_png_text` for an OCR model call with the same signature.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
OCR_KEYWORD = b"ocr_text"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def make_png_scan(page_texts: list[str], width: int = 612, height: int = 792) -> bytes:
    """Build a minimal valid grayscale PNG carrying page texts in iTXt."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    # one row of pixels is enough to be a valid image payload
    raw = b"\x00" + b"\x80" * width
    idat = zlib.compress(raw)
    out = bytearray(PNG_MAGIC)
    out += _chunk(b"IHDR", ihdr)
    for text in page_texts:
        body = OCR_KEYWORD + b"\x00\x00\x00\x00\x00" + text.encode("utf-8")
        out += _chunk(b"iTXt", body)
    out += _chunk(b"IDAT", idat)
    out += _chunk(b"IEND", b"")
    return bytes(out)


def extract_png_text(payload: bytes) -> tuple[str, list[tuple[int, int, str]], int]:
    """Extract ``(text, spans, n_pages)`` from a synthetic scan PNG.

    Walks PNG chunks, reads every ``iTXt``/``tEXt`` chunk keyed
    ``ocr_text`` as one page, then applies the same page-join contract as
    the other extractors (``"\\n\\n"`` join + strip, ``ocr_common.py:341-344``).
    """
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pages: list[str] = []
    i = len(PNG_MAGIC)
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        if ctype == b"iTXt" and body.startswith(OCR_KEYWORD + b"\x00"):
            # keyword NUL compression-flag compression-method NUL lang NUL translated NUL text
            rest = body[len(OCR_KEYWORD) + 1 :]
            # skip: compression flag + method, then two NUL-terminated fields
            rest = rest[2:]
            rest = rest.split(b"\x00", 2)[-1]
            pages.append(rest.decode("utf-8", "replace"))
        elif ctype == b"tEXt" and body.startswith(OCR_KEYWORD + b"\x00"):
            pages.append(body[len(OCR_KEYWORD) + 1 :].decode("latin-1"))
        if ctype == b"IEND":
            break
        i += 12 + length  # length + type + body + crc
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for idx, page_text in enumerate(pages):
        t = page_text.strip()
        if not t:
            continue
        if parts:
            pos += 2
        spans.append((pos, pos + len(t), f"page_{idx + 1}"))
        pos += len(t)
        parts.append(t)
    return "\n\n".join(parts).strip(), spans, len(pages)
