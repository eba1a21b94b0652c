"""The scan-PNG path: real raster in, deterministic OCR out.

The reference OCRs scanned pages via a remote API, one image per page
(``ocr_common.py:431-468``). This sandbox has neither an OCR model nor
a rasterizer, so the pixel->TEXT step is deterministic: page text rides
the raster as pixel VALUES in a framed row layout. Everything an image
pipeline does around that step is REAL as of round 4 — signature/chunk/
CRC walk, IHDR validation, IDAT inflate, scanline unfiltering for all
five PNG filter types, row segmentation (``png_pixels.py``) — so scan
payloads genuinely round-trip through the compressed raster, not
through metadata. A real deployment swaps
:func:`png_pixels.pages_from_pixels` for an OCR model call over the
same decoded array. Legacy payloads whose text lives in ``iTXt``
chunks (pre-round-4 caches) still decode via the metadata fallback.
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
    """Build a real grayscale PNG whose RASTER carries the page texts.

    Pages are framed into pixel rows (``png_pixels.pixels_from_pages``),
    rows are filter-encoded (cycling None/Sub/Up) and deflate-compressed
    into IDAT. ``height`` is ignored — the raster is exactly as tall as
    the framed pages (the parameter is kept for call-site stability).
    """
    from .png_pixels import encode_png_gray, pixels_from_pages

    return encode_png_gray(pixels_from_pages(page_texts, width=width))


def extract_png_text(payload: bytes) -> tuple[str, list[tuple[int, int, str]], int]:
    """Extract ``(text, spans, n_pages)`` from a synthetic scan PNG.

    Walks PNG chunks, reads every ``iTXt``/``tEXt`` chunk keyed
    ``ocr_text`` as one page, then applies the same page-join contract as
    the other extractors (``"\\n\\n"`` join + strip, ``ocr_common.py:341-344``).
    """
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pages: list[str] = []
    # primary path: decode the raster and read the framed pages out of
    # the pixels (round 4 — the real IDAT/filter machinery)
    try:
        from .png_pixels import decode_png_gray, pages_from_pixels

        pages = pages_from_pixels(decode_png_gray(payload))
    except ValueError:
        pages = []  # not a raster-framed scan: fall through to metadata
    if pages:
        return _pages_to_result(pages)
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
    return _pages_to_result(pages)


def _pages_to_result(pages: list[str]) -> tuple[str, list[tuple[int, int, str]], int]:
    """Shared page-join contract (``"\\n\\n"`` join + strip + spans)."""
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
