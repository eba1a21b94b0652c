"""Per-document extraction dispatcher + error taxonomy.

Mirrors the reference pipeline's stage semantics and error codes
(``cv_api/pipeline.py:93-151``, HTTP codes in ``docs/API_CONTRACT_V1.md:143-152``)
but as data: errors become ``(status, error)`` fields, never exceptions,
so a poisoned document can never kill a Spark task.
"""

from __future__ import annotations

import gzip
import io
import time
import zlib
from dataclasses import dataclass, field

from .sniff import (
    KIND_EMPTY,
    KIND_HTML,
    KIND_IMAGE,
    KIND_JPEG,
    KIND_PDF,
    sniff_doc_kind,
)
from .html_extract import extract_html
from .jpeg_pixels import ProgressiveJpegError
from .pdf_extract import extract_pdf
from .png_stub import extract_jpeg_text, extract_png_text

# Error taxonomy — names preserved from the reference
# (cv_api/pipeline.py raise sites; docs/API_CONTRACT_V1.md:143-152).
ERR_INVALID_FILE_TYPE = "INVALID_FILE_TYPE"
ERR_FILE_TOO_LARGE = "FILE_TOO_LARGE"
ERR_OCR_PROVIDER = "OCR_PROVIDER_ERROR"
ERR_INTERNAL = "INTERNAL_ERROR"
# r7: progressive (SOF2) JPEGs get their OWN code so the taxonomy can
# measure how often real crawls would need a progressive decoder before
# one is built (r6 VERDICT missing #3 / next-round #7)
ERR_JPEG_PROGRESSIVE = "JPEG_PROGRESSIVE_UNSUPPORTED"

STATUS_OK = "succeeded"
STATUS_FAILED = "failed"

# upload cap from the reference (cv_api/main.py:38-40: MAX_FILE_MB = 10)
MAX_DOC_BYTES = 10 * 1024 * 1024


@dataclass
class ExtractResult:
    extracted_text: str = ""
    spans: list[tuple[int, int, str]] = field(default_factory=list)
    n_pages: int = 0
    doc_kind: str = KIND_EMPTY
    status: str = STATUS_FAILED
    error: str | None = None
    elapsed_ms: float = 0.0
    # raw <a href> values in document order (HTML docs only) — the
    # crawl-frontier / host-graph feed, collected in the same parse pass
    out_links: list[str] = field(default_factory=list)


def extract_document(payload: bytes | None, max_bytes: int = MAX_DOC_BYTES) -> ExtractResult:
    """Extract main content from one raw document blob.

    Dispatch by sniffed kind (html / pdf / image); empty extraction output
    is an error, matching ``cv_api/pipeline.py:139-145`` (empty OCR text
    => ``OCR_PROVIDER_ERROR``).
    """
    t0 = time.perf_counter()
    res = ExtractResult()
    # transparent gzip: Common-Crawl-style payloads often arrive
    # compressed; decompress (bounded by max_bytes AFTER inflation, so a
    # zip bomb becomes FILE_TOO_LARGE, not an OOM) and dispatch on the
    # inflated bytes
    if payload is not None and payload[:2] == b"\x1f\x8b":
        try:
            with gzip.GzipFile(fileobj=io.BytesIO(payload)) as gz:
                payload = gz.read(max_bytes + 1)
        # OSError covers BadGzipFile (bad header/CRC); a TRUNCATED stream
        # raises EOFError and a corrupted deflate body raises zlib.error —
        # all three are routine in Common-Crawl-style data and must become
        # (status, error) rows, never task failures
        except (OSError, EOFError, zlib.error):
            pass  # corrupt gzip: fall through and sniff the raw bytes
    kind = sniff_doc_kind(payload)
    res.doc_kind = kind
    try:
        if kind == KIND_EMPTY:
            res.error = ERR_OCR_PROVIDER
        elif payload is not None and len(payload) > max_bytes:
            res.error = ERR_FILE_TOO_LARGE
        elif kind == KIND_HTML:
            text, spans, links = extract_html(payload)
            res.extracted_text, res.spans, res.n_pages = text, spans, 1
            res.out_links = links
        elif kind == KIND_PDF:
            res.extracted_text, res.spans, res.n_pages = extract_pdf(payload)
        elif kind == KIND_IMAGE:
            res.extracted_text, res.spans, res.n_pages = extract_png_text(payload)
        elif kind == KIND_JPEG:
            res.extracted_text, res.spans, res.n_pages = extract_jpeg_text(payload)
        else:
            res.error = ERR_INVALID_FILE_TYPE
        if res.error is None and not res.extracted_text:
            res.error = ERR_OCR_PROVIDER  # empty output is an error (pipeline.py:139-145)
    except ProgressiveJpegError:
        res.error = ERR_JPEG_PROGRESSIVE
        res.extracted_text, res.spans = "", []
    except Exception as exc:  # noqa: BLE001 — poisoned docs become rows, not task failures
        res.error = f"{ERR_INTERNAL}: {type(exc).__name__}: {exc}"
        res.extracted_text, res.spans = "", []
    res.status = STATUS_OK if res.error is None else STATUS_FAILED
    res.elapsed_ms = (time.perf_counter() - t0) * 1000.0
    return res
