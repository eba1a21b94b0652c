"""Payload-kind sniffing: dispatch a raw document blob to its extractor.

Reference analog: extension-based dispatch in ``cv_api/pipeline.py:93-127``
(``prepare_pdf_bytes``), replaced here with content sniffing because the
``pages`` table carries raw bytes, not filenames.
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF-"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"

# kinds
KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_IMAGE = "image"
KIND_JPEG = "jpeg"
KIND_EMPTY = "empty"
KIND_UNKNOWN = "unknown"

_HTML_HINTS = (b"<!doctype", b"<html", b"<head", b"<body", b"<div", b"<p", b"<article")


def sniff_doc_kind(payload: bytes | None) -> str:
    """Classify a raw payload as html / pdf / image / empty / unknown.

    Deterministic and order-stable: magic bytes first, then a lowercase
    scan of the first 1 KiB for HTML tag hints.
    """
    if not payload:
        return KIND_EMPTY
    if payload.startswith(PDF_MAGIC):
        return KIND_PDF
    if payload.startswith(PNG_MAGIC):
        return KIND_IMAGE
    if payload.startswith(JPEG_MAGIC):
        return KIND_JPEG
    head = payload[:1024].lower()
    stripped = head.lstrip()
    if stripped.startswith(b"<") or any(h in head for h in _HTML_HINTS):
        return KIND_HTML
    return KIND_UNKNOWN
