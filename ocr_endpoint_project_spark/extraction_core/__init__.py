"""Pure-Python deterministic extraction kernels (no Spark imports).

This package is the single source of truth for every byte of extracted
text: both the fixture generator and the Spark pipeline call the same
functions, which is what makes the byte-identity contract testable
(reference analog: the ``"\\n\\n".join(parts).strip()`` page-join rule at
``ocr_common.py:341-344``).
"""

from .sniff import sniff_doc_kind
from .document import extract_document
from .html_extract import extract_html
from .pdf_extract import extract_pdf
from .png_stub import extract_png_text

__all__ = [
    "sniff_doc_kind",
    "extract_document",
    "extract_html",
    "extract_pdf",
    "extract_png_text",
]
