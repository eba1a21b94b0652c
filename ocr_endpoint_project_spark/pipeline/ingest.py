"""Ingestion-side validation + quarantine routing (S5).

The reference rejects uploads with HTTP errors (empty file, bad
extension, > 10 MB — ``cv_api/main.py:38-40,322-348``). In a table
pipeline the same rules become a split: valid rows continue, invalid
rows are routed to a quarantine DataFrame with an ``error_code`` column
(never dropped silently). Pure Catalyst — pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extraction_core.document import (
    ERR_FILE_TOO_LARGE,
    ERR_INVALID_FILE_TYPE,
    MAX_DOC_BYTES,
)

ERR_EMPTY_FILE = "EMPTY_FILE"
ERR_NULL_URL = "NULL_URL"


def _error_code(max_bytes: int):
    payload_len = F.length(F.col("html"))
    return (
        F.when(F.col("url").isNull(), F.lit(ERR_NULL_URL))
        .when(F.col("html").isNull() | (payload_len == 0), F.lit(ERR_EMPTY_FILE))
        .when(payload_len > max_bytes, F.lit(ERR_FILE_TOO_LARGE))
        .when(  # must sniff as a supported kind: pdf / png / jpeg / html-ish
            ~(
                F.col("html").startswith(F.lit(b"%PDF-"))
                | F.col("html").startswith(F.lit(b"\x89PNG\r\n\x1a\n"))
                | F.col("html").startswith(F.lit(b"\xff\xd8\xff"))
                | F.lower(F.col("html").cast("string")).contains("<")
            ),
            F.lit(ERR_INVALID_FILE_TYPE),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def validate_pages(pages: DataFrame, max_bytes: int = MAX_DOC_BYTES) -> tuple[DataFrame, DataFrame]:
    """Split pages into (valid, quarantined-with-error_code)."""
    tagged = pages.withColumn("error_code", _error_code(max_bytes))
    valid = tagged.filter(F.col("error_code").isNull()).drop("error_code")
    quarantined = tagged.filter(F.col("error_code").isNotNull()).drop("html")
    return valid, quarantined
