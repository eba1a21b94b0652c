"""ocr_endpoint_project_spark — a PySpark-native document-extraction engine.

A from-scratch, Spark-first reimplementation of the *semantics* of the
reference system ``badreddinesaadioui/OCR-endpoint-project`` (a single-node
Streamlit + FastAPI OCR benchmark/service): distributed main-content
extraction (HTML boilerplate strip + PDF layout parse) over a Common-Crawl
style ``pages(url, warc_ts, html, text, lang)`` table, with vectorized
pandas/Arrow kernels, salted 64-bit-url-hash repartitioning, per-partition
lineage + checkpoint resume, and the reference's full analytics layer
(CER/WER/layout metrics, latest-snapshot dedup, Borda/Condorcet rankings).

Layout:
    extraction_core/  pure-Python deterministic kernels (no Spark imports)
    functions/        Arrow kernels + Catalyst expression builders
    operators/        analytics, dedup, similarity, text-stats operators
    pipeline/         flagship extraction pipeline, lineage, resume, ingest
    sources/          pages-table synthesis + readers/sinks
"""

__version__ = "0.1.0"
