"""Structured Streaming surface: incremental extraction over arriving
page files (the reference's async-job semantics, O3/O4, as a stream)."""

from .incremental import stream_extract, stream_extract_with_callbacks

__all__ = ["stream_extract", "stream_extract_with_callbacks"]
