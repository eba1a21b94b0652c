"""Structured Streaming surface: incremental extraction over arriving
page files (the reference's async-job semantics, O3/O4, as a stream)."""

from .incremental import stream_extract

__all__ = ["stream_extract"]
