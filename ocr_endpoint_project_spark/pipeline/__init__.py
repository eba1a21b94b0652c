"""The flagship extraction pipeline: ingest -> salt/repartition ->
Arrow extraction kernel -> extracted + lineage sinks, with checkpoint
resume (SURVEY.md §3.3 / §7 spine)."""

from .extract import run_extraction, salted_pages
from .lineage import lineage_rows, resume_filter, run_with_lineage

__all__ = [
    "run_extraction",
    "salted_pages",
    "lineage_rows",
    "resume_filter",
    "run_with_lineage",
]
