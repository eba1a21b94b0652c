"""Relational/analytics operators (SURVEY.md §2.4–2.6) plus the
training-data-pipeline operators (dedup, similarity, text-stats).

Every operator here ships as a pair: a Spark callable
``(spark, sf_dir) -> DataFrame`` in ``QUERIES`` and a DuckDB oracle SQL
string in ``ORACLES`` with IDENTICAL output column names — the driver's
correctness gate compares them value-by-value at sf0.01.
"""

from . import (
    analytics,
    cluster,
    dedup,
    doc_embed,
    extraction,
    multimodal,
    similarity,
    textstats,
)

_MODULES = (
    analytics,
    cluster,
    dedup,
    doc_embed,
    extraction,
    multimodal,
    similarity,
    textstats,
)


def all_queries() -> dict:
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict:
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
