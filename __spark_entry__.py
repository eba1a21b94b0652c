"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries live next to their oracles in
``ocr_endpoint_project_spark/operators/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full extraction
    pipeline (salted url-hash repartition -> Arrow extraction kernel) over
    a pages table synthesized from documents.parquet, returning per-url
    extraction rows with a byte-identity flag against golden text."""
    from pyspark.sql import functions as F

    from ocr_endpoint_project_spark.pipeline.extract import run_extraction
    from ocr_endpoint_project_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    extracted = run_extraction(pages, num_partitions=16)
    golden = pages.select("url", F.col("text").alias("golden_text"))
    return extracted.join(golden, "url", "left").select(
        "url",
        "lang",
        "n_chars",
        "n_pages",
        "doc_kind",
        "status",
        (F.col("extracted_text") == F.col("golden_text")).alias("byte_identical"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline operators). Column names are aliased
    identically in the Spark code and the oracle SQL."""
    from ocr_endpoint_project_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents; keys match ``queries()``.
    Entries absent here are genuinely non-SQL-expressible (driver records
    a rows-only check)."""
    from ocr_endpoint_project_spark.operators import all_oracles

    return all_oracles()
