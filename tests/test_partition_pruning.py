"""Partitioned pages table: partition pruning + column pruning evidence
(the Iceberg-style layout claim — at 100 TB, lang/date partition pruning
and never reading the blob column for metrics queries are what keep
queries cheap)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_endpoint_project_spark.sources.pages import corpus_pages


def test_partition_and_column_pruning(spark, tmp_path):
    path = str(tmp_path / "pages_by_lang")
    corpus_pages(spark, n=120, seed=42).write.partitionBy("lang").parquet(path)

    pages = spark.read.parquet(path)
    q = pages.filter(F.col("lang") == "ar").select("url", F.length("text").alias("n"))
    plan = q._jdf.queryExecution().executedPlan().toString()

    # partition pruning: only the lang=ar directory is scanned
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:200]
    # column pruning: the html blob column is NOT in the read schema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in read_schema
    assert "text" in read_schema

    # and the result is correct
    n_ar = pages.filter(F.col("lang") == "ar").count()
    assert q.count() == n_ar > 0
