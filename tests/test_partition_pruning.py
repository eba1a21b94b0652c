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


def test_tpch_q6_filters_pushed_to_scan(spark):
    """Q6's predicates must reach the parquet scan (PushedFilters) and the
    read schema must be pruned to the 4 referenced columns."""
    from ocr_endpoint_project_spark.operators.analytics import q_forecast_revenue

    q = q_forecast_revenue(spark, "/root/testdata/sf0.001")
    plan = q._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read_schema
    assert "l_partkey" not in read_schema  # untouched columns pruned


def test_tpch_q4_is_left_semi(spark):
    """The EXISTS form must compile to a semi join, not an inner join +
    distinct (which would materialize lineitem columns)."""
    from ocr_endpoint_project_spark.operators.analytics import q_order_priority

    plan = (
        q_order_priority(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan


def test_round5_operator_plan_shapes(spark):
    """Shuffle budgets of the round-5 operators, pinned so they can't
    silently regress: the hashed linear scorer is map-side only (its one
    exchange is the deliberate read-spread repartition), audio DSP adds
    no shuffle beyond the spread, and paragraph dedup stays within its
    audited 5-exchange budget (spread x2, para agg, doc agg, join)."""
    from ocr_endpoint_project_spark.operators import all_queries

    q = all_queries()
    sf = "/root/testdata/sf0.001"

    def exchanges(name):
        plan = q[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    assert exchanges("text_hashed_linear_score") <= 1
    assert exchanges("media_audio_dsp") <= 1
    assert exchanges("dedup_paragraphs") <= 5
