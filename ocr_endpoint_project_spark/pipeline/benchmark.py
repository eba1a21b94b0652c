"""The reference's corpus-benchmark flow (§3.3 of SURVEY.md), Spark-first.

``pages/parallel_ocr_test.py`` loops documents sequentially, runs 2 OCR
models per doc in threads, scores each against golden text, appends to a
results table, then aggregates + ranks. Here the model axis is a COLUMN:
each extractor variant contributes rows to one results DataFrame
(``unionByName`` of per-variant runs = the thread fan-out of
``pages/2_OCR_Benchmark.py:846-860``), metrics come from the word-metrics
kernel + Catalyst CER, and the analytics layer (latest snapshot, per-model
summary, Borda/Condorcet) consumes the same table shape as the reference
DDL (``pages/parallel_ocr_test.py:33-54``).

Extractor variants (deterministic, no remote APIs):
* ``structured``  — the real extraction pipeline (html/pdf/png kernels);
* ``raw_text``    — naive whitespace-collapse of the decoded payload
  (boilerplate kept), a genuinely worse baseline so rankings have signal.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import word_metrics_udf
from ..functions.text import cer_expr
from ..pipeline.extract import COST_PER_PAGE_USD, run_extraction

RAW_SCHEMA = "url string, extracted_text string, status string"


def _raw_text_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Baseline 'model': decode payload, collapse whitespace, strip tags
    crudely (everything between < and > dropped) — the kind of extraction
    the reference's weakest OCR model approximates."""
    import re

    tag_re = re.compile(r"<[^>]*>")

    def run(payload) -> str:
        if payload is None:
            return ""
        raw = bytes(payload).decode("utf-8", "replace")
        return " ".join(tag_re.sub(" ", raw).split())

    for batch in it:
        yield pd.DataFrame(
            {
                "url": batch["url"],
                "extracted_text": [run(p) for p in batch["html"]],
                "status": "succeeded",
            }
        )


def run_model_benchmark(pages: DataFrame, num_partitions: int = 32) -> DataFrame:
    """pages -> results rows: one per (url, model_name) with metric struct.

    Output columns mirror the reference results DDL: url, model_name,
    cer_pct, wer_pct, layout_accuracy_pct, accuracy_pct, error, run_at.
    """
    golden = pages.select("url", F.col("text").alias("golden"), "lang")

    structured = (
        run_extraction(pages, num_partitions=num_partitions)
        .select(
            "url",
            "extracted_text",
            "status",
            "error",
            (F.col("elapsed_ms") / 1000.0).alias("time_seconds"),
            "cost_usd",
        )
        .withColumn("model_name", F.lit("structured"))
    )
    raw = (
        pages.select("url", "html")
        .repartition(num_partitions)
        .mapInPandas(_raw_text_batch, RAW_SCHEMA)
        .withColumn("model_name", F.lit("raw_text"))
        .withColumn("error", F.lit(None).cast("string"))
        .withColumn("time_seconds", F.lit(0.0))
        # the raw baseline emits single-page text (pricing parity with the
        # reference's per-page cost, ocr_common.py:345-346)
        .withColumn("cost_usd", F.lit(COST_PER_PAGE_USD))
    )
    runs = structured.unionByName(raw)

    scored = runs.join(golden, "url", "left").withColumn(
        "m", word_metrics_udf(F.col("golden"), F.col("extracted_text"))
    )
    return scored.select(
        "url",
        "model_name",
        "lang",
        cer_expr(F.col("golden"), F.col("extracted_text")).alias("cer_pct"),
        F.col("m.wer_pct").alias("wer_pct"),
        F.col("m.layout_accuracy_pct").alias("layout_accuracy_pct"),
        F.col("m.accuracy_pct").alias("accuracy_pct"),
        "time_seconds",
        "cost_usd",
        "status",
        "error",
        F.current_timestamp().alias("run_at"),
    )


def run_parsing_benchmark(pages: DataFrame, num_partitions: int = 16) -> DataFrame:
    """Structured-stage twin of :func:`run_model_benchmark` (M8-M10).

    The reference's LLM-parsing benchmark scores each model's nested
    JSON against golden leaves (``pages/parallel_llm_parsing_test.py:
    280-288``, leaf semantics ``pages/llm_parsing_benchmark.py:317-350``).
    Here the model axis is again a column: ``structured`` parses a clean
    resume rendering of the page, ``raw_text`` parses a
    whitespace-collapsed rendering (section headers destroyed — the
    no-layout baseline), and both are scored by ``leaf_accuracy_udf``
    against the golden record built from the same fields.
    """
    from ..functions.kernels import leaf_accuracy_udf, parse_sections

    name = F.concat(F.lit("Page "), F.substring(F.sha1(F.col("url")), 1, 8))
    # about rides as ONE LOWERCASED line: corpus text contains
    # heading-shaped content the resume grammar would legitimately
    # segment (an all-caps word inside an otherwise-uncased Arabic line
    # makes the whole line isupper() == a header), and this benchmark
    # scores the MODELS, not the page's accidental resemblance to a CV.
    # (?U): Java \s is ASCII-only by default; Unicode class keeps parity
    # with the Python-side splitlines boundaries.
    # the "~ " sentinel keeps the line from STARTING with a scalar key
    # ("name:", "location:", ...) — the corpus contains resume-shaped
    # documents whose own grammar would otherwise capture the line
    about = F.concat(
        F.lit("~ "), F.lower(F.regexp_replace(F.col("text"), r"(?U)\s+", " "))
    )
    golden_json = F.to_json(
        F.struct(
            name.alias("name"),
            F.col("lang").alias("location"),
            about.alias("about"),
        )
    )
    resume = F.concat(
        F.lit("NAME: "), name,
        F.lit("\nLOCATION: "), F.col("lang"),
        F.lit("\nABOUT\n"), about,
    )
    variants = (
        pages.select(
            "url",
            golden_json.alias("golden_json"),
            resume.alias("structured"),
            # collapse ALL whitespace: the segmenter needs line-anchored
            # headers, so this model's location/about leaves go null
            F.regexp_replace(resume, r"\s+", " ").alias("raw_text"),
        )
        .repartition(num_partitions)
        .unpivot(["url", "golden_json"], ["structured", "raw_text"],
                 "model_name", "resume_text")
    )
    parsed = parse_sections(variants, text_col="resume_text", out_col="record")
    return parsed.select(
        "url",
        "model_name",
        leaf_accuracy_udf(
            F.to_json(F.col("record")), F.col("golden_json")
        ).alias("leaf_accuracy_pct"),
    )


def per_model_parsing_summary(parsing_results: DataFrame) -> DataFrame:
    """Per-model rollup of the structured stage — the row the decision
    report shows next to the OCR metrics."""
    return parsing_results.groupBy("model_name").agg(
        F.avg("leaf_accuracy_pct").alias("avg_leaf_accuracy_pct"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def per_model_summary(results: DataFrame) -> DataFrame:
    """A1/A2: error-masked per-model means (pages/parallel_ocr_test.py:211-228)."""
    ok = results.filter(
        F.col("error").isNull() | (F.trim(F.col("error")) == "")
    )
    return ok.groupBy("model_name").agg(
        F.avg("cer_pct").alias("avg_cer_pct"),
        F.avg("wer_pct").alias("avg_wer_pct"),
        F.avg("layout_accuracy_pct").alias("avg_layout_pct"),
        F.avg("accuracy_pct").alias("avg_word_accuracy_pct"),
        F.avg("time_seconds").alias("avg_time_seconds"),
        F.sum("cost_usd").alias("total_cost_usd"),
        F.count(F.lit(1)).alias("n_docs"),
    )
