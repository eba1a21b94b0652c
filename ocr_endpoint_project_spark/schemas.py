"""Spark schemas for every table and kernel output in the engine.

Data model from SURVEY.md §1 / FIXTURES.md: the ``pages`` input table is
the authoritative shape from BASELINE.json ``input_hint``; ``extracted``,
``lineage`` and ``metrics`` are the output tables; ``RESUME_STRUCT`` is
the nested structured-parse record (re-expression of the JSON schema at
``cv_api/resume_schema.py:11-131`` — Spark ``from_json`` with this struct
natively drops unknown keys, the reference's ``_strip_extra_keys_to_schema``
semantics at ``cv_api/resume_schema.py:187-198``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- input -------------------------------------------------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SPAN_STRUCT = T.StructType(
    [
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)

# -- extraction kernel output --------------------------------------------------
# span offsets ship as three PARALLEL PRIMITIVE ARRAYS instead of
# array<struct>: pandas->Arrow conversion of per-row struct lists is
# python-object-heavy (~17% of extraction wall time measured); primitive
# lists are near-free and carry identical information
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("span_starts", T.ArrayType(T.IntegerType()), True),
        T.StructField("span_ends", T.ArrayType(T.IntegerType()), True),
        T.StructField("span_kinds", T.ArrayType(T.StringType()), True),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("n_chars", T.IntegerType(), True),
        T.StructField("doc_kind", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("elapsed_ms", T.DoubleType(), True),
        T.StructField("doc_bytes", T.LongType(), True),
        # raw <a href> values in document order (HTML docs; empty
        # otherwise) — feeds the link-graph/crawl-frontier operators
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        T.StructField("partition_id", T.IntegerType(), True),
    ]
)

# -- per-partition lineage rows (J6/O4: checkpoint resume) ---------------------
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("ok_count", T.LongType(), False),
        T.StructField("failed_count", T.LongType(), False),
        T.StructField("byte_count", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("started_at", T.TimestampType(), False),
        T.StructField("finished_at", T.TimestampType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

# -- results table (mirror of ocr_test_results DDL, pages/parallel_ocr_test.py:33-54)
RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("model_name", T.StringType(), False),
        T.StructField("language", T.StringType(), True),
        T.StructField("layout_type", T.StringType(), True),
        T.StructField("extension", T.StringType(), True),
        T.StructField("is_scanned", T.IntegerType(), True),
        T.StructField("cer_pct", T.DoubleType(), True),
        T.StructField("wer_pct", T.DoubleType(), True),
        T.StructField("layout_accuracy_pct", T.DoubleType(), True),
        T.StructField("time_seconds", T.DoubleType(), True),
        T.StructField("cost_usd", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("run_at", T.TimestampType(), False),
    ]
)

# -- word_metrics kernel struct (ocr_common.py:173-201) ------------------------
WORD_METRICS_STRUCT = T.StructType(
    [
        T.StructField("accuracy_pct", T.DoubleType(), False),
        T.StructField("total_gt_words", T.IntegerType(), False),
        T.StructField("found", T.IntegerType(), False),
        T.StructField("missing_words", T.ArrayType(T.StringType()), False),
        T.StructField("extra_words", T.ArrayType(T.StringType()), False),
        T.StructField("cer_pct", T.DoubleType(), False),
        T.StructField("wer_pct", T.DoubleType(), False),
        T.StructField("layout_accuracy_pct", T.DoubleType(), False),
    ]
)


def _exp_entry() -> T.StructType:
    return T.StructType(
        [
            T.StructField("position_title", T.StringType(), True),
            T.StructField("institution_name", T.StringType(), True),
            T.StructField("linkedin_url", T.StringType(), True),
            T.StructField("from_date", T.StringType(), True),
            T.StructField("to_date", T.StringType(), True),
            T.StructField("duration", T.StringType(), True),
            T.StructField("location", T.StringType(), True),
            T.StructField("description", T.StringType(), True),
        ]
    )


def _edu_entry() -> T.StructType:
    fields = [T.StructField("degree", T.StringType(), True)] + _exp_entry().fields[1:]
    return T.StructType(fields)


RESUME_STRUCT = T.StructType(
    [
        T.StructField("linkedin_url", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("about", T.StringType(), True),
        T.StructField("open_to_work", T.BooleanType(), True),
        T.StructField("experiences", T.ArrayType(_exp_entry()), True),
        T.StructField("educations", T.ArrayType(_edu_entry()), True),
        T.StructField(
            "skills",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("category", T.StringType(), True),
                        T.StructField("items", T.ArrayType(T.StringType()), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "projects",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("project_name", T.StringType(), True),
                        T.StructField("role", T.StringType(), True),
                        T.StructField("from_date", T.StringType(), True),
                        T.StructField("to_date", T.StringType(), True),
                        T.StructField("duration", T.StringType(), True),
                        T.StructField("technologies", T.ArrayType(T.StringType()), True),
                        T.StructField("description", T.StringType(), True),
                        T.StructField("url", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("interests", T.ArrayType(T.StringType()), True),
        T.StructField("accomplishments", T.ArrayType(T.StringType()), True),
        T.StructField("contacts", T.ArrayType(T.StringType()), True),
    ]
)
