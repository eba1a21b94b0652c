"""The §3.3 corpus-benchmark flow: model fan-out -> metrics -> results
table -> summary/export (reference: pages/parallel_ocr_test.py)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from ocr_endpoint_project_spark.pipeline.benchmark import (
    per_model_summary,
    run_model_benchmark,
)
from ocr_endpoint_project_spark.pipeline.export import export_results, latest_snapshot
from ocr_endpoint_project_spark.sources.pages import corpus_pages


def test_model_benchmark_and_export(spark, tmp_path):
    pages = corpus_pages(spark, n=60, seed=42).filter(F.col("text") != "").cache()
    n_pages = pages.count()

    results = run_model_benchmark(pages, num_partitions=8).cache()
    # two variants per doc (O1 fan-out as a column)
    assert results.count() == 2 * n_pages
    models = {r["model_name"] for r in results.select("model_name").distinct().collect()}
    assert models == {"structured", "raw_text"}

    summary = per_model_summary(results)
    by_model = {r["model_name"]: r for r in summary.collect()}
    # the real extractor is byte-identical -> CER/WER exactly 0
    assert by_model["structured"]["avg_cer_pct"] == 0.0
    assert by_model["structured"]["avg_wer_pct"] == 0.0
    # the naive baseline keeps boilerplate -> strictly worse
    assert by_model["raw_text"]["avg_cer_pct"] > 0.0
    assert by_model["structured"]["avg_word_accuracy_pct"] == 100.0
    # O8 cost accounting: cost = n_pages * $0.002 per run. The raw
    # baseline emits one page per doc; the structured extractor pays for
    # every PDF page, so its total is at least the one-page floor.
    assert abs(by_model["raw_text"]["total_cost_usd"] - n_pages * 0.002) < 1e-9
    assert by_model["structured"]["total_cost_usd"] >= n_pages * 0.002 - 1e-9
    for m in ("structured", "raw_text"):
        assert by_model[m]["avg_time_seconds"] >= 0.0

    # S8 export sinks: all-runs CSV, latest-snapshot CSV, summary JSON
    out = str(tmp_path / "export")
    summary_json = export_results(results, out)
    assert set(summary_json) == {"structured", "raw_text"}
    assert summary_json["structured"]["avg_cer_pct"] == 0.0
    with open(os.path.join(out, "summary.json"), encoding="utf-8") as f:
        assert json.load(f) == summary_json
    snap = latest_snapshot(results)
    assert snap.count() == 2 * n_pages  # one run per key so snapshot == all
    csv = spark.read.option("header", True).csv(os.path.join(out, "latest_snapshot_csv"))
    assert csv.count() == 2 * n_pages
    results.unpersist()
    pages.unpersist()


def test_decision_report_renders_table_and_winner(spark, tmp_path):
    """The Markdown decision report carries the per-model ranking table
    and a definite winner line (reference
    scripts/generate_decision_report.py:685-712)."""
    from ocr_endpoint_project_spark.pipeline.export import decision_report

    out = str(tmp_path / "report.md")
    text = decision_report(spark, "/root/testdata/sf0.001", out)
    with open(out, encoding="utf-8") as f:
        assert f.read() == text

    assert "## Model ranking" in text
    assert "| model | weighted_score |" in text
    # at least one data row in the table (a pipe-delimited line with a
    # 4-decimal weighted score)
    assert any(
        line.startswith("| ") and line.count("|") == 7
        for line in text.splitlines()
        if "weighted_score" not in line and "---" not in line
    )
    assert "**Winner: " in text
    assert "success rate by user" in text

    # the OCR-weights table (reference decision weights 0.35/0.25/0.20/
    # 0.10/0.10) renders alongside the event-based one, and the real
    # extractor (byte-identical -> best CER/WER/layout) wins it
    assert "## OCR model ranking (extraction-quality weights)" in text
    assert "| model | decision_score |" in text
    assert "**OCR winner: structured**" in text


def test_ocr_decision_scores_weights_and_ties(spark):
    """Min-max semantics mirror the reference exactly: lower-is-better
    metrics flip, an all-equal column normalizes to 1.0 for every model,
    and the score is the documented weighted sum."""
    from ocr_endpoint_project_spark.pipeline.export import ocr_decision_scores

    summary = spark.createDataFrame(
        [
            # model, cer, wer, layout, time, cost, n_docs
            ("good", 0.0, 0.0, 100.0, 2.0, 5.0, 10),
            ("bad", 10.0, 20.0, 50.0, 1.0, 5.0, 10),
        ],
        "model_name string, avg_cer_pct double, avg_wer_pct double, "
        "avg_layout_pct double, avg_time_seconds double, total_cost_usd double, "
        "n_docs long",
    )
    rows = {r["model_name"]: r for r in ocr_decision_scores(summary).collect()}
    g, b = rows["good"], rows["bad"]
    # lower-is-better: best cer/wer -> 1.0; higher-is-better layout -> 1.0
    assert (g["s_cer"], g["s_wer"], g["s_layout"]) == (1.0, 1.0, 1.0)
    assert (b["s_cer"], b["s_wer"], b["s_layout"]) == (0.0, 0.0, 0.0)
    # time: 'bad' is faster -> 1.0 there; cost ties -> 1.0 for BOTH
    assert (g["s_time"], b["s_time"]) == (0.0, 1.0)
    assert (g["s_cost"], b["s_cost"]) == (1.0, 1.0)
    assert g["decision_score"] == round(0.35 + 0.25 + 0.20 + 0.0 + 0.10, 4)
    assert b["decision_score"] == round(0.10 + 0.10, 4)


def test_parsing_benchmark_leaf_accuracy_rollup(spark):
    """M8–M10 through the real parse stage: the structured model
    reproduces every golden leaf; the whitespace-collapsed baseline
    loses the line-anchored sections and scores strictly lower."""
    from ocr_endpoint_project_spark.pipeline.benchmark import (
        per_model_parsing_summary,
        run_parsing_benchmark,
    )

    pages = corpus_pages(spark, n=40, seed=7).filter(F.col("text") != "")
    n_pages = pages.count()
    results = run_parsing_benchmark(pages, num_partitions=4).cache()
    assert results.count() == 2 * n_pages

    by_model = {
        r["model_name"]: r for r in per_model_parsing_summary(results).collect()
    }
    assert by_model["structured"]["avg_leaf_accuracy_pct"] == 100.0
    assert by_model["raw_text"]["avg_leaf_accuracy_pct"] < 100.0
    assert by_model["raw_text"]["n_docs"] == n_pages
    results.unpersist()


def test_decision_report_has_parsing_section(spark, tmp_path):
    from ocr_endpoint_project_spark.pipeline.export import decision_report

    text = decision_report(spark, "/root/testdata/sf0.001", str(tmp_path / "r.md"))
    assert "## Structured parsing — nested-leaf accuracy" in text
    assert "| structured | 100.0000 |" in text
