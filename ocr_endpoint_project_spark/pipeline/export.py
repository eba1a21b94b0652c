"""Export sinks (S8): latest-snapshot CSV, all-runs CSV, summary JSON.

Mirrors ``scripts/export_benchmark_results.py:310-354``: the run history
stays append-only; exports derive the latest snapshot (newest run per
(url, model)), write row-level CSVs via Spark, and a small driver-side
summary JSON of per-model aggregates (k rows — driver-side is the
idiomatic place for k-row decision output, SURVEY.md A8 note).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(results: DataFrame, keys=("url", "model_name"), order_col="run_at") -> DataFrame:
    """Newest row per key tuple (scripts/export_benchmark_results.py:47-56)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return (
        results.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def export_results(results: DataFrame, out_dir: str) -> dict:
    """Write all-runs CSV + latest-snapshot CSV + summary JSON.

    Returns the summary dict (also written to ``summary.json``).
    """
    os.makedirs(out_dir, exist_ok=True)
    flat = results.withColumn("run_at", F.col("run_at").cast("string"))
    flat.write.mode("overwrite").option("header", True).csv(
        os.path.join(out_dir, "all_runs_csv")
    )
    snap = latest_snapshot(flat)
    snap.write.mode("overwrite").option("header", True).csv(
        os.path.join(out_dir, "latest_snapshot_csv")
    )
    summary_rows = (
        snap.filter(F.col("error").isNull() | (F.trim(F.col("error")) == ""))
        .groupBy("model_name")
        .agg(
            F.round(F.avg("cer_pct"), 2).alias("avg_cer_pct"),
            F.round(F.avg("wer_pct"), 2).alias("avg_wer_pct"),
            F.round(F.avg("layout_accuracy_pct"), 2).alias("avg_layout_pct"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect()
    )
    summary = {r["model_name"]: r.asDict() for r in summary_rows}
    with open(os.path.join(out_dir, "summary.json"), "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary


# the reference's explicit OCR decision weights — "prioritize extraction
# quality" (scripts/generate_decision_report.py:158-200)
OCR_DECISION_WEIGHTS = (
    ("avg_cer_pct", "s_cer", False, 0.35),
    ("avg_wer_pct", "s_wer", False, 0.25),
    ("avg_layout_pct", "s_layout", True, 0.20),
    ("avg_time_seconds", "s_time", False, 0.10),
    ("total_cost_usd", "s_cost", False, 0.10),
)


def ocr_decision_scores(summary: DataFrame) -> DataFrame:
    """The reference's OCR decision table (CER/WER/layout/time/cost
    weighted 0.35/0.25/0.20/0.10/0.10,
    ``scripts/generate_decision_report.py:158-200``) over a
    ``per_model_summary`` frame: min-max normalize each metric across
    models (all-equal column -> 1.0, the reference's nunique<=1 rule;
    lower-is-better metrics flipped), then the weighted sum.

    Pure Catalyst over a k-row model table — the min/max bounds frame is
    1 row, broadcast into the k-row crossJoin.
    """
    bounds = summary.agg(
        *[
            f
            for (c, _, _, _) in OCR_DECISION_WEIGHTS
            for f in (F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}"))
        ]
    )
    j = summary.crossJoin(F.broadcast(bounds))
    norm_cols = []
    for c, s, higher, _w in OCR_DECISION_WEIGHTS:
        mn, mx = F.col(f"mn_{c}"), F.col(f"mx_{c}")
        scaled = (F.col(c) - mn) / (mx - mn)
        norm = F.when(mx == mn, F.lit(1.0)).otherwise(
            scaled if higher else F.lit(1.0) - scaled
        )
        norm_cols.append(F.round(norm, 4).alias(s))
    normed = j.select("model_name", *norm_cols, "n_docs")
    score = None
    for _c, s, _h, w in OCR_DECISION_WEIGHTS:
        term = F.lit(w) * F.col(s)
        score = term if score is None else score + term
    return normed.select(
        "model_name",
        *[F.col(s) for _, s, _, _ in OCR_DECISION_WEIGHTS],
        F.round(score, 4).alias("decision_score"),
        "n_docs",
    )


def decision_report(spark, sf_dir: str, out_path: str) -> str:
    """Render the ranking aggregates into a human-readable Markdown
    decision report.

    Mirrors ``scripts/generate_decision_report.py:685-712`` (the
    reference writes ``ANALYSE_DECISIONNELLE.md`` from the same class of
    aggregates). Every number comes from the oracle-checked ranking
    queries — weighted score (W6), Borda (W7), Condorcet (W8), success
    rate (A5); this function is k-row driver-side formatting only
    (k = number of models), the idiomatic place for decision output.

    Returns the Markdown text (also written to ``out_path``).
    """
    from ..operators.analytics import (
        q_borda_rank,
        q_condorcet_wins,
        q_success_rate,
        q_weighted_score,
    )

    ws = {r["event_type"]: r for r in q_weighted_score(spark, sf_dir).collect()}
    borda = {
        r["event_type"]: r["borda_points"] for r in q_borda_rank(spark, sf_dir).collect()
    }
    cond = {r["event_type"]: r["wins"] for r in q_condorcet_wins(spark, sf_dir).collect()}
    # top user cohorts by volume: k rows after the aggregate, distributed
    # sort+limit (TakeOrderedAndProject), never a full collect
    users = (
        q_success_rate(spark, sf_dir)
        .orderBy(F.desc("total"), F.asc("user_id"))
        .limit(10)
        .collect()
    )

    models = sorted(ws)
    # definite winner for the report: weighted score, ties broken by
    # Borda points then name (the tie->None semantics of A8 stay in the
    # queryable operator; a report needs a recommendation)
    winner = max(models, key=lambda m: (ws[m]["weighted_score"], borda.get(m, 0.0), m))

    lines = [
        "# Decision report",
        "",
        f"_Source tables: `{sf_dir}` — all figures from oracle-checked queries._",
        "",
        "## Model ranking",
        "",
        "| model | weighted_score | s_value | s_volume | borda_points | condorcet_wins |",
        "|---|---|---|---|---|---|",
    ]
    for m in sorted(models, key=lambda m: -ws[m]["weighted_score"]):
        r = ws[m]
        lines.append(
            f"| {m} | {r['weighted_score']:.4f} | {r['s_value']:.4f} "
            f"| {r['s_volume']:.4f} | {borda.get(m, 0.0):.4f} | {cond.get(m, 0)} |"
        )
    lines += [
        "",
        f"**Winner: {winner}** — weighted score "
        f"{ws[winner]['weighted_score']:.4f}, Borda {borda.get(winner, 0.0):.4f}, "
        f"{cond.get(winner, 0)} Condorcet win(s).",
        "",
        "## OCR model ranking (extraction-quality weights)",
        "",
        "_CER/WER/layout/time/cost weighted 0.35/0.25/0.20/0.10/0.10 — the",
        "reference's explicit OCR decision weights",
        "(scripts/generate_decision_report.py:158-200), over the benchmark",
        "fan-out's per-model summary._",
        "",
        "| model | decision_score | s_cer | s_wer | s_layout | s_time | s_cost | n_docs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    from ..pipeline.benchmark import per_model_summary, run_model_benchmark
    from ..sources.pages import pages_from_documents

    bench = run_model_benchmark(pages_from_documents(spark, sf_dir), num_partitions=16)
    ocr_rows = ocr_decision_scores(per_model_summary(bench)).collect()
    ocr_rows.sort(key=lambda r: (-r["decision_score"], r["model_name"]))
    for r in ocr_rows:
        lines.append(
            f"| {r['model_name']} | {r['decision_score']:.4f} | {r['s_cer']:.4f} "
            f"| {r['s_wer']:.4f} | {r['s_layout']:.4f} | {r['s_time']:.4f} "
            f"| {r['s_cost']:.4f} | {r['n_docs']} |"
        )
    ocr_winner = ocr_rows[0]
    lines += [
        "",
        f"**OCR winner: {ocr_winner['model_name']}** — decision score "
        f"{ocr_winner['decision_score']:.4f} over {ocr_winner['n_docs']} documents.",
        "",
        "## Structured parsing — nested-leaf accuracy (M8–M10)",
        "",
        "_% of golden record leaves each parser model reproduces at the",
        "same path (pages/llm_parsing_benchmark.py:317-350 semantics),",
        "through the real segment→from_json stage._",
        "",
        "| model | avg_leaf_accuracy_pct | n_docs |",
        "|---|---|---|",
    ]
    from ..pipeline.benchmark import per_model_parsing_summary, run_parsing_benchmark

    parse_rows = per_model_parsing_summary(
        run_parsing_benchmark(pages_from_documents(spark, sf_dir), num_partitions=16)
    ).collect()
    parse_rows.sort(key=lambda r: -r["avg_leaf_accuracy_pct"])
    for r in parse_rows:
        lines.append(
            f"| {r['model_name']} | {r['avg_leaf_accuracy_pct']:.4f} | {r['n_docs']} |"
        )
    lines += [
        "",
        "## Reliability — success rate by user (top 10 by volume)",
        "",
        "| user_id | runs | errors | success_rate_pct |",
        "|---|---|---|---|",
    ]
    for r in users:
        lines.append(
            f"| {r['user_id']} | {r['total']} | {r['errors']} | {r['success_rate_pct']:.2f} |"
        )
    text = "\n".join(lines) + "\n"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(text)
    return text
