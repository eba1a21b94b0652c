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
