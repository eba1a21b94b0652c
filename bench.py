"""Benchmark harness (driver contract: ONE JSON line on stdout).

Measures:
* the flagship extraction job's documents/sec (pages synthesized from
  ``{sf_dir}/documents.parquet``, replicated xBENCH_REPLICAS with distinct
  urls so the run is long enough to time meaningfully),
* wall seconds for each headline operator query,
* N -> 4N scaling: the same extraction job at ``local[N]`` and
  ``local[4N]`` cores on identical input; efficiency =
  (throughput_4N / throughput_N) / 4 (the sandbox stand-in for N vs 4N
  executors, per BASELINE.md).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_REPLICAS (default 8),
SPARK_GRAFT_BENCH_SCALING=0 to skip the scaling runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ocr_endpoint_project_spark.pipeline.extract import run_extraction  # noqa: E402
from ocr_endpoint_project_spark.session import build_session  # noqa: E402
from ocr_endpoint_project_spark.sources.pages import pages_from_documents  # noqa: E402

HEADLINE = [
    "tpch_pricing_summary",
    "join_revenue_per_nation",
    "win_latest_snapshot",
    "rank_borda",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_quality_score",
    "word_metrics_kernel",
]


def replicated_pages(spark, sf_dir: str, replicas: int):
    """Fan the documents-derived pages out xN with distinct urls —
    same content distribution, bench-sized row count."""
    pages = pages_from_documents(spark, sf_dir)
    if replicas <= 1:
        return pages
    return pages.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    ).select(
        F.concat(F.col("url"), F.lit("#"), F.col("rep")).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )


def time_extraction(spark, sf_dir: str, replicas: int, partitions: int) -> tuple[float, int]:
    pages = replicated_pages(spark, sf_dir, replicas)
    t0 = time.perf_counter()
    extracted = run_extraction(pages, num_partitions=partitions)
    row = extracted.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    ).collect()[0]
    dt = time.perf_counter() - t0
    return dt, int(row["n"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicas = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "8"))
    do_scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from ocr_endpoint_project_spark.operators import all_queries

    spark = build_session(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    queries = all_queries()
    timings: dict[str, float] = {}

    # flagship extraction throughput
    dt, n_docs = time_extraction(spark, sf_dir, replicas, partitions=cpus * 2)
    timings["extract_throughput"] = round(dt, 3)
    docs_per_sec = n_docs / dt

    for name in HEADLINE:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = sum(timings.values())
    spark.stop()

    scaling = {}
    if do_scaling:
        n_small = max(1, cpus // 4)
        for m in (n_small, cpus):
            s = build_session(
                app_name=f"bench-scale-{m}", master=f"local[{m}]", shuffle_partitions=m
            )
            # warm the JVM/python workers with a tiny run, then measure
            time_extraction(s, sf_dir.replace("sf0.1", "sf0.001"), 1, partitions=m)
            sdt, sn = time_extraction(s, sf_dir, replicas, partitions=m * 2)
            scaling[f"local[{m}]"] = {
                "sec": round(sdt, 3),
                "docs_per_sec": round(sn / sdt, 1),
            }
            s.stop()
        tput_n = scaling[f"local[{n_small}]"]["docs_per_sec"]
        tput_4n = scaling[f"local[{cpus}]"]["docs_per_sec"]
        scaling["efficiency_n_to_4n"] = round(tput_4n / tput_n / (cpus / n_small), 3)

    print(
        json.dumps(
            {
                "metric": "extraction_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "total_sec": round(total, 3),
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
