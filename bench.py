"""Benchmark harness (driver contract: ONE JSON line on stdout).

Measures:
* flagship extraction throughput (docs/sec) over a realistic mixed
  html/pdf/png corpus (generated once to a parquet cache, fanned out
  xreplicas in Catalyst with distinct urls — default ~120k documents);
* wall seconds for each headline operator query at ``SPARK_GRAFT_SF_DIR``;
* N -> 4N scaling: the same extraction job at ``local[N]`` and
  ``local[4N]`` on identical input, after a warm-up run per session;
  efficiency = (throughput_4N / throughput_N) / 4 — the sandbox stand-in
  for N vs 4N executors (BASELINE.md).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_DOCS (default 120000),
SPARK_GRAFT_BENCH_SCALING=0 to skip scaling runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ocr_endpoint_project_spark.pipeline.extract import run_extraction  # noqa: E402
from ocr_endpoint_project_spark.session import build_session  # noqa: E402
from ocr_endpoint_project_spark.sources.pages import cached_corpus_pages  # noqa: E402

HEADLINE = [
    "tpch_pricing_summary",
    "join_revenue_per_nation",
    "win_latest_snapshot",
    "rank_borda",
    "dedup_minhash_lsh_pairs",
    "dedup_cluster_keeper",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "ann_bruteforce_topk",
    "ann_ivf_bucketed",
    "dedup_embedding_srp_pairs",
    "text_quality_score",
    "text_winnow_fingerprint",
    "pipeline_training_prep",
    "word_metrics_kernel",
    "extract_roundtrip",
]

CORPUS_BASE = 5000
CORPUS_RICHNESS = 8  # ~10 KB avg payload, realistic page weight
CACHE_DIR = os.path.join(REPO, "BENCH", "cache")


def time_extraction(spark, replicas: int, partitions: int) -> tuple[float, int]:
    pages = cached_corpus_pages(
        spark, CACHE_DIR, n=CORPUS_BASE, seed=42, replicas=replicas,
        richness=CORPUS_RICHNESS,
    )
    t0 = time.perf_counter()
    extracted = run_extraction(pages, num_partitions=partitions)
    row = extracted.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    ).collect()[0]
    dt = time.perf_counter() - t0
    return dt, int(row["n"])


def _session(name: str, cores: int, aqe: bool = True):
    # small Arrow batches win for binary payloads: the JVM VarBinary
    # vector path degrades superlinearly past ~1 MB batches (measured:
    # 64-row batches move 1.2 GB 3.4x faster than 2048-row ones), and 64
    # is also the bounded-memory setting for 10 MB blobs. AQE is disabled
    # for the fixed-partitioning scaling runs (its per-stage re-planning
    # adds constant latency and buys nothing for a static extraction job).
    return build_session(
        app_name=name,
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        arrow_batch_rows=64,
        extra_conf={} if aqe else {"spark.sql.adaptive.enabled": "false"},
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "120000"))
    replicas = max(1, bench_docs // CORPUS_BASE)
    do_scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
    sf = float(sf_dir.rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from ocr_endpoint_project_spark.operators import all_queries

    # bench runs the dedup path in its 100-TB shape: signature tables are
    # materialized parquet, not .cache() (operators/dedup.py:_pin)
    os.environ.setdefault(
        "SPARK_GRAFT_MATERIALIZE_DIR", os.path.join(CACHE_DIR, "materialized")
    )

    spark = _session("bench", cpus)
    queries = all_queries()
    timings: dict[str, float] = {}

    # flagship extraction throughput (warm-up, then measured run)
    time_extraction(spark, replicas=1, partitions=cpus)
    dt, n_docs = time_extraction(spark, replicas=replicas, partitions=cpus * 2)
    timings["extract_throughput"] = round(dt, 3)
    docs_per_sec = n_docs / dt

    for name in HEADLINE:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — one bad query must not kill the bench
            print(f"bench: {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = sum(t for t in timings.values() if t > 0)
    spark.stop()

    scaling = {}
    if do_scaling:
        # N vs 4N with BOTH legs fully provisioned: worker cores + the JVM
        # task threads that feed them stay under the machine's core count,
        # mirroring a real cluster where each executor is provisioned with
        # matching cores. (local[32] on a 32-core box oversubscribes — 32
        # Python workers + 32 JVM serialization threads — which a cluster
        # never does; see BENCH/BASELINE.md for the full ladder incl. 8->32.)
        n_small = max(1, int(os.environ.get("SPARK_GRAFT_SCALING_N", str(max(2, cpus // 16)))))
        n_big = 4 * n_small
        # 60k docs/leg: long enough (~70 s on the small leg) that transient
        # VM noise (steal, page-cache churn) amortizes instead of dominating
        scaling_docs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "60000"))
        scaling_reps = max(1, scaling_docs // CORPUS_BASE)
        n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
        # INTERLEAVED rounds (2,8,2,8,...): this shared VM drifts on a
        # minutes scale (observed: one leg's 4 runs all 60% slower than
        # the same leg an hour earlier), so running all N-leg runs then
        # all 4N-leg runs lets a slow patch hit exactly one leg and skew
        # the ratio both ways. Alternating legs inside each round makes
        # every round a locally-paired measurement; per-round ratios are
        # reported alongside the best-of aggregate.
        leg_runs: dict[int, list[tuple[float, int]]] = {n_small: [], n_big: []}
        pair_eff = []
        for r in range(n_runs):
            round_secs = {}
            for m in (n_small, n_big):
                s = _session(f"bench-scale-{m}-r{r}", m, aqe=False)
                time_extraction(s, replicas=1, partitions=m)  # warm-up
                run = time_extraction(s, replicas=scaling_reps, partitions=m * 4)
                leg_runs[m].append(run)
                round_secs[m] = run[0]
                s.stop()
            pair_eff.append(
                round(round_secs[n_small] / round_secs[n_big] / 4.0, 3)
            )
        for m in (n_small, n_big):
            secs = sorted(dt for dt, _ in leg_runs[m])
            sn = leg_runs[m][0][1]  # doc count is identical across runs
            scaling[f"local[{m}]"] = {
                "sec": round(secs[0], 3),
                "docs_per_sec": round(sn / secs[0], 1),
                "runs_sec": [round(x, 3) for x in secs],
                "spread_pct": round((secs[-1] - secs[0]) / secs[0] * 100.0, 1),
            }
        tput_n = scaling[f"local[{n_small}]"]["docs_per_sec"]
        tput_4n = scaling[f"local[{n_big}]"]["docs_per_sec"]
        scaling["efficiency_n_to_4n"] = round(tput_4n / tput_n / 4.0, 3)
        scaling["per_round_efficiency"] = pair_eff
        scaling["efficiency_best_round"] = max(pair_eff)
        scaling["efficiency_median_round"] = sorted(pair_eff)[len(pair_eff) // 2]

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
