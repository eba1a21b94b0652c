"""Spark-layer tests: the flagship pipeline end-to-end, byte-identity on
the cluster, lineage + checkpoint resume, ingestion quarantine, and the
structured-parse stage."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_endpoint_project_spark.pipeline.extract import run_extraction, salted_pages
from ocr_endpoint_project_spark.pipeline.ingest import validate_pages
from ocr_endpoint_project_spark.pipeline.lineage import (
    latest_lineage,
    lineage_rows,
    run_with_lineage,
)
from ocr_endpoint_project_spark.sources.pages import corpus_pages, pages_from_documents

N_CORPUS = 120
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return corpus_pages(spark, n=N_CORPUS, seed=42).cache()


def test_byte_identity_on_spark(spark, pages):
    """The BASELINE.json per-row invariant, on the cluster: extracted text
    byte-identical to golden per url (confusion-free harness: per-url
    left join + equality, mismatches reported by url)."""
    extracted = run_extraction(pages, num_partitions=16)
    golden = pages.select("url", F.col("text").alias("golden"))
    joined = extracted.join(golden, "url", "left")
    checked = joined.filter(F.col("golden") != "")
    mismatch = checked.filter(F.col("extracted_text") != F.col("golden"))
    bad = [r["url"] for r in mismatch.select("url").limit(5).collect()]
    assert mismatch.count() == 0, f"byte mismatches at urls: {bad}"
    # every golden-bearing row extracted successfully
    assert checked.filter(F.col("status") != "succeeded").count() == 0


def test_failure_rows_become_rows_not_exceptions(spark, pages):
    extracted = run_extraction(pages, num_partitions=8)
    failed = extracted.filter(F.col("status") == "failed")
    errs = {r["error"] for r in failed.select("error").distinct().collect()}
    assert "OCR_PROVIDER_ERROR" in errs  # empty payload rows
    assert "INVALID_FILE_TYPE" in errs  # binary-noise rows
    assert extracted.count() == N_CORPUS


def test_salted_partitioning_spreads_skewed_host(spark, pages):
    """~30% of urls share one host; url-hash partitioning must still be
    near-uniform (north_rule: salting defeats host-level skew)."""
    df = salted_pages(pages, num_partitions=8)
    sizes = (
        df.filter(F.col("url").contains("skewed-host"))
        .groupBy("partition_id")
        .count()
        .collect()
    )
    assert len(sizes) >= 6, "skewed host rows should spread across partitions"
    counts = [r["count"] for r in sizes]
    assert max(counts) <= 4 * max(1, min(counts)) + 4


def test_partition_id_is_data_derived(spark, pages):
    a = salted_pages(pages, num_partitions=16).select("url", "partition_id")
    b = salted_pages(pages.repartition(3), num_partitions=16).select("url", "partition_id")
    assert a.exceptAll(b).count() == 0  # same ids regardless of input layout


def test_lineage_and_resume(spark, pages, tmp_path):
    out = str(tmp_path / "job")
    # run 1: only a subset of partitions "completed" — simulate by running
    # the job on rows of partitions 0..7 only
    tagged = salted_pages(pages, num_partitions=16)
    subset = tagged.filter(F.col("partition_id") < 8).drop("partition_id")
    r1 = run_with_lineage(spark, subset, out, run_id="run-1", num_partitions=16)
    assert r1["resumed_partitions_skipped"] == 0
    lin1 = latest_lineage(spark.read.parquet(r1["lineage_dir"]))
    done1 = {r["partition_id"] for r in lin1.select("partition_id").collect()}
    assert done1 and all(p < 8 for p in done1)

    # run 2: full input, resume — partitions from run 1 must be skipped
    r2 = run_with_lineage(spark, pages, out, run_id="run-2", num_partitions=16)
    assert r2["resumed_partitions_skipped"] == len(done1)

    # exactly-once: final extracted data covers every url exactly once
    final = spark.read.parquet(r1["extracted_dir"])
    assert final.count() == N_CORPUS
    assert final.select("url").distinct().count() == N_CORPUS
    # run-1 partitions were NOT reprocessed (their lineage still run-1)
    lin2 = latest_lineage(spark.read.parquet(r2["lineage_dir"]))
    runs = {r["partition_id"]: r["run_id"] for r in lin2.collect()}
    assert all(runs[p] == "run-1" for p in done1)
    # lineage accounting: doc counts sum to corpus size
    assert sum(r["doc_count"] for r in lin2.collect()) == N_CORPUS

    # SURVEY §5 property: resume(run A ∪ run B) ≡ one single-shot run,
    # content-wise per url (not just counts)
    single = run_extraction(pages, num_partitions=16)
    resumed_sig = {
        (r["url"], r["extracted_text"]) for r in final.select("url", "extracted_text").collect()
    }
    single_sig = {
        (r["url"], r["extracted_text"]) for r in single.select("url", "extracted_text").collect()
    }
    assert resumed_sig == single_sig


def test_lineage_checksum_deterministic(spark, pages):
    ex = run_extraction(pages, num_partitions=8).cache()
    l1 = {r["partition_id"]: r["checksum"] for r in lineage_rows(ex, "a").collect()}
    l2 = {r["partition_id"]: r["checksum"] for r in lineage_rows(ex.repartition(5), "b").collect()}
    assert l1 == l2  # order-insensitive checksum
    ex.unpersist()


def test_validate_pages_quarantine(spark, pages):
    valid, quarantined = validate_pages(pages)
    assert valid.count() + quarantined.count() == N_CORPUS
    codes = {r["error_code"] for r in quarantined.select("error_code").distinct().collect()}
    assert "EMPTY_FILE" in codes
    assert "INVALID_FILE_TYPE" in codes
    # valid rows all extract without INVALID_FILE_TYPE
    ex = run_extraction(valid, num_partitions=8)
    assert ex.filter(F.col("error") == "INVALID_FILE_TYPE").count() == 0


def test_structured_parse_stage(spark, pages):
    from ocr_endpoint_project_spark.functions.kernels import parse_sections

    extracted = run_extraction(pages, num_partitions=8)
    resumes = extracted.filter(F.col("extracted_text").contains("NAME:"))
    parsed = parse_sections(resumes)
    rows = parsed.select("record.name", "record.experiences", "record.skills").collect()
    assert rows, "corpus must contain resume-grammar docs"
    for r in rows:
        assert r["name"], "segmenter must recover the name"
        assert r["experiences"] is not None
        assert r["skills"] and r["skills"][0]["items"]


def test_pages_from_documents_byte_identity(spark):
    pages_df = pages_from_documents(spark, SF_DIR)
    extracted = run_extraction(pages_df, num_partitions=8)
    golden = pages_df.select("url", F.col("text").alias("golden"))
    j = extracted.join(golden, "url")
    assert j.filter(F.col("extracted_text") != F.col("golden")).count() == 0
    assert j.count() == 500


def test_job_progress_from_lineage(spark, pages, tmp_path):
    """Progress percentages derive from the lineage table (the reference's
    per-job progress reporting, cv_api/main.py:223-301, generalized to
    partitions): 0% before any run, 100% after a full run, partial after
    a partial run."""
    from ocr_endpoint_project_spark.pipeline.lineage import (
        job_progress,
        run_with_lineage,
    )

    out = str(tmp_path / "job")
    lineage_dir = out + "/lineage"

    p0 = job_progress(spark, lineage_dir, num_partitions=8)
    assert p0["stage"] == "preparing" and p0["percent"] == 0.0

    run_with_lineage(spark, pages, out, run_id="run-1", num_partitions=8)
    p1 = job_progress(spark, lineage_dir, num_partitions=8)
    assert p1["stage"] == "completed" and p1["percent"] == 100.0
    assert p1["partitions_done"] == 8
    assert p1["docs_done"] == pages.count()

    # a lineage table with only SOME partitions succeeded reads as partial
    import pyspark.sql.functions as F

    partial_dir = str(tmp_path / "partial_lineage")
    spark.read.parquet(lineage_dir).filter(F.col("partition_id") < 4).write.parquet(
        partial_dir
    )
    p2 = job_progress(spark, partial_dir, num_partitions=8)
    assert p2["stage"] == "extracting" and 0.0 < p2["percent"] < 100.0


def test_lineage_stage_timestamps_real(spark, pages, tmp_path):
    """started_at is captured BEFORE the data write and finished_at at
    lineage-commit time (the reference records genuine per-stage timings,
    cv_api/main.py:246-256) — so the pair brackets the write instead of
    being one vacuous double current_timestamp()."""
    out = str(tmp_path / "job")
    run_with_lineage(spark, pages, out, run_id="run-1", num_partitions=8)
    rows = spark.read.parquet(out + "/lineage").collect()
    assert rows and all(r["started_at"] < r["finished_at"] for r in rows)


def test_job_progress_denominator_from_lineage(spark, pages, tmp_path):
    """A job launched with one partition count must report that count as
    the denominator even when the progress caller assumes a different
    default — partitions_total rides the lineage rows themselves."""
    from ocr_endpoint_project_spark.pipeline.lineage import job_progress

    out = str(tmp_path / "job")
    run_with_lineage(spark, pages, out, run_id="run-1", num_partitions=8)
    # caller guesses 999 partitions; lineage knows the truth
    p = job_progress(spark, out + "/lineage", num_partitions=999)
    assert p["partitions_total"] == 8
    assert p["stage"] == "completed" and p["percent"] == 100.0


def test_canonicalize_url_separator_correct(spark):
    """Round-5 fix: stripping a leading tracking param promotes the next
    param's separator ('a?utm=x&page=2' -> 'a?page=2'), a sole tracking
    param drops with its '?', and multiple tracking params all vanish."""
    from ocr_endpoint_project_spark.operators.extraction import canonicalize_url

    cases = {
        "https://h.example/a?utm_source=x&page=2": "https://h.example/a?page=2",
        "https://h.example/a?page=2&utm_source=x": "https://h.example/a?page=2",
        "https://h.example/a?utm_source=x": "https://h.example/a",
        "https://h.example/a?utm_a=1&utm_b=2&page=2": "https://h.example/a?page=2",
        "https://h.example/a?utm_a=1&ref=r": "https://h.example/a",
        "HTTPS://H.example:443/Path/?x=1#frag": "https://h.example/Path/?x=1",
    }
    rows = spark.createDataFrame([(u,) for u in cases], ["url"]).select(
        "url", canonicalize_url("url").alias("canon")
    ).collect()
    for r in rows:
        assert r.canon == cases[r.url], (r.url, r.canon)


def test_job_progress_denominator_scoped_to_counted_rows(spark, pages, tmp_path):
    """Round 5: with multiple runs sharing one lineage_dir (run_prefix
    streams), the globally newest lineage row must NOT supply the
    denominator — partitions_total comes from the same latest-succeeded
    rows that are being counted. A newer FAILED retry row carrying a
    foreign partitions_total would otherwise skew percent and stage."""
    from pyspark.sql import functions as F

    from ocr_endpoint_project_spark.pipeline.lineage import job_progress

    out = str(tmp_path / "job")
    run_with_lineage(spark, pages, out, run_id="run-1", num_partitions=8)
    lin_dir = out + "/lineage"
    # a newer failed attempt for partition 0, from a run configured with
    # a wildly different partition count
    failed = (
        spark.read.parquet(lin_dir)
        .filter(F.col("partition_id") == 0)
        .limit(1)
        .select(
            "partition_id",
            F.lit("run-2").alias("run_id"),
            "doc_count", "ok_count", "failed_count", "byte_count", "checksum",
            F.current_timestamp().alias("started_at"),
            (F.current_timestamp() + F.expr("INTERVAL 1 HOUR")).alias("finished_at"),
            F.lit(999).cast("int").alias("partitions_total"),
            F.lit("failed").alias("status"),
        )
    )
    failed.write.mode("append").parquet(lin_dir)

    p = job_progress(spark, lin_dir, num_partitions=8)
    assert p["partitions_total"] == 8  # not the foreign row's 999
    assert p["partitions_done"] == 7  # partition 0's latest row is failed
    assert p["stage"] == "extracting" and p["percent"] == 87.5
