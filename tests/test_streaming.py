"""Structured Streaming incremental extraction: exactly-once per input
file via checkpoint, byte-identity preserved through the stream path."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_endpoint_project_spark.sources.pages import corpus_pages
from ocr_endpoint_project_spark.streaming import stream_extract


def _await(q):
    q.awaitTermination(120)


def test_stream_extract_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    all_pages = corpus_pages(spark, n=60, seed=42).cache()
    batch1 = all_pages.filter(F.col("warc_ts") < F.lit("2024-01-01 00:00:30"))
    batch2 = all_pages.filter(F.col("warc_ts") >= F.lit("2024-01-01 00:00:30"))

    # batch 1 arrives, stream drains it (availableNow) and stops
    batch1.write.mode("append").parquet(in_dir)
    _await(stream_extract(spark, in_dir, out_dir, ckpt, num_partitions=8))
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == batch1.count()

    # batch 2 arrives; restart processes ONLY the new files (checkpoint)
    batch2.write.mode("append").parquet(in_dir)
    _await(stream_extract(spark, in_dir, out_dir, ckpt, num_partitions=8))
    out = spark.read.parquet(out_dir)
    assert out.count() == 60
    assert out.select("url").distinct().count() == 60  # exactly-once

    # byte identity holds through the streaming path
    golden = all_pages.select("url", F.col("text").alias("golden"))
    j = out.join(golden, "url").filter(F.col("golden") != "")
    assert j.filter(F.col("extracted_text") != F.col("golden")).count() == 0

    # a third restart with no new input is a no-op
    _await(stream_extract(spark, in_dir, out_dir, ckpt, num_partitions=8))
    assert spark.read.parquet(out_dir).count() == 60
    all_pages.unpersist()
