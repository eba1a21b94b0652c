"""Incremental extraction with Structured Streaming.

The reference's async-job surface (``POST /v1/jobs`` + poll,
``cv_api/main.py:407-451``) maps to a file-arrival stream: new page
files land in a directory, each micro-batch runs the SAME salted
extraction pipeline, and the checkpoint gives exactly-once per input
file — the streaming twin of the batch lineage/resume in
``pipeline/lineage.py``. ``Trigger.AvailableNow`` drains the backlog and
stops, which is the "job" execution mode; leaving the trigger default
gives a continuous service.

The batch and streaming paths share ``run_extraction`` verbatim — one
code path to keep byte-identity guarantees in both modes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.extract import DEFAULT_PARTITIONS, run_extraction
from ..schemas import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_partitions: int = DEFAULT_PARTITIONS,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the incremental extraction stream (parquet in -> parquet out).

    ``max_files_per_trigger`` bounds per-batch input (the streaming analog
    of the bounded Arrow batches) so a backlog of 10^6 files never turns
    into one giant micro-batch.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.parquet(input_dir)

    extracted = run_extraction(pages, num_partitions=num_partitions)

    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
