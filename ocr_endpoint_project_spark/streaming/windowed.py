"""Event-time windowed aggregation with watermarks: crawl-throughput
rollups that tolerate out-of-order page arrival and DROP too-late data
deterministically.

Web-scale rationale: pages arrive ordered by fetch completion, not by
``warc_ts``; a per-window doc/byte rollup must wait for stragglers
(watermark lag) but cannot hold state forever. Append output mode emits
each window exactly once, when the watermark passes its end — so the
results table is immutable history, the same contract as the lineage
table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schemas import PAGES_SCHEMA

DEFAULT_WINDOW = "1 minute"
DEFAULT_LATENESS = "30 seconds"


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = DEFAULT_WINDOW,
    max_lateness: str = DEFAULT_LATENESS,
    available_now: bool = True,
) -> StreamingQuery:
    """Tumbling event-time windows over ``warc_ts`` with a watermark.

    Emits (window_start, window_end, lang, n_docs, total_bytes) rows in
    APPEND mode: a window row appears exactly once, after the watermark
    (max event time seen minus ``max_lateness``) passes the window end;
    events arriving later than the watermark are dropped by the engine.
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    agg = (
        pages.withWatermark("warc_ts", max_lateness)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.length("html"), F.lit(0))).alias("total_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_docs",
            "total_bytes",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
