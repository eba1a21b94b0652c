"""Custom stateful streaming operator: running per-language corpus
totals across micro-batches via ``applyInPandasWithState``.

The reference's long-lived job counters (``cv_api/main.py:246-256`` keeps
cumulative doc/page/cost tallies per job in process memory) become
checkpointed GROUP STATE: totals survive restarts because the state store
is part of the streaming checkpoint, not the driver process.

Scale shape: state is keyed by ``lang`` (bounded cardinality), each
micro-batch shuffles only (lang) partial aggregates to the state
partitions, and the emitted rows are update-mode deltas — O(distinct
langs) per batch regardless of corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import PAGES_SCHEMA

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def _update_lang_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update function: fold this batch's per-lang rows into the
    running totals and emit the new totals (update-mode delta)."""
    n_docs, total_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_docs += len(pdf)
        total_bytes += int(pdf["doc_bytes"].sum())
    state.update((n_docs, total_bytes))
    yield pd.DataFrame(
        {"lang": [key[0]], "n_docs": [n_docs], "total_bytes": [total_bytes]}
    )


def stream_lang_totals(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Running (lang -> docs, bytes) totals over a stream of page files.

    Each micro-batch emits the UPDATED totals per language seen in the
    batch; the final tally per lang is the latest row (the repo's
    latest-snapshot idiom). Restarts continue from checkpointed state —
    the streaming twin of lineage-based batch resume.
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    per_doc = pages.select(
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("doc_bytes"),
    )
    totals = per_doc.groupBy("lang").applyInPandasWithState(
        _update_lang_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    writer = (
        totals.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_lang_totals(spark: SparkSession, out_dir: str):
    """Latest emitted totals per lang (W1 idiom over the update stream)."""
    from pyspark.sql import Window

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("lang").orderBy(F.desc("batch_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
