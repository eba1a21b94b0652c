"""Shared reader for operator modules: spread small inputs on read.

A single small parquet file scans as ONE partition (maxPartitionBytes
splitting is per-file), serializing every first stage onto one core. At
100 TB inputs arrive as thousands of splits and this is a no-op; at
bench/test scale the round-robin repartition unlocks all cores for one
tiny shuffle. The check is plan-side only (no data read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_spread(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return df
