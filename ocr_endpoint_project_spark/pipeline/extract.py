"""Flagship extraction job: salted url-hash repartition -> Arrow kernel.

Physical plan (SURVEY.md §4):

    scan pages (column-pruned: url, warc_ts, html, lang)
    -> Project partition_id = pmod(xxhash64(url), P)       (data-derived)
    -> [left-anti join lineage.succeeded]                  (resume, J6)
    -> Exchange hashpartitioning(partition_id, P)          (skew-defeating)
    -> MapInPandas extract_batch (bounded Arrow batches)
    -> Project (html dropped — blobs never survive the kernel)

Scale notes: the partition key is the 64-bit hash of the FULL url
(``xxhash64``), so a host contributing 30% of documents still spreads
uniformly across all P partitions — host-level skew cannot concentrate
(north_rule salting requirement). ``salt_buckets`` adds a second-level
salt for the pathological case of many rows sharing one url (recrawls).
The blob column is projected away immediately after the kernel, so no
shuffle ever moves document bytes again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import extract_batch
from ..schemas import EXTRACTED_SCHEMA

DEFAULT_PARTITIONS = 64

# per-page processing cost (reference pricing model, ocr_common.py:345-346)
COST_PER_PAGE_USD = 0.002


def salted_pages(
    pages: DataFrame, num_partitions: int = DEFAULT_PARTITIONS, salt_buckets: int = 1
) -> DataFrame:
    """Tag rows with a stable logical ``partition_id`` and spread them.

    ``partition_id = pmod(xxhash64(url [, salt]), P)`` — deterministic
    from the data (NOT the scheduler), so lineage rows keyed by it
    survive restarts. The PHYSICAL exchange hashes the raw 64-bit key
    (north_rule: "salts and repartitions on a 64-bit url hash"), not the
    modded id: hashing P distinct ids into P buckets collides
    birthday-style (measured 4.0x max/median task time on 64/64 —
    round-6 partition_skew probe), while the raw key spreads binomially
    (~1.05x). Logical grouping for the file-per-partition sink is
    restored by a cheap blob-free re-cluster at write time
    (lineage.run_with_lineage).
    """
    if salt_buckets > 1:
        key = F.xxhash64(F.col("url"), F.pmod(F.xxhash64(F.col("warc_ts")), F.lit(salt_buckets)))
    else:
        key = F.xxhash64(F.col("url"))
    tagged = pages.withColumn(
        "partition_id", F.pmod(key, F.lit(num_partitions)).cast("int")
    )
    return tagged.repartition(num_partitions, key)


def run_extraction(
    pages: DataFrame,
    num_partitions: int = DEFAULT_PARTITIONS,
    salt_buckets: int = 1,
    done_partitions: DataFrame | None = None,
) -> DataFrame:
    """pages -> extracted DataFrame (EXTRACTED_SCHEMA).

    ``done_partitions``: optional single-column ``partition_id`` frame of
    already-succeeded partitions (checkpoint resume, J6) — removed with a
    broadcast left-anti join before any extraction work happens.
    """
    cols = [c for c in ("url", "warc_ts", "html", "text", "lang") if c in pages.columns]
    df = salted_pages(pages.select(*cols), num_partitions, salt_buckets)
    if done_partitions is not None:
        df = df.join(
            F.broadcast(done_partitions.select("partition_id").distinct()),
            "partition_id",
            "left_anti",
        )
    extracted = df.select("url", "warc_ts", "lang", "html", "partition_id").mapInPandas(
        extract_batch, EXTRACTED_SCHEMA
    )
    # O8 cost accounting (reference: ocr_common.py:345-346, cost = pages *
    # $0.002) — a Catalyst column, not kernel Python: the cost model is
    # pure arithmetic over n_pages, so it stays in codegen
    return extracted.withColumn(
        "cost_usd", F.coalesce(F.col("n_pages"), F.lit(0)) * F.lit(COST_PER_PAGE_USD)
    )
