"""Crawl-side web operators: robots.txt policy parsing and polite
frontier scheduling — the acquisition end of a web-scale corpus pipeline
(the reference ingests uploads, `cv_api/main.py:322-348`; a Common-Crawl
scale deployment ingests a crawl frontier, so the engine carries the
crawl-policy layer too).

Pure Catalyst: the per-host robots.txt TEXT is synthesized in the query
(no external fetches in the sandbox), then genuinely PARSED back with
regexp_extract — crawl delay and disallow prefix are read from the
robots body, not from the construction — so the parse path is what the
oracle checks. Scheduling is a per-host window (host cardinality is the
parallelism axis at web scale; no global ordering anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._io import read_spread
from ..functions.text import SQL_SHINGLE_HASH32, shingle_hash32


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/documents.parquet")


# every host serves the same robots GRAMMAR with a host-specific delay;
# a tenth of paths live under the disallowed prefix
_PRIVATE_MOD = 7


def q_web_robots_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    host = F.concat(F.col("source"), F.lit(".example"))
    path = F.when(
        F.col("doc_id") % _PRIVATE_MOD == 0,
        F.concat(F.lit("/private/doc/"), F.col("doc_id")),
    ).otherwise(F.concat(F.lit("/doc/"), F.col("doc_id")))
    # per-host robots.txt body (crawl delay derived from the host hash)
    delay = shingle_hash32(F.concat(F.lit("robots|"), F.col("source"))) % 5 + 1
    robots = F.concat(
        F.lit("User-agent: *\nCrawl-delay: "),
        delay.cast("string"),
        F.lit("\nDisallow: /private/\n"),
    )
    base = docs.select(
        "doc_id",
        host.alias("host"),
        path.alias("path"),
        robots.alias("robots_txt"),
    )
    # the PARSE: read the policy back out of the robots body
    parsed = base.select(
        "doc_id",
        "host",
        "path",
        F.regexp_extract("robots_txt", r"\nCrawl-delay: (\d+)", 1)
        .cast("bigint")
        .alias("crawl_delay_s"),
        F.regexp_extract("robots_txt", r"\nDisallow: ([^\n]+)", 1).alias(
            "disallow_prefix"
        ),
    )
    allowed = ~F.col("path").startswith(F.col("disallow_prefix"))
    # rank only within (host, allowed): denied urls must not leave holes
    # in the fetch schedule
    w = Window.partitionBy("host", "allowed").orderBy(
        shingle_hash32(F.concat(F.lit("order|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        parsed.withColumn("allowed", allowed)
        .withColumn(
            "fetch_slot_s",
            F.when(
                F.col("allowed"),
                (
                    F.row_number().over(w).cast("bigint") - 1
                ) * F.col("crawl_delay_s"),
            ),
        )
        .select(
            "doc_id", "host", "path", "crawl_delay_s", "allowed", "fetch_slot_s"
        )
    )


_SQL_DELAY = (
    SQL_SHINGLE_HASH32.format(s="'robots|' || source") + " % 5 + 1"
)
_SQL_ORDER_H = SQL_SHINGLE_HASH32.format(
    s="'order|' || CAST(doc_id AS VARCHAR)"
)

SQL_WEB_ROBOTS_FRONTIER = f"""
WITH base AS (
  SELECT doc_id,
         source || '.example' AS host,
         CASE WHEN doc_id % {_PRIVATE_MOD} = 0
              THEN '/private/doc/' || doc_id
              ELSE '/doc/' || doc_id END AS path,
         'User-agent: *' || chr(10) || 'Crawl-delay: '
             || CAST({_SQL_DELAY} AS VARCHAR)
             || chr(10) || 'Disallow: /private/' || chr(10) AS robots_txt
  FROM documents
), parsed AS (
  SELECT doc_id, host, path,
         CAST(regexp_extract(robots_txt, '\\nCrawl-delay: (\\d+)', 1) AS BIGINT)
             AS crawl_delay_s,
         regexp_extract(robots_txt, '\\nDisallow: ([^\\n]+)', 1) AS disallow_prefix
  FROM base
)
SELECT doc_id, host, path, crawl_delay_s,
       NOT starts_with(path, disallow_prefix) AS allowed,
       CASE WHEN NOT starts_with(path, disallow_prefix) THEN
         (CAST(row_number() OVER (
             PARTITION BY host, starts_with(path, disallow_prefix)
             ORDER BY {_SQL_ORDER_H}, doc_id) AS BIGINT) - 1) * crawl_delay_s
       END AS fetch_slot_s
FROM parsed
"""


QUERIES = {
    "web_robots_frontier": q_web_robots_frontier,
}

ORACLES = {
    "web_robots_frontier": SQL_WEB_ROBOTS_FRONTIER,
}
