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


# ---------------------------------------------------------------------------
# the closed crawl loop (r7): crawled pages -> KERNEL link extraction ->
# resolve + canonicalize -> candidate frontier -> dedup against the
# already-crawled url set -> polite per-host fetch slots. This is the
# full acquisition cycle of a web-scale corpus pipeline running on the
# engine's own extraction output — no synthesized link column anywhere.
# Scale shape: link rollup is a map-side-combinable groupBy on the
# canonical target url; the crawled-set dedup is one anti-join keyed on
# url (both sides partition on the join key); scheduling is a per-host
# window (host cardinality = parallelism axis, same as the frontier
# above). The oracle rebuilds every step from the page construction.
# ---------------------------------------------------------------------------


def q_web_crawl_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .extraction import extracted_link_edges
    from ..pipeline.extract import run_extraction
    from ..sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    extracted = run_extraction(pages, num_partitions=16)
    # candidate targets: kernel-extracted, resolved, canonicalized,
    # self-host links already filtered
    cand = (
        extracted_link_edges(extracted)
        .groupBy(
            F.col("canonical").alias("target_url"), F.col("dst_host").alias("host")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_links"))
    )
    crawled = pages.select(F.col("url").alias("target_url"))
    frontier = cand.join(crawled, "target_url", "left_anti")
    # politeness: same robots-derived per-host delay as the frontier query
    src_name = F.regexp_replace("host", r"\.example$", "")
    delay = (
        shingle_hash32(F.concat(F.lit("robots|"), src_name)) % 5 + 1
    ).cast("bigint")
    w = Window.partitionBy("host").orderBy(
        shingle_hash32(F.concat(F.lit("order|"), F.col("target_url"))),
        "target_url",
    )
    return frontier.select(
        "target_url",
        "host",
        "n_links",
        delay.alias("crawl_delay_s"),
        ((F.row_number().over(w).cast("bigint") - 1) * delay).alias("fetch_slot_s"),
    )


def _sql_crawl_loop() -> str:
    from .extraction import _SQL_LINK_T

    delay = (
        SQL_SHINGLE_HASH32.format(s="'robots|' || replace(host, '.example', '')")
        + " % 5 + 1"
    )
    order_h = SQL_SHINGLE_HASH32.format(s="'order|' || target_url")
    return f"""
WITH t AS (
  {_SQL_LINK_T.format(h=1, p=1000)}
  UNION ALL
  {_SQL_LINK_T.format(h=2, p=2000)}
  UNION ALL
  {_SQL_LINK_T.format(h=1, p=1000)}
), cand AS (
  SELECT canonical AS target_url, dst_host AS host,
         CAST(count(*) AS BIGINT) AS n_links
  FROM t WHERE src_host != dst_host
  GROUP BY 1, 2
), frontier AS (
  SELECT * FROM cand
  WHERE target_url NOT IN (
    SELECT 'https://' || source || '.example/doc/' || doc_id FROM documents
  )
)
SELECT target_url, host, n_links,
       CAST({delay} AS BIGINT) AS crawl_delay_s,
       (CAST(row_number() OVER (
            PARTITION BY host ORDER BY {order_h}, target_url) AS BIGINT) - 1)
           * CAST({delay} AS BIGINT) AS fetch_slot_s
FROM frontier
"""


def _oracles() -> dict:
    return {
        "web_robots_frontier": SQL_WEB_ROBOTS_FRONTIER,
        "web_crawl_loop": _sql_crawl_loop(),
    }


QUERIES = {
    "web_robots_frontier": q_web_robots_frontier,
    "web_crawl_loop": q_web_crawl_loop,
}

ORACLES = _oracles()
