"""Pages-table builders: from the synthetic corpus and from the driver's
``documents`` parquet (for entry/bench/oracle runs on /root/testdata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PAGES_SCHEMA
from .corpus import generate_corpus

# Deterministic HTML wrapper used to turn a `documents` row into a page
# payload IN CATALYST (no Python in the loop). The main-content block is
# the document text; chrome around it must be stripped by the extractor.
# Because document texts are single-spaced word sequences, whitespace
# collapse is the identity and extracted_text == text byte-for-byte.
_PRE = (
    "<!DOCTYPE html><html><head><title>d</title><script>var x=1;</script></head>"
    "<body><nav><ul><li><a href='/'>Home</a></li><li><a href='/c'>Contact</a></li></ul></nav>"
    "<header><h1><a href='/'>Banner Headline Of The Site</a></h1></header>"
    "<main><article><p>"
)
_POST = (
    "</p></article></main>"
    "<div><p><a href='/share'>Share this article with everyone</a></p></div>"
    "<footer><p>Copyright 2024 Example Corp. All rights reserved.</p></footer>"
    "</body></html>"
)

# cross-host "related" links (round 7): three absolute <a href> targets
# derived in Catalyst from doc_id, so the kernel-extracted link graph
# (operators/extraction.q_web_link_graph, trainprep.q_web_host_pagerank)
# has a closed-form DuckDB twin. The third link duplicates the first
# with a tracking param — canonicalize_url must collapse them. The list
# items are pure anchor text (link density 1.0 > 0.35), so the block is
# scored OUT of extracted_text and byte-identity is untouched.
_LINK_HOSTS_MOD = 20   # documents.source is src0..src19
_LINK_PATH_MOD = 100000


def _link_target(k: int, utm: bool = False):
    host = F.pmod(F.col("doc_id") * 7 + F.lit(k), F.lit(_LINK_HOSTS_MOD))
    path = F.pmod(
        F.col("doc_id") * 31 + F.lit(k * 1000), F.lit(_LINK_PATH_MOD)
    )
    url = F.concat(
        F.lit("https://src"), host.cast("string"),
        F.lit(".example/doc/"), path.cast("string"),
    )
    return F.concat(url, F.lit("?utm_source=feed")) if utm else url


def _related_links_html():
    return F.concat(
        F.lit("<div><ul><li><a href='"), _link_target(1),
        F.lit("'>Related story one follow</a></li><li><a href='"), _link_target(2),
        F.lit("'>Related story two follow</a></li><li><a href='"),
        _link_target(1, utm=True),
        F.lit("'>Related story three follow</a></li></ul></div>"),
    )


def corpus_pages(
    spark: SparkSession, n: int = 200, seed: int = 42, richness: int = 1
) -> DataFrame:
    """Synthetic corpus rows (sources/corpus.py) as a pages DataFrame."""
    rows = [
        (r.url, r.warc_ts, r.html, r.text, r.lang)
        for r in generate_corpus(n=n, seed=seed, richness=richness)
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def cached_corpus_pages(
    spark: SparkSession,
    cache_dir: str,
    n: int = 5000,
    seed: int = 42,
    replicas: int = 1,
    richness: int = 1,
) -> DataFrame:
    """Mixed html/pdf/png corpus as parquet (generated once, cached), then
    optionally fanned out xreplicas in Catalyst with distinct urls — the
    bench input: realistic payload mix, parquet scan path, any size."""
    import os

    from .corpus import CORPUS_VERSION

    path = os.path.join(
        cache_dir, f"pages_v{CORPUS_VERSION}_n{n}_s{seed}_r{richness}.parquet"
    )
    if not os.path.isdir(path):
        # 64 files so the scan+explode stage parallelizes at any core count
        # (8 files capped the stage at 8 tasks -> Amdahl at local[32]).
        # Build into a private dir and publish with an atomic rename: two
        # racing bench processes used to interleave writes into one cache
        # dir (mode=overwrite is not mutual exclusion), which polluted
        # the v5 cache with 1,406 duplicated rows — see BENCH/BASELINE.md
        # round-7 corpus accounting note.
        import shutil

        tmp = f"{path}.build-{os.getpid()}"
        corpus_pages(spark, n=n, seed=seed, richness=richness).repartition(64).write.mode(
            "overwrite"
        ).parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race: reuse theirs
    pages = spark.read.parquet(path)
    if replicas <= 1:
        return pages
    return pages.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    ).select(
        F.concat(F.col("url"), F.lit("#"), F.col("rep")).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a pages table from ``{sf_dir}/documents.parquet``.

    Pure Catalyst (concat + cast to binary): url from (source, doc_id),
    warc_ts from a fixed epoch + doc_id seconds, payload = deterministic
    HTML wrapping of the text, golden text = the text itself.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/doc/"), F.col("doc_id")).alias(
            "url"
        ),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id"))).alias(
            "warc_ts"
        ),
        F.concat(
            F.lit(_PRE), F.col("text"), F.lit("</p>"), _related_links_html(),
            F.lit("<p>"), F.lit(_POST)
        ).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def pages_from_warc_blobs(
    blobs: DataFrame, blob_col: str = "warc", tolerant: bool = False
) -> DataFrame:
    """WARC segment blobs -> pages DataFrame (round 5).

    Input: a DataFrame with one ``.warc``/``.warc.gz`` segment's bytes
    per row (``blob_col`` binary) — the shape a Common-Crawl manifest
    read produces. Each blob parses independently inside an Arrow batch
    kernel (``sources/warc.pages_rows_from_warc``): embarrassingly
    parallel, no shuffle; the output is the engine's ``pages`` contract
    (golden ``text`` is null — real crawl data has no golden column) and
    feeds ``pipeline.extract.run_extraction`` directly, which salts and
    repartitions downstream.
    """
    import pandas as pd

    from .warc import pages_rows_from_warc

    def _parse(it):
        for batch in it:
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for blob in batch[blob_col]:
                for url, ts, body, lang in pages_rows_from_warc(
                    bytes(blob), tolerant=tolerant
                ):
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(body)
                    out["text"].append(None)
                    out["lang"].append(lang)
            yield pd.DataFrame(out)

    return blobs.mapInPandas(_parse, PAGES_SCHEMA)


def pages_from_warc_dir(
    spark: SparkSession, path: str, glob: str = "*.warc.gz", tolerant: bool = True
) -> DataFrame:
    """A directory (or object-store prefix) of WARC segments -> pages.

    This is the shape a real Common-Crawl drop has: thousands of
    ``.warc.gz`` segment files under one prefix. Spark's ``binaryFile``
    source lists the tree and spreads ONE FILE PER ROW across executors
    (no driver listing loop, so a 10^5-segment crawl fans out exactly
    like any other scan); each segment then parses independently via
    :func:`pages_from_warc_blobs` — embarrassingly parallel, zero
    shuffle before the extraction exchange.

    ``tolerant=True`` (the crawl default) makes a damaged segment
    degrade to its intact record prefix instead of failing the job —
    real crawl tails contain truncated members (the reference's
    one-file-at-a-time upload path quarantines bad files the same way,
    cv_api/main.py:322-348; here the unit is the segment).
    """
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(F.col("content").alias("warc"))
    )
    return pages_from_warc_blobs(blobs, tolerant=tolerant)
