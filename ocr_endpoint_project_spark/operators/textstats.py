"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.3 +
the training-data-pipeline text layer): token stats, quality scoring,
language-ID, fingerprinting, CER — all pure Catalyst (codegen'd, no
Python), each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._io import read_spread
from ..functions.text import (
    SQL_CER,
    SQL_NORM_TOKENS,
    SQL_SHINGLE_HASH32,
    cer_expr,
    hoist,
    norm_tokens,
    r4,
    shingle_hash32,
    stopword_hits,
    token_count,
)

# modest per-language stopword lists for the language-ID vote
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "y", "es", "un", "en"],
    "fr": ["le", "la", "de", "et", "est", "un", "dans"],
    "zh": ["的", "是", "了", "在", "和", "有", "我"],
}
LANGS = sorted(STOPWORDS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/documents.parquet")


def _sql_tokens(col: str = "text") -> str:
    return SQL_NORM_TOKENS.format(col=col)


# ---------------------------------------------------------------------------
# token stats (token counting op of the training-data layer)
# ---------------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # toks HOISTED (functions/text.hoist): four consumers per row below —
    # a plain alias would re-tokenize the text once per consumer
    toks = F.col("toks")
    return hoist(_docs(spark, sf_dir), ("doc_id",), toks=norm_tokens("text")).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        r4(
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).cast(
                "double"
            )
            / F.greatest(F.size(toks), F.lit(1))).alias("avg_token_len"),
    )


SQL_TOKEN_STATS = f"""
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       floor((CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
             / greatest(len(toks), 1)) * 10000 + 0.5) / 10000 AS avg_token_len
FROM (SELECT doc_id, {_sql_tokens()} AS toks FROM documents)
"""


# ---------------------------------------------------------------------------
# quality scoring (length / stopword-ratio / token-shape heuristics)
# ---------------------------------------------------------------------------

_QUALITY_STOPS = STOPWORDS["en"]


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # toks HOISTED: the score expression references the token array five
    # times per row (length, stop-ratio, avg-len terms)
    toks = F.col("toks")
    n = F.size(toks).cast("double")
    stop_ratio = stopword_hits(toks, _QUALITY_STOPS).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    )
    avg_len = F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)).cast(
        "double"
    ) / F.greatest(F.size(toks), F.lit(1))
    score = (
        F.least(n, F.lit(100.0)) / 100.0 * 0.4
        + (1.0 - F.least(F.abs(avg_len - 5.0) / 10.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return hoist(
        _docs(spark, sf_dir), ("doc_id", "lang"), toks=norm_tokens("text")
    ).select("doc_id", F.col("lang"), r4(score).alias("quality_score"))


_SQL_STOPS = ", ".join(f"'{s}'" for s in _QUALITY_STOPS)
SQL_QUALITY_SCORE = f"""
SELECT doc_id, lang,
       floor((least(CAST(len(toks) AS DOUBLE), 100.0) / 100.0 * 0.4
             + (1.0 - least(abs(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                                / greatest(len(toks), 1) - 5.0) / 10.0, 1.0)) * 0.3
             + least(CAST(len(list_filter(toks, t -> t IN ({_SQL_STOPS}))) AS DOUBLE)
                     / greatest(len(toks), 1) * 5.0, 1.0) * 0.3) * 10000 + 0.5) / 10000 AS quality_score
FROM (SELECT doc_id, lang, {_sql_tokens()} AS toks FROM documents)
"""


# ---------------------------------------------------------------------------
# language-ID (stopword vote, deterministic tie-break by language code)
# ---------------------------------------------------------------------------

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # toks HOISTED: the 5 per-language vote columns plus the argmax/pred
    # cascade reference it ~15x per row
    df = hoist(_docs(spark, sf_dir), ("doc_id", "lang"), toks=norm_tokens("text"))
    for lg in LANGS:
        df = df.withColumn(f"score_{lg}", stopword_hits(F.col("toks"), STOPWORDS[lg]))
    best = F.greatest(*[F.col(f"score_{lg}") for lg in LANGS])
    pred = F.lit("und")
    # first language (alphabetical) achieving the max score wins
    for lg in reversed(LANGS):
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return df.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        best.cast("bigint").alias("vote_score"),
    )


def _sql_lang_votes() -> str:
    cols = ",\n       ".join(
        "CAST(len(list_filter(toks, t -> t IN ({lst}))) AS BIGINT) AS score_{lg}".format(
            lst=", ".join(f"'{s}'" for s in STOPWORDS[lg]), lg=lg
        )
        for lg in LANGS
    )
    return cols


_case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
    f"WHEN score_{lg} = best THEN '{lg}'" for lg in LANGS
) + " ELSE 'und' END"
SQL_LANG_ID = f"""
SELECT doc_id, lang, {_case} AS pred_lang, best AS vote_score
FROM (
  SELECT doc_id, lang, greatest({", ".join("score_" + lg for lg in LANGS)}) AS best,
         {", ".join("score_" + lg for lg in LANGS)}
  FROM (
    SELECT doc_id, lang, {_sql_lang_votes()}
    FROM (SELECT doc_id, lang, {_sql_tokens()} AS toks FROM documents)
  )
)
"""


# ---------------------------------------------------------------------------
# document fingerprinting (md5 over normalized token stream)
# ---------------------------------------------------------------------------

def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.concat_ws(" ", norm_tokens("text"))).alias("fingerprint")
    )


SQL_FINGERPRINT = f"""
SELECT doc_id, md5(array_to_string({_sql_tokens()}, ' ')) AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# BPE-style pre-tokenizer counting: the GPT-2-family pretokenizer split
# (word | number | punctuation-run), RE2-compatible (no lookahead) so the
# same pattern runs in Spark and DuckDB. Whitespace-token counting lives
# in text_token_stats; the bpe/ws ratio approximates tokens-per-word
# inflation, the signal used for quality/cost budgeting.
# ---------------------------------------------------------------------------

BPE_PATTERN = r"[a-zA-Z]+(?:'[a-z]+)?|[0-9]+|[^a-zA-Z0-9\s]+"


# ---------------------------------------------------------------------------
# winnowing fingerprint (rolling-hash k-gram min-sampling, the MOSS
# scheme): hash every k-char gram of the normalized text, take the min
# hash of each w-gram window, dedup — a position-robust fingerprint SET
# whose overlap estimates local similarity (vs the whole-doc md5 above,
# which only detects exact matches). Pure Catalyst; the md5-derived gram
# hash is the repo's engine-portable hash (functions/text.py).
# ---------------------------------------------------------------------------

WINNOW_K = 5  # k-gram length (chars of the normalized token stream)
WINNOW_W = 4  # winnowing window (grams per window)


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    txt = F.concat_ws(" ", norm_tokens("text"))
    # CASE guards: Spark's sequence(1, 0) is the DESCENDING [1, 0], not
    # empty — short docs must produce empty arrays explicitly
    grams_expr = (
        f"CASE WHEN length(norm_txt) < {WINNOW_K} THEN array() "
        f"ELSE transform(sequence(1, length(norm_txt) - {WINNOW_K - 1}), "
        f"i -> conv(substring(md5(substring(norm_txt, i, {WINNOW_K})), 1, 7), 16, 10)) END"
    )
    mins_expr = (
        f"CASE WHEN size(hashes) < {WINNOW_W} THEN array() "
        f"ELSE transform(sequence(1, size(hashes) - {WINNOW_W - 1}), "
        f"i -> array_min(slice(hashes, i, {WINNOW_W}))) END"
    )
    # every stage is HOISTED: the gram lambda substrings norm_txt per
    # gram, the window lambda slices hashes per window, and the final
    # projection reads fps twice — inlined, the md5-gram pass would
    # re-run once per window element (quadratic in document length)
    df = hoist(_docs(spark, sf_dir), ("doc_id",), norm_txt=txt)
    df = hoist(df, ("doc_id",), hashes=F.expr(grams_expr).cast("array<long>"))
    df = hoist(df, ("doc_id",), fps=F.array_distinct(F.expr(mins_expr)))
    return df.select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.sort_array(F.col("fps")))).alias("fp_digest"),
    )


SQL_WINNOW = f"""
WITH t AS (
  SELECT doc_id, array_to_string({_sql_tokens()}, ' ') AS norm_txt FROM documents
), h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(norm_txt) - {WINNOW_K - 1}, 0) + 1),
             i -> CAST(('0x' || substr(md5(substr(norm_txt, i, {WINNOW_K})), 1, 7)) AS BIGINT)
         ) AS hashes
  FROM t
), m AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hashes) - {WINNOW_W - 1}, 0) + 1),
             i -> list_min(hashes[i:i + {WINNOW_W - 1}]))) AS fps
  FROM h
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       md5(array_to_string(list_sort(fps), ',')) AS fp_digest
FROM m
"""


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both token arrays HOISTED: bpe is read three times per row and ws
    # twice — a plain alias re-runs the regex scans per consumer
    bpe = F.col("bpe")
    ws = F.col("ws")
    return hoist(
        _docs(spark, sf_dir),
        ("doc_id",),
        bpe=F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0),
        ws=norm_tokens("text"),
    ).select(
        "doc_id",
        F.size(bpe).cast("bigint").alias("n_bpe_tokens"),
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        r4(
            F.size(bpe).cast("double") / F.greatest(F.size(ws), F.lit(1))
        ).alias("bpe_per_word"),
    )


_SQL_BPE = "regexp_extract_all(text, '[a-zA-Z]+(?:''[a-z]+)?|[0-9]+|[^a-zA-Z0-9\\s]+')"
SQL_BPE_TOKEN_COUNT = f"""
SELECT doc_id,
       CAST(len({_SQL_BPE}) AS BIGINT) AS n_bpe_tokens,
       CAST(len(toks) AS BIGINT) AS n_ws_tokens,
       floor((CAST(len({_SQL_BPE}) AS DOUBLE) / greatest(len(toks), 1)) * 10000 + 0.5)
           / 10000 AS bpe_per_word
FROM (SELECT doc_id, text, {_sql_tokens()} AS toks FROM documents)
"""


# ---------------------------------------------------------------------------
# CER as pure Catalyst (M3) — prediction simulated by a deterministic
# perturbation so the metric is exercised end-to-end in both engines
# ---------------------------------------------------------------------------

def q_cer(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = F.regexp_replace(F.col("text"), "e", "a")
    return _docs(spark, sf_dir).select(
        "doc_id",
        r4(cer_expr(F.col("text"), pred)).alias("cer_pct"),
    )


SQL_CER_Q = (
    "SELECT doc_id, floor(("
    + SQL_CER.format(gt="text", pred="regexp_replace(text, 'e', 'a', 'g')")
    + ") * 10000 + 0.5) / 10000 AS cer_pct FROM documents"
)


# ---------------------------------------------------------------------------
# grouped metric rollup (A3 analog over documents: per-lang averages)
# ---------------------------------------------------------------------------

def q_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = F.regexp_replace(F.col("text"), "e", "a")
    return (
        _docs(spark, sf_dir)
        .select("lang", cer_expr(F.col("text"), pred).alias("cer"), token_count("text").alias("nt"))
        .groupBy("lang")
        .agg(
            r4(F.avg("cer")).alias("avg_cer_pct"),
            r4(F.avg("nt")).alias("avg_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )


SQL_LANG_ROLLUP = (
    "SELECT lang, floor((avg("
    + SQL_CER.format(gt="text", pred="regexp_replace(text, 'e', 'a', 'g')")
    + ")) * 10000 + 0.5) / 10000 AS avg_cer_pct, floor((avg(len("
    + _sql_tokens()
    + "))) * 10000 + 0.5) / 10000 AS avg_tokens, count(*) AS n_docs FROM documents GROUP BY lang"
)


# ---------------------------------------------------------------------------
# Gopher-style repetition filter: fraction-of-repetition signals that a
# web-scale pretraining pipeline rejects documents on (boilerplate spam,
# keyword stuffing, navigation loops). Token-count fractions rather than
# character fractions, with documented thresholds; keep decision computed
# over the SAME r4-quantized values in both engines so rounding-boundary
# rows can never flip the boolean across engines.
# ---------------------------------------------------------------------------

REP_TOP_TOKEN_MAX = 0.30   # most frequent token may cover <= 30% of tokens
REP_DUP_2GRAM_MAX = 0.20   # <= 20% of bigrams may be repeats
REP_DUP_3GRAM_MAX = 0.18   # <= 18% of trigrams may be repeats


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_ngrams

    # toks HOISTED (the n-gram lambdas slice it per element), then the
    # gram arrays hoisted too (dup_frac reads each three times per row)
    docs = hoist(_docs(spark, sf_dir), ("doc_id",), toks=norm_tokens("text"))
    # top-token count via explode -> groupBy: the 100-TB shape (keyed
    # shuffle with map-side partial counts), not an O(n^2) per-doc HOF
    top = (
        docs.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"))
    )

    def dup_frac(grams):
        n = F.size(grams)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(grams)).cast("double") / n
        )

    docs = hoist(
        docs,
        ("doc_id", "toks"),
        g2=word_ngrams(F.col("toks"), 2),
        g3=word_ngrams(F.col("toks"), 3),
    )
    g2 = F.col("g2")
    g3 = F.col("g3")
    base = docs.join(top, "doc_id", "left").select(
        "doc_id",
        r4(
            F.coalesce(F.col("top_cnt"), F.lit(0)).cast("double")
            / F.greatest(F.size("toks"), F.lit(1))
        ).alias("top_token_frac"),
        r4(dup_frac(g2)).alias("dup_2gram_frac"),
        r4(dup_frac(g3)).alias("dup_3gram_frac"),
    )
    return base.select(
        "doc_id",
        "top_token_frac",
        "dup_2gram_frac",
        "dup_3gram_frac",
        (
            (F.col("top_token_frac") <= REP_TOP_TOKEN_MAX)
            & (F.col("dup_2gram_frac") <= REP_DUP_2GRAM_MAX)
            & (F.col("dup_3gram_frac") <= REP_DUP_3GRAM_MAX)
        ).alias("keep_repetition"),
    )


def _sql_ngrams(n: int) -> str:
    return (
        f"list_transform(range(0, greatest(len(toks) - {n - 1}, 0)), "
        f"i -> array_to_string(toks[i+1:i+{n}], ' '))"
    )


SQL_REPETITION = f"""
WITH toks AS (SELECT doc_id, {_sql_tokens()} AS toks FROM documents),
top AS (
  SELECT doc_id, max(cnt) AS top_cnt
  FROM (SELECT doc_id, t, count(*) AS cnt
        FROM (SELECT doc_id, unnest(toks) AS t FROM toks) GROUP BY 1, 2)
  GROUP BY 1
),
fr AS (
  SELECT t.doc_id,
         floor((CAST(coalesce(top_cnt, 0) AS DOUBLE) / greatest(len(toks), 1)) * 10000 + 0.5) / 10000 AS top_token_frac,
         floor((CASE WHEN len({_sql_ngrams(2)}) <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct({_sql_ngrams(2)})) AS DOUBLE) / len({_sql_ngrams(2)}) END) * 10000 + 0.5) / 10000 AS dup_2gram_frac,
         floor((CASE WHEN len({_sql_ngrams(3)}) <= 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct({_sql_ngrams(3)})) AS DOUBLE) / len({_sql_ngrams(3)}) END) * 10000 + 0.5) / 10000 AS dup_3gram_frac
  FROM toks t LEFT JOIN top USING (doc_id)
)
SELECT doc_id, top_token_frac, dup_2gram_frac, dup_3gram_frac,
       (top_token_frac <= {REP_TOP_TOKEN_MAX}
        AND dup_2gram_frac <= {REP_DUP_2GRAM_MAX}
        AND dup_3gram_frac <= {REP_DUP_3GRAM_MAX}) AS keep_repetition
FROM fr
"""


# ---------------------------------------------------------------------------
# PII scrub: redact emails / phone-like tokens before training — the
# standard web-scale hygiene transform. The corpus has no PII, so the
# query INJECTS deterministic PII from (doc_id, source) in Catalyst
# (the repo's kernel-query pattern) and the oracle predicts both the
# redaction counts and the scrubbed text byte-for-byte.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.-]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact doc"),
        F.col("doc_id"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com or 555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )
    docs = _docs(spark, sf_dir).select("doc_id", pii_text.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        scrubbed.alias("scrubbed_text"),
    )


SQL_PII_SCRUB = f"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact doc' || doc_id || '@' || source || '.example.com or 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed_text
FROM pii
"""


# ---------------------------------------------------------------------------
# model-based quality filtering (round 5): a fastText-style HASHED LINEAR
# classifier — the filtering idiom CCNet/LLaMA-class pipelines use
# alongside heuristics (text_quality_score covers the heuristic half).
# Every token hashes into a 28-bit feature id whose weight is derived
# deterministically from the hash (w = h % 2001 - 1000, i.e. a fixed
# random-projection weight vector that needs no side table), the logit is
# the exact-integer sum of token weights, and keep = logit > 0. Shape:
# pure map-side Catalyst HOF — ZERO shuffles, codegen'd, embarrassingly
# parallel at any corpus size; a real trained weight table would swap in
# as a broadcast join on the same feature ids.
# ---------------------------------------------------------------------------

_HLS_MOD = 2001
_HLS_HALF = 1000


def q_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # toks HOISTED: referenced by the weight transform and two size()
    # consumers per row
    toks = F.col("toks")
    weights = F.transform(
        toks, lambda t: shingle_hash32(t) % _HLS_MOD - _HLS_HALF
    )
    base = hoist(_docs(spark, sf_dir), ("doc_id",), toks=norm_tokens("text"))
    # second hoist: logit (an md5 per token) has three consumers below
    base = hoist(
        base,
        ("doc_id",),
        n=F.size(toks),
        logit=F.aggregate(weights, F.lit(0).cast("long"), lambda acc, v: acc + v),
    )
    n, logit = F.col("n"), F.col("logit")
    return base.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        logit.alias("logit"),
        F.when(
            n > 0, r4(logit.cast("double") / (n * F.lit(_HLS_HALF)))
        ).alias("quality_score"),
        (logit > 0).alias("keep"),
    )


SQL_HASHED_LINEAR = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(coalesce(list_sum(list_transform(tk,
             t -> {SQL_SHINGLE_HASH32.format(s='t')} % {_HLS_MOD} - {_HLS_HALF})), 0)
              AS BIGINT) AS logit
  FROM (SELECT doc_id, {{tokens}} AS tk FROM documents)
)
SELECT doc_id, n_tokens, logit,
       CASE WHEN n_tokens > 0
            THEN floor((CAST(logit AS DOUBLE) / (n_tokens * {_HLS_HALF}))
                       * 10000 + 0.5) / 10000 END AS quality_score,
       logit > 0 AS keep
FROM scored
""".format(tokens=_sql_tokens())


QUERIES = {
    "text_token_stats": q_token_stats,
    "text_quality_score": q_quality_score,
    "text_hashed_linear_score": q_hashed_linear_score,
    "text_lang_id": q_lang_id,
    "text_fingerprint": q_fingerprint,
    "text_bpe_token_count": q_bpe_token_count,
    "text_winnow_fingerprint": q_winnow_fingerprint,
    "text_repetition_filter": q_repetition_filter,
    "text_pii_scrub": q_pii_scrub,
    "metric_cer": q_cer,
    "metric_lang_rollup": q_lang_rollup,
}

ORACLES = {
    "text_token_stats": SQL_TOKEN_STATS,
    "text_quality_score": SQL_QUALITY_SCORE,
    "text_hashed_linear_score": SQL_HASHED_LINEAR,
    "text_lang_id": SQL_LANG_ID,
    "text_fingerprint": SQL_FINGERPRINT,
    "text_bpe_token_count": SQL_BPE_TOKEN_COUNT,
    "text_winnow_fingerprint": SQL_WINNOW,
    "text_repetition_filter": SQL_REPETITION,
    "text_pii_scrub": SQL_PII_SCRUB,
    "metric_cer": SQL_CER_Q,
    "metric_lang_rollup": SQL_LANG_ROLLUP,
}
