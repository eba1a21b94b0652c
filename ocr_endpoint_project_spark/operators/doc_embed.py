"""Document embeddings from text (hash projection) + doc-level ANN.

A deterministic feature-hashing embedder: each token hashes to a point in
a D-dimensional pseudo-random projection (one universal hash per
dimension), the document vector is the sum over its token multiset. This
is the classic hashing-trick embedding — no model needed, fully
engine-portable, so the whole text -> embedding -> cosine-top-k path is
oracle-checked against DuckDB end-to-end.

Engine-exactness: per-dimension sums are computed over INTEGER hash
values (exact in any order, functions/text.py discipline) and converted
to centered doubles only at the end, so Spark and DuckDB produce
bit-identical vectors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._io import read_spread
from ..functions.text import SQL_NORM_TOKENS, SQL_SHINGLE_HASH32, norm_tokens, r4, shingle_hash32

EMBED_DIM = 8
# one universal-hash permutation per dimension: ((h*a + b) % P)
DIM_PERMS = [(2663, 17), (3371, 131), (4093, 241), (4931, 379), (5641, 487), (6373, 599), (7109, 691), (7919, 809)]
EMBED_P = 1048573  # prime < 2^20: products stay far from int64 overflow
N_QUERY_DOCS = 10
TOP_K = 3


def _docs(spark, sf_dir):
    return read_spread(spark, f"{sf_dir}/documents.parquet")


def _vectors_df(spark, sf_dir):
    """doc_id -> e0..e{D-1}: centered hash-projection sums over tokens."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(norm_tokens("text")).alias("t"))
        .select("doc_id", shingle_hash32(F.col("t")).alias("h"))
    )
    aggs = [
        F.sum((F.col("h") * a + b) % EMBED_P).alias(f"s{j}")
        for j, (a, b) in enumerate(DIM_PERMS)
    ] + [F.count(F.lit(1)).alias("n_toks")]
    sums = toks.groupBy("doc_id").agg(*aggs)
    dims = [
        (F.col(f"s{j}").cast("double") / EMBED_P - 0.5 * F.col("n_toks")).alias(f"e{j}")
        for j in range(EMBED_DIM)
    ]
    return sums.select("doc_id", *dims)


def _sql_vectors() -> str:
    h = SQL_SHINGLE_HASH32.format(s="t")
    sums = ", ".join(
        f"sum(({h} * {a} + {b}) % {EMBED_P}) AS s{j}" for j, (a, b) in enumerate(DIM_PERMS)
    )
    dims = ", ".join(
        f"CAST(s{j} AS DOUBLE) / {EMBED_P} - 0.5 * n_toks AS e{j}" for j in range(EMBED_DIM)
    )
    return f"""
  SELECT doc_id, {dims}
  FROM (
    SELECT doc_id, {sums}, count(*) AS n_toks
    FROM (SELECT doc_id, unnest({SQL_NORM_TOKENS.format(col='text')}) AS t FROM documents)
    GROUP BY doc_id
  )"""


def q_doc_embed_vectors(spark, sf_dir):
    v = _vectors_df(spark, sf_dir)
    return v.select("doc_id", *[r4(F.col(f"e{j}")).alias(f"e{j}") for j in range(EMBED_DIM)])


SQL_DOC_EMBED = (
    "SELECT doc_id, "
    + ", ".join(
        f"floor((e{j}) * 10000 + 0.5) / 10000 AS e{j}" for j in range(EMBED_DIM)
    )
    + " FROM (" + _sql_vectors() + "\n)"
)


def q_doc_embed_topk(spark, sf_dir):
    """Doc-level ANN: cosine top-k over the hash-projection vectors."""
    v = _vectors_df(spark, sf_dir)
    q = v.filter(F.col("doc_id") < N_QUERY_DOCS)
    # norms computed ONCE per side before the join (same left-to-right
    # IEEE sum order as the inline form, so values are bit-identical);
    # the N x Q pair expression is then a single 16-term dot
    q = q.select(
        F.col("doc_id").alias("query_id"),
        *[F.col(f"e{j}").alias(f"q{j}") for j in range(EMBED_DIM)],
        F.sqrt(sum(F.col(f"e{j}") * F.col(f"e{j}") for j in range(EMBED_DIM))).alias("q_nrm"),
    )
    c = v.select(
        F.col("doc_id").alias("neighbor_id"),
        *[F.col(f"e{j}").alias(f"c{j}") for j in range(EMBED_DIM)],
        F.sqrt(sum(F.col(f"e{j}") * F.col(f"e{j}") for j in range(EMBED_DIM))).alias("c_nrm"),
    )
    dot = sum(F.col(f"q{j}") * F.col(f"c{j}") for j in range(EMBED_DIM))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            r4(dot / (F.col("q_nrm") * F.col("c_nrm"))).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


_DOT = " + ".join(f"q.e{j} * c.e{j}" for j in range(EMBED_DIM))
_QN = " + ".join(f"q.e{j} * q.e{j}" for j in range(EMBED_DIM))
_CN = " + ".join(f"c.e{j} * c.e{j}" for j in range(EMBED_DIM))
SQL_DOC_EMBED_TOPK = f"""
WITH vectors AS ({_sql_vectors()}),
scored AS (
  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         floor((({_DOT}) / (sqrt({_QN}) * sqrt({_CN}))) * 10000 + 0.5) / 10000 AS cosine
  FROM vectors q JOIN vectors c ON q.doc_id != c.doc_id
  WHERE q.doc_id < {N_QUERY_DOCS}
)
SELECT query_id, rank, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


QUERIES = {
    "doc_embed_vectors": q_doc_embed_vectors,
    "doc_embed_topk": q_doc_embed_topk,
}

ORACLES = {
    "doc_embed_vectors": SQL_DOC_EMBED,
    "doc_embed_topk": SQL_DOC_EMBED_TOPK,
}
